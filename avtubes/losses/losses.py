"""Loss functions (pure jnp).

Parity targets:
  * hardway_loss      — nn.CrossEntropyLoss(logits, 0)  (`train_hardway.py:109,135`)
  * propagation_loss  — `losses.py:16-23` (temporal smoothness of heatmaps)
  * np_ratio_loss     — `losses.py:7-14`  (stability of positive-area size)
  * flip_loss         — `losses.py:25-36` (horizontal-flip equivariance, L1)
  * consistency_l2    — nn.MSELoss between clean/augmented weighted maps
                        (`train_hardway.py:111,138`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hardway_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy with target class 0 for every row.

    Class 0 is the Pos-pooled own-pair similarity column; the model must push
    it above every cross-pair (and the Neg-pooled own-image) similarity.
    """
    logz = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -logz[:, 0].mean()


def propagation_loss(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute temporal gradient of (B, T, H, W) maps."""
    d = jnp.abs(jnp.diff(heatmaps, axis=1))
    return d.mean(axis=(2, 3)).mean(axis=1).mean()


def np_ratio_loss(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute temporal change of total heatmap mass, (B, T, H, W)."""
    sums = heatmaps.sum(axis=(2, 3))
    return jnp.abs(jnp.diff(sums, axis=1)).mean(axis=1).mean()


def flip_loss(heatmap: jnp.ndarray, flipped_heatmap: jnp.ndarray) -> jnp.ndarray:
    """L1 between the flipped-input prediction and the horizontally flipped map.

    `heatmap` is the prediction on the original input, `flipped_heatmap` the
    prediction on the horizontally flipped input; the flip of the former is
    the pseudo-label for the latter. Maps are (..., H, W).
    """
    pseudo = jnp.flip(heatmap, axis=-1)
    return jnp.abs(flipped_heatmap - pseudo).mean()


def consistency_l2(weighted_a: jnp.ndarray, weighted_b: jnp.ndarray) -> jnp.ndarray:
    """MSE between Pos-weighted feature maps of two augmented views."""
    return jnp.mean((weighted_a - weighted_b) ** 2)
