"""Loss tests: parity with torch formulations (torch CPU available) + fixtures."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from avtubes.losses import (
    consistency_l2,
    flip_loss,
    hardway_loss,
    np_ratio_loss,
    propagation_loss,
)


def test_hardway_loss_matches_torch_ce():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 10).astype(np.float32)
    ours = float(hardway_loss(jnp.asarray(logits)))
    ref = float(tF.cross_entropy(torch.tensor(logits), torch.zeros(8, dtype=torch.long)))
    assert np.isclose(ours, ref, atol=1e-6)


def test_propagation_loss_matches_torch():
    rng = np.random.RandomState(1)
    h = rng.randn(4, 16, 14, 14).astype(np.float32)
    ours = float(propagation_loss(jnp.asarray(h)))
    t = torch.tensor(h)
    ref = float(torch.abs(torch.diff(t, dim=1)).mean(dim=(2, 3)).mean(dim=1).mean(dim=0))
    assert np.isclose(ours, ref, atol=1e-6)


def test_np_ratio_matches_torch():
    rng = np.random.RandomState(2)
    h = rng.randn(4, 16, 14, 14).astype(np.float32)
    ours = float(np_ratio_loss(jnp.asarray(h)))
    t = torch.tensor(h)
    ref = float(torch.abs(torch.diff(torch.sum(t, dim=(2, 3)), dim=1)).mean(dim=1).mean(dim=0))
    assert np.isclose(ours, ref, atol=1e-5)


def test_flip_loss_zero_for_equivariant_maps():
    rng = np.random.RandomState(3)
    h = rng.randn(2, 14, 14).astype(np.float32)
    flipped_pred = h[:, :, ::-1].copy()
    assert float(flip_loss(jnp.asarray(h), jnp.asarray(flipped_pred))) < 1e-7
    assert float(flip_loss(jnp.asarray(h), jnp.asarray(h))) > 0.1


def test_consistency_l2_matches_mse():
    rng = np.random.RandomState(4)
    a = rng.randn(3, 14, 14).astype(np.float32)
    b = rng.randn(3, 14, 14).astype(np.float32)
    ours = float(consistency_l2(jnp.asarray(a), jnp.asarray(b)))
    ref = float(tF.mse_loss(torch.tensor(a), torch.tensor(b)))
    assert np.isclose(ours, ref, atol=1e-6)


def test_propagation_loss_zero_for_static_video():
    h = jnp.ones((2, 16, 14, 14))
    assert float(propagation_loss(h)) == 0.0
    assert float(np_ratio_loss(h)) == 0.0
