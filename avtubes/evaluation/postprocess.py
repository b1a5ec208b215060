"""Heatmap -> binary localization mask postprocess.

The reference inlines this in every driver (`train_hardway.py:176-181`,
`test.py:97-128`): 14x14 heatmap -> bilinear resize to 224x224 ->
min-max normalize the *negated* map -> pred = 1 - normalized ->
binarize at the median pixel (value at sorted index H*W/2).

The double negation means: pred is the min-max normalization of the raw
heatmap; the mask keeps pixels strictly above the median.  We implement it
directly that way, plus a batched on-device (jnp) variant so eval heatmaps
never round-trip through the host one at a time.

cv2.resize(..., INTER_LINEAR) on an upsample uses half-pixel-centered
bilinear interpolation, which is exactly `jax.image.resize(method="linear")`
— verified bit-close in tests/test_postprocess.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IMG = 224


def normalize_minmax(x):
    """Min-max normalize to [0,1] (reference `utils.py:234-239`)."""
    xmin, xmax = x.min(), x.max()
    if isinstance(x, np.ndarray):
        if xmax - xmin == 0:
            return x
        return (x - xmin) / (xmax - xmin)
    return jnp.where(xmax - xmin == 0, x, (x - xmin) / (xmax - xmin))


def heatmap_to_mask(heatmap: np.ndarray, size: int = IMG) -> np.ndarray:
    """Exact (numpy) reference postprocess for one 14x14 heatmap.

    Returns a {0,1} float map of shape (size, size).

    Deliberate deviation: a CONSTANT heatmap returns all zeros.  The
    reference's inlined code is degenerate there (normalize_img skips the
    rescale, and `out[out < 1.0] = 0` then yields a non-binary all-(1+c)
    map for c >= 0 but all zeros for c < 0); a constant map carries no
    localization evidence, so both our host and batched paths report an
    empty mask — keeping the two implementations equal per sample.
    """
    h = np.asarray(
        jax.image.resize(jnp.asarray(heatmap, jnp.float32), (size, size), method="linear")
    )
    if h.max() - h.min() == 0:
        return np.zeros((size, size), np.float32)
    # reference: normalize_img(-h); pred = 1 - that  ==  minmax-normalized h
    h = -h
    h = normalize_minmax(h)
    pred = 1.0 - h
    flat = np.sort(pred.flatten())
    threshold = flat[int(size * size * 0.5)]
    out = pred.copy()
    out[out > threshold] = 1.0
    out[out < 1.0] = 0.0
    return out


def heatmap_to_mask_batch(heatmaps: jnp.ndarray, size: int = IMG,
                          impl: str = "auto") -> jnp.ndarray:
    """Batched on-device postprocess: (B, h, w) heatmaps -> (B, size, size) {0,1} masks.

    Matches `heatmap_to_mask` per sample; the median is the value at sorted
    index size*size/2 per map, and the mask keeps pixels strictly above it
    plus pixels exactly at the normalized max (the reference's
    `out[out < 1.0] = 0` spares them even when the median is 1.0).
    The k-th value comes from an exact bit-space bisection instead of a full
    sort (avtubes.ops.median_select — Pallas on TPU), bit-identical to
    `jnp.sort(pred)[k]` and ~10x cheaper.
    """
    from avtubes.ops.median_select import median_mask

    b = heatmaps.shape[0]
    up = jax.image.resize(heatmaps.astype(jnp.float32), (b, size, size), method="linear")
    flat = up.reshape(b, -1)
    lo = flat.min(axis=1, keepdims=True)
    hi = flat.max(axis=1, keepdims=True)
    denom = jnp.where(hi - lo == 0, 1.0, hi - lo)
    pred = ((flat - lo) / denom).reshape(b, size, size)
    mask = median_mask(pred, k=size * size // 2, impl=impl)
    # the host path's `out[out < 1.0] = 0` keeps pixels EQUAL to 1.0 even
    # when the median itself is 1.0 (a >50% plateau at the max) — the
    # strictly-greater mask alone would drop them.  Constant maps are
    # unaffected: their pred is identically 0 (flat - lo == 0).
    return jnp.where(pred == 1.0, 1.0, mask)
