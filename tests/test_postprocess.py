"""Heatmap postprocess tests: parity with the reference's cv2/numpy pipeline."""

import numpy as np
import pytest

from avtubes.evaluation import heatmap_to_mask, heatmap_to_mask_batch

cv2 = pytest.importorskip("cv2")


def _reference_postprocess(heatmap):
    """The reference driver's inline pipeline (train_hardway.py:176-181)."""
    h = cv2.resize(heatmap.astype(np.float32), dsize=(224, 224), interpolation=cv2.INTER_LINEAR)
    h = -h
    vmin, vmax = h.min(), h.max()
    if vmax - vmin != 0:
        h = (h - vmin) / (vmax - vmin)
    pred = 1 - h
    threshold = np.sort(pred.flatten())[int(50176 * 0.5)]
    pred[pred > threshold] = 1
    pred[pred < 1] = 0
    return pred


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mask_matches_reference_pipeline(seed):
    rng = np.random.RandomState(seed)
    heat = rng.randn(14, 14).astype(np.float32)
    ours = heatmap_to_mask(heat)
    ref = _reference_postprocess(heat)
    # bilinear resize differences are at float ulp level; allow a handful of
    # pixels to flip right at the median threshold
    disagree = np.sum(ours != ref)
    assert disagree <= 5, f"{disagree} pixels disagree"


def test_mask_is_binary_and_half_dense():
    rng = np.random.RandomState(3)
    heat = rng.randn(14, 14).astype(np.float32)
    m = heatmap_to_mask(heat)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    # strictly-above-median keeps just under half the pixels
    assert 0.3 < m.mean() < 0.55


def test_batched_matches_single():
    rng = np.random.RandomState(4)
    heats = rng.randn(6, 14, 14).astype(np.float32)
    batched = np.asarray(heatmap_to_mask_batch(heats))
    for i in range(6):
        single = heatmap_to_mask(heats[i])
        assert np.array_equal(batched[i], single)


def test_constant_heatmap_no_nan():
    heat = np.ones((14, 14), dtype=np.float32)
    m = heatmap_to_mask(heat)
    assert np.all(np.isfinite(m))


def test_constant_heatmap_empty_mask_both_paths():
    """Constant heatmaps (no localization evidence) give an all-zero mask in
    BOTH the host and the batched path — the reference's inlined code is
    degenerate here (non-binary for c>=0, zeros for c<0), so the two paths
    would otherwise silently disagree."""
    import jax.numpy as jnp

    from avtubes.evaluation.postprocess import heatmap_to_mask, heatmap_to_mask_batch

    for c in (-0.3, 0.0, 0.7):
        host = heatmap_to_mask(np.full((14, 14), c, np.float32))
        batch = np.asarray(heatmap_to_mask_batch(
            jnp.full((1, 14, 14), c, jnp.float32)))[0]
        assert host.sum() == 0
        assert batch.sum() == 0


def test_plateau_at_max_matches_host_path():
    """A heatmap where >50% of upsampled pixels sit exactly at the max: the
    median threshold equals 1.0 and the reference's `out[out < 1.0] = 0`
    KEEPS the max plateau as foreground.  The batched strictly-greater mask
    used to return all zeros here — pinned equal to the host path now."""
    import jax.numpy as jnp

    h = np.ones((14, 14), np.float32)
    h[:, 10:] = 0.0  # 10/14 columns at the max
    host = heatmap_to_mask(h)
    batch = np.asarray(heatmap_to_mask_batch(jnp.asarray(h)[None])[0])
    assert host.sum() > 0, "host path must keep the plateau"
    np.testing.assert_array_equal(batch, host)
