"""Negative-pool scoping: per-device (DataParallel parity) vs global."""

import jax.numpy as jnp
import numpy as np

from conftest import cpu_mesh

from avtubes.models import HardwayConfig, hardway_head
from avtubes.parallel import hardway_head_device_pool, hardway_head_global_pool


def test_device_pool_matches_per_shard_computation():
    rng = np.random.RandomState(0)
    b, h, w, c = 8, 4, 4, 32
    img = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    aud = jnp.asarray(rng.randn(b, c), jnp.float32)
    cfg = HardwayConfig()
    mesh = cpu_mesh((4,), ("data",))

    out = hardway_head_device_pool(img, aud, cfg, mesh)
    assert out.logits.shape == (8, 2 + 2)  # local pool of 2 per device

    per_shard = np.asarray(out.logits)
    for d in range(4):
        sl = slice(d * 2, (d + 1) * 2)
        ref = hardway_head(img[sl], aud[sl], cfg)
        np.testing.assert_allclose(per_shard[sl], np.asarray(ref.logits),
                                   rtol=1e-5, atol=1e-5)


def test_global_pool_differs_from_device_pool():
    rng = np.random.RandomState(1)
    b, c = 8, 32
    img = jnp.asarray(rng.randn(b, 4, 4, c), jnp.float32)
    aud = jnp.asarray(rng.randn(b, c), jnp.float32)
    cfg = HardwayConfig()
    mesh = cpu_mesh((4,), ("data",))
    g = hardway_head_global_pool(img, aud, cfg, mesh)
    d = hardway_head_device_pool(img, aud, cfg, mesh)
    assert g.logits.shape == (8, 10)
    assert d.logits.shape == (8, 4)
    # heatmaps (own-pair similarity) agree regardless of pool scope
    np.testing.assert_allclose(np.asarray(g.heatmap), np.asarray(d.heatmap),
                               rtol=1e-5, atol=1e-5)


def test_gathered_pool_matches_single_device():
    """Explicit all-gather + offset mask == single-device global pool."""
    from avtubes.parallel import hardway_head_gathered_pool

    rng = np.random.RandomState(2)
    b, h, w, c = 8, 4, 4, 32
    img = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    aud = jnp.asarray(rng.randn(b, c), jnp.float32)
    cfg = HardwayConfig()
    mesh = cpu_mesh((4,), ("data",))

    gathered = hardway_head_gathered_pool(img, aud, cfg, mesh)
    single = hardway_head(img, aud, cfg)
    np.testing.assert_allclose(np.asarray(gathered.logits),
                               np.asarray(single.logits), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gathered.heatmap),
                               np.asarray(single.heatmap), rtol=1e-5, atol=1e-6)


def test_aud_all_with_offset_matches_diagonal_mask():
    """Passing an explicit key pool + pool_offset reproduces the own-column
    exclusion: slicing a 2x-batch pool at offset b must equal running the
    head on the second half alone, column-shifted."""
    rng = np.random.RandomState(3)
    b, c = 4, 16
    img = jnp.asarray(rng.randn(b, 4, 4, c), jnp.float32)
    aud_own = jnp.asarray(rng.randn(b, c), jnp.float32)
    aud_other = jnp.asarray(rng.randn(b, c), jnp.float32)
    pool = jnp.concatenate([aud_other, aud_own])
    cfg = HardwayConfig()

    out = hardway_head(img, aud_own, cfg, aud_all=pool, pool_offset=b)
    ref = hardway_head(img, aud_own, cfg)
    assert out.logits.shape == (b, 2 * b + 2)
    # sim1 (col 0) and sim2 (last col) depend only on the own pair
    np.testing.assert_allclose(np.asarray(out.logits[:, 0]),
                               np.asarray(ref.logits[:, 0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.logits[:, -1]),
                               np.asarray(ref.logits[:, -1]), rtol=1e-5)
    # the own-batch block (cols b+1 .. 2b) carries the diagonal exclusion
    np.testing.assert_allclose(np.asarray(out.logits[:, 1 + b:1 + 2 * b]),
                               np.asarray(ref.logits[:, 1:1 + b]),
                               rtol=1e-5, atol=1e-5)


def test_global_pool_mask_values():
    from avtubes.parallel import global_pool_mask

    m = np.asarray(global_pool_mask(2, 6, 2, penalty=100.0))
    expected = np.ones((2, 6))
    expected[0, 2] = -99.0
    expected[1, 3] = -99.0
    np.testing.assert_array_equal(m, expected)
