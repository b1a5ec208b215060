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
