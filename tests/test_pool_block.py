"""Block-pool masking == per-device negative pools (DataParallel parity)."""

import jax.numpy as jnp
import numpy as np

from avtubes.models import HardwayConfig, hardway_head


def test_block_pool_matches_isolated_subbatch_logits():
    rng = np.random.RandomState(0)
    b, blk, h, w, c = 8, 2, 4, 4, 32
    img = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    aud = jnp.asarray(rng.randn(b, c), jnp.float32)

    blocked = hardway_head(img, aud, HardwayConfig(pool_block=blk))
    logits = np.asarray(blocked.logits)
    assert logits.shape == (b, b + 2)

    for d in range(b // blk):
        sl = slice(d * blk, (d + 1) * blk)
        iso = hardway_head(img[sl], aud[sl], HardwayConfig())
        iso_logits = np.asarray(iso.logits)
        # sim1 (col 0) and sim2 (last col) are pool-independent
        np.testing.assert_allclose(logits[sl, 0], iso_logits[:, 0], atol=1e-5)
        np.testing.assert_allclose(logits[sl, -1], iso_logits[:, -1], atol=1e-5)
        # local cross-sim block matches the isolated sub-batch's sims
        local = logits[sl, 1 + d * blk : 1 + (d + 1) * blk]
        np.testing.assert_allclose(local, iso_logits[:, 1:-1], atol=1e-5)

    # non-local columns are excluded: pinned to a hard negative so their
    # softmax weight is ~0 (NOT the multiplicative diagonal trick, which
    # would flip negative cross-pair sims into dominant positives)
    from avtubes.models.hardway import HardwayConfig as _HC

    cfg = _HC()
    non_local = logits[0, 1 + blk : 1 + b]
    np.testing.assert_allclose(
        non_local, -cfg.mask_penalty / cfg.temperature, rtol=1e-6)


def test_pool_block_zero_is_global():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(4, 4, 4, 16), jnp.float32)
    aud = jnp.asarray(rng.randn(4, 16), jnp.float32)
    a = hardway_head(img, aud, HardwayConfig(pool_block=0))
    b = hardway_head(img, aud, HardwayConfig())
    np.testing.assert_array_equal(np.asarray(a.logits), np.asarray(b.logits))
