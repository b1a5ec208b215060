"""Custom-op tests: correlation volume vs naive loop, grid_sample vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from avtubes.ops import correlation_cost_volume, flow_warp, grid_sample
from avtubes.ops.correlation import correlation_pallas, correlation_xla


def _naive_correlation(f1, f2, max_disp, stride):
    b, h, w, c = f1.shape
    disps = list(range(-max_disp, max_disp + 1, stride))
    f2p = np.pad(f2, ((0, 0), (max_disp, max_disp), (max_disp, max_disp), (0, 0)))
    out = np.zeros((b, h, w, len(disps) ** 2), f1.dtype)
    k = 0
    for dy in disps:
        for dx in disps:
            sh = f2p[:, max_disp + dy : max_disp + dy + h,
                     max_disp + dx : max_disp + dx + w, :]
            out[..., k] = (f1 * sh).mean(-1)
            k += 1
    return out


def test_correlation_xla_matches_naive():
    rng = np.random.RandomState(0)
    f1 = rng.randn(2, 8, 8, 16).astype(np.float32)
    f2 = rng.randn(2, 8, 8, 16).astype(np.float32)
    out = np.asarray(correlation_xla(jnp.asarray(f1), jnp.asarray(f2), 2, 1))
    ref = _naive_correlation(f1, f2, 2, 1)
    assert out.shape == (2, 8, 8, 25)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_correlation_identity_peak():
    """Correlating a map with itself peaks at zero displacement."""
    rng = np.random.RandomState(1)
    f = rng.randn(1, 8, 8, 32).astype(np.float32)
    out = np.asarray(correlation_cost_volume(jnp.asarray(f), jnp.asarray(f), 2, 1,
                                             impl="xla"))
    center = 12  # (2*2+1)^2 grid, zero displacement at index 12
    inner = out[0, 2:-2, 2:-2]
    assert np.all(inner.argmax(-1) == center)


def test_correlation_stride():
    rng = np.random.RandomState(2)
    f1 = rng.randn(1, 8, 8, 8).astype(np.float32)
    f2 = rng.randn(1, 8, 8, 8).astype(np.float32)
    out = np.asarray(correlation_xla(jnp.asarray(f1), jnp.asarray(f2), 4, 2))
    ref = _naive_correlation(f1, f2, 4, 2)
    assert out.shape[-1] == 25
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_correlation_pallas_interpret_matches_xla():
    """Pallas kernel in interpreter mode (CPU) vs XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(3)
    f1 = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    f2 = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out_p = np.asarray(correlation_pallas(f1, f2, 2, 1))
    out_x = np.asarray(correlation_xla(f1, f2, 2, 1))
    np.testing.assert_allclose(out_p, out_x, atol=1e-5)


def test_grid_sample_matches_torch():
    rng = np.random.RandomState(4)
    img = rng.randn(2, 9, 11, 3).astype(np.float32)
    grid = np.clip(rng.randn(2, 5, 7, 2) * 0.6, -1.2, 1.2).astype(np.float32)
    for align in (False, True):
        ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                      align_corners=align))
        ref = tF.grid_sample(
            torch.tensor(img).permute(0, 3, 1, 2), torch.tensor(grid),
            mode="bilinear", padding_mode="zeros", align_corners=align,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_flow_warp_zero_flow_identity():
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randn(1, 8, 8, 2), jnp.float32)
    out = flow_warp(img, jnp.zeros((1, 8, 8, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_flow_warp_integer_shift():
    img = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    flow = jnp.ones((1, 4, 4, 2))  # sample from (i+1, j+1)
    out = np.asarray(flow_warp(img, flow, padding_mode="border"))[0, :, :, 0]
    ref = np.asarray(img)[0, :, :, 0]
    np.testing.assert_allclose(out[:3, :3], ref[1:, 1:], atol=1e-6)


def test_warp_differentiable():
    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.randn(1, 6, 6, 1), jnp.float32)
    flow = jnp.asarray(rng.randn(1, 6, 6, 2) * 0.3, jnp.float32)
    g = jax.grad(lambda f: flow_warp(img, f).sum())(flow)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
