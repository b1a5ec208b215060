"""Correlation cost volume (FlowNet-style), TPU-native.

The reference's flow path depends on flownet2-pytorch's custom CUDA
`correlation` op (`/root/reference/flow.py:12` via the vendored flownet2
package): for every pixel of feature map 1 and every displacement d in a
(2*max_disp/stride + 1)^2 window, the channel-mean dot product with the
displaced pixel of feature map 2:

    corr[b, i, j, d] = mean_c f1[b,i,j,c] * f2[b, i+dy, j+dx, c]

Two implementations:

  * `correlation_xla` — statically unrolled shift-multiply-reduce over the
    displacement grid on a zero-padded f2.  Every displacement is a strided
    slice + fused multiply-reduce; works on any backend, the reference in
    tests.
  * `correlation_pallas` — a fused TPU kernel, one grid step per batch
    element: f1 and the padded f2 live in VMEM, the displacement loop runs
    on-chip (VPU multiply-reduce per shift) and the (H, W, D) volume is
    written once.  No displacement-stacked intermediate ever round-trips
    through HBM, so the op is bandwidth-bound at exactly one read of
    f1/f2 + one write of the output.

`correlation_cost_volume` picks Pallas on TPU when the per-image working
set fits VMEM, XLA otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under ~16 MB/core


def _displacements(max_disp: int, stride: int) -> list[int]:
    """flownet2's i*stride grid: always symmetric and always includes 0.
    (range(-max_disp, max_disp+1, stride) loses the zero displacement — and
    with it the self-match channel — whenever stride does not divide
    max_disp.)"""
    steps = max_disp // stride
    return [i * stride for i in range(-steps, steps + 1)]


@functools.partial(jax.jit, static_argnames=("max_disp", "stride"))
def correlation_xla(f1: jnp.ndarray, f2: jnp.ndarray, max_disp: int = 4,
                    stride: int = 1) -> jnp.ndarray:
    """(B,H,W,C) x2 -> (B,H,W,D) with D = (2*max_disp//stride + 1)^2."""
    b, h, w, c = f1.shape
    disps = _displacements(max_disp, stride)
    f2p = jnp.pad(f2, ((0, 0), (max_disp, max_disp), (max_disp, max_disp), (0, 0)))
    outs = []
    for dy in disps:
        for dx in disps:
            shifted = jax.lax.dynamic_slice(
                f2p, (0, max_disp + dy, max_disp + dx, 0), (b, h, w, c))
            outs.append((f1 * shifted).mean(axis=-1))
    return jnp.stack(outs, axis=-1)


def _corr_kernel(f1_ref, f2p_ref, out_ref, *, disps, max_disp, h, w, c):
    inv_c = 1.0 / c
    f1 = f1_ref[0]                      # (H, W, C)
    for k, (dy, dx) in enumerate(disps):
        f2s = f2p_ref[0, max_disp + dy : max_disp + dy + h,
                      max_disp + dx : max_disp + dx + w, :]
        out_ref[0, :, :, k] = (f1 * f2s).sum(axis=-1) * inv_c


@functools.partial(jax.jit, static_argnames=("max_disp", "stride"))
def correlation_pallas(f1: jnp.ndarray, f2: jnp.ndarray, max_disp: int = 4,
                       stride: int = 1) -> jnp.ndarray:
    b, h, w, c = f1.shape
    disps1 = _displacements(max_disp, stride)
    disps = [(dy, dx) for dy in disps1 for dx in disps1]
    d = len(disps)
    f2p = jnp.pad(f2, ((0, 0), (max_disp, max_disp), (max_disp, max_disp), (0, 0)))

    kernel = functools.partial(_corr_kernel, disps=disps, max_disp=max_disp,
                               h=h, w=w, c=c)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * max_disp, w + 2 * max_disp, c),
                         lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, d), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, d), f1.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * d,
            bytes_accessed=4 * b * (2 * h * w * c + h * w * d),
            transcendentals=0,
        ),
    )(f1, f2p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _correlation_pallas_ad(f1, f2, max_disp: int, stride: int):
    """Pallas correlation with reverse-mode autodiff: the fused kernel runs
    forward; the backward pass reuses the XLA implementation's VJP (Pallas
    kernels are not differentiable by tracing).  The flow pretraining loop
    differentiates through the cost volume, so this matters on TPU."""
    return correlation_pallas(f1, f2, max_disp, stride)


def _correlation_fwd(f1, f2, max_disp, stride):
    return correlation_pallas(f1, f2, max_disp, stride), (f1, f2)


def _correlation_bwd(max_disp, stride, res, g):
    f1, f2 = res
    _, vjp = jax.vjp(lambda a, b: correlation_xla(a, b, max_disp, stride), f1, f2)
    return vjp(g)


_correlation_pallas_ad.defvjp(_correlation_fwd, _correlation_bwd)


def _pallas_fits(h: int, w: int, c: int, d: int, max_disp: int, itemsize: int) -> bool:
    per_image = (
        h * w * c + (h + 2 * max_disp) * (w + 2 * max_disp) * c + h * w * d
    ) * itemsize
    return per_image <= _VMEM_BUDGET


def correlation_cost_volume(f1: jnp.ndarray, f2: jnp.ndarray, max_disp: int = 4,
                            stride: int = 1, impl: str = "auto") -> jnp.ndarray:
    """Cost volume between two (B,H,W,C) feature maps.

    impl: 'auto' (pallas on TPU when it fits VMEM, xla otherwise)
          | 'xla' | 'pallas'.
    """
    if impl == "auto":
        _, h, w, c = f1.shape
        d = len(_displacements(max_disp, stride)) ** 2
        from avtubes.core.platform import on_tpu

        impl = ("pallas" if on_tpu() and _pallas_fits(h, w, c, d, max_disp,
                                                      f1.dtype.itemsize) else "xla")
    if impl == "pallas":
        return _correlation_pallas_ad(f1, f2, max_disp, stride)
    return correlation_xla(f1, f2, max_disp, stride)
