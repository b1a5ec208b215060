"""Exact k-th-order-statistic threshold + mask, TPU-native.

The reference's heatmap postprocess binarizes each upsampled 224x224 map at
its median pixel — the value at sorted index H*W/2 (`train_hardway.py:176-181`,
`test.py:97-128`).  A full `jnp.sort` of 50,176 floats per clip is the
single most expensive non-backbone op in the inference pipeline (~25% of
step time on v5e).  Sorting is overkill: only the k-th smallest VALUE is
needed, and for non-negative IEEE-754 floats the integer interpretation of
the bit pattern is order-isomorphic to the float ordering, so the exact
k-th value can be found by ~31 iterations of binary search on the bit
space, each a compare-and-count reduction — no data movement at all.

Two implementations of the same exact math:

  * `kth_value_bits_xla` — pure jnp `fori_loop` bisection; any backend.
    Each iteration is one compare-and-count pass over the (B, N) block,
    vectorized across the whole batch.  Measured 0.49 ms vs 6.4 ms for
    sort at B=128 on v5e (13x) — the default.
  * `median_mask_pallas` — fused kernel: one map per program in VMEM,
    bisection on-chip, mask written directly (one HBM read + one write).
    Measured 1.25 ms: latency-bound on its 128 sequential programs x 31
    serial reductions, so the XLA path wins; kept as an alternative and
    a Mosaic regression target (like ops/stft).

Both return bit-identical results to `jnp.sort(x)[k]` (ties and all):
the bisection converges to the smallest bit pattern m with
count(x <= m) >= k+1, which is exactly the k-th smallest element.

Inputs must be non-negative finite floats (any magnitude — the bisection
bound is the largest finite f32); asserted nowhere for speed, guaranteed by
the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_BITS = 0x7F7FFFFF  # bit pattern of the largest finite f32: the search
#                          covers ALL finite non-negative inputs, not just
#                          [0, 1] (a caller feeding un-normalized maps must
#                          get the exact answer, not a silent clamp at 1.0)
_ITERS = 31             # ceil(log2(_MAX_BITS + 1)) = 31 exactly


@functools.partial(jax.jit, static_argnames=("k",))
def kth_value_bits_xla(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, N) non-negative f32 -> (B,) exact k-th smallest value per row."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    b = x.shape[0]
    lo0 = jnp.zeros((b,), jnp.int32)
    hi0 = jnp.full((b,), _MAX_BITS, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + ((hi - lo) >> 1)  # lo+hi could overflow int32 at _MAX_BITS
        cnt = jnp.sum(bits <= mid[:, None], axis=1)
        take_lo = cnt >= k + 1
        return jnp.where(take_lo, lo, mid + 1), jnp.where(take_lo, mid, hi)

    lo, _ = jax.lax.fori_loop(0, _ITERS, body, (lo0, hi0))
    return jax.lax.bitcast_convert_type(lo, jnp.float32)


def _median_mask_kernel(pred_ref, out_ref, *, k):
    """One map per program: bisect its k-th value (scalar state in SREGs),
    write the strictly-greater mask."""
    bits = jax.lax.bitcast_convert_type(pred_ref[0], jnp.int32)   # (H, W)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + ((hi - lo) >> 1)
        cnt = jnp.sum(bits <= mid)
        take_lo = cnt >= k + 1
        return (jnp.where(take_lo, lo, mid + 1),
                jnp.where(take_lo, mid, hi))

    lo, _ = jax.lax.fori_loop(
        0, _ITERS, body, (jnp.int32(0), jnp.int32(_MAX_BITS)))
    # strictly-greater mask; int compare == float compare for non-negatives
    out_ref[0] = (bits > lo).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def median_mask_pallas(pred: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, H, W) non-negative f32 -> (B, H, W) {0,1} mask of pixels strictly
    above the per-row k-th smallest value.  One VMEM-resident pass."""
    b, h, w = pred.shape
    kernel = functools.partial(_median_mask_kernel, k=k)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=_ITERS * b * h * w,
            bytes_accessed=4 * b * h * w * 2,
            transcendentals=0,
        ),
    )(pred)


def median_mask(pred: jnp.ndarray, k: int, impl: str = "auto") -> jnp.ndarray:
    """(B, H, W) -> {0,1} mask above the exact k-th smallest per row.

    impl: 'auto' (= the XLA bisection, fastest measured on v5e) | 'pallas'
          | 'bisect' | 'sort' (reference oracle, kept for tests).
    """
    b, h, w = pred.shape
    if impl == "auto":
        impl = "bisect"
    if impl == "pallas":
        return median_mask_pallas(pred, k)
    flat = pred.reshape(b, -1)
    if impl == "bisect":
        thr = kth_value_bits_xla(flat, k)
    else:  # 'sort'
        thr = jnp.sort(flat, axis=1)[:, k]
    mask = (flat > thr[:, None]).astype(jnp.float32)
    return mask.reshape(b, h, w)
