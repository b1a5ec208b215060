"""Time-stacked lowering of temporal-stride-1 3D convolution.

The 3D tube encoder (reference `resnet3D.py:138-148`) is all (kt, kh, kw)
convolutions with temporal stride 1 and SAME temporal padding — XLA's
native Conv3D lowering runs these at ~0.42 of MXU peak on v5e (measured,
DESIGN.md "3D tube" notes), while the 2D flagship's Conv2D programs reach
~0.73.  This module lowers the 3D conv EXACTLY onto Conv2D two ways:

  y[b, t] = sum_dt conv2d(x[b, t + dt - kt//2], K[dt])

'stacked': one 2D convolution over the (B*T) folded frame batch whose
input is the kt time-shifted copies of x stacked along channels (zero
padding at the clip boundary = the 3D conv's SAME temporal padding) and
whose kernel is K transposed to (kh, kw, kt*C, O) with dt-major channel
blocks.  'sum': kt separate 2D convolutions on time-shifted slices,
summed.  Identical FLOPs and math (same contraction, reassociated).

MEASURED RESULT (v5e, bs=20 x 16-frame recipe — a recorded NEGATIVE,
DESIGN.md 3D-tube notes): direct Conv3D wins.  Forward-only eval program
155.4 ms (direct) vs 179.0 ('sum', +15%) vs 207.7 ('stacked', +34%) — the
kt-fold extra activation traffic costs more than Conv2D codegen recovers,
i.e. the ~0.42-of-peak conv efficiency is intrinsic to these shapes
(112x112 bf16 activations, C=64-512 on (8,128) tiles), not a
Conv3D-codegen artifact.  On the training backward both lowerings OOM the
recipe batch: 'stacked' saves the kt-wide concats (+4.18 GB over the
15.75 GB HBM), 'sum' saves the kt sliced inputs (+0.2 GB).  Both impls
stay available and parity-tested (tests/test_resnet3d.py); the default
everywhere is 'direct'.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _check_temporal(kernel, strides, padding):
    kt = kernel.shape[0]
    st = strides[0]
    if st != 1:
        raise ValueError(f"time-lowered conv3d needs temporal stride 1, got {st}")
    if isinstance(padding, int):
        padding = ((padding,) * 2,) * 3
    (pt0, pt1), ph, pw = padding
    if (pt0, pt1) != (kt // 2, kt // 2):
        raise ValueError(
            f"time-lowered conv3d needs SAME temporal padding ({kt // 2}), "
            f"got {(pt0, pt1)}")
    return (pt0, pt1), ph, pw


def conv3d_time_stacked(x: jnp.ndarray, kernel: jnp.ndarray,
                        strides: tuple[int, int, int],
                        padding) -> jnp.ndarray:
    """Exact NDHWC 3D convolution via one NHWC 2D convolution.

    x: (B, T, H, W, C); kernel: (kt, kh, kw, C, O) (flax nn.Conv layout).
    Requires temporal stride 1 and SAME temporal padding (kt//2 each side)
    — the only temporal geometry the tube encoder uses.
    """
    kt, kh, kw, cin, cout = kernel.shape
    st, sh, sw = strides
    (pt0, pt1), ph, pw = _check_temporal(kernel, strides, padding)
    b, t, h, w, c = x.shape
    if kt == 1:
        xs = x.reshape(b * t, h, w, c)
        k2 = kernel.reshape(kh, kw, cin, cout)
    else:
        xp = jnp.pad(x, ((0, 0), (pt0, pt1), (0, 0), (0, 0), (0, 0)))
        # kt time-shifted views stacked dt-major along channel
        xs = jnp.concatenate([xp[:, i:i + t] for i in range(kt)], axis=-1)
        xs = xs.reshape(b * t, h, w, kt * c)
        k2 = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(kh, kw, kt * cin, cout)
    y = lax.conv_general_dilated(
        xs, k2, window_strides=(sh, sw), padding=(ph, pw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    _, ho, wo, _ = y.shape
    return y.reshape(b, t, ho, wo, cout)


def conv3d_time_sum(x: jnp.ndarray, kernel: jnp.ndarray,
                    strides: tuple[int, int, int],
                    padding) -> jnp.ndarray:
    """Exact NDHWC 3D convolution as a sum of kt NHWC 2D convolutions.

    y[b, t] = sum_dt conv2d(x[b, t + dt - kt//2], K[dt]) — each temporal tap
    is its own Conv2D over the (B·T) folded frame batch on a time-shifted
    slice of the padded input.  Unlike `conv3d_time_stacked`, nothing wider
    than the input is materialized in the forward; in the backward XLA
    still saves each sliced conv input, so the recipe-batch train step
    OOMs by ~0.2 GB (vs the stacked form's +4.18 GB).  Measured slower
    than direct Conv3D on the forward anyway (module docstring) — kept as
    an opt-in, parity-tested alternative.  Same contraction, reassociated.
    """
    kt, kh, kw, cin, cout = kernel.shape
    st, sh, sw = strides
    (pt0, pt1), ph, pw = _check_temporal(kernel, strides, padding)
    b, t, h, w, c = x.shape
    if kt == 1:
        return conv3d_time_stacked(x, kernel, strides, padding)
    xp = jnp.pad(x, ((0, 0), (pt0, pt1), (0, 0), (0, 0), (0, 0)))
    y = None
    for i in range(kt):
        xi = xp[:, i:i + t].reshape(b * t, h, w, c)
        yi = lax.conv_general_dilated(
            xi, kernel[i], window_strides=(sh, sw), padding=(ph, pw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        y = yi if y is None else y + yi
    _, ho, wo, _ = y.shape
    return y.reshape(b, t, ho, wo, cout)
