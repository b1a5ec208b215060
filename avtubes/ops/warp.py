"""Bilinear warping: flow warp + torch-compatible grid_sample.

Replaces flownet2's CUDA `resample2d` and the reference's
`F.grid_sample(pred, flows)` warp (`/root/reference/flow.py:152`).

TPU-native formulation: bilinear sampling is four gathers + a weighted sum.
Gathers are expressed as flat one-hot-free `take` along a flattened spatial
axis so XLA lowers them to efficient dynamic-gathers; everything is
vmapped/jittable and differentiable (gradients flow to both image and
coordinates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_bilinear(img: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                     padding_mode: str) -> jnp.ndarray:
    """img (H,W,C); sy/sx (..., ) absolute pixel coords -> (..., C)."""
    h, w, _ = img.shape
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def sample(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img.reshape(h * w, -1)[yc * w + xc]
        if padding_mode == "zeros":
            inside = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
            vals = vals * inside[..., None].astype(vals.dtype)
        return vals

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    return ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
            + wy * (1 - wx) * v10 + wy * wx * v11)


@functools.partial(jax.jit, static_argnames=("padding_mode",))
def flow_warp(img: jnp.ndarray, flow: jnp.ndarray,
              padding_mode: str = "border") -> jnp.ndarray:
    """Warp img (B,H,W,C) by flow (B,H,W,2) with (dx, dy) pixel offsets:
    out[b,i,j] = img[b, i + flow[...,1], j + flow[...,0]] (bilinear)."""
    _, h, w, _ = img.shape
    yy = jnp.arange(h, dtype=flow.dtype)[:, None]
    xx = jnp.arange(w, dtype=flow.dtype)[None, :]

    def one(im, fl):
        sy = yy + fl[..., 1]
        sx = xx + fl[..., 0]
        return _gather_bilinear(im, sy, sx, padding_mode)

    return jax.vmap(one)(img, flow)


@functools.partial(jax.jit, static_argnames=("align_corners", "padding_mode"))
def grid_sample(img: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = False,
                padding_mode: str = "zeros") -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent (bilinear, NHWC).

    img: (B, H, W, C); grid: (B, Ho, Wo, 2) normalized coords in [-1, 1],
    grid[..., 0] = x, grid[..., 1] = y (torch convention).
    """
    _, h, w, _ = img.shape

    def unnormalize(coord, size):
        if align_corners:
            return (coord + 1.0) / 2.0 * (size - 1)
        return ((coord + 1.0) * size - 1.0) / 2.0

    def one(im, g):
        sx = unnormalize(g[..., 0], w)
        sy = unnormalize(g[..., 1], h)
        return _gather_bilinear(im, sy, sx, padding_mode)

    return jax.vmap(one)(img, grid)
