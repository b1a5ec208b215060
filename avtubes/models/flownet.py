"""Compact FlowNet-C-style optical flow estimator (TPU-native).

The reference's flow-guided consistency path (`/root/reference/flow.py`)
loads external FlowNet2 (vendored CUDA correlation/resample ops).  We
provide a self-contained flax flow net built on our Pallas correlation
cost volume (`avtubes.ops.correlation`): siamese conv encoders, a
normalized-correlation layer at 1/8 resolution, a **soft-argmax flow
prior** (expected displacement under softmax over the cost volume, PWC-Net
style), and a small conv trunk that regresses a residual refinement.

The soft-argmax prior is the load-bearing design choice: the photometric
warp loss only carries gradient over a ~1 px neighborhood, so a decoder
that must regress flow from scratch plateaus (measured).  The prior reads
the displacement directly off the correlation peak — informative even at
random init (random conv features approximately preserve local inner
products) — and training only sharpens/refines it.

Output convention: `flow_warp(im1, net(im1, im2)) ~ im2` (backward warp
pulling im1 onto im2), which is what the heatmap consistency loss in
`avtubes.train.flow` consumes.

Architecture is deliberately small (the consumer is a 14x14 heatmap
consistency loss, not Sintel benchmarks).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from avtubes.models.resnet2d import conv_init
from avtubes.ops.correlation import correlation_cost_volume


class _Encoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (ch, stride) in enumerate([(32, 2), (64, 2), (96, 2)]):
            x = nn.Conv(ch, (5, 5) if i == 0 else (3, 3), strides=(stride, stride),
                        padding="SAME", kernel_init=conv_init, dtype=self.dtype,
                        name=f"conv{i + 1}")(x)
            x = nn.leaky_relu(x, 0.1)
        return x  # (B, H/8, W/8, 96)


class FlowNetLite(nn.Module):
    """(im1, im2) (B,H,W,3) each -> flow (B,H,W,2) in pixels (dx, dy)."""

    max_disp: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, im1, im2):
        enc = _Encoder(dtype=self.dtype, name="encoder")
        f1 = enc(im1)
        f2 = enc(im2)
        c = f1.shape[-1]
        # spatially center, then L2-normalize: random conv features carry a
        # large DC component that makes raw cosine similarity ~0.6 everywhere
        # (measured), which dilutes the softmax below; centered features give
        # a near-one-hot correlation peak at the true displacement
        f1 = f1 - f1.mean(axis=(1, 2), keepdims=True)
        f2 = f2 - f2.mean(axis=(1, 2), keepdims=True)
        # eps INSIDE the sqrt: norm's gradient at exactly-zero features is
        # 0/0 = NaN, and 0 * NaN from a clamped-after-the-fact norm still
        # poisons the backward pass
        f1n = f1 * jax.lax.rsqrt((f1 * f1).sum(-1, keepdims=True) + 1e-12)
        f2n = f2 * jax.lax.rsqrt((f2 * f2).sum(-1, keepdims=True) + 1e-12)
        corr = correlation_cost_volume(
            f1n.astype(jnp.float32), f2n.astype(jnp.float32),
            self.max_disp, 1) * c                          # (B, h8, w8, D)

        # soft-argmax prior: expected displacement under softmax(corr * T).
        # Channel k = iy * n + ix over (dy, dx) in [-r, r]^2 (dy outer) —
        # the correlation op's layout.  A peak at displacement d means
        # content moved im1 -> im2 by +d, so the backward-warp flow is -d.
        r = self.max_disp
        n = 2 * r + 1
        disp = jnp.arange(-r, r + 1, dtype=jnp.float32)
        dys = jnp.repeat(disp, n)                          # (D,) dy per channel
        dxs = jnp.tile(disp, n)                            # (D,) dx per channel
        temp = self.param("corr_temp", nn.initializers.constant(10.0), (1,))
        prob = jax.nn.softmax(corr * temp, axis=-1)
        prior = -jnp.stack([(prob * dxs).sum(-1), (prob * dys).sum(-1)],
                           axis=-1)                        # (B, h8, w8, 2) cells

        # residual refinement trunk on [corr, f1]
        x = jnp.concatenate([nn.leaky_relu(corr.astype(self.dtype), 0.1), f1],
                            axis=-1)
        for i, ch in enumerate([128, 96, 64, 32]):
            x = nn.Conv(ch, (3, 3), padding="SAME", kernel_init=conv_init,
                        dtype=self.dtype, name=f"dec{i + 1}")(x)
            x = nn.leaky_relu(x, 0.1)
        residual = nn.Conv(2, (3, 3), padding="SAME",
                           kernel_init=nn.initializers.zeros, dtype=jnp.float32,
                           name="flow_head")(x)
        flow8 = prior + residual                           # cells at 1/8 res

        b, h8, w8, _ = flow8.shape
        h, w = im1.shape[1], im1.shape[2]
        flow = jax.image.resize(flow8, (b, h, w, 2), method="linear")
        # cell units -> pixels, per axis: channel 0 is dx (scale by the
        # width ratio), channel 1 is dy (height ratio) — they differ for
        # non-square or non-multiple-of-8 inputs
        return flow * jnp.array([w / w8, h / h8], dtype=flow.dtype)
