"""Compact FlowNet-C-style optical flow estimator (TPU-native).

The reference's flow-guided consistency path (`/root/reference/flow.py`)
loads external FlowNet2 (vendored CUDA correlation/resample ops).  We
provide a self-contained flax flow net built on our Pallas correlation
cost volume (`avtubes.ops.correlation`): siamese conv encoders, a
correlation layer at 1/8 resolution, a small refinement trunk, and
upsampled 2-channel flow output — enough structure to train/infer flow for
the warp-consistency objective without any external checkpoint.

Architecture is deliberately small (the consumer is a 14x14 heatmap
consistency loss, not Sintel benchmarks); `flow_warp` consumes its output.
"""

from __future__ import annotations

import flax.linen as nn
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
        corr = correlation_cost_volume(
            f1.astype(jnp.float32), f2.astype(jnp.float32), self.max_disp, 1)
        corr = nn.leaky_relu(corr.astype(self.dtype), 0.1)
        x = jnp.concatenate([corr, f1], axis=-1)
        for i, ch in enumerate([128, 96, 64, 32]):
            x = nn.Conv(ch, (3, 3), padding="SAME", kernel_init=conv_init,
                        dtype=self.dtype, name=f"dec{i + 1}")(x)
            x = nn.leaky_relu(x, 0.1)
        flow8 = nn.Conv(2, (3, 3), padding="SAME", kernel_init=conv_init,
                        dtype=jnp.float32, name="flow_head")(x)
        import jax

        b, h8, w8, _ = flow8.shape
        h, w = im1.shape[1], im1.shape[2]
        flow = jax.image.resize(flow8, (b, h, w, 2), method="linear")
        return flow * (h / h8)  # scale flow magnitudes with the upsample
