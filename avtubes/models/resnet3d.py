"""T-preserving 3D ResNet video tube encoder (NDHWC flax module).

Capability parity with `/root/reference/models/resnet3D.py` as instantiated
by the live path (`model.py:20`: depth 18, no_max_pool=True):

  * stem: 7x7x7 conv, stride (1,2,2), no temporal stride anywhere —
    layer2-4 use spatial stride (1,2,2) (`resnet3D.py:138-148`), so a
    (T, 224, 224) clip keeps all T steps and yields (T, 14, 14, 512);
  * wait — the reference's 3D layer4 has spatial stride 2 (unlike the 2D
    backbone), giving 14x14 only because no_max_pool skips the stem pool:
    224 -> conv/2 -> 112 -> layer2/2 -> 56 -> layer3/2 -> 28 -> layer4/2
    -> 14.  We reproduce exactly that geometry;
  * BasicBlock x [2,2,2,2] (depth 18).

TPU-first differences: NDHWC layout, features returned directly (the
reference reaches its features via a forward hook on layer4 because forward
runs the dead Kinetics classifier head — we just don't build the head).
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn

from avtubes.models.norm import TorchBatchNorm
import jax.numpy as jnp

from avtubes.models.resnet2d import conv_init
from avtubes.ops.conv3d import conv3d_time_stacked, conv3d_time_sum

# The reference's 3D path keeps BatchNorm3d's default constant-1 scale
# (resnet3D.py builds plain BN; the N(1, 0.02) re-init in model.py:108-110
# is applied only to the 2D AVENet) — so no bn_scale_init here.


class TSConv3D(nn.Module):
    """Drop-in for bias-free nn.Conv(3D) that lowers through Conv2D.

    Same parameter pytree as nn.Conv ({"kernel": (kt, kh, kw, C, O)}, same
    init), so checkpoints and the Kinetics torch import are impl-agnostic;
    the forward is `ops.conv3d.conv3d_time_stacked` / `conv3d_time_sum`
    (exact math; measured SLOWER than XLA's direct Conv3D on v5e — a
    recorded negative result, DESIGN.md 3D tube notes — kept opt-in).
    """

    features: int
    kernel_size: tuple[int, int, int] = (3, 3, 3)
    strides: tuple[int, int, int] = (1, 1, 1)
    padding: int = 1
    dtype: jnp.dtype = jnp.float32
    mode: str = "stacked"  # 'stacked' (one wide Conv2D) | 'sum' (kt Conv2Ds)

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", conv_init,
            (*self.kernel_size, x.shape[-1], self.features), jnp.float32)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad),) * 3
        fn = conv3d_time_stacked if self.mode == "stacked" else conv3d_time_sum
        return fn(x.astype(self.dtype), kernel.astype(self.dtype),
                  self.strides, pad)


def _conv3d(impl: str, features, kernel_size, strides, padding, dtype, name):
    if impl in ("stacked", "sum"):
        return TSConv3D(features, kernel_size, strides, padding, dtype,
                        mode=impl, name=name)
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   use_bias=False, kernel_init=conv_init, dtype=dtype,
                   name=name)


class BasicBlock3D(nn.Module):
    filters: int
    stride: tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "direct"

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda name: TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        y = _conv3d(self.conv_impl, self.filters, (3, 3, 3), self.stride, 1,
                    self.dtype, "conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = _conv3d(self.conv_impl, self.filters, (3, 3, 3), (1, 1, 1), 1,
                    self.dtype, "conv2")(y)
        y = norm("bn2")(y)
        if any(s != 1 for s in self.stride) or x.shape[-1] != self.filters:
            identity = _conv3d(self.conv_impl, self.filters, (1, 1, 1),
                               self.stride, 0, self.dtype,
                               "downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet3D(nn.Module):
    """Headless r3d-18 tube encoder: (B, T, H, W, 3) -> (B, T, H/16, W/16, 512).

    Temporal resolution is preserved end to end (strides are (1, s, s));
    spatial /16 comes from stem stride 2 + three stage strides of 2 with the
    stem max-pool disabled (no_max_pool=True in the reference call).
    """

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_filters: Sequence[int] = (64, 128, 256, 512)
    no_max_pool: bool = True
    dtype: jnp.dtype = jnp.float32
    # "direct" = XLA Conv3D; "stacked" = exact time-stacked Conv2D lowering
    # (ops/conv3d.py) — same params/math, measured per-impl in DESIGN.md.
    conv_impl: str = "direct"

    @nn.compact
    def __call__(self, x, train: bool = True):
        if x.shape[-1] != 3:
            raise ValueError(f"expected NDHWC RGB clip, got {x.shape}")
        x = x.astype(self.dtype)
        x = _conv3d(self.conv_impl, 64, (7, 7, 7), (1, 2, 2),
                    ((3, 3), (3, 3), (3, 3)), self.dtype, "stem")(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        if not self.no_max_pool:
            x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding=((1, 1),) * 3)
        for i, (blocks, filters) in enumerate(zip(self.stage_sizes, self.stage_filters)):
            for j in range(blocks):
                stride = (1, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                x = BasicBlock3D(filters=filters, stride=stride, dtype=self.dtype,
                                 conv_impl=self.conv_impl,
                                 name=f"layer{i + 1}_block{j}")(x, train=train)
        return x
