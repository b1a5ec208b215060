"""Dual-modal 2D ResNet encoder (TPU-native NHWC flax module).

Capability parity with the reference backbone
(`/root/reference/models/base_models.py`):

  * three stems selected by `modal`: 1-channel audio spectrogram, 3-channel
    RGB, 6-channel stacked flow — all 7x7/stride-2 convs;
  * stages [64, 128, 256, 512] of two BasicBlocks each (ResNet-18), with
    strides [1, 2, 2, 1] — **layer4 keeps stride 1**
    (`base_models.py:149`), which is what makes a 224x224 image produce the
    14x14x512 feature map the similarity heatmap is defined on;
  * conv kernels use He fan-out initialization, BatchNorm starts at
    scale~N(1, 0.02), bias 0 (the AVENet re-init, `model.py:104-110`).

TPU-first design differences from the reference (deliberate, not drift):

  * NHWC layout throughout (XLA's native conv layout on TPU);
  * a `dtype` knob runs conv/BN compute in bfloat16 with float32 params
    and float32 batch statistics;
  * returns the spatial feature map directly — no forward hooks, no
    classifier head (the reference's avgpool/fc are dead weight on the
    live path).
  * under jit with a sharded batch, BatchNorm statistics are global-batch
    by construction (XLA inserts the cross-device reductions), unlike the
    reference's per-replica DataParallel stats.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from avtubes.models.norm import TorchBatchNorm

# He fan-out normal (reference: nn.init.kaiming_normal_(mode='fan_out'))
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def bn_scale_init(key, shape, dtype=jnp.float32):
    """BatchNorm scale ~ N(1.0, 0.02) — the AVENet re-init (`model.py:108-110`)."""
    import jax

    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


STEM_CHANNELS = {"vision": 3, "audio": 1, "flow": 6}


def _conv_cls(quant_int8: bool):
    """Conv module factory: plain bias-free nn.Conv, or the int8 QuantConv
    (identical parameter tree — checkpoints are interchangeable)."""
    import functools

    if quant_int8:
        return QuantConv
    return functools.partial(nn.Conv, use_bias=False)


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, C*b*b); odd trailing rows/cols are
    zero-padded first (audio spectrograms have odd extents)."""
    b, h, w, c = x.shape
    ph, pw = (-h) % block, (-w) % block
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        h, w = h + ph, w + pw
    x = x.reshape(b, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // block, w // block,
                                                 block * block * c)


def stem_kernel_to_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """Transform a (7, 7, C, O) stride-2 stem kernel into the equivalent
    (4, 4, 4C, O) stride-1 kernel over space-to-depth(2) input.

    The 7x7/stride-2/pad-3 conv reads x[2i+u-3] for u in 0..6; zero-padding
    the kernel to 8x8 at the *front* aligns taps to 2x2 blocks, which then
    fold into the channel dimension (the MLPerf TPU ResNet stem trick).
    """
    k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # 8x8xCxO
    c, o = kernel.shape[2], kernel.shape[3]
    k = k.reshape(4, 2, 4, 2, c, o)                        # (bh, a, bw, b, C, O)
    # s2d input channel layout is (a, b, C) flattened -> order must match
    k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, o)
    return k


class QuantConv(nn.Module):
    """Int8 inference conv, drop-in for `nn.Conv(use_bias=False)`.

    Same parameter tree (one f32 "kernel" of HWIO shape), so a checkpoint
    trained with the plain model applies unchanged.  At call time the kernel
    is quantized per-output-channel and the activation per-SAMPLE (dynamic,
    symmetric, +-127 levels), the conv runs int8 x int8 -> int32 on the MXU's
    double-rate int8 path, and the int32 result is rescaled back.  Zero
    padding is exact under symmetric quantization (0 -> 0).

    The activation scale must not cross the batch axis: the serving path
    coalesces unrelated requests into one batch and zero-pads it to a
    bucket, so a per-tensor max would make each sample's output depend on
    its co-batched neighbors (nondeterministic serving).  Per-sample scales
    cost the same one reduction pass and keep samples independent.

    Inference-only: `jnp.round` has zero gradient, so training through this
    module silently learns nothing — the model guards against it.
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: int | tuple = 0
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = conv_init

    @nn.compact
    def __call__(self, x):
        import jax

        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, x.shape[-1], self.features), jnp.float32)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        # per-output-channel weight scale (constant-folds at compile time
        # when the weights are baked, e.g. in a serving export)
        sw = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.round(kernel / sw).astype(jnp.int8)
        # per-sample dynamic activation scale: one extra pass over the conv
        # input; these convs are MXU-bound, not bandwidth-bound
        x = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True),
                         1e-12) / 127.0
        xq = jnp.round(x / sx).astype(jnp.int8)  # |x|/sx <= 127 by construction
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=self.strides, padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (sx * sw)).astype(self.dtype)


class BasicBlock(nn.Module):
    """Two 3x3 convs with identity/projection shortcut (ResNet v1 basic block)."""

    filters: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_scale_noise: bool = True  # N(1, .02) BN scale (AVENet re-init) vs 1
    quant_int8: bool = False     # int8 inference convs (QuantConv)

    @nn.compact
    def __call__(self, x, train: bool = True):
        scale_init = (bn_scale_init if self.bn_scale_noise
                      else nn.initializers.ones)
        norm = lambda name: TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            scale_init=scale_init,
            name=name,
        )
        conv = _conv_cls(self.quant_int8)
        identity = x
        y = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                 padding=1, kernel_init=conv_init,
                 dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = conv(self.filters, (3, 3), padding=1,
                 kernel_init=conv_init, dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = conv(self.filters, (1, 1), strides=(self.stride, self.stride),
                            kernel_init=conv_init,
                            dtype=self.dtype, name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet2D(nn.Module):
    """Headless dual-modal ResNet feature extractor.

    Input  (B, H, W, C_modal) -> output (B, H/16, W/16, 512) — the /16 (not
    /32) is the stride-1 layer4.
    """

    modal: str = "vision"
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_filters: Sequence[int] = (64, 128, 256, 512)
    stage_strides: Sequence[int] = (1, 2, 2, 1)  # layer4 stride 1 -> 14x14 map
    s2d_stem: bool = False  # space-to-depth stem: exact 7x7/s2 equivalent,
    #                          much better MXU/HBM behavior on TPU
    bn_scale_noise: bool = True  # N(1, .02) BN scale init — the AVENet
    #   re-init (`model.py:108-110`).  The reference applies it ONLY inside
    #   AVENet.__init__; FullModel's 2D audnet keeps torch's constant-1
    #   default, so the 3D path builds this module with False.
    quant_int8: bool = False  # int8 inference convs (2x MXU peak on v5e);
    #   same parameter tree as the plain model — apply a trained checkpoint
    #   unchanged.  Inference-only (QuantConv's round has zero gradient).
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        expected_c = STEM_CHANNELS[self.modal]
        if x.shape[-1] != expected_c:
            raise ValueError(
                f"modal={self.modal!r} expects {expected_c} input channels (NHWC), got {x.shape}"
            )
        if self.quant_int8 and train:
            raise ValueError("quant_int8 is inference-only (round() has zero "
                             "gradient); train with the plain model")
        x = x.astype(self.dtype)
        scale_init = (bn_scale_init if self.bn_scale_noise
                      else nn.initializers.ones)
        conv = _conv_cls(self.quant_int8)
        if self.s2d_stem:
            x = space_to_depth(x, 2)
            x = conv(64, (4, 4), padding=((2, 1), (2, 1)),
                     kernel_init=conv_init, dtype=self.dtype,
                     name=f"stem_{self.modal}_s2d")(x)
        else:
            x = conv(64, (7, 7), strides=(2, 2), padding=3,
                     kernel_init=conv_init, dtype=self.dtype,
                     name=f"stem_{self.modal}")(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, scale_init=scale_init, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (blocks, filters, stride) in enumerate(
            zip(self.stage_sizes, self.stage_filters, self.stage_strides)
        ):
            for j in range(blocks):
                x = BasicBlock(
                    filters=filters,
                    stride=stride if j == 0 else 1,
                    dtype=self.dtype,
                    bn_scale_noise=self.bn_scale_noise,
                    quant_int8=self.quant_int8,
                    name=f"layer{i + 1}_block{j}",
                )(x, train=train)
        return x


def resnet18(modal: str = "vision", dtype: jnp.dtype = jnp.float32) -> ResNet2D:
    """ResNet-18 feature extractor with the given stem modality."""
    return ResNet2D(modal=modal, dtype=dtype)
