"""Experimental model zoo (capability parity with the reference's dead code).

The reference ships several models no driver imports (SURVEY §2.2); they are
re-designed here as compact flax modules so the framework exposes the same
model families:

  * AudioResNetVLAD  ~ models/resnet.py       — audio ResNet18 with an
    optional NetVLAD pooling head (`resnet.py:161-216`)
  * SyncNetAudio/SyncNetVisual ~ models/vggm.py — VGG-M SyncNet-style
    audio/video embedding towers (`vggm.py:12-162`)
  * AudioConvNet / ImageConvNet ~ models/{audio,image}_convnet.py — 8-conv
    VGG-ish encoders (1->512 / 3->512 channels)
  * TransformerAttention ~ model.py:62-77     — QKV attention between the
    audio vector and video feature map (defined, never trained, in both)
"""

from __future__ import annotations

import flax.linen as nn

from avtubes.models.norm import TorchBatchNorm
import jax.numpy as jnp

from avtubes.models.resnet2d import ResNet2D, conv_init


class NetVLAD(nn.Module):
    """NetVLAD pooling: soft-assign descriptors to K clusters, aggregate
    residuals (reference `models/resnet.py:161-216`)."""

    num_clusters: int = 64
    dim: int = 512

    @nn.compact
    def __call__(self, x):
        """(B, H, W, D) -> (B, K*D) L2-normalized VLAD descriptor."""
        b, h, w, d = x.shape
        flat = x.reshape(b, h * w, d)
        logits = nn.Conv(self.num_clusters, (1, 1), use_bias=True,
                         name="assign")(x).reshape(b, h * w, self.num_clusters)
        assign = nn.softmax(logits, axis=-1)                     # (B, N, K)
        centroids = self.param("centroids", nn.initializers.normal(1.0),
                               (self.num_clusters, d))
        # residual aggregation: sum_n a_nk * (x_n - c_k)
        agg = jnp.einsum("bnk,bnd->bkd", assign, flat)
        counts = assign.sum(axis=1)[..., None]                   # (B, K, 1)
        vlad = agg - counts * centroids[None]
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)  # intra-norm
        vlad = vlad.reshape(b, -1)
        return vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)


class AudioResNetVLAD(nn.Module):
    """Audio-only ResNet18 with NetVLAD (or max) pooling."""

    pool: str = "vlad"  # 'vlad' | 'max'
    num_clusters: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spec, train: bool = True):
        feats = ResNet2D(modal="audio", dtype=self.dtype, name="backbone")(
            spec, train=train)
        if self.pool == "vlad":
            return NetVLAD(self.num_clusters, feats.shape[-1], name="vlad")(feats)
        return feats.max(axis=(1, 2))


class _VGGMTower(nn.Module):
    """Shared VGG-M trunk: conv/pool stack ending in a flat embedding."""

    channels: tuple = (96, 256, 512, 512, 512)
    embed: int = 1024
    in_pool: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, ch in enumerate(self.channels):
            k = (7, 7) if i == 0 else (5, 5) if i == 1 else (3, 3)
            s = (2, 2) if i == 0 else (1, 1)
            x = nn.Conv(ch, k, strides=s, padding="SAME", kernel_init=conv_init,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i + 1}")(x)
            x = nn.relu(x)
            if self.in_pool and i in (0, 1, 4):
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = x.max(axis=(1, 2))  # global pool to (B, C)
        x = nn.Dense(self.embed, name="fc")(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class SyncNetAudio(_VGGMTower):
    """SyncNet audio tower: (B, F, T, 1) spectrogram -> (B, embed)."""


class SyncNetVisual(_VGGMTower):
    """SyncNet visual tower: (B, H, W, 3) frame -> (B, embed)."""


class AudioConvNet(nn.Module):
    """8-conv VGG-ish audio encoder (reference `models/audio_convnet.py`)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, ch in enumerate((64, 64, 128, 128, 256, 256, 512, 512)):
            x = nn.Conv(ch, (3, 3), padding="SAME", kernel_init=conv_init,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i + 1}")(x)
            x = nn.relu(x)
            if i % 2 == 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class ImageConvNet(AudioConvNet):
    """Same topology over RGB (reference `models/image_convnet.py`)."""


class TransformerAttention(nn.Module):
    """QKV attention between the audio vector and video features
    (reference `model.py:62-77`; unused alternative head there and here)."""

    latent: int = 512

    @nn.compact
    def __call__(self, audio_features, video_features):
        """audio (B, C); video (B, T, H, W, C) -> (B, T, H, W) attention."""
        key = nn.Dense(self.latent, name="key")(video_features)
        query = nn.Dense(self.latent, name="query")(audio_features)
        weights = jnp.einsum("bthwc,bc->bthw", key, query)
        value = nn.Dense(self.latent, name="value")(video_features)
        # reference normalizes over the LAST axis only (nn.Softmax(dim=-1)
        # on (B,T,H,W) — per-row over W, not jointly over H*W)
        soft = nn.softmax(weights, axis=-1)
        return jnp.einsum("bthwc,bthw->bthw", value, soft)
