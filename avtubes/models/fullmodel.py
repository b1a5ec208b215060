"""FullModel: the 3D tube localization model (reference `model.py:17-36`).

ResNet3D-18 tube encoder (T-preserving) + audio ResNet18, joined by the
hard-way head over the (b·t) flattened frame axis (`HardWayAttention`,
`model.py:38-60`: same tri-map math with hard-coded eps=0.65, eps2=0.4,
tau=0.03, temperature 0.07, over a (B·T)² negative pool).

Shapes (NDHWC):
  video: (B, T, 224, 224, 3) -> tube feats (B, T, 14, 14, 512)
  audio: (B*T, F, Tt, 1) log-spectrograms (one per frame; the trainers
         repeat each clip's spectrogram T times) -> (B*T, 512)
  output: HardwayOutput with heatmap (B*T, 14, 14), logits (B*T, B*T+2).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from avtubes.models.hardway import HardwayConfig, HardwayOutput, hardway_head
from avtubes.models.resnet2d import ResNet2D
from avtubes.models.resnet3d import ResNet3D


class FullModel(nn.Module):
    hardway: HardwayConfig = HardwayConfig()
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # checkpoint backbones (recompute in backward)
    # conv3d lowering for the tube encoder: "direct" (XLA Conv3D) or
    # "stacked" (exact Conv2D lowering, ops/conv3d.py) — param-compatible.
    conv3d_impl: str = "direct"

    def setup(self):
        net3d = nn.remat(ResNet3D, static_argnums=(2,)) if self.remat else ResNet3D
        net2d = nn.remat(ResNet2D, static_argnums=(2,)) if self.remat else ResNet2D
        self.vidnet = net3d(dtype=self.dtype, conv_impl=self.conv3d_impl,
                            name="vidnet")
        # bn_scale_noise=False: the N(1, .02) BN re-init lives only in the
        # reference's AVENet.__init__ (`model.py:104-110`); FullModel's
        # audnet (`model.py:21`) keeps torch's constant-1 BN default
        self.audnet = net2d(modal="audio", dtype=self.dtype,
                            bn_scale_noise=False, name="audnet")

    def encode_video(self, video, train: bool = True) -> jnp.ndarray:
        """(B, T, H, W, 3) -> (B, T, H/16, W/16, 512)."""
        return self.vidnet(video, train)  # positional: remat static_argnums

    def encode_audio(self, audio, train: bool = True) -> jnp.ndarray:
        feats = self.audnet(audio, train)
        return feats.max(axis=(1, 2))  # AdaptiveMaxPool2d((1,1))

    def __call__(self, audio, video, train: bool = True,
                 aud_all: jnp.ndarray | None = None,
                 pool_offset=0) -> HardwayOutput:
        # pool_offset: index of this batch's first own-pair column within
        # aud_all (shard_index * B*T for an all-gathered pool)
        vid = self.encode_video(video, train=train)          # (B, T, h, w, C)
        b, t, h, w, c = vid.shape
        vid = vid.reshape(b * t, h, w, c)                    # (b t) folding
        aud = self.encode_audio(audio, train=train)          # (B*T, 512)
        if aud.shape[0] != b * t:
            raise ValueError(
                f"audio batch {aud.shape[0]} != video frames {b}*{t}; repeat the "
                "clip spectrogram per frame before calling"
            )
        return hardway_head(vid, aud, self.hardway, aud_all=aud_all,
                            pool_offset=pool_offset)

    def forward_shared_audio(self, audio, video, train: bool = True) -> HardwayOutput:
        """Forward with the audio encoded ONCE per clip and features tiled
        over T — identical math to repeating the spectrogram (see
        AVENet.two_view_forward), ~T x less audio compute.

        audio: (B, F, Tt, 1) unique per-clip spectrograms; video (B, T, H, W, 3).
        """
        vid = self.encode_video(video, train=train)
        b, t, h, w, c = vid.shape
        vid = vid.reshape(b * t, h, w, c)
        aud = self.encode_audio(audio, train=train)          # (B, 512)
        aud = jnp.repeat(aud, t, axis=0)                     # (B*T, 512)
        return hardway_head(vid, aud, self.hardway)
