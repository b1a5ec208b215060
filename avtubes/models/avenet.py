"""AVENet: the 2D per-frame audio-visual localization model.

Capability parity with `/root/reference/model.py:87-154`: an image ResNet18
producing a 14x14x512 spatial map and an audio ResNet18 globally max-pooled
to a 512-d vector, joined by the hard-way similarity head.

TPU-first shape conventions (NHWC):
  image: (B, 224, 224, 3)         -> img feats (B, 14, 14, 512)
  audio: (B, 257, 431, 1) log-spectrogram -> aud feats (B, 512)

Returns a HardwayOutput named tuple instead of the reference's positional
5-tuple; fields map 1:1 (A, logits, weighted_A, Pos, Neg).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from avtubes.models.hardway import HardwayConfig, HardwayOutput, hardway_head
from avtubes.models.resnet2d import ResNet2D


class AVENet(nn.Module):
    hardway: HardwayConfig = HardwayConfig()
    dtype: jnp.dtype = jnp.float32
    s2d_stem: bool = False  # space-to-depth stems (exact transform; faster on TPU)
    quant_int8: bool = False  # int8 inference convs in both backbones
    #                           (serving-only; checkpoints interchangeable
    #                           with the plain model — see QuantConv)
    remat: bool = False     # checkpoint the backbones: recompute activations in
    #                         backward instead of stashing them (HBM for FLOPs —
    #                         fits the reference bs=20 x 16-frame x 2-view recipe
    #                         on one chip). Same math, same params.

    def setup(self):
        # static_argnums=(2,) = the `train` flag of ResNet2D.__call__
        net = nn.remat(ResNet2D, static_argnums=(2,)) if self.remat else ResNet2D
        self.imgnet = net(modal="vision", dtype=self.dtype,
                          s2d_stem=self.s2d_stem, quant_int8=self.quant_int8,
                          name="imgnet")
        self.audnet = net(modal="audio", dtype=self.dtype,
                          s2d_stem=self.s2d_stem, quant_int8=self.quant_int8,
                          name="audnet")

    def encode_image(self, image, train: bool = True) -> jnp.ndarray:
        """(B, H, W, 3) -> (B, H/16, W/16, 512) spatial features."""
        return self.imgnet(image, train)  # positional: remat static_argnums

    def encode_audio(self, audio, train: bool = True) -> jnp.ndarray:
        """(B, F, T, 1) -> (B, 512) via global max pool (AdaptiveMaxPool2d(1,1))."""
        feats = self.audnet(audio, train)
        return feats.max(axis=(1, 2))

    def __call__(self, image, audio, train: bool = True,
                 aud_all: jnp.ndarray | None = None,
                 pool_offset=0) -> HardwayOutput:
        # pool_offset: index of this batch's first own-pair column within
        # aud_all (shard_index * B for an all-gathered pool) — forwarded to
        # hardway_head so gathered pools mask the right columns
        img = self.encode_image(image, train=train)
        aud = self.encode_audio(audio, train=train)
        return hardway_head(img, aud, self.hardway, aud_all=aud_all,
                            pool_offset=pool_offset)

    def head(self, img_feats, aud_feats, aud_all=None, pool_offset=0) -> HardwayOutput:
        """The hard-way head alone (module method so callers that compute
        features outside — e.g. the ghost-BN train step, which vmaps the
        encoders over the view axis — use this module's HardwayConfig)."""
        return hardway_head(img_feats, aud_feats, self.hardway,
                            aud_all=aud_all, pool_offset=pool_offset)

    def forward_shared_audio(self, frames, audio,
                             train: bool = False) -> HardwayOutput:
        """Forward with one audio clip shared by a group of frames: encode
        the B unique spectrograms once, tile the pooled features over the
        frames-per-clip factor.  Used by per-frame eval, where every frame
        of a video is scored against the same clip audio
        (`train_hardway.py:171-173` repeats the spectrogram instead).

        frames: (B*K, H, W, 3); audio: (B, F, Tt, 1) with K = frames/clip.
        """
        aud = self.encode_audio(audio, train=train)               # (B, 512)
        aud = jnp.repeat(aud, frames.shape[0] // aud.shape[0], axis=0)
        img = self.encode_image(frames, train=train)
        return hardway_head(img, aud, self.hardway)

    def two_view_forward(self, frames, augmented, audio, t: int,
                         train: bool = True) -> tuple[HardwayOutput, HardwayOutput]:
        """Both training views with the audio encoded ONCE per clip.

        The reference repeats each clip's spectrogram T times and runs the
        audio backbone on B*T duplicates, twice (`train_hardway.py:128-133`)
        — 2T redundant audio passes per clip.  Encoding the B unique
        spectrograms once and tiling the pooled features is mathematically
        identical: batch statistics over uniformly duplicated samples equal
        those over the uniques, and the tiled features broadcast/sum
        correctly through the backward pass.  The BatchNorm running stats
        see one audio EMA update here instead of the reference's two; the
        train step composes the second update in closed form
        (`train/steps.py:_advance_audio_stats`), so running stats track the
        reference too (up to the 1/n unbiased-variance count difference of
        deduplicated-vs-duplicated batches — negligible at real shapes).

        frames/augmented: (B*T, H, W, 3); audio: (B, F, Tt, 1).
        """
        aud = self.encode_audio(audio, train=train)       # (B, 512)
        aud_f = jnp.repeat(aud, t, axis=0)                # (B*T, 512)
        img1 = self.encode_image(frames, train=train)     # stats update 1
        out1 = hardway_head(img1, aud_f, self.hardway)
        img2 = self.encode_image(augmented, train=train)  # stats update 2
        out2 = hardway_head(img2, aud_f, self.hardway)
        return out1, out2


def variables_to_s2d(variables: dict) -> dict:
    """Convert a plain-stem AVENet variables pytree to the s2d-stem layout
    (kernels transformed with stem_kernel_to_s2d; everything else shared)."""
    import copy

    from avtubes.models.resnet2d import stem_kernel_to_s2d

    out = copy.deepcopy(jax.tree_util.tree_map(lambda x: x, variables))
    for net, modal in (("imgnet", "vision"), ("audnet", "audio")):
        stem = out["params"][net].pop(f"stem_{modal}")
        out["params"][net][f"stem_{modal}_s2d"] = {
            "kernel": stem_kernel_to_s2d(stem["kernel"])
        }
    return out
