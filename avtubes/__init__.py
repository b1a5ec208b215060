"""avtubes — TPU-native audio-visual sound-source localization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tonymisic/audio-visual-tubes (spatial-temporal "Audio-Visual Tubes"
localization): dual-modal encoders producing a cross-modal cosine
similarity heatmap, trained with the "hard-way" tri-map contrastive
objective plus temporal-consistency losses, evaluated with cIoU/AUC/mTC
against Flickr-SoundNet / VGG-Sound Source ground truth.

Design notes (TPU-first, not a port):
  * all compute-path code is functional JAX, jit/pjit-compiled with
    static shapes; models are flax.linen modules in NHWC layout;
  * parallelism is expressed with jax.sharding.Mesh + NamedSharding;
    the contrastive negative pool is an explicit config knob
    (per-device vs. global all_gather);
  * hot host-side ops (STFT/log-spectrogram, heatmap postprocess)
    have on-device implementations, with Pallas kernels for the ops
    the reference delegated to CUDA (correlation cost volume, warp).
"""

__version__ = "0.1.0"
