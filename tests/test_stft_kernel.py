"""Pallas fused STFT kernel: interpret-mode parity with the XLA/scipy path."""

import numpy as np
from jax.experimental.pallas import tpu as pltpu

import jax.numpy as jnp

from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram
from avtubes.ops.stft import _log_spectrogram_pallas, log_spectrogram_fused


def test_pallas_stft_matches_xla_interpret():
    cfg = SpectrogramConfig(samplerate=8000, seconds=2)  # small: T=31 frames
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.clip(rng.randn(2, cfg.num_samples) * 0.2, -1, 1), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(_log_spectrogram_pallas(x, cfg, tile=32))
    ref = np.asarray(log_spectrogram(x, cfg))
    assert fused.shape == ref.shape == (2, 257, cfg.num_frames)
    np.testing.assert_allclose(fused, ref, atol=5e-4)


def test_fused_entrypoint_fallback_on_cpu():
    """Off-TPU the fused entry point must silently use the XLA path."""
    cfg = SpectrogramConfig(samplerate=8000, seconds=1)
    rng = np.random.RandomState(1)
    x = jnp.asarray(np.clip(rng.randn(cfg.num_samples) * 0.2, -1, 1), jnp.float32)
    out = np.asarray(log_spectrogram_fused(x, cfg))
    ref = np.asarray(log_spectrogram(x, cfg))
    np.testing.assert_allclose(out, ref, atol=1e-6)
