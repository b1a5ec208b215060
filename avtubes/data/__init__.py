"""Input pipeline: WAV/video decode, spectrogram, clip sampling, transforms, prefetch."""

from avtubes.data.audio import read_wav, prepare_waveform
from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram, log_spectrogram_np

__all__ = [
    "read_wav",
    "prepare_waveform",
    "SpectrogramConfig",
    "log_spectrogram",
    "log_spectrogram_np",
]
