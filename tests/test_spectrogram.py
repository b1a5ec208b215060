"""Spectrogram parity: our device/numpy implementations vs scipy, WAV round-trip."""

import numpy as np
import pytest
from scipy import signal

from avtubes.data import SpectrogramConfig, log_spectrogram, log_spectrogram_np, prepare_waveform, read_wav
from avtubes.data.audio import write_wav
from avtubes.data.spectrogram import tukey_periodic


def _scipy_logspec(x, sr):
    _, _, S = signal.spectrogram(x, sr, nperseg=512, noverlap=1)
    return np.log(S + 1e-7) / 12.0


def test_tukey_matches_scipy():
    ref = signal.get_window(("tukey", 0.25), 512)
    assert np.abs(tukey_periodic(512, 0.25) - ref).max() == 0.0


def test_config_shape_22050():
    cfg = SpectrogramConfig(samplerate=22050)
    assert cfg.shape == (257, 431)


@pytest.mark.parametrize("sr", [22050, 16000])
def test_numpy_reference_matches_scipy(sr):
    rng = np.random.RandomState(0)
    x = np.clip(rng.randn(sr * 10) * 0.1, -1, 1)
    cfg = SpectrogramConfig(samplerate=sr)
    ours = log_spectrogram_np(x, cfg)
    ref = _scipy_logspec(x, sr)
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() < 1e-10


def test_device_matches_scipy_f32():
    rng = np.random.RandomState(1)
    sr = 22050
    x = np.clip(rng.randn(sr * 10) * 0.1, -1, 1).astype(np.float32)
    cfg = SpectrogramConfig(samplerate=sr)
    ours = np.asarray(log_spectrogram(x, cfg))
    ref = _scipy_logspec(x.astype(np.float64), sr)
    assert ours.shape == ref.shape
    # float32 DFT-matmul vs float64 FFT: log compresses the error further
    assert np.abs(ours - ref).max() < 2e-4
    assert np.abs(ours - ref).mean() < 2e-5


def test_device_batched():
    rng = np.random.RandomState(2)
    sr = 22050
    cfg = SpectrogramConfig(samplerate=sr)
    xb = np.clip(rng.randn(3, sr * 10) * 0.1, -1, 1).astype(np.float32)
    batched = np.asarray(log_spectrogram(xb, cfg))
    assert batched.shape == (3, 257, 431)
    for i in range(3):
        single = np.asarray(log_spectrogram(xb[i], cfg))
        assert np.abs(batched[i] - single).max() < 1e-6


def test_int16_transport_exact_for_pcm16():
    # int16 PCM transport: log_spectrogram(int16) == log_spectrogram(float)
    # bit-for-bit when the float came from 16-bit samples (/32768 reader norm)
    rng = np.random.RandomState(3)
    cfg = SpectrogramConfig()
    ints = rng.randint(-32768, 32768, cfg.num_samples).astype(np.int16)
    f = ints.astype(np.float32) / 32768.0
    assert np.array_equal(np.asarray(log_spectrogram(ints, cfg)),
                          np.asarray(log_spectrogram(f, cfg)))


def test_prepare_waveform_tiles_and_clips():
    sr = 1000
    short = np.ones(sr * 3) * 2.0  # 3 s of out-of-range samples
    out = prepare_waveform(short, sr, seconds=10)
    assert out.shape == (sr * 10,)
    assert out.max() == 1.0  # clipped
    long = np.linspace(-2, 2, sr * 20)
    out2 = prepare_waveform(long, sr, seconds=10)
    assert out2.shape == (sr * 10,)
    assert out2.min() == -1.0


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    sr = 22050
    x = np.clip(rng.randn(sr) * 0.3, -1, 1)
    p = tmp_path / "t.wav"
    write_wav(p, x, sr)
    y, sr2 = read_wav(p)
    assert sr2 == sr
    assert y.shape == x.shape
    # PCM16 quantization + asymmetric 32767/32768 scaling
    assert np.abs(y - x).max() < 1.0 / 16000

def test_wav_stereo(tmp_path):
    sr = 8000
    x = np.stack([np.ones(100) * 0.5, np.ones(100) * -0.5], axis=1)
    p = tmp_path / "s.wav"
    write_wav(p, x, sr)
    y, _ = read_wav(p)
    assert y.shape == (100, 2)
    mono = prepare_waveform(y, sr, seconds=1)
    assert np.abs(mono).max() < 1e-4  # downmix cancels


def test_mel_filterbank_properties():
    """Triangles: non-negative, correct shape, peaks at the center bins,
    and Slaney area-normalization (each filter integrates to ~2/(hi-lo) *
    triangle area = 1 over Hz)."""
    from avtubes.data.spectrogram import SpectrogramConfig, mel_filterbank

    cfg = SpectrogramConfig()
    fb = mel_filterbank(cfg, n_mels=64)
    assert fb.shape == (cfg.num_freqs, 64)
    assert (fb >= 0).all()
    # each filter is nonzero somewhere and unimodal (one contiguous support)
    for m in range(64):
        nz = np.nonzero(fb[:, m])[0]
        assert nz.size > 0
        assert (np.diff(nz) == 1).all()
    # Slaney norm: sum(fb * df) over freq ~ 1 for interior filters
    df = cfg.samplerate / 2.0 / (cfg.num_freqs - 1)
    areas = fb.sum(axis=0) * df
    assert np.all(np.abs(areas[5:-5] - 1.0) < 0.2), areas[5:-5]


def test_log_mel_spectrogram_matches_numpy():
    """Device log-mel == filterbank applied to the float64 linear power."""
    from avtubes.data.spectrogram import (
        SpectrogramConfig,
        log_mel_spectrogram,
        mel_filterbank,
        log_spectrogram_np,
    )

    cfg = SpectrogramConfig(samplerate=8000, seconds=1)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(cfg.num_samples).astype(np.float32)
    import jax.numpy as jnp

    got = np.asarray(log_mel_spectrogram(jnp.asarray(x), cfg, 40))

    # numpy oracle: undo the log/std on the linear reference, apply fb
    lin = np.exp(log_spectrogram_np(x, cfg) * cfg.normalize_std) - cfg.log_offset
    mel = mel_filterbank(cfg, 40).T @ lin
    want = np.log(mel + cfg.log_offset) / cfg.normalize_std
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert got.shape == (40, cfg.num_frames)


def test_host_f32_spectrogram_matches_reference():
    """The fast host f32 path (spec_int16 transport producer) agrees with the
    f64 scipy-parity reference."""
    from avtubes.data.spectrogram import log_spectrogram_np_f32

    rng = np.random.RandomState(3)
    cfg = SpectrogramConfig()
    x = np.clip(rng.randn(cfg.num_samples) * 0.1, -1, 1).astype(np.float32)
    f32 = log_spectrogram_np_f32(x, cfg)
    f64 = log_spectrogram_np(x.astype(np.float64), cfg)
    assert f32.shape == cfg.shape
    assert np.abs(f32 - f64).max() < 1e-5


def test_spec_int16_transport_roundtrip():
    """spec_int16 transport: host spectrogram -> int16 -> device passthrough
    dequantization lands within the scipy-parity tolerance of the device
    waveform path (quantization step 1/32000 ~ 3e-5 < 2e-4)."""
    from avtubes.data.spectrogram import (
        log_spectrogram_np_f32,
        quantize_int16_spectrogram,
    )

    rng = np.random.RandomState(4)
    cfg = SpectrogramConfig(samplerate=16000, seconds=1)
    x = np.clip(rng.randn(2, cfg.num_samples) * 0.3, -1, 1).astype(np.float32)
    via_wave = np.asarray(log_spectrogram(x, cfg))
    payload = np.stack([quantize_int16_spectrogram(log_spectrogram_np_f32(xi, cfg))
                        for xi in x])
    assert payload.dtype == np.int16 and payload.shape[-2:] == cfg.shape
    via_spec = np.asarray(log_spectrogram(payload, cfg))  # passthrough branch
    assert np.abs(via_spec - via_wave).max() < 2e-4


def test_spec_int8_transport_roundtrip():
    """spec_int8 transport (opt-in): host spectrogram -> int8 -> device
    passthrough dequantization lands within half a quantization step
    (1/124 ~ 8.1e-3) of the device waveform path, and the int16->int8
    requantizer used by the fused native batch path agrees with direct
    quantization to within one step."""
    from avtubes.data.spectrogram import (
        SPEC_INT8_SCALE,
        log_spectrogram_np_f32,
        quantize_int8_spectrogram,
        quantize_int16_spectrogram,
        spec_int16_to_int8,
    )

    rng = np.random.RandomState(4)
    cfg = SpectrogramConfig(samplerate=16000, seconds=1)
    x = np.clip(rng.randn(2, cfg.num_samples) * 0.3, -1, 1).astype(np.float32)
    via_wave = np.asarray(log_spectrogram(x, cfg))
    host = np.stack([log_spectrogram_np_f32(xi, cfg) for xi in x])
    payload = quantize_int8_spectrogram(host)
    assert payload.dtype == np.int8 and payload.shape[-2:] == cfg.shape
    via_spec = np.asarray(log_spectrogram(payload, cfg))  # passthrough branch
    assert np.abs(via_spec - via_wave).max() < 0.5 / SPEC_INT8_SCALE + 1e-4
    # fused-native-path equivalence: int16 payload requantized to int8
    via16 = spec_int16_to_int8(quantize_int16_spectrogram(host))
    assert np.abs(via16.astype(np.int32) - payload.astype(np.int32)).max() <= 1


def test_spec_int8_through_pipeline(tmp_path):
    """A loader configured with audio_transport='spec_int8' emits (F, T)
    int8 payloads whose device dequantization tracks the f64 reference
    spectrogram within the int8 quantization step."""
    from avtubes.core.config import DataConfig
    from avtubes.data.audio import write_wav
    from avtubes.data.pipeline import HardwayTestSource
    from avtubes.data.spectrogram import SPEC_INT8_SCALE
    from PIL import Image

    root = tmp_path
    (root / "frames").mkdir()
    (root / "audio").mkdir()
    rng = np.random.RandomState(6)
    Image.fromarray(rng.randint(0, 256, (64, 64, 3), np.uint8)).save(
        root / "frames" / "v0.jpg")
    wav = np.clip(rng.randn(16000) * 0.2, -1, 1).astype(np.float32)
    write_wav(root / "audio" / "v0.wav", wav, 16000)

    cfg = DataConfig(samplerate=16000, audio_seconds=1, image_size=64,
                     audio_transport="spec_int8")
    spec_cfg = SpectrogramConfig(samplerate=16000, seconds=1)
    sample = HardwayTestSource(root, ["v0"], cfg).load(0)
    assert sample["waveform"].dtype == np.int8
    assert sample["waveform"].shape == spec_cfg.shape
    spec = np.asarray(log_spectrogram(sample["waveform"], spec_cfg))
    ref = log_spectrogram_np(
        np.asarray(prepare_waveform(wav, 16000, 1), np.float64)[:16000], spec_cfg)
    assert np.abs(spec - ref).max() < 1.0 / SPEC_INT8_SCALE


def test_spec_transport_through_pipeline(tmp_path):
    """A loader configured with audio_transport='spec_int16' emits (F, T)
    int16 payloads that every consumer can feed through log_spectrogram."""
    from avtubes.core.config import DataConfig
    from avtubes.data.audio import write_wav
    from avtubes.data.pipeline import HardwayTestSource
    from PIL import Image

    root = tmp_path
    (root / "frames").mkdir()
    (root / "audio").mkdir()
    rng = np.random.RandomState(5)
    Image.fromarray(rng.randint(0, 256, (64, 64, 3), np.uint8)).save(
        root / "frames" / "v0.jpg")
    wav = np.clip(rng.randn(16000) * 0.2, -1, 1).astype(np.float32)
    write_wav(root / "audio" / "v0.wav", wav, 16000)

    cfg = DataConfig(samplerate=16000, audio_seconds=1, image_size=64,
                     audio_transport="spec_int16")
    spec_cfg = SpectrogramConfig(samplerate=16000, seconds=1)
    sample = HardwayTestSource(root, ["v0"], cfg).load(0)
    assert sample["waveform"].dtype == np.int16
    assert sample["waveform"].shape == spec_cfg.shape
    spec = np.asarray(log_spectrogram(sample["waveform"], spec_cfg))
    ref = log_spectrogram_np(
        np.asarray(prepare_waveform(wav, 16000, 1), np.float64)[:16000], spec_cfg)
    assert np.abs(spec - ref).max() < 2e-4


def test_np_f32_rejects_short_waveform():
    """as_strided framing must not silently read past a short buffer — the
    contract (prepare to cfg.num_samples first) is enforced loudly, same as
    the native wrapper."""
    import pytest

    from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram_np_f32

    with pytest.raises(ValueError, match="prepare"):
        log_spectrogram_np_f32(np.zeros(1000, np.float32), SpectrogramConfig())
