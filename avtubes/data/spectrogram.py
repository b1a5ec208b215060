"""Log-spectrogram front-end, scipy-parity, TPU-native.

The reference computes, on the host per sample (`dataloader.py:94-96`):

    _, _, S = scipy.signal.spectrogram(x, sr, nperseg=512, noverlap=1)
    spec = log(S + 1e-7) / 12        # Normalize(mean=0, std=12)

With scipy defaults that means: tukey(0.25) *periodic* window, per-segment
constant detrend (mean removal), hop = nperseg - noverlap = 511, PSD
density scaling 1/(fs * sum(win^2)), one-sided with non-DC/non-Nyquist
bins doubled.  For 22.05 kHz x 10 s input the output is (257, 431).

TPU design — everything after the raw waveform runs on device, batched:

  * Framing uses the stride-(nperseg-1) reshape trick: with hop = 511 and
    nperseg = 512, frames[i] = x[i*511 : i*511+512], so
    x[: F*511].reshape(F, 511) gives the first 511 columns and the last
    column is the strided gather x[511 :: 511][:F].  No (F, 512) gather —
    just a reshape, one tiny slice, and a concat that XLA fuses away.
  * The DFT is two MXU matmuls against precomputed (nperseg, nfreq)
    cos/sin matrices rather than an FFT: 512-point transforms over ~431
    frames are exactly the large-batch small-matmul shape the MXU eats,
    and it fuses with the window/detrend/power/log elementwise ops.
  * A fused Pallas variant lives in avtubes.ops.stft; this module is the
    jnp reference implementation both are tested against (and against
    scipy itself in tests/test_spectrogram.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


def tukey_periodic(nperseg: int, alpha: float = 0.25) -> np.ndarray:
    """Periodic Tukey window == scipy.signal.get_window(('tukey', a), M)."""
    npts = nperseg + 1  # periodic = symmetric(M+1) minus last point
    n = np.arange(npts, dtype=np.float64)
    edge = alpha * (npts - 1) / 2.0
    w = np.ones(npts)
    left = n < edge
    w[left] = 0.5 * (1 + np.cos(np.pi * (n[left] / edge - 1)))
    right = n > (npts - 1) - edge
    w[right] = 0.5 * (1 + np.cos(np.pi * ((n[right] - (npts - 1) + edge) / edge)))
    return w[:nperseg]


@dataclasses.dataclass(frozen=True)
class SpectrogramConfig:
    samplerate: int = 22050
    seconds: int = 10
    nperseg: int = 512
    noverlap: int = 1
    tukey_alpha: float = 0.25
    log_offset: float = 1e-7
    normalize_std: float = 12.0

    @property
    def hop(self) -> int:
        return self.nperseg - self.noverlap

    @property
    def num_samples(self) -> int:
        return self.samplerate * self.seconds

    @property
    def num_frames(self) -> int:
        return (self.num_samples - self.nperseg) // self.hop + 1

    @property
    def num_freqs(self) -> int:
        return self.nperseg // 2 + 1

    @property
    def shape(self) -> tuple[int, int]:
        """(freq, time) like scipy's output."""
        return (self.num_freqs, self.num_frames)


def _dft_matrices(cfg: SpectrogramConfig) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin matrices of shape (nperseg, num_freqs), window folded in."""
    n = np.arange(cfg.nperseg, dtype=np.float64)[:, None]
    k = np.arange(cfg.num_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / cfg.nperseg
    win = tukey_periodic(cfg.nperseg, cfg.tukey_alpha)[:, None]
    return (np.cos(ang) * win), (-np.sin(ang) * win)


def _onesided_scale(cfg: SpectrogramConfig) -> np.ndarray:
    """PSD density scale per frequency bin, with one-sided doubling."""
    win = tukey_periodic(cfg.nperseg, cfg.tukey_alpha)
    scale = 1.0 / (cfg.samplerate * float(np.sum(win * win)))
    s = np.full(cfg.num_freqs, 2.0 * scale)
    s[0] = scale
    if cfg.nperseg % 2 == 0:
        s[-1] = scale  # Nyquist bin not doubled
    return s


def quantize_int16_waveform(wav: np.ndarray) -> np.ndarray:
    """Host-side int16 transport quantization — the exact inverse of
    `as_float_waveform`'s 1/32768 rescale (lossless round trip for floats
    that came from 16-bit PCM).  Keep the two in lockstep."""
    return np.clip(np.rint(wav * 32768.0), -32768, 32767).astype(np.int16)


#: fixed-point scale for int16 log-spectrogram transport.  The normalized
#: log-spectrogram is bounded in [log(1e-7)/12 ~ -1.3432, ~+2] (the lower
#: bound is exact — log_offset floors the power), so 16000 leaves 2x
#: headroom (32767/16000 = 2.048) and quantizes at 1/32000 ~ 3.1e-5
#: absolute — under the 2e-4 scipy-parity tolerance of the f32 device path.
SPEC_INT16_SCALE = 16000.0


def quantize_int16_spectrogram(spec: np.ndarray) -> np.ndarray:
    """Host-side int16 transport quantization of a normalized log-spectrogram
    (inverse applied on device by `log_spectrogram`'s passthrough branch)."""
    return np.clip(np.rint(spec * SPEC_INT16_SCALE),
                   -32768, 32767).astype(np.int16)


#: fixed-point scale for the OPT-IN int8 log-spectrogram transport, chosen
#: to represent the same [-2.048, +2.048] range as the int16 transport
#: (127/62 = 2.048) at 1/124 ~ 8.1e-3 absolute quantization.  That is NOT
#: parity-grade (the int16 transport's 3.1e-5 is); it exists for thin
#: host->device links where the spectrogram is the larger half of the
#: shipped bytes — measured metric deltas are recorded in DESIGN.md and
#: must be validated per deployment like int8 conv quant.
SPEC_INT8_SCALE = 62.0


def quantize_int8_spectrogram(spec: np.ndarray) -> np.ndarray:
    """Host-side int8 transport quantization of a normalized log-spectrogram
    (inverse applied on device by `log_spectrogram`'s passthrough branch)."""
    return np.clip(np.rint(spec * SPEC_INT8_SCALE), -128, 127).astype(np.int8)


def spec_int16_to_int8(spec16: np.ndarray) -> np.ndarray:
    """Requantize an int16-transport spectrogram to the int8 transport —
    lets the fused native decode+STFT batch path (which emits int16) serve
    the int8 transport without recomputing the STFT."""
    return np.clip(np.rint(spec16.astype(np.float32)
                           * (SPEC_INT8_SCALE / SPEC_INT16_SCALE)),
                   -128, 127).astype(np.int8)


#: the audio transport family: how a waveform crosses the host->device (or
#: client->server) boundary.  `log_spectrogram`'s static-shape/dtype
#: dispatch decodes every one of them, so any consumer accepts any member.
AUDIO_TRANSPORTS = ("float32", "int16", "spec_int16", "spec_int8")


def audio_payload_spec(transport: str, cfg: SpectrogramConfig
                       ) -> tuple[tuple[int, ...], np.dtype]:
    """Per-sample (shape, dtype) of a transport's wire payload."""
    if transport == "float32":
        return (cfg.num_samples,), np.dtype(np.float32)
    if transport == "int16":
        return (cfg.num_samples,), np.dtype(np.int16)
    if transport == "spec_int16":
        return cfg.shape, np.dtype(np.int16)
    if transport == "spec_int8":
        return cfg.shape, np.dtype(np.int8)
    raise ValueError(f"unknown audio transport {transport!r}; "
                     f"expected one of {AUDIO_TRANSPORTS}")


def prepare_audio_payload(waves: np.ndarray, transport: str,
                          cfg: SpectrogramConfig) -> np.ndarray:
    """Host-side encode of (n, num_samples) float waveforms into a
    transport's wire payload (the batched counterpart of the training
    pipeline's `_finalize_waveform`).  Uses the native C++ STFT when
    available for the spec transports; `log_spectrogram`'s passthrough
    branch is the device-side decoder for every output."""
    waves = np.ascontiguousarray(np.asarray(waves), dtype=np.float32)
    if waves.ndim != 2 or waves.shape[1] != cfg.num_samples:
        raise ValueError(f"expected (n, {cfg.num_samples}) float waveforms, "
                         f"got {waves.shape}")
    if transport == "float32":
        return waves
    if transport == "int16":
        return quantize_int16_waveform(waves)
    if transport not in ("spec_int16", "spec_int8"):
        raise ValueError(f"unknown audio transport {transport!r}; "
                         f"expected one of {AUDIO_TRANSPORTS}")
    rows = []
    native_fn = None
    try:
        from avtubes import native

        if native.available():
            native_fn = native.log_spectrogram_i16
    except ImportError:
        pass
    for w in waves:
        out = None
        if native_fn is not None:
            out = native_fn(w, cfg.samplerate, cfg.nperseg, cfg.noverlap,
                            cfg.num_freqs, cfg.num_frames)
        if out is None:
            out = quantize_int16_spectrogram(log_spectrogram_np_f32(w, cfg))
        rows.append(out)
    spec16 = np.stack(rows)
    return spec_int16_to_int8(spec16) if transport == "spec_int8" else spec16


def log_spectrogram_np_f32(x: np.ndarray,
                           cfg: SpectrogramConfig = SpectrogramConfig()) -> np.ndarray:
    """Fast float32 HOST log-spectrogram (~3.9 ms/clip/core vs ~9 ms for the
    f64 reference): stride-trick framing (zero-copy), pocketfft rfft, f32
    elementwise tail.  Agrees with `log_spectrogram_np` to ~2e-7 — used by
    the 'spec_int16' audio transport, where the host ships the (F, T)
    spectrogram instead of the waveform (halves audio H2D bytes again;
    worth it on thin host->device links)."""
    fcount, nperseg, hop = cfg.num_frames, cfg.nperseg, cfg.hop
    x = np.ascontiguousarray(x, np.float32)
    needed = (fcount - 1) * hop + nperseg
    if x.shape[-1] < needed:
        # as_strided would silently read past the buffer — a short waveform
        # is a caller bug (prepare to cfg.num_samples first), same contract
        # as the native wrapper
        raise ValueError(
            f"waveform length {x.shape[-1]} < {needed} required for "
            f"{fcount} frames; prepare to cfg.num_samples first")
    frames = np.lib.stride_tricks.as_strided(
        x, (fcount, nperseg), (x.strides[0] * hop, x.strides[0]))
    frames = frames - frames.mean(axis=-1, keepdims=True, dtype=np.float32)
    win = tukey_periodic(nperseg, cfg.tukey_alpha).astype(np.float32)
    spec = np.fft.rfft(frames * win, nperseg, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
    power *= _onesided_scale(cfg).astype(np.float32)
    out = np.log(power + np.float32(cfg.log_offset)) / np.float32(cfg.normalize_std)
    return np.ascontiguousarray(out.T)


def as_float_waveform(x: jnp.ndarray) -> jnp.ndarray:
    """Accept int16 PCM transport: int inputs are scaled by 1/32768 — the
    exact inverse of the host quantization in `data.pipeline` (and of the
    WAV reader's PCM16 normalization, so the round trip is lossless for
    16-bit sources).  Shipping waveforms as int16 halves H2D traffic, which
    dominates the end-to-end pipeline when the device link is thin."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(jnp.float32) * (1.0 / 32768.0)
    return x.astype(jnp.float32)


def frame_signal(x: jnp.ndarray, cfg: SpectrogramConfig) -> jnp.ndarray:
    """(..., num_samples) -> (..., num_frames, nperseg) via the reshape trick.

    Requires hop == nperseg - 1 (the reference's noverlap=1 geometry). A
    general-hop gather fallback covers other configs.
    """
    fcount, nperseg, hop = cfg.num_frames, cfg.nperseg, cfg.hop
    if hop == nperseg - 1:
        body = x[..., : fcount * hop].reshape(*x.shape[:-1], fcount, hop)
        tail = x[..., hop :: hop][..., :fcount][..., None]
        return jnp.concatenate([body, tail], axis=-1)
    idx = np.arange(fcount)[:, None] * hop + np.arange(nperseg)[None, :]
    return x[..., idx]


def _power_spectrum(x: jnp.ndarray, cfg: SpectrogramConfig) -> jnp.ndarray:
    """(..., num_samples) waveform -> onesided PSD power (..., T, F).

    Framing + constant detrend + Tukey window + rDFT + one-sided density
    scaling (= scipy.signal.spectrogram's S before the log).  The rDFT is
    the direct (nperseg, num_freqs) cos/sin matmul pair: one big
    MXU-shaped contraction (K=512, N=257, M=B*T).  A two-stage
    Cooley-Tukey factoring (32x16) cuts f32 FLOPs 4x on paper but was
    measured ~800x SLOWER on v5e (2457 ms vs 3.1 ms per B=128 iter) —
    the sub-128 contraction dims can't tile the MXU and the batched
    small dots serialize; jnp.fft.rfft was worse still (4628 ms).
    Keep this a single large matmul.
    """
    x = as_float_waveform(x)
    frames = frame_signal(x, cfg)                       # (..., T, nperseg)
    frames = frames - frames.mean(axis=-1, keepdims=True)  # constant detrend
    # HIGHEST precision: TPU matmuls default to bf16 inputs, which costs ~1e-2
    # absolute error in the log-spectrogram; fp32 MXU passes keep it <2e-4.
    dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    cosm, sinm = _dft_matrices(cfg)
    re = dot(frames, jnp.asarray(cosm, jnp.float32))    # (..., T, F) — MXU
    im = dot(frames, jnp.asarray(sinm, jnp.float32))
    power = re * re + im * im
    return power * jnp.asarray(_onesided_scale(cfg), jnp.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def log_spectrogram(x: jnp.ndarray, cfg: SpectrogramConfig = SpectrogramConfig()) -> jnp.ndarray:
    """Batched device log-spectrogram: (..., num_samples) -> (..., F, T).

    Output matches log(scipy spectrogram + 1e-7) / 12 in float32.

    Transport-aware: when `x` already has the (F, T) spectrogram shape it is
    a host-computed payload (audio_transport='spec_int16' in the pipeline) —
    int16 inputs are dequantized by 1/SPEC_INT16_SCALE, floats pass through.
    The branch is on static shape, so every call site works with either
    transport unchanged.
    """
    if x.ndim >= 2 and tuple(x.shape[-2:]) == cfg.shape:
        if x.dtype == jnp.int8:
            return x.astype(jnp.float32) * (1.0 / SPEC_INT8_SCALE)
        if jnp.issubdtype(x.dtype, jnp.integer):
            return x.astype(jnp.float32) * (1.0 / SPEC_INT16_SCALE)
        return x.astype(jnp.float32)
    power = _power_spectrum(x, cfg)
    spec = jnp.log(power + cfg.log_offset) / cfg.normalize_std
    return jnp.swapaxes(spec, -1, -2)                   # (..., F, T) like scipy


def mel_filterbank(cfg: SpectrogramConfig, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """(num_freqs, n_mels) Slaney-style triangular mel filterbank.

    HTK mel scale (2595 log10(1 + f/700)), area-normalized triangles
    (Slaney norm) — the standard log-mel front-end named by the build's
    north-star spec (BASELINE.json); the reference itself trains on the
    plain log-spectrogram, so mel stays opt-in (`log_mel_spectrogram`).
    """
    fmax = fmax if fmax is not None else cfg.samplerate / 2.0

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    freqs = np.linspace(0, cfg.samplerate / 2.0, cfg.num_freqs)
    fb = np.zeros((cfg.num_freqs, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-12)
        down = (hi - freqs) / max(hi - ctr, 1e-12)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
        fb[:, m] *= 2.0 / max(hi - lo, 1e-12)  # Slaney area norm
    return fb


@functools.partial(jax.jit, static_argnums=(1, 2))
def log_mel_spectrogram(x: jnp.ndarray, cfg: SpectrogramConfig = SpectrogramConfig(),
                        n_mels: int = 128) -> jnp.ndarray:
    """Batched device log-mel: (..., num_samples) -> (..., n_mels, T).

    Linear power spectrogram (same STFT path as `log_spectrogram`, PSD
    scaling included) -> mel filterbank matmul (MXU) -> log/std normalize.
    """
    power = _power_spectrum(x, cfg)
    dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    mel = dot(power, jnp.asarray(mel_filterbank(cfg, n_mels), jnp.float32))
    spec = jnp.log(mel + cfg.log_offset) / cfg.normalize_std
    return jnp.swapaxes(spec, -1, -2)                   # (..., M, T)


def log_spectrogram_np(x: np.ndarray, cfg: SpectrogramConfig = SpectrogramConfig()) -> np.ndarray:
    """Float64 numpy reference (bit-comparable to scipy; used in tests/tools)."""
    fcount, nperseg, hop = cfg.num_frames, cfg.nperseg, cfg.hop
    idx = np.arange(fcount)[:, None] * hop + np.arange(nperseg)[None, :]
    frames = x[idx].astype(np.float64)
    frames = frames - frames.mean(axis=-1, keepdims=True)
    win = tukey_periodic(cfg.nperseg, cfg.tukey_alpha)
    spec = np.fft.rfft(frames * win, cfg.nperseg, axis=-1)
    power = np.abs(spec) ** 2
    power *= _onesided_scale(cfg)
    return (np.log(power + cfg.log_offset) / cfg.normalize_std).T
