"""Fused Pallas log-spectrogram kernel.

Split of labor (Mosaic requires 128-aligned vector loads, and the
stride-511 framing offsets are inherently odd):

  * XLA builds the framed array (B, T, nperseg) via the contiguous
    reshape trick — ~num_samples elements, no duplication, fused slicing;
  * the Pallas kernel fuses everything after framing: constant detrend,
    windowed DFT (two fp32 MXU matmuls against cos/sin matrices), power,
    PSD scaling, one-sided doubling and the log — one read of the frames,
    one write of the (T, F) spectrogram, nothing else touching HBM.

The output is written in (T, F) layout (time-major); callers get (F, T)
scipy layout via a final cheap transpose, identical to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avtubes.data.spectrogram import (
    SpectrogramConfig,
    _dft_matrices,
    _onesided_scale,
    frame_signal,
    log_spectrogram,
)


def _stft_kernel(frames_ref, cos_ref, sin_ref, scale_ref, out_ref, *,
                 log_offset: float, inv_std: float):
    frames = frames_ref[0]                                   # (tile, nperseg)
    frames = frames - frames.mean(axis=1, keepdims=True)     # constant detrend
    # fp32 passes: default bf16 MXU inputs cost ~1e-3 in the log-spectrogram
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_ref[:], precision=hi, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], precision=hi, preferred_element_type=jnp.float32)
    power = (re * re + im * im) * scale_ref[:]
    # write transposed: the (F, T) scipy layout comes out of VMEM for free
    # instead of a separate 113 MB HBM transpose pass
    out_ref[0] = (jnp.log(power + log_offset) * inv_std).T


@functools.partial(jax.jit, static_argnums=(1, 2))
def _log_spectrogram_pallas(x: jnp.ndarray, cfg: SpectrogramConfig,
                            tile: int) -> jnp.ndarray:
    b = x.shape[0]
    t, nper, nfreq = cfg.num_frames, cfg.nperseg, cfg.num_freqs
    frames = frame_signal(x.astype(jnp.float32), cfg)        # (B, T, nperseg)
    ntiles = pl.cdiv(t, tile)
    padded_t = ntiles * tile
    if padded_t != t:
        frames = jnp.pad(frames, ((0, 0), (0, padded_t - t), (0, 0)))

    cosm, sinm = _dft_matrices(cfg)
    scale = _onesided_scale(cfg)[None, :]
    kernel = functools.partial(_stft_kernel, log_offset=cfg.log_offset,
                               inv_std=1.0 / cfg.normalize_std)
    out = pl.pallas_call(
        kernel,
        grid=(b, ntiles),
        in_specs=[
            pl.BlockSpec((1, tile, nper), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nper, nfreq), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nper, nfreq), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nfreq), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nfreq, tile), lambda bi, ti: (bi, 0, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nfreq, padded_t), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * padded_t * nper * nfreq,
            bytes_accessed=4 * b * (padded_t * nper + padded_t * nfreq),
            transcendentals=b * padded_t * nfreq,
        ),
    )(frames, jnp.asarray(cosm, jnp.float32), jnp.asarray(sinm, jnp.float32),
      jnp.asarray(scale, jnp.float32))
    return out[:, :, :t]                                     # (B, F, T)


def log_spectrogram_fused(x: jnp.ndarray,
                          cfg: SpectrogramConfig = SpectrogramConfig(),
                          tile: int = 512) -> jnp.ndarray:
    """Batched (B, num_samples) -> (B, F, T) log-spectrogram, Pallas-fused on
    TPU; falls back to the pure-XLA implementation elsewhere."""
    from avtubes.data.spectrogram import as_float_waveform

    x = as_float_waveform(x)  # int16 PCM transport: same rescale as the
    # XLA path, so both implementations agree on quantized inputs
    from avtubes.core.platform import on_tpu

    if not on_tpu():
        return log_spectrogram(x, cfg)
    if x.ndim == 1:
        return _log_spectrogram_pallas(x[None], cfg, tile)[0]
    return _log_spectrogram_pallas(x, cfg, tile)
