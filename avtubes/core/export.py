"""AOT export of the inference pipeline (serving path).

The reference has no serving story (inference is `model(image, spec)`
inside the Python training scripts).  For production deployment we export
the complete localization pipeline — waveform -> log-spectrogram, frame ->
encoder, heatmap -> binary mask postprocess — as a serialized StableHLO
artifact via `jax.export`:

  * the artifact bundles weights as constants; serving needs jax + the
    bytes, not the model code or the checkpoint format;
  * shapes are fixed at export (batch is a leading symbolic dim if
    requested), so the server compiles once and never retraces;
  * the same artifact runs on any platform jax supports (exported for
    TPU by default; pass platforms=("cpu", "tpu") for both).

Usage:
    blob = export_localizer(state, spec_cfg)           # bytes
    Path("model.avt").write_bytes(blob)
    ...
    fn = load_localizer(Path("model.avt").read_bytes())
    masks, heatmaps = fn(frames_uint8, waveforms)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import export as jexport


def _pipeline_fn(state, spec_cfg) -> Callable:
    """Build the full frames+waveforms -> (masks, heatmaps) program."""
    from avtubes.data.spectrogram import log_spectrogram
    from avtubes.data.transforms import normalize_imagenet
    from avtubes.evaluation.postprocess import heatmap_to_mask_batch

    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)
    apply_fn = state.apply_fn

    def pipeline(frames_uint8: jnp.ndarray, waveforms: jnp.ndarray):
        frames = normalize_imagenet(frames_uint8)
        spec = log_spectrogram(waveforms, spec_cfg)[..., None]
        out = apply_fn({"params": params, "batch_stats": batch_stats},
                       frames, spec, train=False)
        return heatmap_to_mask_batch(out.heatmap), out.heatmap

    return pipeline


# Artifact container: a small self-describing header in front of the
# serialized StableHLO so servers can recover the input contract (image
# size, samplerate, audio length) without the export-time config.  Bare
# `jax.export` payloads (pre-header artifacts) still load.
_MAGIC = b"AVTMETA1"


def export_localizer(state, spec_cfg, batch: int | str = "b",
                     image_size: int = 224,
                     platforms: tuple[str, ...] | None = None,
                     extra_meta: dict | None = None,
                     audio_transport: str = "float32") -> bytes:
    """Serialize the inference pipeline to a portable StableHLO artifact.

    batch: an int for a fixed batch, or a dim-variable name (default "b")
    for a batch-polymorphic artifact.

    audio_transport: the artifact's audio INPUT encoding — 'float32'
    waveform (default), 'int16' PCM waveform (half the request/H2D bytes,
    dequantized in-program by the exact inverse of the WAV reader's
    normalization, so bit-identical for 16-bit sources), or host-computed
    'spec_int16'/'spec_int8' log-spectrogram payloads (the training
    pipeline's thin-link transports; the program skips the device STFT).
    `log_spectrogram`'s static shape/dtype dispatch decodes all of them,
    so the exported program body is the same pipeline either way.
    """
    import json
    import struct

    import numpy as np

    from avtubes.data.spectrogram import audio_payload_spec

    pipeline = _pipeline_fn(state, spec_cfg)
    if isinstance(batch, str):
        (bdim,) = jexport.symbolic_shape(batch)
    else:
        bdim = batch
    audio_shape, audio_dtype = audio_payload_spec(audio_transport, spec_cfg)
    frames_spec = jax.ShapeDtypeStruct((bdim, image_size, image_size, 3), jnp.uint8)
    waves_spec = jax.ShapeDtypeStruct((bdim, *audio_shape),
                                      jnp.dtype(audio_dtype))
    exported = jexport.export(jax.jit(pipeline), platforms=platforms)(
        frames_spec, waves_spec)
    meta = {
        "image_size": int(image_size),
        "samplerate": int(spec_cfg.samplerate),
        "seconds": int(spec_cfg.seconds),
        "num_samples": int(spec_cfg.num_samples),
        "batch": batch if isinstance(batch, int) else None,
        "platforms": list(platforms) if platforms else None,
        "audio_transport": audio_transport,
        **(extra_meta or {}),
    }
    head = json.dumps(meta, sort_keys=True).encode()
    return (_MAGIC + struct.pack("<I", len(head)) + head
            + bytes(exported.serialize()))


def load_artifact(blob: bytes):
    """Deserialize an artifact into (callable, meta dict).

    The callable maps (frames_uint8, waveforms) -> (masks, heatmaps).
    Headerless (bare jax.export) payloads load with meta reconstructed
    from the program's input avals (samplerate/seconds then unknown)."""
    import json
    import struct

    if blob[: len(_MAGIC)] == _MAGIC:
        (n,) = struct.unpack("<I", blob[len(_MAGIC) : len(_MAGIC) + 4])
        meta = json.loads(blob[len(_MAGIC) + 4 : len(_MAGIC) + 4 + n])
        payload = blob[len(_MAGIC) + 4 + n :]
    else:
        meta, payload = None, blob
    import numpy as np

    exported = jexport.deserialize(payload)
    frames_aval, waves_aval = exported.in_avals
    b = frames_aval.shape[0]
    # the program itself is the ground truth for the audio input contract:
    # a 3-d audio aval is a host-spectrogram payload (int8/int16 by dtype),
    # a 2-d one is a waveform (int16 PCM or f32)
    if waves_aval.ndim == 3:
        transport = ("spec_int8" if waves_aval.dtype == np.int8
                     else "spec_int16")
    else:
        transport = "int16" if waves_aval.dtype == np.int16 else "float32"
    derived = {
        "image_size": int(frames_aval.shape[1]),
        "batch": int(b) if isinstance(b, int) else None,
        "audio_transport": transport,
        "audio_shape": [int(s) for s in waves_aval.shape[1:]],
        "audio_dtype": np.dtype(waves_aval.dtype).name,
    }
    if waves_aval.ndim == 2:
        derived["num_samples"] = int(waves_aval.shape[1])
    if meta is None:
        meta = derived
    else:
        meta.update(derived)  # the program is the ground truth for shapes
    return jax.jit(exported.call), meta


def load_localizer(blob: bytes) -> Callable:
    """Deserialize an exported artifact into a callable
    (frames_uint8, waveforms) -> (masks, heatmaps)."""
    return load_artifact(blob)[0]


def validate_artifact(state, blob: bytes, spec_cfg, image_size: int = 224,
                      n: int = 16, seed: int = 0) -> dict:
    """Score an exported artifact against the in-memory f32 pipeline.

    The export CLI's `--quant int8` is an approximation; the docs used to
    tell users to "validate cIoU before serving it" — this is that
    validation as a function: both pipelines score the same synthetic boxed
    eval set (random frames/waveforms, random rectangle GT — the same
    construction the system-parity tests use) and the report carries the
    cIoU@0.5/AUC of each, their deltas, the mean per-sample mask IoU
    between the two pipelines (the GT-free agreement number), and the
    heatmap max-abs-diff/correlation.  Exact exports (plain / --s2d) come
    back with ~zero deltas; int8 shows its true metric-level cost.

    `state` must be the UN-quantized f32 state (what the checkpoint holds);
    `blob` is the artifact as written to disk.
    """
    import numpy as np

    from avtubes.evaluation import auc_from_ciou, ciou_single

    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, (n, image_size, image_size, 3),
                         dtype=np.uint8)
    waves = (rng.rand(n, spec_cfg.num_samples).astype(np.float32) * 2 - 1)
    gts = []
    for _ in range(n):
        x0, y0 = rng.randint(10, 100, 2)
        w, h = rng.randint(60, 120, 2)
        g = np.zeros((224, 224), np.float32)
        g[y0:y0 + h, x0:x0 + w] = 1.0
        gts.append(g)

    ref_fn = jax.jit(_pipeline_fn(state, spec_cfg))
    masks_ref, heat_ref = jax.device_get(ref_fn(frames, waves))

    art_fn, meta = load_artifact(blob)
    from avtubes.data.spectrogram import prepare_audio_payload

    # encode the eval waveforms into the artifact's own audio transport
    # (a transport artifact's deltas then INCLUDE its quantization cost)
    waves = prepare_audio_payload(
        waves, meta.get("audio_transport", "float32"), spec_cfg)
    fixed = meta.get("batch")
    if fixed:  # fixed-batch artifact: run in padded chunks of that size
        masks_chunks, heat_chunks = [], []
        for i in range(0, n, fixed):
            fr, wv = frames[i:i + fixed], waves[i:i + fixed]
            pad = fixed - fr.shape[0]
            if pad:
                fr = np.concatenate([fr, np.repeat(fr[:1], pad, 0)])
                wv = np.concatenate([wv, np.repeat(wv[:1], pad, 0)])
            m, h = jax.device_get(art_fn(fr, wv))
            masks_chunks.append(m[: fr.shape[0] - pad])
            heat_chunks.append(h[: fr.shape[0] - pad])
        masks_art = np.concatenate(masks_chunks)
        heat_art = np.concatenate(heat_chunks)
    else:
        masks_art, heat_art = jax.device_get(art_fn(frames, waves))

    def headline(masks):
        cious = np.asarray([ciou_single(masks[i], gts[i], 0.5)
                            for i in range(n)])
        return float(np.mean(cious >= 0.5)), auc_from_ciou(cious), cious

    ciou_ref, auc_ref, cious_ref = headline(np.asarray(masks_ref))
    ciou_art, auc_art, cious_art = headline(np.asarray(masks_art))
    inter = np.minimum(masks_ref, masks_art).sum(axis=(1, 2))
    union = np.maximum(masks_ref, masks_art).sum(axis=(1, 2))
    pair_iou = float(np.mean(inter / np.maximum(union, 1.0)))
    hr = np.asarray(heat_ref, np.float64).ravel()
    ha = np.asarray(heat_art, np.float64).ravel()
    return {
        "n": int(n),
        "ciou_f32": round(ciou_ref, 4),
        "ciou_artifact": round(ciou_art, 4),
        "ciou_delta": round(abs(ciou_art - ciou_ref), 4),
        "auc_f32": round(auc_ref, 4),
        "auc_artifact": round(auc_art, 4),
        "auc_delta": round(abs(auc_art - auc_ref), 4),
        "ciou_per_sample_max_delta": round(
            float(np.abs(cious_art - cious_ref).max()), 4),
        "mask_pairwise_iou_mean": round(pair_iou, 4),
        "heatmap_max_abs_diff": round(float(np.abs(hr - ha).max()), 5),
        "heatmap_corr": round(float(np.corrcoef(hr, ha)[0, 1]), 5),
    }
