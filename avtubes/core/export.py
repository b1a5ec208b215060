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
                     extra_meta: dict | None = None) -> bytes:
    """Serialize the inference pipeline to a portable StableHLO artifact.

    batch: an int for a fixed batch, or a dim-variable name (default "b")
    for a batch-polymorphic artifact.
    """
    import json
    import struct

    pipeline = _pipeline_fn(state, spec_cfg)
    if isinstance(batch, str):
        (bdim,) = jexport.symbolic_shape(batch)
    else:
        bdim = batch
    frames_spec = jax.ShapeDtypeStruct((bdim, image_size, image_size, 3), jnp.uint8)
    waves_spec = jax.ShapeDtypeStruct((bdim, spec_cfg.num_samples), jnp.float32)
    exported = jexport.export(jax.jit(pipeline), platforms=platforms)(
        frames_spec, waves_spec)
    meta = {
        "image_size": int(image_size),
        "samplerate": int(spec_cfg.samplerate),
        "seconds": int(spec_cfg.seconds),
        "num_samples": int(spec_cfg.num_samples),
        "batch": batch if isinstance(batch, int) else None,
        "platforms": list(platforms) if platforms else None,
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
    exported = jexport.deserialize(payload)
    frames_aval, waves_aval = exported.in_avals
    b = frames_aval.shape[0]
    derived = {
        "image_size": int(frames_aval.shape[1]),
        "num_samples": int(waves_aval.shape[1]),
        "batch": int(b) if isinstance(b, int) else None,
    }
    if meta is None:
        meta = derived
    else:
        meta.update(derived)  # the program is the ground truth for shapes
    return jax.jit(exported.call), meta


def load_localizer(blob: bytes) -> Callable:
    """Deserialize an exported artifact into a callable
    (frames_uint8, waveforms) -> (masks, heatmaps)."""
    return load_artifact(blob)[0]
