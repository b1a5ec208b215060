"""Evaluation loops: hard-way test (cIoU/AUC) and per-frame test (cIoU/AUC/mTC).

Protocol parity (`train_hardway.py:164-239`, `test.py:87-172`):
  * heatmaps come from the jitted eval step, are upsampled 14->224 bilinear,
    min-max normalized and binarized at the median pixel ON DEVICE in batch
    (heatmap_to_mask_batch), then compared to rasterized GT on host;
  * hard-way test: one frame per video, cIoU@0.5 fraction + 21-point AUC;
  * per-frame test: every sampling_rate-th frame of each test video, per-video
    cIoU@0.5/AUC averaged over videos, plus mTC between consecutive preds.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.core.config import DataConfig
from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram
from avtubes.data.transforms import normalize_imagenet
from avtubes.evaluation import (
    auc_from_ciou,
    ciou_single,
    flickr_gt_from_xml,
    heatmap_to_mask_batch,
    mtc,
    vggss_gt_from_bboxes,
)

def make_gt_lookup(data_cfg: DataConfig, per_frame: bool = False,
                   vggss_index: dict | None = None) -> Callable[[str, int | None], np.ndarray]:
    """Returns gt(video_id, frame_or_None) -> 224x224 map."""
    gt_dir = Path(data_cfg.gt_path if per_frame else data_cfg.og_gt_path)

    def lookup(vid: str, frame: int | None = None) -> np.ndarray:
        if data_cfg.testset == "vggss":
            assert vggss_index is not None, "vggss eval requires the vggss.json index"
            return vggss_gt_from_bboxes(vggss_index[vid])
        name = f"{vid}_{frame}.xml" if frame is not None else f"{vid}.xml"
        return flickr_gt_from_xml(gt_dir / name, per_frame=frame is not None)

    return lookup


def make_gt_lookup_auto(data_cfg: DataConfig, per_frame: bool = False):
    """make_gt_lookup with the vggss.json index auto-loaded for
    testset='vggss' (the reference preloads it into args.gt_all,
    `test.py:77-83`)."""
    vggss_index = None
    if data_cfg.testset == "vggss":
        from avtubes.data.index import resolve_metadata_dir
        from avtubes.evaluation import load_vggss_index

        vggss_index = load_vggss_index(
            resolve_metadata_dir(data_cfg.metadata_dir) / "vggss.json")
    return make_gt_lookup(data_cfg, per_frame=per_frame, vggss_index=vggss_index)


@functools.partial(jax.jit, static_argnames=("spec_cfg",))
def _hardway_eval_masks(state, frames_uint8, waveforms, spec_cfg):
    """Raw frames+waveforms -> binary masks in ONE program (normalize,
    spectrogram, both encoders, heatmap postprocess all fused)."""
    frames = normalize_imagenet(frames_uint8)
    spec = log_spectrogram(waveforms, spec_cfg)[..., None]
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        frames, spec, train=False,
    )
    return heatmap_to_mask_batch(out.heatmap)


@functools.partial(jax.jit, static_argnames=("spec_cfg",))
def _hardway_eval_masks_3d(state, frames_uint8, waveforms, spec_cfg):
    """FullModel variant: each test frame forwarded as a T=1 clip."""
    frames = normalize_imagenet(frames_uint8)
    spec = log_spectrogram(waveforms, spec_cfg)[..., None]
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        spec, frames[:, None], train=False, method="forward_shared_audio",
    )
    return heatmap_to_mask_batch(out.heatmap)


@functools.partial(jax.jit, static_argnames=("spec_cfg",))
def _perframe_masks(state, frames_uint8, waveform, spec_cfg):
    """Per-frame eval in ONE program: normalize + spectrogram + both
    encoders (audio once per clip via forward_shared_audio) + mask
    postprocess.  One dispatch per video instead of a per-op eager chain —
    on a ~30 ms-RTT tunnel the fused form is latency-bound by ONE round
    trip, not a dozen."""
    frames = normalize_imagenet(frames_uint8)
    spec = log_spectrogram(waveform[None], spec_cfg)[..., None]
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        frames, spec, train=False, method="forward_shared_audio",
    )
    return heatmap_to_mask_batch(out.heatmap)


@functools.partial(jax.jit, static_argnames=("spec_cfg",))
def _perframe_masks_3d(state, clip_uint8, waveform, spec_cfg):
    """FullModel variant: the sampled frames run as ONE clip (the
    reference's batched-clip trick, `train_3D.py:152-154`)."""
    frames = normalize_imagenet(clip_uint8)
    spec = log_spectrogram(waveform[None], spec_cfg)[..., None]
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        spec, frames[None], train=False, method="forward_shared_audio",
    )
    return heatmap_to_mask_batch(out.heatmap)


def _pad_rows(arr: np.ndarray, to: int) -> np.ndarray:
    """Pad axis 0 to `to` rows by repeating row 0 (sliced off after the jit
    call — eval paths have no cross-sample coupling, so this is exact)."""
    if arr.shape[0] >= to:
        return arr
    reps = np.repeat(arr[:1], to - arr.shape[0], axis=0)
    return np.concatenate([arr, reps], axis=0)


def bucket_len(n: int, buckets: tuple[int, ...] = (1, 2, 4, 8, 16, 32)) -> int:
    """Smallest bucket >= n (multiples of 32 past the table).  Jitted eval
    steps recompile per input shape — on TPU that is ~30 s per NEW video
    length, so variable-length eval pads to a small set of shapes."""
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 32) * 32


def _eval_put(mesh):
    """(put_batch, put_replicated, divisor) for an optional data mesh.

    mesh=None (or size 1) keeps the single-device behavior.  With a mesh,
    batch inputs are sharded over the 'data' axis (each device scores its
    slice — eval is per-sample independent, so this is exact) and
    broadcast inputs (shared audio) are explicitly replicated so every
    jit input lives on the same device set."""
    if mesh is None or mesh.size <= 1:
        return jnp.asarray, jnp.asarray, 1
    from avtubes.core.mesh import batch_sharding, replicated

    bs, rs = batch_sharding(mesh), replicated(mesh)
    return (lambda x: jax.device_put(np.asarray(x), bs),
            lambda x: jax.device_put(x, rs), mesh.size)


def evaluate_hardway(state, loader, data_cfg: DataConfig, spec_cfg: SpectrogramConfig,
                     gt_lookup, epoch: int = 0, logger=None,
                     record: int = 0, model_kind: str = "2d",
                     evaluated_ids: list | None = None, mesh=None) -> dict[str, float]:
    """249-image hard-way test: cIoU@0.5 + AUC (`train_hardway.py:208-239`).

    record > 0 dumps overlay JPEGs (frame + GT/pred JET compositing) for the
    first `record` samples via logger.log_image — the reference's
    record_qualitative path (`train_hardway.py:70-78`).

    evaluated_ids, when given, collects the id of every sample actually
    scored (the loader skip-and-counts decode failures, so this can be a
    subset of the split) — comparison baselines must score the same set.

    mesh, when given, shards each eval batch over the mesh's 'data' axis so
    multi-chip eval scales instead of replicating the whole batch on every
    device (state must be replicated over the same mesh).
    """
    from avtubes.utils.visual import overlay_heatmap

    mask_fn = _hardway_eval_masks_3d if model_kind == "3d" else _hardway_eval_masks
    put, _, div = _eval_put(mesh)
    cious = []
    recorded = 0
    full_bsz = getattr(loader, "batch_size", 0)
    for batch in loader.epoch(epoch):
        n = batch["frame"].shape[0]
        pad_to = full_bsz if 0 < n < full_bsz else n  # last partial batch:
        # pad to the steady-state shape instead of compiling a second program
        pad_to = -(-pad_to // div) * div  # sharded: divisible by mesh size
        masks = np.asarray(mask_fn(
            state, put(_pad_rows(batch["frame"], pad_to)),
            put(_pad_rows(batch["waveform"], pad_to)),
            spec_cfg))[:n]
        for i, vid in enumerate(batch["id"]):
            gt = gt_lookup(vid, None)
            cious.append(ciou_single(masks[i], gt, 0.5))
            if evaluated_ids is not None:
                evaluated_ids.append(vid)
            if logger is not None and recorded < record:
                logger.log_image(f"{vid}_hardway",
                                 overlay_heatmap(batch["frame"][i], masks[i], gt),
                                 step=epoch)
                recorded += 1
    cious = np.asarray(cious)
    return {
        "hardway_ciou": float(np.mean(cious >= 0.5)),
        "hardway_auc": auc_from_ciou(cious),
        "hardway_n": int(cious.size),
    }


def evaluate_perframe(state, source, data_cfg: DataConfig, spec_cfg: SpectrogramConfig,
                      gt_lookup, model_kind: str = "2d", logger=None,
                      record: int = 0, epoch: int = 0, mesh=None) -> dict[str, float]:
    """Whole-video per-frame eval with mTC (`train_hardway.py:164-207`,
    `train_3D.py:146-186`).

    `source` yields {"clip": (T,224,224,3) uint8, "waveform", "id"} per video.
    Frames i = sampling_rate, i+sampling_rate, ... < T-1 are scored; a video
    shorter than one stride is skipped.

    model_kind "2d" scores each sampled frame through AVENet (audio encoded
    once per clip); "3d" passes all sampled frames as ONE clip through
    FullModel — the reference's batched-clip trick (`train_3D.py:152-154`).
    record > 0 dumps per-frame overlay JPEGs for the first `record` videos.
    mesh shards the 2d path's frame batch over the data axis (the 3d path
    runs one whole clip and is left replicated — 3D convs couple frames).
    """
    from avtubes.utils.visual import overlay_heatmap

    put, put_rep, div = _eval_put(mesh)
    ious, aucs, mtcs = [], [], []
    stride = data_cfg.sampling_rate
    for vi in range(len(source)):
        try:
            sample = source.load(vi)
        except Exception as e:  # skip-and-count decode policy
            print(f"[eval] skipping {vi}: {e}")
            continue
        clip = sample["clip"]
        idxs = list(range(stride, clip.shape[0] - 1, stride))
        if not idxs:
            continue
        k = len(idxs)
        if model_kind == "3d":
            # 3D convs couple neighboring frames, so the clip runs at its
            # natural length (padding would perturb features near the end;
            # reference parity: the whole clip in one forward)
            masks = np.asarray(_perframe_masks_3d(
                state, jnp.asarray(clip[idxs]), jnp.asarray(sample["waveform"]),
                spec_cfg))
        else:
            # 2D eval is per-frame independent: pad the frame batch to a
            # shape bucket so each unique video length does not recompile
            pad_k = -(-bucket_len(k) // div) * div
            masks = np.asarray(_perframe_masks(
                state, put(_pad_rows(clip[idxs], pad_k)),
                put_rep(np.asarray(sample["waveform"])), spec_cfg))[:k]
        iou = [ciou_single(masks[j], gt_lookup(sample["id"], fi), 0.5)
               for j, fi in enumerate(idxs)]
        ious.append(float(np.mean(np.asarray(iou) >= 0.5)))
        aucs.append(auc_from_ciou(np.asarray(iou)))
        mtcs.append(mtc([masks[j] for j in range(len(idxs))]))
        if logger is not None and vi < record:
            for j, fi in enumerate(idxs):
                logger.log_image(
                    f"{sample['id']}_test_frame_{fi}",
                    overlay_heatmap(clip[fi], masks[j], gt_lookup(sample["id"], fi)),
                    step=epoch)
    if not ious:
        return {"test_ciou": float("nan"), "test_auc": float("nan"), "test_mtc": float("nan")}
    return {
        "test_ciou": float(np.mean(ious)),
        "test_auc": float(np.mean(aucs)),
        "test_mtc": float(np.nanmean(mtcs)),
    }
