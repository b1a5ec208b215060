"""Measure what the opt-in serving --fast_decode costs in metric terms.

`cli/serve.py --fast_decode` decodes request JPEGs with the native
DCT-domain-scaled fast path (libjpeg scale_num/8 — the PIL Image.draft
trick): ~2x the image-decode rate at ~2-level pixel drift vs the exact
full-resolution decode.  NOT parity-grade, so its metric cost must be
measured, not assumed (same policy as spec_int8 / --quant int8).

This script scores the SAME f32 model pipeline on the same synthetic boxed
eval set (the construction `core.export.validate_artifact` uses) fed with
frames decoded from the SAME JPEG bytes two ways:
  a) eval_frame_from_bytes(...)            (exact: PIL decode + parity resize),
  b) eval_frame_from_bytes(..., fast=True) (native DCT-scaled decode),
and prints one JSON line with cIoU@0.5/AUC per path, deltas, mask IoU,
heatmap agreement, and the measured per-frame decode times.  Verdict goes
in DESIGN.md.

    python scripts/bench_fast_decode.py [--n 64] [--image_size 224]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.core.cache import enable_compilation_cache

enable_compilation_cache()


def synth_photo(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    """Photo-like frame: smooth gradients + blobs + mild noise (pure noise
    JPEGs are unrealistically dense and hide DCT-scaling drift in noise)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        128 + 100 * np.sin(xx / w * (2 + rng.rand() * 4)),
        128 + 100 * np.cos(yy / h * (2 + rng.rand() * 4)),
        128 + 80 * np.sin((xx + yy) / (h + w) * (3 + rng.rand() * 5)),
    ], -1)
    for _ in range(4):  # a few hard-edged boxes: structure for the crop
        x0, y0 = rng.randint(0, w - 40), rng.randint(0, h - 40)
        img[y0:y0 + 40, x0:x0 + 40] = rng.randint(0, 256, 3)
    img += rng.randn(h, w, 3) * 4
    return np.clip(img, 0, 255).astype(np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    from avtubes.core.config import OptimConfig
    from avtubes.core.export import _pipeline_fn
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.data.transforms import eval_frame_from_bytes
    from avtubes.evaluation import auc_from_ciou, ciou_single
    from avtubes.models import AVENet
    from avtubes.train.state import create_train_state

    spec_cfg = SpectrogramConfig()
    n, s = args.n, args.image_size
    state = create_train_state(
        AVENet(), jax.random.PRNGKey(args.seed),
        (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1))),
        OptimConfig())

    rng = np.random.RandomState(args.seed)
    jpegs = []
    for _ in range(n):  # request-realistic source geometry (not square)
        buf = io.BytesIO()
        Image.fromarray(synth_photo(rng, 480, 640)).save(buf, "JPEG",
                                                         quality=92)
        jpegs.append(buf.getvalue())
    waves = (rng.rand(n, spec_cfg.num_samples).astype(np.float32) * 2 - 1)
    gts = []
    for _ in range(n):
        x0, y0 = rng.randint(10, 100, 2)
        w, h = rng.randint(60, 120, 2)
        g = np.zeros((s, s), np.float32)
        g[y0:y0 + h, x0:x0 + w] = 1.0
        gts.append(g)

    t0 = time.perf_counter()
    exact = np.stack([eval_frame_from_bytes(j, s) for j in jpegs])
    t1 = time.perf_counter()
    fast = np.stack([eval_frame_from_bytes(j, s, fast=True) for j in jpegs])
    t2 = time.perf_counter()
    pix = np.abs(exact.astype(int) - fast.astype(int))

    pipeline = jax.jit(_pipeline_fn(state, spec_cfg))
    results, masks_all, heat_all = {}, {}, {}
    for name, frames in (("exact", exact), ("fast", fast)):
        masks, heat = jax.device_get(pipeline(frames, waves))
        cious = np.asarray([ciou_single(masks[i], gts[i], 0.5)
                            for i in range(n)])
        results[name] = {"ciou": float(np.mean(cious >= 0.5)),
                         "auc": auc_from_ciou(cious)}
        masks_all[name], heat_all[name] = np.asarray(masks), np.asarray(heat)

    ref, alt = results["exact"], results["fast"]
    inter = np.minimum(masks_all["fast"], masks_all["exact"]).sum((1, 2))
    union = np.maximum(masks_all["fast"], masks_all["exact"]).sum((1, 2))
    hr = heat_all["exact"].astype(np.float64).ravel()
    ha = heat_all["fast"].astype(np.float64).ravel()
    out = {
        "n": n, "image_size": s,
        "decode_ms_exact": round(1e3 * (t1 - t0) / n, 2),
        "decode_ms_fast": round(1e3 * (t2 - t1) / n, 2),
        "decode_speedup": round((t1 - t0) / (t2 - t1), 2),
        "pixel_maxdiff": int(pix.max()),
        "pixel_meandiff": round(float(pix.mean()), 4),
        "ciou_exact": round(ref["ciou"], 4), "auc_exact": round(ref["auc"], 4),
        "ciou_fast": round(alt["ciou"], 4), "auc_fast": round(alt["auc"], 4),
        "ciou_delta": round(abs(alt["ciou"] - ref["ciou"]), 4),
        "auc_delta": round(abs(alt["auc"] - ref["auc"]), 4),
        "mask_iou": round(float(np.mean(inter / np.maximum(union, 1.0))), 4),
        "heat_corr": round(float(np.corrcoef(hr, ha)[0, 1]), 5),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
