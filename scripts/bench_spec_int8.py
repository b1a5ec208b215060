"""Measure what the opt-in spec_int8 audio transport costs in metric terms.

The spec_int8 transport (core/config.py `audio_transport`) halves the
shipped spectrogram bytes vs spec_int16 at ~8e-3 absolute quantization of
the normalized log-spectrogram — NOT parity-grade, so its metric cost must
be measured, not assumed (same policy as export_model --quant int8).

This script scores the SAME f32 model pipeline on the same synthetic boxed
eval set (the construction `core.export.validate_artifact` uses) fed with:
  a) float32 waveforms            (the parity-grade device-DFT path),
  b) spec_int16 payloads          (the default thin-link transport),
  c) spec_int8 payloads           (the opt-in thinnest-link transport),
and prints one JSON line with cIoU@0.5/AUC per transport, deltas vs (a),
pairwise mask IoU, and heatmap agreement.  Verdict goes in DESIGN.md.

    python scripts/bench_spec_int8.py [--n 64] [--image_size 224]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.core.cache import enable_compilation_cache

enable_compilation_cache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from avtubes.core.config import OptimConfig
    from avtubes.core.export import _pipeline_fn
    from avtubes.data.spectrogram import (
        SpectrogramConfig,
        log_spectrogram_np_f32,
        quantize_int8_spectrogram,
        quantize_int16_spectrogram,
    )
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
    frames = rng.randint(0, 256, (n, s, s, 3), dtype=np.uint8)
    waves = (rng.rand(n, spec_cfg.num_samples).astype(np.float32) * 2 - 1)
    gts = []
    for _ in range(n):
        x0, y0 = rng.randint(10, 100, 2)
        w, h = rng.randint(60, 120, 2)
        g = np.zeros((224, 224), np.float32)
        g[y0:y0 + h, x0:x0 + w] = 1.0
        gts.append(g)

    host_spec = np.stack([log_spectrogram_np_f32(w, spec_cfg) for w in waves])
    payloads = {
        "f32_waveform": waves,
        "spec_int16": quantize_int16_spectrogram(host_spec),
        "spec_int8": quantize_int8_spectrogram(host_spec),
    }

    pipeline = jax.jit(_pipeline_fn(state, spec_cfg))
    results, masks_all, heat_all = {}, {}, {}
    for name, payload in payloads.items():
        masks, heat = jax.device_get(pipeline(frames, payload))
        cious = np.asarray([ciou_single(masks[i], gts[i], 0.5)
                            for i in range(n)])
        results[name] = {"ciou": float(np.mean(cious >= 0.5)),
                         "auc": auc_from_ciou(cious)}
        masks_all[name], heat_all[name] = np.asarray(masks), np.asarray(heat)

    ref = results["f32_waveform"]
    out = {"n": n, "image_size": s}
    for name, r in results.items():
        out[f"ciou_{name}"] = round(r["ciou"], 4)
        out[f"auc_{name}"] = round(r["auc"], 4)
        if name != "f32_waveform":
            out[f"ciou_delta_{name}"] = round(abs(r["ciou"] - ref["ciou"]), 4)
            out[f"auc_delta_{name}"] = round(abs(r["auc"] - ref["auc"]), 4)
            inter = np.minimum(masks_all[name], masks_all["f32_waveform"]).sum((1, 2))
            union = np.maximum(masks_all[name], masks_all["f32_waveform"]).sum((1, 2))
            out[f"mask_iou_{name}"] = round(float(np.mean(inter / np.maximum(union, 1.0))), 4)
            hr = heat_all["f32_waveform"].astype(np.float64).ravel()
            ha = heat_all[name].astype(np.float64).ravel()
            out[f"heat_corr_{name}"] = round(float(np.corrcoef(hr, ha)[0, 1]), 5)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
