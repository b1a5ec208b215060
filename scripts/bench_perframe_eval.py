"""Measure the mp4 per-frame whole-video eval path (PerFrameLabels parity).

The reference's whole-video protocol decodes `videos/<id>.mp4` with cv2 and
forwards every sampling_rate-th frame (`/root/reference/datasets/
dataloader.py:346-362`, `train_hardway.py:164-207`).  This script records
the two numbers that path is bound by on a real host:

  * host mp4 decode rate (cv2 full-video decode + eval resize/crop + WAV),
    clips/s and frames/s — pure host, no device;
  * end-to-end per-frame eval rate through `evaluate_perframe` (decode +
    fused per-clip device program + cIoU/AUC/mTC scoring), frames/s.

Usage:  python scripts/bench_perframe_eval.py [--n 16] [--frames 96]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", default=16, type=int, help="videos")
    p.add_argument("--frames", default=96, type=int, help="frames per video")
    p.add_argument("--seconds", default=10, type=int)
    p.add_argument("--reps", default=3, type=int)
    a = p.parse_args(argv)

    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from avtubes.core.config import DataConfig, OptimConfig
    from avtubes.data.pipeline import PerFrameEvalSource
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.data.synthetic import write_synthetic_dataset
    from avtubes.models import AVENet
    from avtubes.train.evaluate import evaluate_perframe
    from avtubes.train.hardway import _synthetic_gt_lookup
    from avtubes.train.state import create_train_state

    cfg = DataConfig()  # image_size 224, sampling_rate 16 — reference recipe
    spec_cfg = SpectrogramConfig(samplerate=cfg.samplerate,
                                 seconds=cfg.audio_seconds)

    with tempfile.TemporaryDirectory() as root:
        ids = write_synthetic_dataset(root, n_videos=a.n, frames=a.frames,
                                      samplerate=cfg.samplerate,
                                      seconds=a.seconds, mp4=True)
        src = PerFrameEvalSource(root, ids, cfg)

        # --- host-only: cv2 decode + eval resize/crop + WAV ---------------
        n_frames = 0
        for i in range(len(src)):  # warm page cache
            n_frames += src.load(i)["clip"].shape[0]
        host_best = 0.0
        for _ in range(a.reps):
            t0 = time.perf_counter()
            for i in range(len(src)):
                src.load(i)
            host_best = max(host_best, len(src) / (time.perf_counter() - t0))

        # --- end-to-end per-frame eval -------------------------------------
        model = AVENet(dtype=jnp.bfloat16)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((2, 224, 224, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
            OptimConfig(), 1)
        gt = _synthetic_gt_lookup()
        # scored frames per video: len(range(stride, T-1, stride))
        scored = len(range(cfg.sampling_rate, a.frames - 1, cfg.sampling_rate))
        res = evaluate_perframe(state, src, cfg, spec_cfg,
                                lambda vid, f=None: gt(vid, f))  # warm+compile
        e2e_best = 0.0
        for _ in range(a.reps):
            t0 = time.perf_counter()
            res = evaluate_perframe(state, src, cfg, spec_cfg,
                                    lambda vid, f=None: gt(vid, f))
            e2e_best = max(e2e_best, len(src) / (time.perf_counter() - t0))

    out = {
        "n_videos": a.n,
        "frames_per_video": a.frames,
        "decoded_frames_per_video": n_frames / a.n,
        "scored_frames_per_video": scored,
        "host_decode_clips_per_sec": round(host_best, 2),
        "host_decode_frames_per_sec": round(host_best * n_frames / a.n, 1),
        "e2e_eval_clips_per_sec": round(e2e_best, 2),
        "e2e_eval_scored_frames_per_sec": round(e2e_best * scored, 1),
        "test_auc_sanity": res["test_auc"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
