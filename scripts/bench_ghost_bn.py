"""Ghost-BN experiment: one vmapped two-view encoder pass vs two sequential.

The round-3 train-MFU root cause (DESIGN.md "Where the train-step 56%
non-MFU goes") left one lever untried: running BOTH training views through
ONE image-encoder pass over the stacked (2, B*T, ...) views with per-view
BatchNorm statistics (ghost BN over the view axis — identical per-view
math, pinned by tests/test_two_view.py), halving the number of conv and
BN-reduction kernel launches.  This script measures it.

    python scripts/bench_ghost_bn.py [--batch 20] [--frames 16] [--group 5]

Method mirrors bench.py's bench_train_step: recipe-shape batch, G steps
scan-grouped into one program (hardway_multi_step), null-program RTT
subtracted, completion by scalar readback; each variant timed best-of-3.
Prints one JSON line per variant; the verdict goes in DESIGN.md either way.
"""

from __future__ import annotations

import argparse
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


def measure_rtt() -> float:
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--group", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from avtubes.core.config import OptimConfig
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train.state import create_train_state
    from avtubes.train.steps import hardway_multi_step

    spec_cfg = SpectrogramConfig()
    model = AVENet(dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    g, b, t = args.group, args.batch, args.frames
    clips = jax.device_put(
        rng.randint(0, 256, (g, b, t, 224, 224, 3), dtype=np.uint8))
    waves = jax.device_put(
        np.clip(rng.randn(g, b, spec_cfg.num_samples) * 0.1, -1, 1)
        .astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), g)
    rtt = measure_rtt()

    results = {}
    for ghost in (False, True):
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((2, 224, 224, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
            OptimConfig(), 1)
        state, m = hardway_multi_step(state, clips, waves, keys, spec_cfg,
                                      ghost=ghost)  # compile
        loss = float(m["loss"])
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            state, m = hardway_multi_step(state, clips, waves, keys, spec_cfg,
                                          ghost=ghost)
            float(m["loss"])
            best = min(best, time.perf_counter() - t0)
        step_ms = (best - rtt) / g * 1000.0
        name = "ghost" if ghost else "sequential"
        results[name] = step_ms
        print(json.dumps({
            "variant": name, "step_ms": round(step_ms, 1),
            "clips_per_sec": round(b / (step_ms / 1e3), 1),
            "loss": round(loss, 4), "rtt_ms": round(rtt * 1e3, 1),
            "batch": b, "frames": t, "group": g,
        }), flush=True)

    speedup = results["sequential"] / results["ghost"]
    print(json.dumps({"ghost_speedup": round(speedup, 3)}), flush=True)


if __name__ == "__main__":
    main()
