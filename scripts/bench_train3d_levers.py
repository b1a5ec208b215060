"""Measure the known levers on the 3D tube trainer step.

VERDICT r4 item 1: the T-preserving ResNet3D (reference `resnet3D.py:138-148`,
driven by `train_3D.py:107-139` at bs=20 x 16-frame clips) is the heaviest
model in the capability set; give it the same lever treatment the 2D
flagship got.  This measures, at the recipe shape:

  * remat off vs on (backbones recomputed in backward; same math) — the
    FLOPs-for-HBM trade, with the activation-memory delta from XLA's
    compiled memory analysis;
  * f32 vs bf16 model dtype (bf16 is the default; f32 quantifies what MXU
    bf16 buys on this model).

Usage: python scripts/bench_train3d_levers.py [--batch 20] [--frames 16]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=20, type=int)
    p.add_argument("--frames", default=16, type=int)
    p.add_argument("--image_size", default=224, type=int)
    p.add_argument("--reps", default=5, type=int)
    a = p.parse_args(argv)

    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import bench
    from avtubes.core.config import OptimConfig
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import FullModel
    from avtubes.train.state import create_train_state
    from avtubes.train.steps import train3d_fused_step

    bench.wait_for_backend()
    rtt = bench.measure_rtt()
    peak = bench.device_peak_flops() or 197e12
    spec_cfg = SpectrogramConfig()
    b, t, s = a.batch, a.frames, a.image_size
    rng = np.random.RandomState(0)
    clips = jax.device_put(rng.randint(0, 256, (b, t, s, s, 3), dtype=np.uint8))
    waves = jax.device_put(
        np.clip(rng.randn(b, spec_cfg.num_samples) * 0.1, -1, 1)
        .astype(np.float32))
    key = jax.random.PRNGKey(1)

    def run_variant(tag, remat, dtype, conv3d_impl="direct"):
        model = FullModel(dtype=dtype, remat=remat, conv3d_impl=conv3d_impl)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((2, *spec_cfg.shape, 1)),
             jnp.zeros((1, 2, 64, 64, 3))),
            OptimConfig(), 1)
        lowered = jax.jit(train3d_fused_step, static_argnames=("spec_cfg",)
                          ).lower(state, clips, waves, key, spec_cfg=spec_cfg)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        try:
            mem = compiled.memory_analysis()
            temp_mb = float(mem.temp_size_in_bytes) / 1e6
        except Exception:
            temp_mb = None
        state, m = train3d_fused_step(state, clips, waves, key, spec_cfg)
        float(m["loss"])  # compile via the step's own jit + run
        holder = {"st": state}

        def run():
            holder["st"], mm = train3d_fused_step(
                holder["st"], clips, waves, key, spec_cfg)
            float(mm["loss"])

        run()  # warm
        walls, cotenants = bench._rep_stats(run, a.reps)
        i = min(range(len(walls)), key=lambda j: walls[j])
        ms = (walls[i] - rtt) * 1e3
        row = {
            "variant": tag, "step_ms": round(ms, 1),
            "step_ms_median": round((bench._median(walls) - rtt) * 1e3, 1),
            "cotenant_busy_fraction": round(cotenants[i], 3),
            "tflops_per_step": round(flops / 1e12, 2),
            "mfu": round(flops / (ms / 1e3) / peak, 3),
            "clips_per_sec": round(b / (ms / 1e3), 1),
            "temp_hbm_mb": round(temp_mb, 0) if temp_mb is not None else None,
        }
        print(json.dumps(row), flush=True)
        del holder, state
        return row

    def try_variant(*args, **kw):
        try:
            return run_variant(*args, **kw)
        except Exception as e:
            print(json.dumps({"variant": args[0],
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            return None

    def eval_variant(tag, conv3d_impl):
        # forward-only (per-frame eval program) impl comparison — no
        # backward residuals, so even the concat-hungry 'stacked' fits.
        # Same methodology as bench.py's eval3d leg: scan-amortized (3
        # iters/jit), float video, scalar-readback barrier.
        from avtubes.train.steps import eval3d_heatmap_step

        model = FullModel(dtype=jnp.bfloat16, conv3d_impl=conv3d_impl)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((2, *spec_cfg.shape, 1)),
             jnp.zeros((1, 2, 64, 64, 3))),
            OptimConfig(), 1)
        spec = jnp.zeros((b, *spec_cfg.shape, 1), jnp.float32)
        video = jax.device_put(
            (rng.rand(b, t, s, s, 3) * 2 - 1).astype(np.float32))

        @jax.jit
        def timed_eval(video, spec):
            def body(acc, i):
                h = eval3d_heatmap_step(state, video + i * 1e-6, spec)
                return acc + h[0, 0, 0, 0], None
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(3, dtype=jnp.float32))
            return acc

        float(timed_eval(video, spec))  # compile
        walls, cotenants = bench._rep_stats(
            lambda: float(timed_eval(video, spec)), a.reps)
        i = min(range(len(walls)), key=lambda j: walls[j])
        ms = (walls[i] - rtt) / 3 * 1e3
        row = {"variant": tag, "eval_ms": round(ms, 1),
               "eval_ms_median": round((bench._median(walls) - rtt) / 3 * 1e3, 1),
               "cotenant_busy_fraction": round(cotenants[i], 3),
               "clips_per_sec": round(b / (ms / 1e3), 1)}
        print(json.dumps(row), flush=True)
        return row

    try_variant("bf16", remat=False, dtype=jnp.bfloat16)
    # conv3d lowering impls (ops/conv3d.py): on the bs=20 recipe backward
    # BOTH lowerings OOM ('stacked' +4.18 GB saved concats, 'sum' +0.20 GB
    # saved sliced inputs — errors recorded below); the forward-only eval
    # program measures all three and direct Conv3D wins (DESIGN.md 3D
    # notes, negative result).
    try_variant("bf16+sum", remat=False, dtype=jnp.bfloat16,
                conv3d_impl="sum")
    try_variant("bf16+stacked+remat", remat=True, dtype=jnp.bfloat16,
                conv3d_impl="stacked")
    try_variant("bf16+remat", remat=True, dtype=jnp.bfloat16)
    try_variant("f32", remat=False, dtype=jnp.float32)
    for impl in ("direct", "stacked", "sum"):
        try:
            eval_variant(f"eval/{impl}", impl)
        except Exception as e:
            print(json.dumps({"variant": f"eval/{impl}",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
