"""Bench the flow-consistency trainer step with correlation + warp LIVE.

The reference's flow driver (`/root/reference/flow.py:127-161`) runs
FlowNet2 between consecutive frames and warps heatmap[t] onto heatmap[t+1]
at its recipe shape bs=20, frame_density=16, image_size=256.  This measures
our fused equivalent (`avtubes.train.flow.flow_fused_train_step`) at that
shape with flow_loss_weight > 0, so FlowNetLite (Pallas correlation cost
volume inside), the bilinear warp, and the warp-consistency term are all on
the live path — plus the CE-only variant (weight 0.0, the reference's
effective objective) to isolate what the flow term costs.

Usage: python scripts/bench_flow_step.py [--batch 20] [--frames 16]
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
    p.add_argument("--image_size", default=256, type=int)
    p.add_argument("--reps", default=5, type=int)
    a = p.parse_args(argv)

    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import bench
    from avtubes.core.config import OptimConfig
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.models.flownet import FlowNetLite
    from avtubes.train.flow import flow_fused_train_step
    from avtubes.train.state import create_train_state

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

    def build_state():
        model = AVENet(dtype=jnp.bfloat16)
        return create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((2, s, s, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
            OptimConfig(), 1)

    flow_vars = jax.jit(FlowNetLite().init)(
        jax.random.PRNGKey(7), jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)))

    out = {"batch": b, "frames": t, "image_size": s}
    # flow_live: warp term in the objective (weight>0).  probe_only: the
    # reference's effective program at weight 0 — flow net + warp still run
    # for the logged probe (/root/reference/flow.py:127-153).  ce_only: the
    # TPU-native compute_flow=False program, flow net dropped entirely.
    for weight, cf, tag in ((0.1, True, "flow_live"),
                            (0.0, True, "probe_only"),
                            (0.0, False, "ce_only")):
        state = build_state()
        flops = bench.compiled_flops(
            flow_fused_train_step, state, flow_vars, clips, waves, key,
            spec_cfg=spec_cfg, flow_loss_weight=weight, image_size=s,
            compute_flow=cf)
        state, m = flow_fused_train_step(state, flow_vars, clips, waves, key,
                                         spec_cfg, weight, s,
                                         compute_flow=cf)
        float(m["loss"])  # compile
        holder = {"st": state}

        def run():
            holder["st"], mm = flow_fused_train_step(
                holder["st"], flow_vars, clips, waves, key, spec_cfg,
                weight, s, compute_flow=cf)
            float(mm["loss"])

        run()  # warm
        walls, cotenants = bench._rep_stats(run, a.reps)
        i = min(range(len(walls)), key=lambda j: walls[j])
        ms = (walls[i] - rtt) * 1e3
        out[f"{tag}_step_ms"] = round(ms, 1)
        out[f"{tag}_tflops_per_step"] = round(flops / 1e12, 2)
        out[f"{tag}_mfu"] = round(flops / (ms / 1e3) / peak, 3)
        out[f"{tag}_cotenant_busy_fraction"] = round(cotenants[i], 3)
    out["flow_term_overhead_ms"] = round(
        out["flow_live_step_ms"] - out["ce_only_step_ms"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
