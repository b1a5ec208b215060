"""Attribute the flagship train-step r03->r04 regression (135.5 -> ~142 ms).

BENCH_r05's per-leg noise instrumentation shows the dip is real (train-leg
co-tenant fraction ~0.01, median ~= best), so it must come from one of the
two round-4 parity changes that touched the fused step's program:

  * torchvision random per-sample color-jitter ORDER
    (`data/transforms.py:242-299` — a 4-step lax.scan over lax.switch
    branches; the previous fixed-order composition fused into fewer
    HBM passes), or
  * torch-exact BatchNorm running stats (`models/norm.py` TorchBatchNorm —
    unbiased-variance EMA + the shared-audio second-EMA advance).

This measures the recipe step (bench.py's exact G=5 scan-grouped
methodology) under 4 ablations: current, fixed jitter order, flax
BatchNorm, and both.  The ablations change ONLY the program being timed —
they are not parity-valid configurations (that's the point).

Result on record (2026-08-20, co-tenant <=0.023 on every leg):
current 142.0 ms / fixed jitter 137.2 / flax BN 139.6 / both 134.9
(= the r02/r03 number).  The dip is the price of the two parity
features, 4.8 + 2.4 ms; see DESIGN.md "The r04 train dip is attributed".
The jitter share is recoverable via the trainers' `--jitter_order fixed`.

Usage: python scripts/bench_train_attrib.py
"""

from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    import bench
    import avtubes.data.transforms as transforms
    import avtubes.models.resnet2d as resnet2d
    from avtubes.core.config import OptimConfig
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train.state import create_train_state
    from avtubes.train.steps import hardway_multi_step

    bench.wait_for_backend()
    rtt = bench.measure_rtt()
    peak = bench.device_peak_flops() or 197e12

    orig_jitter = transforms.color_jitter
    fixed_jitter = functools.partial(orig_jitter, order=(0, 1, 2, 3))
    orig_bn = resnet2d.TorchBatchNorm

    class FlaxBN(nn.BatchNorm):
        """flax BatchNorm accepting TorchBatchNorm's kwargs (biased-variance
        EMA — the pre-r04 semantics)."""

    spec_cfg = SpectrogramConfig()
    rng = np.random.RandomState(0)
    g = 5
    clips = jax.device_put(
        rng.randint(0, 256, (g, 20, 16, 224, 224, 3), dtype=np.uint8))
    waves = jax.device_put(
        np.clip(rng.randn(g, 20, spec_cfg.num_samples) * 0.1, -1, 1)
        .astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), g)

    def measure(tag):
        jax.clear_caches()
        model = AVENet(dtype=jnp.bfloat16)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((2, 224, 224, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
            OptimConfig(), 1)
        state, m = hardway_multi_step(state, clips, waves, keys, spec_cfg)
        float(m["loss"])  # compile
        holder = {"st": state}

        def run():
            holder["st"], mm = hardway_multi_step(holder["st"], clips, waves,
                                                  keys, spec_cfg)
            float(mm["loss"])

        run()  # warm
        walls, cotenants = bench._rep_stats(run, 5)
        i = min(range(len(walls)), key=lambda j: walls[j])
        row = {
            "variant": tag,
            "step_ms": round((walls[i] - rtt) / g * 1e3, 1),
            "step_ms_median": round((bench._median(walls) - rtt) / g * 1e3, 1),
            "cotenant_busy_fraction": round(cotenants[i], 3),
        }
        print(json.dumps(row), flush=True)
        del holder, state
        return row

    measure("current")

    transforms.color_jitter = fixed_jitter
    measure("fixed_jitter_order")
    transforms.color_jitter = orig_jitter

    resnet2d.TorchBatchNorm = FlaxBN
    measure("flax_bn")

    transforms.color_jitter = fixed_jitter
    measure("fixed_jitter+flax_bn")
    transforms.color_jitter = orig_jitter
    resnet2d.TorchBatchNorm = orig_bn


if __name__ == "__main__":
    main()
