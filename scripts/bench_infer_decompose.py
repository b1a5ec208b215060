"""Root-cause the inference pipeline's non-MFU time, stage by stage.

The B=128 inference pipeline runs at ~0.64-0.67 MFU (BENCH records).  This
script decomposes the remaining third: every stage (spectrogram, audio
tower, image tower, head+postprocess) and every LAYER GROUP of the dominant
audio tower is measured scan-amortized and compared against its own compute
roofline (XLA cost-analysis FLOPs / 197 TF/s bf16 peak) and HBM roofline
(bytes accessed / ~819 GB/s on v5e) — so the output names which ops are
MXU-bound at peak, which are bandwidth-bound, and which leave time on the
table.

It then runs the one structural experiment VERDICT r4 called for:
MXU-friendlier EVEN spatial extents for the audio tower.  The spectrogram's
odd 257x431 input makes every stage odd (65x108 -> 33x54 -> 17x27); padding
the input to 256x448 gives 64x112 -> 32x56 -> 16x28 throughout (+3.6%
FLOPs).  Throughput of both towers is measured; if padding wins, it becomes
an opt-in lever with a measured metric delta, if not, it goes on record as
a negative result and ~0.65 stands as the pipeline's bound.

Usage: python scripts/bench_infer_decompose.py [--batch 128] [--scan 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HBM_GBPS = 819e9  # v5e HBM bandwidth


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=128, type=int)
    p.add_argument("--scan", default=10, type=int)
    p.add_argument("--reps", default=5, type=int)
    a = p.parse_args(argv)

    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import bench
    from avtubes.models.resnet2d import BasicBlock, ResNet2D

    bench.wait_for_backend()
    rtt = bench.measure_rtt()
    peak = bench.device_peak_flops() or 197e12
    B, K = a.batch, a.scan
    rng = np.random.RandomState(0)

    def measure(make_program, x_shape, x_dtype=np.float32, label=""):
        """Scan-amortized ms/iter + cost-analysis flops/bytes of ONE iter."""
        x = jax.device_put(rng.rand(*x_shape).astype(x_dtype))
        fn = make_program()

        @jax.jit
        def timed(x):
            def body(acc, i):
                out = fn(x + i * jnp.asarray(1e-6, x.dtype))
                return acc + out.ravel()[0].astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, 0.0,
                                  jnp.arange(K, dtype=jnp.float32))
            return acc

        ca = jax.jit(fn).lower(x).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
        float(timed(x))  # compile
        best = min(bench._rep_stats(lambda: float(timed(x)), a.reps)[0])
        ms = (best - rtt) / K * 1e3
        mxu_ms = flops / peak * 1e3
        hbm_ms = bytes_ / HBM_GBPS * 1e3
        row = {
            "stage": label, "ms": round(ms, 3),
            "gflops": round(flops / 1e9, 1),
            "mb_accessed": round(bytes_ / 1e6, 1),
            "mxu_roofline_ms": round(mxu_ms, 3),
            "hbm_roofline_ms": round(hbm_ms, 3),
            "roofline_ms": round(max(mxu_ms, hbm_ms), 3),
            "mfu": round(flops / peak / (ms / 1e3), 3) if ms > 0 else None,
            "bound": "mxu" if mxu_ms >= hbm_ms else "hbm",
        }
        print(json.dumps(row), flush=True)
        return row

    results = []

    # ---- whole towers ------------------------------------------------------
    def tower(modal, shape, s2d=True):
        model = ResNet2D(modal=modal, dtype=jnp.bfloat16, s2d_stem=s2d)
        variables = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, 64, 64, shape[-1])), train=False)
        )(jax.random.PRNGKey(0))
        return lambda x: model.apply(variables, x, train=False)

    print("== towers ==", flush=True)
    results.append(measure(lambda: tower("audio", (B, 257, 431, 1)),
                           (B, 257, 431, 1), label="audio_tower_257x431"))
    results.append(measure(lambda: tower("vision", (B, 224, 224, 3)),
                           (B, 224, 224, 3), label="image_tower_224"))

    # ---- audio tower layer groups (same shapes as inside the tower) --------
    # s2d stem: 257x431 -> s2d pad -> 129x216x64; maxpool -> 65x108
    def stem():
        model = ResNet2D(modal="audio", dtype=jnp.bfloat16, s2d_stem=True,
                         stage_sizes=())
        variables = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, 64, 64, 1)), train=False))(jax.random.PRNGKey(0))
        return lambda x: model.apply(variables, x, train=False)

    def stage(filters, stride, in_shape):
        class _Stage(__import__("flax").linen.Module):
            @__import__("flax").linen.compact
            def __call__(self, x, train: bool = False):
                x = BasicBlock(filters=filters, stride=stride,
                               dtype=jnp.bfloat16, name="b0")(x, train=train)
                return BasicBlock(filters=filters, stride=1,
                                  dtype=jnp.bfloat16, name="b1")(x, train=train)

        model = _Stage()
        variables = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, *in_shape[1:]), jnp.bfloat16), train=False)
        )(jax.random.PRNGKey(0))
        return lambda x: model.apply(variables, x.astype(jnp.bfloat16),
                                     train=False)

    print("== audio tower stages ==", flush=True)
    results.append(measure(stem, (B, 257, 431, 1), label="aud_stem+pool"))
    shapes = {
        "aud_layer1_65x108x64": (64, 1, (B, 65, 108, 64)),
        "aud_layer2_33x54x128": (128, 2, (B, 65, 108, 64)),
        "aud_layer3_17x27x256": (256, 2, (B, 33, 54, 128)),
        "aud_layer4_17x27x512": (512, 1, (B, 17, 27, 256)),
    }
    for label, (f, s, in_shape) in shapes.items():
        results.append(measure(lambda f=f, s=s, i=in_shape: stage(f, s, i),
                               in_shape, label=label))

    # ---- spectrogram + head/postprocess (for the full budget) --------------
    from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram

    cfg = SpectrogramConfig()
    print("== other stages ==", flush=True)
    results.append(measure(
        lambda: (lambda w: log_spectrogram(w, cfg)),
        (B, cfg.num_samples), label="spectrogram"))

    from avtubes.evaluation.postprocess import heatmap_to_mask_batch

    results.append(measure(lambda: heatmap_to_mask_batch, (B, 14, 14),
                           label="postprocess_mask"))

    # ---- EXPERIMENT: even-extent audio tower --------------------------------
    # input padded 257x431 -> 256x448: every stage even
    # (128x224 -> 64x112 -> 32x56 -> 16x28), +3.6% FLOPs
    print("== experiment: even-extent audio tower (256x448 padded) ==",
          flush=True)
    even = measure(lambda: tower("audio", (B, 256, 448, 1)),
                   (B, 256, 448, 1), label="audio_tower_256x448_even")
    base = results[0]
    print(json.dumps({
        "experiment": "even_extent_padding",
        "base_ms": base["ms"], "even_ms": even["ms"],
        "speedup": round(base["ms"] / even["ms"], 3),
        "flops_ratio": round(even["gflops"] / base["gflops"], 3),
        "verdict": ("win" if even["ms"] < base["ms"] * 0.95 else
                    "neutral-or-loss"),
    }), flush=True)


if __name__ == "__main__":
    main()
