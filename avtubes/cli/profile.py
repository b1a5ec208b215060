"""CLI: capture a device profiler trace of training / inference steps.

The reference has no profiler at all (SURVEY §5 — its observability is
print statements); this is the TPU-native equivalent of "nsys on the train
loop": N warm steps under `jax.profiler.trace`, plus a per-step wall
breakdown, written to a TensorBoard-profile-compatible log dir.

    python -m avtubes.cli.profile --mode train --steps 5 \
        --batch_size 20 --logdir /tmp/avtubes_trace
    python -m avtubes.cli.profile --mode infer --steps 5 --batch_size 128

View with: tensorboard --logdir <logdir>  (profile plugin), or inspect the
printed per-step timings directly.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="train",
                   choices=["train", "infer", "train3d"])
    p.add_argument("--steps", default=5, type=int)
    p.add_argument("--batch_size", default=0, type=int,
                   help="0 = mode default (train 20, infer 128)")
    p.add_argument("--image_size", default=224, type=int)
    p.add_argument("--frame_density", default=16, type=int)
    p.add_argument("--samplerate", default=22050, type=int)
    p.add_argument("--audio_seconds", default=10, type=int)
    p.add_argument("--logdir", default="/tmp/avtubes_trace", type=str)
    p.add_argument("--quant", default="", choices=["", "int8"],
                   help="infer mode only: int8 QuantConv backbones")
    a = p.parse_args(argv)

    from avtubes.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.utils.debug import trace

    spec_cfg = SpectrogramConfig(samplerate=a.samplerate,
                                 seconds=a.audio_seconds)
    rng = np.random.RandomState(0)

    if a.mode == "train":
        from avtubes.core.config import OptimConfig
        from avtubes.models import AVENet
        from avtubes.train.state import create_train_state
        from avtubes.train.steps import hardway_fused_train_step

        b = a.batch_size or 20
        model = AVENet(dtype=jnp.bfloat16)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((2, a.image_size, a.image_size, 3)),
             jnp.zeros((2, *spec_cfg.shape, 1))),
            OptimConfig(), 1)
        clips = jax.device_put(rng.randint(
            0, 256, (b, a.frame_density, a.image_size, a.image_size, 3),
            dtype=np.uint8))
        waves = jax.device_put(np.clip(
            rng.randn(b, spec_cfg.num_samples) * 0.1, -1, 1).astype(np.float32))

        def step(st, i):
            st, m = hardway_fused_train_step(
                st, clips, waves, jax.random.PRNGKey(i), spec_cfg,
                0.1, a.image_size)
            return st, m

        state, m = step(state, 0)  # compile
        float(m["loss"])
        holder = {"st": state}  # the step donates its state — rebind each call

        def run(i):
            holder["st"], m = step(holder["st"], i)
            return m["loss"]
    elif a.mode == "train3d":
        # the 3D tube recipe step (train_3D.py: bs=20 x 16-frame clips)
        from avtubes.core.config import OptimConfig
        from avtubes.models import FullModel
        from avtubes.train.state import create_train_state
        from avtubes.train.steps import train3d_fused_step

        b = a.batch_size or 20
        model = FullModel(dtype=jnp.bfloat16)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((2, *spec_cfg.shape, 1)),
             jnp.zeros((1, 2, 64, 64, 3))),
            OptimConfig(), 1)
        clips = jax.device_put(rng.randint(
            0, 256, (b, a.frame_density, a.image_size, a.image_size, 3),
            dtype=np.uint8))
        waves = jax.device_put(np.clip(
            rng.randn(b, spec_cfg.num_samples) * 0.1, -1, 1).astype(np.float32))

        def step(st, i):
            st, m = train3d_fused_step(st, clips, waves, jax.random.PRNGKey(i),
                                       spec_cfg, a.image_size)
            return st, m

        state, m = step(state, 0)  # compile
        float(m["loss"])
        holder = {"st": state}

        def run(i):
            holder["st"], m = step(holder["st"], i)
            return m["loss"]
    else:
        from avtubes.models import AVENet
        from avtubes.data.spectrogram import log_spectrogram
        from avtubes.data.transforms import normalize_imagenet
        from avtubes.evaluation.postprocess import heatmap_to_mask_batch

        b = a.batch_size or 128
        model = AVENet(dtype=jnp.bfloat16, s2d_stem=True,
                       quant_int8=(a.quant == "int8"))
        variables = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1)),
            train=False))(jax.random.PRNGKey(0))

        @jax.jit
        def infer(frames_u8, waves):
            spec = log_spectrogram(waves, spec_cfg)[..., None]
            out = model.apply(variables, normalize_imagenet(frames_u8), spec,
                              train=False)
            return heatmap_to_mask_batch(out.heatmap)

        frames = jax.device_put(rng.randint(
            0, 256, (b, a.image_size, a.image_size, 3), dtype=np.uint8))
        waves = jax.device_put(np.clip(
            rng.randn(b, spec_cfg.num_samples) * 0.1, -1, 1).astype(np.float32))
        masks = infer(frames, waves)  # compile
        float(masks[0, 0, 0])
        run = lambda i: infer(frames, waves)[0, 0, 0]

    # profiled region: N steps, each completed via scalar readback
    times = []
    with trace(a.logdir) as logdir:
        for i in range(a.steps):
            t0 = time.perf_counter()
            float(run(i + 1))
            times.append(time.perf_counter() - t0)
    for i, dt in enumerate(times):
        print(f"step {i}: {dt * 1e3:.1f} ms")
    med = sorted(times)[len(times) // 2]
    print(f"median: {med * 1e3:.1f} ms/step ({b / med:.1f} clips/s, "
          "dispatch RTT included — see bench.py for amortized numbers)")
    print(f"trace written to {logdir} (view: tensorboard --logdir {logdir})")
    return times


if __name__ == "__main__":
    main()
