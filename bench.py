"""Headline benchmark: clips/sec/chip for spectrogram + AVENet heatmap inference.

Measures the steady-state on-device pipeline the BASELINE.json metric names
("clips/sec/chip (decode+spectrogram+heatmap)"): per clip, a 10-second
22.05 kHz waveform -> log-spectrogram (DFT matmuls) -> audio encoder, one
224x224 frame -> image encoder -> 14x14 heatmap -> on-device postprocess to
a 224x224 binary mask.

Timing methodology: the device sits behind a tunnel with a ~30 ms command
round-trip, so per-dispatch wall timing is latency-bound, not compute-bound.
The pipeline is therefore run K times inside ONE jit program (lax.scan with
a per-step input perturbation so nothing hoists) and the cost of a single
dispatch is subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 2000 (the BASELINE.json north-star target; the
reference publishes no throughput numbers).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from avtubes.core.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

NORTH_STAR = 2000.0  # clips/sec/chip target from BASELINE.json
BATCH = 128
SCAN_STEPS = 10
RTT_SECONDS = 0.03   # measured axon-tunnel dispatch round trip


def build_pipeline():
    from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram
    from avtubes.evaluation.postprocess import heatmap_to_mask_batch
    from avtubes.models import AVENet

    cfg = SpectrogramConfig()
    model = AVENet(dtype=jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1)), train=False,
    ))(jax.random.PRNGKey(0))

    def clip_pipeline(frames, waveforms):
        spec = log_spectrogram(waveforms, cfg)[..., None]  # (B, 257, 431, 1)
        out = model.apply(variables, frames, spec, train=False)
        return heatmap_to_mask_batch(out.heatmap)

    @jax.jit
    def timed(frames, waves):
        def body(acc, i):
            masks = clip_pipeline(frames + i * 1e-6, waves + i * 1e-6)
            return acc + masks[0, 0, 0], None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(SCAN_STEPS, dtype=jnp.float32))
        return acc

    rng = np.random.RandomState(0)
    frames = jax.device_put(rng.rand(BATCH, 224, 224, 3).astype(np.float32))
    waves = jax.device_put(
        np.clip(rng.randn(BATCH, cfg.num_samples) * 0.1, -1, 1).astype(np.float32))
    return timed, frames, waves


def main():
    timed, frames, waves = build_pipeline()
    float(timed(frames, waves))  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        acc = float(timed(frames, waves))
    per_call = (time.perf_counter() - t0) / reps - RTT_SECONDS
    clips_per_sec = BATCH * SCAN_STEPS / per_call
    print(json.dumps({
        "metric": "clips/sec/chip (spectrogram+encode+heatmap, bf16, B=128)",
        "value": round(clips_per_sec, 1),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / NORTH_STAR, 3),
    }))


if __name__ == "__main__":
    main()
