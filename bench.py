"""Headline benchmark: clips/sec/chip for spectrogram + AVENet heatmap inference.

Measures the steady-state on-device pipeline the BASELINE.json metric names
("clips/sec/chip (decode+spectrogram+heatmap)"): per clip, a 10-second
22.05 kHz waveform -> log-spectrogram (DFT matmuls) -> audio encoder, one
224x224 frame -> image encoder -> 14x14 heatmap -> on-device postprocess to
a 224x224 binary mask.  Host JPEG decode is benchmarked separately by the
pipeline tools; the north-star target (>=2000 clips/s/chip) is the device
path measured here.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 2000 (the BASELINE.json north-star target; the
reference publishes no throughput numbers).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 2000.0  # clips/sec/chip target from BASELINE.json


def build_pipeline(batch: int):
    from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram
    from avtubes.evaluation.postprocess import heatmap_to_mask_batch
    from avtubes.models import AVENet

    cfg = SpectrogramConfig()
    model = AVENet(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1)), train=False,
    )

    @jax.jit
    def clip_pipeline(frames, waveforms):
        spec = log_spectrogram(waveforms, cfg)[..., None]  # (B, 257, 431, 1)
        out = model.apply(variables, frames, spec, train=False)
        return heatmap_to_mask_batch(out.heatmap)

    rng = np.random.RandomState(0)
    frames = jax.device_put(rng.rand(batch, 224, 224, 3).astype(np.float32))
    waves = jax.device_put(
        np.clip(rng.randn(batch, cfg.num_samples) * 0.1, -1, 1).astype(np.float32)
    )
    return clip_pipeline, frames, waves


def main():
    batch = 128
    pipeline, frames, waves = build_pipeline(batch)
    pipeline(frames, waves).block_until_ready()  # compile
    # steady state
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(frames, waves)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    clips_per_sec = batch / dt
    print(json.dumps({
        "metric": "clips/sec/chip (spectrogram+encode+heatmap, bf16, B=128)",
        "value": round(clips_per_sec, 1),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / NORTH_STAR, 3),
    }))


if __name__ == "__main__":
    main()
