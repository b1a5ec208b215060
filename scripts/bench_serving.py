"""Serving-performance record: drive the micro-batched HTTP endpoint.

Measures what DESIGN.md claims about the serving runtime — that request
micro-batching amortizes the per-call dispatch round trip — with real
numbers: p50/p99 latency and throughput at concurrency 1/8/64, with the
micro-batcher ON (window 5 ms, max_batch 64) and OFF (max_batch 1, every
request its own device call).  The server runs in-process (quickstart
pattern) with a real-geometry artifact (224x224, 10 s 22.05 kHz audio)
exported from a fresh init — weights do not affect timing.

    python scripts/bench_serving.py [--concurrency 1,8,64] [--requests 64]

Prints one JSON line per (mode, concurrency) level; paste into DESIGN.md.
NOTE: client threads, HTTP server threads, and request decode share this
host's single core — the numbers bound the HOST-side serving stack; the
device-side cost per clip is ~15 us at bf16 B=128 (bench.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.core.cache import enable_compilation_cache

enable_compilation_cache()


def build_artifact(audio_transport: str = "float32",
                   quant: bool = False) -> bytes:
    import dataclasses

    from avtubes.core.config import ExperimentConfig
    from avtubes.core.export import export_localizer
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.models.avenet import variables_to_s2d
    from avtubes.train.state import create_train_state

    cfg = ExperimentConfig()
    spec_cfg = SpectrogramConfig()
    model = AVENet(s2d_stem=True, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, 224, 224, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
        cfg.optim)
    if quant:  # int8 inference convs, same parameter tree (export_model
        state = state.replace(  # --quant int8 wiring)
            apply_fn=dataclasses.replace(model, quant_int8=True).apply)
    backend = {"gpu": "cuda"}.get(jax.default_backend(), jax.default_backend())
    return export_localizer(state, spec_cfg, image_size=224,
                            platforms=(backend,),
                            extra_meta={"s2d": True,
                                        "quant": "int8" if quant else None},
                            audio_transport=audio_transport)


def serve(blob: bytes, max_batch: int, window_ms: float,
          fast_decode: bool = False):
    from avtubes.cli.serve import LocalizerHTTPServer, build_handler
    from avtubes.core.serving import ArtifactRunner, MicroBatcher

    runner = ArtifactRunner(blob, max_batch=max_batch)
    runner.warmup()
    batcher = MicroBatcher(runner, window_ms=window_ms)
    handler = build_handler(batcher, runner.meta, 300.0,
                            fast_decode=fast_decode)
    handler.log_message = lambda *a, **k: None  # keep stdout to result lines
    httpd = LocalizerHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    return httpd, batcher, url


def main():
    from avtubes.tools.loadtest import _get_json, run_level, synth_payload

    p = argparse.ArgumentParser()
    p.add_argument("--concurrency", default="1,8,64")
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--payloads", type=int, default=8)
    p.add_argument("--audio_transport", default="float32",
                   choices=["float32", "int16", "spec_int16", "spec_int8"],
                   help="the artifact's audio input encoding: what the "
                        "handler threads ship to the device per request "
                        "(requests themselves are always WAV/PCM)")
    p.add_argument("--fast_decode", action="store_true",
                   help="serve with the native DCT-scaled JPEG request "
                        "decode (cli/serve.py --fast_decode)")
    p.add_argument("--quant", action="store_true",
                   help="export the artifact with int8 inference convs "
                        "(export_model --quant int8)")
    p.add_argument("--source_size", default=None,
                   help="HxW of the encoded request images (default: "
                        "224x224 pre-cropped; pass e.g. 480x640 for "
                        "camera-geometry requests where the server's "
                        "resize path actually runs)")
    args = p.parse_args()
    levels = [int(c) for c in args.concurrency.split(",")]

    blob = build_artifact(args.audio_transport, quant=args.quant)
    rng = np.random.default_rng(0)
    source_hw = (tuple(int(v) for v in args.source_size.split("x"))
                 if args.source_size else None)
    payloads = [synth_payload(rng, 224, 22050, 10, source_hw=source_hw)
                for _ in range(args.payloads)]

    results = []
    for mode, max_batch, window in (("microbatch", 64, 5.0),
                                    ("no_batching", 1, 0.0)):
        httpd, batcher, url = serve(blob, max_batch, window,
                                    fast_decode=args.fast_decode)
        try:
            for level in levels:
                body = [payloads[i % len(payloads)]
                        for i in range(args.requests)]
                r = run_level(url, body, level, timeout_s=300.0)
                r["mode"] = mode
                r["audio_transport"] = args.audio_transport
                r["fast_decode"] = args.fast_decode
                r["quant"] = args.quant
                r["source_size"] = args.source_size or "224x224"
                r["server_stats"] = _get_json(url + "/stats")
                results.append(r)
                print(json.dumps(r), flush=True)
        finally:
            batcher.close()
            httpd.shutdown()
    return results


if __name__ == "__main__":
    main()
