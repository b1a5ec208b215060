"""End-to-end avtubes lifecycle on synthetic data, no downloads needed.

Runs the full production path in one process:

  1. train   — the flagship hard-way trainer (2 steps, tiny shapes)
  2. eval    — per-epoch hard-way test happens inside the trainer
  3. export  — serialize the trained checkpoint as a serving artifact
  4. serve   — bring the artifact up over HTTP with micro-batching
  5. request — localize one synthetic frame+audio pair and print the box

Real-data equivalents of each step are in MIGRATION.md (the reference's
train_hardway.py / test.py workflow).  Tiny shapes keep this CPU-friendly:
about two minutes on a laptop core, most of it XLA compiles.

    python examples/quickstart.py [--workdir /tmp/avtubes_quickstart]
"""

import argparse
import base64
import io
import json
import struct
import sys
import threading
import urllib.request
from pathlib import Path

import numpy as np

try:  # running from a source checkout without `pip install -e .`:
    import avtubes  # noqa: F401
except ModuleNotFoundError:  # sys.path[0] is examples/, not the repo root
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

IMG, SR, SEC = 64, 2000, 1


def step(msg):
    print(f"\n=== {msg}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/avtubes_quickstart")
    a = p.parse_args(argv)
    work = Path(a.workdir)
    work.mkdir(parents=True, exist_ok=True)

    common = ["--synthetic", "--image_size", str(IMG), "--samplerate",
              str(SR), "--audio_seconds", str(SEC), "--frame_density", "2",
              "--batch_size", "2", "--epochs", "1", "--steps", "2",
              "--n_threads", "2", "--compute_dtype", "float32",
              "--summaries_dir", str(work)]

    step("1+2. train (flagship hard-way recipe, synthetic, 2 steps)")
    from avtubes.cli.train_hardway import main as train_main
    train_main(common)

    step("3. export the checkpoint as a serving artifact")
    import jax

    from avtubes.cli.export_model import main as export_main
    artifact = work / "model.avt"
    # export for the platform that will serve it (cpu on a laptop, tpu here);
    # jax.export spells the GPU platform "cuda"/"rocm" while
    # jax.default_backend() reports "gpu" — map it through
    backend = {"gpu": "cuda"}.get(jax.default_backend(), jax.default_backend())
    export_main(common + ["--out", str(artifact), "--platforms",
                          backend, "--batch", "b"])

    step("4. serve it (in-process HTTP server, micro-batched)")
    from avtubes.cli.serve import LocalizerHTTPServer, build_handler
    from avtubes.core.serving import ArtifactRunner, MicroBatcher

    runner = ArtifactRunner(artifact.read_bytes(), max_batch=2)
    runner.warmup()
    batcher = MicroBatcher(runner, window_ms=5.0)
    httpd = LocalizerHTTPServer(("127.0.0.1", 0),
                                build_handler(batcher, runner.meta, 300.0))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    print(f"serving {artifact} at {url}")

    step("5. localize one synthetic frame + audio pair")
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (IMG, IMG, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    pcm = ((rng.random(SR * SEC) * 2 - 1) * 32767).astype("<i2").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, SR, SR * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    req = urllib.request.Request(
        url + "/localize",
        data=json.dumps({"image": base64.b64encode(buf.getvalue()).decode(),
                         "audio": base64.b64encode(wav).decode()}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        resp = json.loads(r.read())
    print(f"heatmap {np.asarray(resp['heatmap']).shape}, "
          f"mask {resp['mask_shape']}, box {resp['box']}, "
          f"latency {resp['latency_ms']} ms")

    httpd.shutdown()
    httpd.server_close()
    batcher.close()
    step("done — full lifecycle OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
