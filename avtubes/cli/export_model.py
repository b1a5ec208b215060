"""CLI: export a trained checkpoint as a serving artifact.

Serializes the full inference pipeline (waveform -> log-spectrogram ->
encoders -> median-threshold mask) to a batch-polymorphic StableHLO blob
(`avtubes.core.export`).  The artifact needs only jax at load time — no
model code, no checkpoint format.

Usage:
    python -m avtubes.cli.export_model --summaries_dir /ckpts \
        --out model.avt [--platforms cpu,tpu] [--batch 8] [--s2d]

`--s2d` converts the checkpoint's 7x7/s2 stems to the exact space-to-depth
equivalent (4x4/s1 over s2d(2) input) before export — same math, ~10%
faster TPU inference.

`--quant int8` exports with int8 inference convs (dynamic per-tensor
activation + per-channel weight quantization; the MXU's int8 path is 2x
its bf16 peak).  Unlike --s2d this is an approximation — pass --validate
to measure what it costs in metric terms.

`--audio_transport {float32,int16,spec_int16,spec_int8}` sets the
artifact's audio INPUT encoding (default float32 waveform): 'int16' PCM
halves request/H2D audio bytes bit-identically for 16-bit sources;
'spec_int16'/'spec_int8' take host-computed spectrogram payloads (the
training pipeline's thin-link transports — the serve CLI encodes request
WAVs automatically, and `--validate` scores the transport's quantization
cost along with everything else).

`--validate [N]` scores the written artifact against the checkpoint's f32
pipeline on an N-sample synthetic boxed eval set (default 16) and prints
the cIoU@0.5/AUC deltas plus mask/heatmap agreement as one JSON line.  If
either delta exceeds `--validate_tol` (default 0.01 = 1 pt) the CLI warns
loudly and exits 2 — the artifact stays on disk, the exit code gates CI.

Smoke:  python -m avtubes.cli.export_model --synthetic --image_size 64 \
            --summaries_dir /tmp/ckpts --out /tmp/model.avt --platforms cpu
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

from avtubes.core.checkpoint import latest_checkpoint, restore_checkpoint
from avtubes.core.config import ExperimentConfig
from avtubes.core.export import export_localizer
from avtubes.data.spectrogram import SpectrogramConfig
from avtubes.train.hardway import build_model
from avtubes.train.state import create_train_state


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    def take(flag, default=None):
        if flag in argv:
            i = argv.index(flag)
            val = argv[i + 1]
            del argv[i : i + 2]
            return val
        return default

    out = take("--out", "model.avt")
    platforms = take("--platforms")
    platforms = tuple(platforms.split(",")) if platforms else None
    batch = take("--batch", "b")
    batch = int(batch) if batch.isdigit() else batch
    quant = take("--quant")
    if quant not in (None, "int8"):
        raise SystemExit(f"--quant supports only 'int8', got {quant!r}")
    audio_transport = take("--audio_transport", "float32")
    validate_tol = float(take("--validate_tol", "0.01"))
    validate_n = 0
    if "--validate" in argv:
        i = argv.index("--validate")
        # optional numeric operand: `--validate 64` or bare `--validate`
        if i + 1 < len(argv) and argv[i + 1].isdigit():
            validate_n = int(argv[i + 1])
            del argv[i : i + 2]
        else:
            validate_n = 16
            del argv[i]
    s2d = "--s2d" in argv
    if s2d:
        argv.remove("--s2d")

    cfg = ExperimentConfig.from_args(argv)
    d = cfg.data
    spec_cfg = SpectrogramConfig(samplerate=d.samplerate, seconds=d.audio_seconds)
    model = build_model(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, d.image_size, d.image_size, 3)),
         jnp.zeros((2, *spec_cfg.shape, 1))),
        cfg.optim)

    ckpt = cfg.train.pretrained_path or latest_checkpoint(cfg.train.summaries_dir,
                                                          "hardway16")
    if ckpt:
        state, epoch = restore_checkpoint(ckpt, state)
        print(f"loaded {ckpt} (epoch {epoch})")
    else:
        print("WARNING: no checkpoint found — exporting untrained weights")

    f32_state = state  # pre-s2d/pre-quant: the checkpoint's own semantics

    if s2d:
        # exact space-to-depth stem transform (same math, ~10% faster
        # inference on TPU): convert the plain-stem checkpoint at export
        import dataclasses

        from avtubes.models.avenet import variables_to_s2d

        conv = variables_to_s2d({"params": state.params,
                                 "batch_stats": state.batch_stats})
        s2d_model = dataclasses.replace(model, s2d_stem=True)
        s2d_state = create_train_state(
            s2d_model, jax.random.PRNGKey(0),
            (jnp.zeros((2, d.image_size, d.image_size, 3)),
             jnp.zeros((2, *spec_cfg.shape, 1))),
            cfg.optim)
        state = s2d_state.replace(params=conv["params"],
                                  batch_stats=conv["batch_stats"])
        model = s2d_model
        print("converted stems to space-to-depth layout")

    if quant == "int8":
        # QuantConv shares the plain conv's parameter tree, so only the
        # apply function changes — the checkpoint's weights are reused as-is
        import dataclasses

        state = state.replace(
            apply_fn=dataclasses.replace(model, quant_int8=True).apply)
        print("exporting with int8 inference convs")

    blob = export_localizer(state, spec_cfg, batch=batch,
                            image_size=d.image_size, platforms=platforms,
                            extra_meta={"s2d": s2d, "quant": quant},
                            audio_transport=audio_transport)
    Path(out).write_bytes(blob)
    print(f"wrote {out} ({len(blob) / 1e6:.1f} MB, batch={batch}, "
          f"platforms={platforms or 'default'}, "
          f"audio_transport={audio_transport})")

    if validate_n:
        import json

        from avtubes.core.export import validate_artifact

        report = validate_artifact(f32_state, blob, spec_cfg,
                                   image_size=d.image_size, n=validate_n)
        print("validate:", json.dumps(report))
        worst = max(report["ciou_delta"], report["auc_delta"])
        if worst > validate_tol:
            print(f"WARNING: artifact deviates from the f32 pipeline by "
                  f"{worst:.4f} cIoU/AUC (> --validate_tol {validate_tol}); "
                  f"NOT serving-safe without a real-data check", flush=True)
            raise SystemExit(2)
        print(f"validate OK: max cIoU/AUC delta {worst:.4f} "
              f"<= tol {validate_tol}")


if __name__ == "__main__":
    main()
