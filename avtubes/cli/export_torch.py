"""CLI: export an avtubes checkpoint as a reference-compatible torch .pth.tar.

The reverse of `--use_pretrained` torch import: weights trained here load
straight into the reference stack (`test.py:64-68` / `train_hardway.py:93`),
so its eval harness can cross-validate our numbers, or its users can
consume avtubes-trained models without switching frameworks.

Usage:
    python -m avtubes.cli.export_torch --summaries_dir /ckpts \
        --out model.pth.tar [--tag hardway16|hardway1f|tube3d] [--loose]

`--loose` skips the synthesized dead tensors (unused modal stems, fc
heads, BN counters) — the file then needs `load_state_dict(strict=False)`.

Smoke:  python -m avtubes.cli.export_torch --synthetic --image_size 64 \
            --summaries_dir /tmp/ckpts --out /tmp/model.pth.tar
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

from avtubes.core.checkpoint import latest_checkpoint, restore_checkpoint
from avtubes.core.config import ExperimentConfig
from avtubes.core.torch_export import (avenet_to_torch, fullmodel_to_torch,
                                       save_torch_checkpoint)
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

    out = take("--out", "model.pth.tar")
    tag = take("--tag", "hardway16")
    strict = "--loose" not in argv
    if not strict:
        argv.remove("--loose")
    if tag == "flow":
        raise SystemExit("--tag flow has no reference torch counterpart "
                         "(FlowNetLite replaces FlowNet2, see PARITY.md)")

    cfg = ExperimentConfig.from_args(argv)
    d = cfg.data
    spec_cfg = SpectrogramConfig(samplerate=d.samplerate, seconds=d.audio_seconds)
    if tag.startswith("tube"):
        from avtubes.models import FullModel

        model = FullModel(hardway=cfg.hardway)
        init_args = (jnp.zeros((1, *spec_cfg.shape, 1)),
                     jnp.zeros((1, 1, d.image_size, d.image_size, 3)))
    else:
        model = build_model(cfg)
        init_args = (jnp.zeros((2, d.image_size, d.image_size, 3)),
                     jnp.zeros((2, *spec_cfg.shape, 1)))
    state = create_train_state(model, jax.random.PRNGKey(0), init_args,
                               cfg.optim)

    ckpt = cfg.train.pretrained_path or latest_checkpoint(
        cfg.train.summaries_dir, tag)
    epoch = 0
    if ckpt:
        state, epoch = restore_checkpoint(ckpt, state)
        print(f"loaded {ckpt} (epoch {epoch})")
    else:
        print("WARNING: no checkpoint found — exporting untrained weights")

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    if tag.startswith("tube"):
        sd = fullmodel_to_torch(variables, strict=strict)
    else:
        sd = avenet_to_torch(variables, strict=strict)
    path = save_torch_checkpoint(Path(out), sd, epoch=epoch)
    print(f"wrote {path} ({path.stat().st_size / 1e6:.1f} MB, "
          f"{len(sd)} tensors, strict={strict})")


if __name__ == "__main__":
    main()
