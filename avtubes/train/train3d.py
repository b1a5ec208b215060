"""3D tube trainer (train_3D.py equivalent): FullModel over 16-frame clips.

Epoch loop = {train (hard-way CE over (b·t), NP-ratio logged), per-frame
whole-video test (cIoU/AUC/mTC, all sampled frames forwarded as ONE clip —
the reference's batched-eval trick, `train_3D.py:152-154`), checkpoint} —
mirroring the working-path semantics of `/root/reference/train_3D.py:83-267`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from avtubes.core.checkpoint import (
    PreemptionGuard,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from avtubes.core.config import ExperimentConfig
from avtubes.core.mesh import make_data_mesh, replicate, shard_batch
from avtubes.data.pipeline import BatchLoader, device_prefetch
from avtubes.data.spectrogram import SpectrogramConfig
from avtubes.models import FullModel
from avtubes.train.hardway import build_sources
from avtubes.train.state import create_train_state
from avtubes.train.steps import train3d_fused_step
from avtubes.utils.logging import MetricLogger


def run(cfg: ExperimentConfig, steps_cap: int = 0, tag: str = "tube3d",
        do_eval: bool = True) -> dict:
    d, o = cfg.data, cfg.optim
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    model = FullModel(hardway=cfg.hardway, dtype=dtype, remat=cfg.train.remat,
                      conv3d_impl=cfg.train.conv3d_impl)
    spec_cfg = SpectrogramConfig(samplerate=d.samplerate, seconds=d.audio_seconds)

    train_src, _, _ = build_sources(cfg)
    loader = BatchLoader(train_src, o.batch_size, num_workers=d.n_threads,
                         shuffle=True, seed=cfg.train.seed)
    steps_per_epoch = max(1, len(loader) if steps_cap == 0 else min(len(loader), steps_cap))

    t = max(d.frame_density, 1)
    init_video = jnp.zeros((1, t, d.image_size, d.image_size, 3))
    init_audio = jnp.zeros((t, *spec_cfg.shape, 1))
    state = create_train_state(model, jax.random.PRNGKey(cfg.train.seed),
                               (init_audio, init_video), o, steps_per_epoch)
    mesh = make_data_mesh(o.batch_size)
    state = replicate(mesh, state)

    start_epoch = 0
    if cfg.train.use_pretrained:
        ckpt = cfg.train.pretrained_path or latest_checkpoint(cfg.train.summaries_dir, tag)
        if ckpt and str(ckpt).endswith((".pth", ".pth.tar")):
            # Kinetics r3d18 / reference FullModel torch warm start
            # (train_3D.py:89 loads pretrained/r3d18_KM_200ep.pth)
            from avtubes.core.torch_import import fullmodel_from_torch

            converted = fullmodel_from_torch(ckpt)
            params = dict(state.params)
            stats = dict(state.batch_stats)
            for net in ("vidnet", "audnet"):
                if converted["params"].get(net):
                    params[net] = converted["params"][net]
                    stats[net] = converted["batch_stats"][net]
            state = state.replace(params=params, batch_stats=stats)
            print(f"[train3d] warm-started from torch checkpoint {ckpt}")
        elif ckpt:
            state, start_epoch = restore_checkpoint(ckpt, state)
            start_epoch += 1

    logger = MetricLogger(cfg.train.summaries_dir, run_name=tag)
    last: dict = {}
    guard = PreemptionGuard()  # SIGTERM/SIGINT -> checkpoint + clean exit

    # per-epoch per-frame whole-video test setup (`train_3D.py:146-186`) —
    # epoch-invariant, built once (the GT lookup parses the whole XML dir)
    pf_src = None
    gt_lookup = None
    if do_eval:
        from avtubes.train.evaluate import make_gt_lookup_auto
        from avtubes.train.hardway import _synthetic_gt_lookup

        pf_cfg = d
        if d.synthetic:
            import dataclasses

            from avtubes.data.pipeline import SyntheticSource

            # synthetic clips are frame_density long; a stride-16 eval over a
            # 2-frame clip scores nothing (NaN) — use stride 1 over >=4 frames
            # so the smoke exercises the real cIoU/AUC/mTC math
            pf_cfg = dataclasses.replace(d, sampling_rate=1,
                                         frame_density=max(d.frame_density, 4))
            pf_src = SyntheticSource(pf_cfg, n=4, clip=True, seed=1)
            gt_lookup = _synthetic_gt_lookup()
        elif d.gt_path:
            from pathlib import Path

            from avtubes.data.index import load_split
            from avtubes.data.pipeline import PerFrameEvalSource

            if (Path(d.data_path) / "videos").exists():
                test_ids = load_split(d.metadata_dir, d.testset, "test")
                pf_src = PerFrameEvalSource(Path(d.data_path), test_ids, d)
                gt_lookup = make_gt_lookup_auto(d, per_frame=True)

    watch = cfg.train.watch_every > 0  # wandb.watch parity (train_3D.py:120)
    for epoch in range(start_epoch, o.epochs):
        aug_key = jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed + 2), epoch)
        step_in_epoch = 0
        for batch in device_prefetch(loader.epoch(epoch), depth=d.prefetch,
                                     put=lambda x: shard_batch(mesh, x)):
            if steps_cap and step_in_epoch >= steps_cap:
                break
            state, metrics = train3d_fused_step(
                state, batch["clip"], batch["waveform"],
                jax.random.fold_in(aug_key, step_in_epoch), spec_cfg,
                d.image_size, watch)
            step_in_epoch += 1
            norms = {k: v for k, v in metrics.items() if "_norm/" in k}
            metrics = {k: v for k, v in metrics.items() if "_norm/" not in k}
            if step_in_epoch % cfg.train.log_every == 0 or steps_cap:
                logger.log(step=int(state.step), epoch=epoch,
                           **{k: float(v) for k, v in metrics.items()})
            if watch and step_in_epoch % cfg.train.watch_every == 0:
                logger.log(step=int(state.step), epoch=epoch,
                           **{k: float(v) for k, v in norms.items()})
            if guard.preempted:
                break
        if step_in_epoch:  # an epoch can yield zero batches (all skipped)
            last = {k: float(v) for k, v in metrics.items()}
        if loader.epoch_skipped:
            logger.log(step=int(state.step), epoch=epoch,
                       epoch_skipped=loader.epoch_skipped)
        if guard.preempted:
            # partial epoch: save under the previous epoch number so a
            # resume re-runs this epoch from the top
            save_checkpoint(cfg.train.summaries_dir, tag, epoch - 1, state)
            # (epoch-1 may be -1: a resume then restarts at epoch 0 —
            # max()ing to 0 would mark the partial epoch 0 as complete)
            print(f"[train] preempted during epoch {epoch}; checkpoint saved")
            break

        if do_eval:
            # per-epoch per-frame whole-video test (`train_3D.py:146-186`)
            from avtubes.train.evaluate import evaluate_perframe

            if pf_src is not None:
                pf = evaluate_perframe(state, pf_src, pf_cfg, spec_cfg, gt_lookup,
                                       model_kind="3d", logger=logger,
                                       record=cfg.train.record_qualitative,
                                       epoch=epoch)
                last.update(pf)
                logger.log(step=int(state.step), epoch=epoch, **pf)

        if (epoch + 1) % cfg.train.checkpoint_every_epochs == 0:
            save_checkpoint(cfg.train.summaries_dir, tag, epoch, state)
    logger.close()
    guard.restore()
    return last
