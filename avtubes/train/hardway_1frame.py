"""Single-frame hard-way trainer (train_hardway_1frame.py equivalent).

Plain hard-way CE on the middle frame of each clip — the reference's
1-frame recipe (`train_hardway_1frame.py:104-131`: batch 3, lr 1e-6,
flickr144k config) without the stale-arity bugs (§2.11).
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
from avtubes.train.evaluate import evaluate_hardway, make_gt_lookup_auto
from avtubes.train.hardway import _synthetic_gt_lookup, build_model, build_sources
from avtubes.train.state import create_train_state
from avtubes.train.steps import hardway_1frame_fused_step
from avtubes.utils.logging import MetricLogger


def run(cfg: ExperimentConfig, steps_cap: int = 0, tag: str = "hardway1frm",
        do_eval: bool = True) -> dict:
    import dataclasses

    # force middle-frame mode in the data source
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, frame_density=1))
    d, o = cfg.data, cfg.optim
    model = build_model(cfg)
    spec_cfg = SpectrogramConfig(samplerate=d.samplerate, seconds=d.audio_seconds)

    train_src, test_src, _ = build_sources(cfg)
    loader = BatchLoader(train_src, o.batch_size, num_workers=d.n_threads,
                         shuffle=True, seed=cfg.train.seed)
    steps_per_epoch = max(1, len(loader) if steps_cap == 0 else min(len(loader), steps_cap))

    state = create_train_state(
        model, jax.random.PRNGKey(cfg.train.seed),
        (jnp.zeros((2, d.image_size, d.image_size, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
        o, steps_per_epoch)
    mesh = make_data_mesh(o.batch_size)
    state = replicate(mesh, state)

    start_epoch = 0
    if cfg.train.use_pretrained:
        ckpt = cfg.train.pretrained_path or latest_checkpoint(cfg.train.summaries_dir, tag)
        if ckpt:
            state, start_epoch = restore_checkpoint(ckpt, state)
            start_epoch += 1

    logger = MetricLogger(cfg.train.summaries_dir, run_name=tag)
    last: dict = {}
    guard = PreemptionGuard()  # SIGTERM/SIGINT -> checkpoint + clean exit
    watch = cfg.train.watch_every > 0  # wandb.watch parity (:120)
    for epoch in range(start_epoch, o.epochs):
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed + 3), epoch)
        step_in_epoch = 0
        for batch in device_prefetch(loader.epoch(epoch), depth=d.prefetch,
                                     put=lambda x: shard_batch(mesh, x)):
            if steps_cap and step_in_epoch >= steps_cap:
                break
            state, metrics = hardway_1frame_fused_step(
                state, batch["clip"][:, 0], batch["waveform"],
                jax.random.fold_in(key, step_in_epoch), spec_cfg, watch)
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
        if step_in_epoch:  # an epoch can yield zero batches
            last = {k: float(v) for k, v in metrics.items()}
        if guard.preempted:
            # partial epoch: save under the previous epoch number so a
            # resume re-runs this epoch from the top
            save_checkpoint(cfg.train.summaries_dir, tag, epoch - 1, state)
            # (epoch-1 may be -1: a resume then restarts at epoch 0)
            print(f"[train] preempted during epoch {epoch}; checkpoint saved")
            break

        if do_eval:
            test_loader = BatchLoader(test_src, batch_size=min(d.eval_batch_size, len(test_src)),
                                      num_workers=d.n_threads, shuffle=False,
                                      drop_last=False)
            gt_lookup = _synthetic_gt_lookup() if d.synthetic else make_gt_lookup_auto(d)
            em = evaluate_hardway(state, test_loader, d, spec_cfg, gt_lookup,
                                  epoch=epoch, mesh=mesh)
            last.update(em)
            logger.log(step=int(state.step), epoch=epoch, **em)

        if (epoch + 1) % cfg.train.checkpoint_every_epochs == 0:
            save_checkpoint(cfg.train.summaries_dir, tag, epoch, state)
    logger.close()
    guard.restore()
    return last
