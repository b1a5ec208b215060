"""The flagship 16-frame hard-way trainer (train_hardway.py equivalent).

Epoch loop = {train, hard-way test, (optional) per-frame test, checkpoint},
mirroring `/root/reference/train_hardway.py:121-247` with the TPU dataflow:

  host threads decode JPEG clips + WAVs ->
  device prefetch ->
  one jit program per step: log-spectrogram (DFT matmuls) + two-view
  augmentation + both backbones + hard-way head + 4-term loss + Adam update.
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
from avtubes.data.index import load_split
from avtubes.data.pipeline import (
    BatchLoader,
    ClipTrainSource,
    HardwayTestSource,
    SyntheticSource,
    device_prefetch,
)
from avtubes.data.spectrogram import SpectrogramConfig
from avtubes.models import AVENet
from avtubes.train.evaluate import evaluate_hardway, make_gt_lookup_auto
from avtubes.train.state import create_train_state
from avtubes.train.steps import hardway_fused_train_step, hardway_multi_step
from avtubes.utils.logging import MetricLogger


def build_model(cfg: ExperimentConfig) -> AVENet:
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    return AVENet(hardway=cfg.hardway, dtype=dtype, remat=cfg.train.remat)


def build_sources(cfg: ExperimentConfig):
    d = cfg.data
    if d.synthetic:
        train_src = SyntheticSource(d, n=max(4 * cfg.optim.batch_size, 8))
        test_src = SyntheticSource(d, n=8, clip=False, seed=1)
        return train_src, test_src, len(train_src)
    from avtubes.core.distributed import data_shard

    # multi-host: each host loads its slice (None when single-process).
    # The full split is read first so every process knows the total id
    # count — the agreed steps-per-epoch derives from it (see run()).
    all_train_ids = load_split(d.metadata_dir, d.testset, "train", d.subset)
    shard = data_shard()
    train_ids = all_train_ids[shard[0]::shard[1]] if shard else all_train_ids
    test_ids = load_split(d.metadata_dir, d.testset, "test_hardway")
    train_src = ClipTrainSource(d.data_path, train_ids, d)
    test_src = HardwayTestSource(d.og_data_path or d.data_path, test_ids, d)
    return train_src, test_src, len(all_train_ids)


def run(cfg: ExperimentConfig, steps_cap: int = 0, tag: str = "hardway16",
        do_eval: bool = True) -> dict:
    d, o = cfg.data, cfg.optim
    if cfg.train.negative_pool == "device":
        # DataParallel-parity pools: contrast only within the per-device
        # slice of the (b·t) frame batch (block masking in the head)
        import dataclasses

        mesh_probe = make_data_mesh(o.batch_size)
        # batch_size is PER PROCESS while mesh.size counts GLOBAL devices:
        # the global frame batch is batch_size * process_count * t
        global_frames = (o.batch_size * jax.process_count()
                         * max(d.frame_density, 1))
        per_dev = global_frames // mesh_probe.size
        cfg = dataclasses.replace(
            cfg, hardway=dataclasses.replace(cfg.hardway, pool_block=per_dev))
    model = build_model(cfg)
    spec_cfg = SpectrogramConfig(samplerate=d.samplerate, seconds=d.audio_seconds)

    from avtubes.core.distributed import (agreed_steps_per_epoch, barrier,
                                          fixed_count_batches, host_local_state,
                                          is_primary)

    multiproc = jax.process_count() > 1
    group = max(1, cfg.train.group_steps)
    train_src, test_src, n_train_total = build_sources(cfg)
    loader = BatchLoader(train_src, o.batch_size, num_workers=d.n_threads,
                         shuffle=True, seed=cfg.train.seed)
    if multiproc:
        # every process must dispatch the same number of collective steps;
        # derive it from the split size, not the local loader (whose yield
        # varies with shard remainders and decode failures)
        steps_per_epoch = agreed_steps_per_epoch(n_train_total, o.batch_size, group)
        if steps_cap:
            # keep the multiple-of-group invariant the agreed count
            # establishes: a raw min() could leave fewer than `group`
            # batches, which never flush `pending` — zero optimizer steps.
            # A cap below group rounds UP to one full group (mirrors the
            # single-process loop, which dispatches a whole group before
            # noticing the cap).
            capped = max(group, steps_cap - steps_cap % group)
            steps_per_epoch = min(steps_per_epoch, capped)
    else:
        steps_per_epoch = max(1, len(loader) if steps_cap == 0
                              else min(len(loader), steps_cap))

    rng = jax.random.PRNGKey(cfg.train.seed)
    init_img = jnp.zeros((2, d.image_size, d.image_size, 3))
    init_aud = jnp.zeros((2, *spec_cfg.shape, 1))
    state = create_train_state(model, rng, (init_img, init_aud), o, steps_per_epoch)

    mesh = make_data_mesh(o.batch_size)
    state = replicate(mesh, state)

    start_epoch = 0
    if cfg.train.use_pretrained:
        ckpt = cfg.train.pretrained_path or latest_checkpoint(cfg.train.summaries_dir, tag)
        if ckpt and str(ckpt).endswith((".pth", ".pth.tar")):
            # reference torch checkpoint warm start (train_hardway.py:93-100)
            from avtubes.core.torch_import import avenet_from_torch

            converted = avenet_from_torch(ckpt)
            state = state.replace(params=converted["params"],
                                  batch_stats=converted["batch_stats"])
            print(f"[train] warm-started from torch checkpoint {ckpt}")
        elif ckpt:
            state, start_epoch = restore_checkpoint(ckpt, state)
            start_epoch += 1
            print(f"[train] resumed from {ckpt} at epoch {start_epoch}")

    logger = MetricLogger(cfg.train.summaries_dir, run_name=tag,
                          enabled=is_primary())
    guard = PreemptionGuard()  # SIGTERM/SIGINT -> checkpoint + clean exit
    last_metrics: dict = {}
    # wandb.watch parity (`train_hardway.py:119`): compute per-layer
    # grad/param norms inside the step program, emit them every watch_every
    # steps.  watch is static, so enabling it compiles one (slightly larger)
    # program; the norms are ~dozens of fused scalar reductions.
    watch = cfg.train.watch_every > 0
    if do_eval:
        # epoch-invariant: build the GT lookups once (make_gt_lookup_auto
        # parses the whole vggss.json / XML dir)
        gt_lookup = _synthetic_gt_lookup() if d.synthetic else make_gt_lookup_auto(d)
        pf_gt_lookup = (make_gt_lookup_auto(d, per_frame=True)
                        if not d.synthetic and d.gt_path else None)
    for epoch in range(start_epoch, o.epochs):
        aug_key = jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed + 1), epoch)
        step_in_epoch = 0
        pending: list = []
        # multi-process: yield EXACTLY the agreed batch count (recycling the
        # local shard if decode failures leave it short) so every process
        # dispatches the same collective programs
        batches = (fixed_count_batches(loader, epoch, steps_per_epoch)
                   if multiproc else loader.epoch(epoch))
        for batch in device_prefetch(batches, depth=d.prefetch,
                                     put=lambda x: shard_batch(mesh, x)):
            if steps_cap and step_in_epoch >= steps_cap:
                break
            if group == 1:
                state, metrics = hardway_fused_train_step(
                    state, batch["clip"], batch["waveform"],
                    jax.random.fold_in(aug_key, step_in_epoch), spec_cfg,
                    o.loss_weight, d.image_size, watch,
                    jitter_order=cfg.train.jitter_order)
                step_in_epoch += 1
            else:
                pending.append(batch)
                if len(pending) < group:
                    continue
                keys = jax.random.split(
                    jax.random.fold_in(aug_key, step_in_epoch), group)
                state, metrics = hardway_multi_step(
                    state,
                    jnp.stack([p["clip"] for p in pending]),
                    jnp.stack([p["waveform"] for p in pending]),
                    keys, spec_cfg, o.loss_weight, d.image_size, watch,
                    jitter_order=cfg.train.jitter_order)
                pending = []
                step_in_epoch += group
            norms = {k: v for k, v in metrics.items() if "_norm/" in k}
            metrics = {k: v for k, v in metrics.items() if "_norm/" not in k}
            if step_in_epoch % cfg.train.log_every == 0 or steps_cap:
                logger.log(step=int(state.step), epoch=epoch,
                           **{k: float(v) for k, v in metrics.items()})
            if watch and step_in_epoch % cfg.train.watch_every < group:
                logger.log(step=int(state.step), epoch=epoch,
                           **{k: float(v) for k, v in norms.items()})
            if guard.preempted and not multiproc:
                # multi-process: breaking mid-epoch on one process would
                # strand its peers inside the next collective — preemption
                # is agreed at the epoch boundary below instead
                break
        if step_in_epoch:  # an epoch can yield zero batches (all skipped)
            last_metrics = {k: float(v) for k, v in metrics.items()}
        if loader.epoch_skipped:
            logger.log(step=int(state.step), epoch=epoch,
                       epoch_skipped=loader.epoch_skipped)
        if multiproc:
            # consensus: preempt everywhere if ANY process caught a signal
            from jax.experimental import multihost_utils

            import numpy as np

            flags = multihost_utils.process_allgather(
                np.asarray([guard.preempted], np.int32))
            guard.preempted = bool(np.any(flags))
        if guard.preempted:
            # single-process breaks mid-epoch: save under the PREVIOUS epoch
            # number, resume re-runs the partial epoch from the top (epoch-1
            # may be -1: a resume then restarts at epoch 0 — max()ing to 0
            # would mark the partial epoch 0 as complete).  Multi-process
            # reaches here only at the boundary, so this epoch is complete.
            save_checkpoint(cfg.train.summaries_dir, tag,
                            epoch if multiproc else epoch - 1, state)
            print(f"[train] preempted during epoch {epoch}; checkpoint saved")
            break

        if do_eval and is_primary():
            # multi-process: the primary alone evaluates (the loaders/jits
            # here are process-local programs) with a host-local copy of the
            # replicated state; peers wait at the barrier below
            eval_state = host_local_state(state) if multiproc else state
            if isinstance(test_src, HardwayTestSource):
                # per-sample decode by default; AVTUBES_EVAL_LOADER=batched
                # opts into the one-C++-call-per-batch mode (many-core hosts)
                from avtubes.data.pipeline import make_hardway_loader

                test_loader = make_hardway_loader(
                    test_src.root, test_src.ids, d,
                    batch_size=min(d.eval_batch_size, len(test_src)),
                    num_workers=d.n_threads)
            else:
                test_loader = BatchLoader(test_src,
                                          batch_size=min(d.eval_batch_size, len(test_src)),
                                          num_workers=d.n_threads, shuffle=False,
                                          drop_last=False)
            eval_metrics = evaluate_hardway(eval_state, test_loader, d, spec_cfg,
                                            gt_lookup, epoch=epoch, logger=logger,
                                            record=cfg.train.record_qualitative,
                                            mesh=None if multiproc else mesh)
            last_metrics.update(eval_metrics)
            logger.log(step=int(state.step), epoch=epoch, **eval_metrics)

            # per-frame whole-video test block (`train_hardway.py:164-207`):
            # runs when the mp4 test videos + per-frame GT dir are present
            if not d.synthetic and d.gt_path:
                from pathlib import Path

                from avtubes.data.pipeline import PerFrameEvalSource
                from avtubes.train.evaluate import evaluate_perframe

                test_ids = load_split(d.metadata_dir, d.testset, "test")
                video_root = Path(d.data_path)
                if (video_root / "videos").exists():
                    pf_src = PerFrameEvalSource(video_root, test_ids, d)
                    pf = evaluate_perframe(
                        eval_state, pf_src, d, spec_cfg,
                        pf_gt_lookup, logger=logger,
                        record=cfg.train.record_qualitative, epoch=epoch,
                        mesh=None if multiproc else mesh)
                    last_metrics.update(pf)
                    logger.log(step=int(state.step), epoch=epoch, **pf)

        if do_eval and multiproc:
            barrier(f"avtubes_eval_ep{epoch}")  # peers wait out primary eval

        if (epoch + 1) % cfg.train.checkpoint_every_epochs == 0:
            save_checkpoint(cfg.train.summaries_dir, tag, epoch, state)

    logger.close()
    guard.restore()
    last_metrics["skipped_samples"] = loader.skipped
    return last_metrics


def _synthetic_gt_lookup():
    """Center-box GT for synthetic smoke runs (matches synthetic.py's XML box)."""
    import numpy as np

    gt = np.zeros((224, 224))
    lo, hi = int(224 * 64 / 256), int(224 * 192 / 256)
    gt[lo:hi, lo:hi] = 1.0
    return lambda vid, frame=None: gt
