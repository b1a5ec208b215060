"""Flow-guided consistency trainer (flow.py equivalent).

Reference mechanics (`/root/reference/flow.py:127-161`): AVENet heatmaps on
consecutive frames; FlowNet2 flow between the frame pairs; heatmap[t]
warped along the flow and compared to heatmap[t+1].  In the reference the
comparison is computed but never backpropagated — only the hard-way CE
reaches backward() (`flow.py:158-160`).

Here the flow-consistency term is functional and gated by
`flow_loss_weight`: 0.0 reproduces the reference's effective objective
(CE only, warp metric logged); > 0 adds an L1 warp-consistency loss on the
*soft* Pos maps (binarized maps, which the reference warps, have no
gradient).  The flow net is our FlowNetLite (Pallas correlation inside),
trained jointly or frozen.
"""

from __future__ import annotations

import functools

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
from avtubes.losses import hardway_loss
from avtubes.models.flownet import FlowNetLite
from avtubes.ops.warp import flow_warp
from avtubes.train.hardway import build_model, build_sources
from avtubes.train.state import create_train_state
from avtubes.train.steps import pytree_group_norms
from avtubes.utils.logging import MetricLogger


@functools.partial(jax.jit,
                   static_argnames=("flow_loss_weight", "spec_cfg",
                                    "image_size", "watch", "compute_flow"),
                   donate_argnums=(0,))
def flow_fused_train_step(state, flow_variables, clips_uint8, waveforms, key,
                          spec_cfg, flow_loss_weight: float = 0.0,
                          image_size: int = 224, watch: bool = False,
                          compute_flow: bool = True):
    """Whole flow step in one program: spectrogram + augmentation + flow
    estimation + hard-way CE (+ gated warp consistency) + update."""
    from avtubes.data.spectrogram import log_spectrogram
    from avtubes.data.transforms import augment_train_batch

    spec = log_spectrogram(waveforms, spec_cfg)[..., None]
    v1, _ = augment_train_batch(key, clips_uint8, image_size)
    return flow_train_step(state, flow_variables, v1, spec, flow_loss_weight,
                           watch, compute_flow)


@functools.partial(jax.jit, static_argnames=("flow_loss_weight", "watch",
                                             "compute_flow"),
                   donate_argnums=(0,))
def flow_train_step(state, flow_variables, frames, spec,
                    flow_loss_weight: float = 0.0, watch: bool = False,
                    compute_flow: bool = True):
    """frames (B,T,H,W,3), spec (B,F,Tt,1); flow net frozen within the step.

    `compute_flow=True` matches the reference, which runs FlowNet2 and logs
    the warp-consistency probe every step even at weight 0
    (`/root/reference/flow.py:127-153`).  `compute_flow=False` is the
    TPU-native option the reference lacks: at weight 0 the flow net, the
    resize and the warp are dropped from the program entirely (the
    `warp_consistency` metric reads 0.0) — measured in
    `scripts/bench_flow_step.py`.
    """
    if flow_loss_weight > 0 and not compute_flow:
        raise ValueError("flow_loss_weight > 0 requires compute_flow=True")
    b, t = frames.shape[:2]
    frames_f = frames.reshape(b * t, *frames.shape[2:])

    if compute_flow:
        # flow between consecutive frame pairs (no grad into the flow net
        # here).  FlowNetLite is pretrained on [0,1] frames (flow_pretrain's
        # photometric loss divides by 255) — undo the ImageNet normalization
        # the AVENet input carries, or the flow net runs far outside its
        # input domain
        from avtubes.data.transforms import IMAGENET_MEAN, IMAGENET_STD

        raw = frames * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN)
        im1 = raw[:, :-1].reshape(b * (t - 1), *frames.shape[2:])
        im2 = raw[:, 1:].reshape(b * (t - 1), *frames.shape[2:])
        flow = FlowNetLite().apply(flow_variables, im1, im2)
        flow = jax.lax.stop_gradient(flow)

    def loss_fn(params):
        # audio encoded once per clip, pooled features tiled over T
        # (forward_shared_audio — same math as the reference's T-fold repeat)
        out, mut = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            frames_f, spec, train=True, mutable=["batch_stats"],
            method="forward_shared_audio",
        )
        ce = hardway_loss(out.logits)
        if compute_flow:
            pos = out.pos.reshape(b, t, *out.pos.shape[1:])      # (B,T,h,w)
            h, w = pos.shape[2:]
            # downsample the flow to heatmap resolution, rescale magnitudes
            flow_hw = jax.image.resize(
                flow, (b * (t - 1), h, w, 2), method="linear"
            ) * (h / frames.shape[2])
            prev = pos[:, :-1].reshape(b * (t - 1), h, w, 1)
            nxt = pos[:, 1:].reshape(b * (t - 1), h, w, 1)
            warped = flow_warp(prev, flow_hw)
            warp_l1 = jnp.abs(warped - nxt).mean()
        else:
            warp_l1 = jnp.asarray(0.0, jnp.float32)
        loss = ce + flow_loss_weight * warp_l1
        metrics = {"loss": loss, "hardway_loss": ce, "warp_consistency": warp_l1}
        return loss, (mut["batch_stats"], metrics)

    grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_stats)
    if watch:
        metrics.update(pytree_group_norms(grads, "grad_norm"))
        metrics.update(pytree_group_norms(state.params, "param_norm"))
    return state, metrics


def run(cfg: ExperimentConfig, steps_cap: int = 0, tag: str = "flow",
        flow_loss_weight: float = 0.0, compute_flow: bool = True) -> dict:
    d, o = cfg.data, cfg.optim
    model = build_model(cfg)
    spec_cfg = SpectrogramConfig(samplerate=d.samplerate, seconds=d.audio_seconds)

    train_src, _, _ = build_sources(cfg)
    loader = BatchLoader(train_src, o.batch_size, num_workers=d.n_threads,
                         shuffle=True, seed=cfg.train.seed)
    state = create_train_state(
        model, jax.random.PRNGKey(cfg.train.seed),
        (jnp.zeros((2, d.image_size, d.image_size, 3)),
         jnp.zeros((2, *spec_cfg.shape, 1))),
        o, max(1, len(loader)))
    start_epoch = 0
    if cfg.train.use_pretrained:
        # the reference warm-starts flow training from the trained LVS
        # localizer unconditionally (`flow.py:94-98`); here it is gated by
        # the same --use_pretrained/--pretrained_path flags as the flagship
        ckpt = cfg.train.pretrained_path or latest_checkpoint(
            cfg.train.summaries_dir, tag)
        if ckpt and str(ckpt).endswith((".pth", ".pth.tar")):
            from avtubes.core.torch_import import avenet_from_torch

            converted = avenet_from_torch(ckpt)
            state = state.replace(params=converted["params"],
                                  batch_stats=converted["batch_stats"])
            print(f"[flow] warm-started AVENet from torch checkpoint {ckpt}")
        elif ckpt:
            state, start_epoch = restore_checkpoint(ckpt, state)
            start_epoch += 1
            print(f"[flow] resumed from {ckpt} at epoch {start_epoch}")
    flow_variables = jax.jit(FlowNetLite().init)(
        jax.random.PRNGKey(cfg.train.seed + 7),
        jnp.zeros((1, d.image_size, d.image_size, 3)),
        jnp.zeros((1, d.image_size, d.image_size, 3)))
    # pretrained flow weights (the reference loads FlowNet2's checkpoint,
    # flow.py:100-107; ours come from avtubes.train.flow_pretrain)
    flow_ckpt = latest_checkpoint(cfg.train.summaries_dir, "flownet")
    if flow_ckpt:
        from avtubes.train.flow_pretrain import create_flow_state

        fstate, _ = restore_checkpoint(
            flow_ckpt, create_flow_state(jax.random.PRNGKey(0), d.image_size))
        flow_variables = {"params": fstate.params}
        print(f"[flow] loaded pretrained flow net {flow_ckpt}")
    elif flow_loss_weight > 0:
        print("[flow] WARNING: flow_loss_weight > 0 with a random-init flow "
              "net; pretrain first (python -m avtubes.cli.flow --train_flow)")

    mesh = make_data_mesh(o.batch_size)
    state = replicate(mesh, state)
    flow_variables = replicate(mesh, flow_variables)

    logger = MetricLogger(cfg.train.summaries_dir, run_name=tag)
    last: dict = {}
    guard = PreemptionGuard()  # SIGTERM/SIGINT -> checkpoint + clean exit
    watch = cfg.train.watch_every > 0  # wandb.watch parity (flow.py:124)
    for epoch in range(start_epoch, o.epochs):
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed + 4), epoch)
        step_in_epoch = 0
        for batch in device_prefetch(loader.epoch(epoch), depth=d.prefetch,
                                     put=lambda x: shard_batch(mesh, x)):
            if steps_cap and step_in_epoch >= steps_cap:
                break
            state, metrics = flow_fused_train_step(
                state, flow_variables, batch["clip"], batch["waveform"],
                jax.random.fold_in(key, step_in_epoch), spec_cfg,
                flow_loss_weight, d.image_size, watch, compute_flow)
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
        if loader.epoch_skipped:
            logger.log(step=int(state.step), epoch=epoch,
                       epoch_skipped=loader.epoch_skipped)
        if guard.preempted:
            # partial epoch: save under the previous epoch number so a
            # resume re-runs this epoch from the top
            save_checkpoint(cfg.train.summaries_dir, tag, epoch - 1, state)
            # (epoch-1 may be -1: a resume then restarts at epoch 0)
            print(f"[train] preempted during epoch {epoch}; checkpoint saved")
            break
        save_checkpoint(cfg.train.summaries_dir, tag, epoch, state)
    logger.close()
    guard.restore()
    return last
