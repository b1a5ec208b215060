"""Unsupervised optical-flow pretraining for FlowNetLite.

The reference's flow path loads pretrained FlowNet2 weights
(`/root/reference/flow.py:100-107`) so its flows are meaningful.  We have no
external checkpoint, so FlowNetLite is trained unsupervised on frame pairs
with the classic photometric + smoothness objective:

    flow = net(im1, im2)                     # convention: warp(im1, flow) ~ im2
    photo  = charbonnier(flow_warp(im1, flow) - im2)
    smooth = |dx flow| + |dy flow|           # first-order
    loss   = photo + smooth_weight * smooth

The convention matters: `flow_warp(x, f)[p] = x[p + f(p)]` (backward warp),
so the net learns the field that pulls im1 forward onto im2 — exactly what
`train/flow.py` needs to warp heatmap[t] onto heatmap[t+1].

Pairs come from consecutive frames of training clips (real data) or from a
translating-pattern generator (synthetic smoke/tests, where the true shift
is known and recoverable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.core.checkpoint import (
    PreemptionGuard,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from avtubes.core.config import ExperimentConfig
from avtubes.core.mesh import make_data_mesh, replicate, shard_batch
from avtubes.data.pipeline import BatchLoader
from avtubes.models.flownet import FlowNetLite
from avtubes.ops.warp import flow_warp
from avtubes.train.state import AVTrainState, make_optimizer
from avtubes.utils.logging import MetricLogger

FLOW_TAG = "flownet"


def charbonnier(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    return jnp.sqrt(x * x + eps * eps)


def smoothness_loss(flow: jnp.ndarray, image: jnp.ndarray | None = None,
                    edge_alpha: float = 0.0) -> jnp.ndarray:
    """First-order flow smoothness: mean |spatial gradient| (B,H,W,2).

    With `image` and edge_alpha > 0 the penalty is EDGE-AWARE (the standard
    unsupervised-flow form: weight exp(-alpha * |spatial image gradient|)):
    real flow fields are discontinuous exactly at object boundaries, which
    photometrically are image edges — a uniform penalty drags the flow of
    independently moving objects toward the static background (measured:
    two-object interior EPE plateaus ~25% below the zero-flow baseline
    without it), while the edge-aware form lets the field break there."""
    dy = jnp.abs(flow[:, 1:] - flow[:, :-1])
    dx = jnp.abs(flow[:, :, 1:] - flow[:, :, :-1])
    if image is not None and edge_alpha > 0.0:
        wy = jnp.exp(-edge_alpha * jnp.abs(image[:, 1:] - image[:, :-1])
                     .mean(-1, keepdims=True))
        wx = jnp.exp(-edge_alpha * jnp.abs(image[:, :, 1:] - image[:, :, :-1])
                     .mean(-1, keepdims=True))
        return (dx * wx).mean() + (dy * wy).mean()
    return dx.mean() + dy.mean()


def multiscale_photometric(im1: jnp.ndarray, im2: jnp.ndarray, flow: jnp.ndarray,
                           scales: tuple[int, ...] = (1, 2, 4, 8)) -> jnp.ndarray:
    """Photometric charbonnier at a pyramid of scales.

    The bilinear warp's gradient w.r.t. flow only sees a +-1 px neighborhood,
    so a full-resolution-only loss cannot pull the flow toward displacements
    larger than ~1 px (it plateaus — measured).  Evaluating the same loss at
    downsampled scales widens the basin: an 8 px shift is 1 px at 1/8 scale.
    """
    b, h, w, c = im1.shape
    total = charbonnier(flow_warp(im1, flow) - im2).mean()
    for s in scales[1:]:
        im1s = jax.image.resize(im1, (b, h // s, w // s, c), "linear")
        im2s = jax.image.resize(im2, (b, h // s, w // s, c), "linear")
        flows = jax.image.resize(flow, (b, h // s, w // s, 2), "linear") / s
        total = total + charbonnier(flow_warp(im1s, flows) - im2s).mean()
    return total / len(scales)


@functools.partial(jax.jit, static_argnames=("smooth_weight", "edge_alpha"),
                   donate_argnums=(0,))
def flow_pretrain_step(state: AVTrainState, im1: jnp.ndarray, im2: jnp.ndarray,
                       smooth_weight: float = 0.05, edge_alpha: float = 10.0):
    """One unsupervised step on a batch of frame pairs in [0,1], (B,H,W,3)."""

    def loss_fn(params):
        flow = state.apply_fn({"params": params}, im1, im2)
        photo = multiscale_photometric(im1, im2, flow)
        smooth = smoothness_loss(flow, image=im1, edge_alpha=edge_alpha)
        loss = photo + smooth_weight * smooth
        return loss, {"loss": loss, "photometric": photo, "smoothness": smooth}

    grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    return state, metrics


def create_flow_state(rng: jax.Array, image_size: int, learning_rate: float = 1e-4,
                      steps_per_epoch: int = 1) -> AVTrainState:
    model = FlowNetLite()
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, image_size, image_size, 3)),
        jnp.zeros((1, image_size, image_size, 3)))
    import dataclasses

    from avtubes.core.config import OptimConfig

    # constant lr: the hardway MultiStepLR milestones are denominated in
    # *hardway-recipe epochs* and have no meaning for this short
    # unsupervised pretraining (with the default steps_per_epoch=1 they
    # would decay lr 10x four times within the first 180 optimizer steps)
    tx = make_optimizer(
        dataclasses.replace(OptimConfig(), learning_rate=learning_rate,
                            weight_decay=0.0, lr_milestones=()),
        steps_per_epoch)
    return AVTrainState.create(apply_fn=model.apply, params=variables["params"],
                               tx=tx, batch_stats={})


def smooth_pattern(rng: np.random.RandomState, size: int, cells: int = 8) -> np.ndarray:
    """Band-limited random RGB pattern in [0,1] — enough spatial gradient for
    the photometric loss to localize shifts, no aliasing under translation."""
    small = rng.rand(cells, cells, 3).astype(np.float32)
    reps = size // cells
    up = np.kron(small, np.ones((reps, reps, 1), np.float32))
    # separable box blur to kill the blocky edges
    k = max(reps // 2, 1)
    kernel = np.ones(k, np.float32) / k
    for axis in (0, 1):
        up = np.apply_along_axis(
            lambda m: np.convolve(m, kernel, mode="same"), axis, up)
    return np.clip(up, 0.0, 1.0)


def translating_pairs(rng: np.random.RandomState, batch: int, size: int,
                      max_shift: int = 8) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(im1, im2, shift): im2 is im1 circularly shifted by a per-sample
    integer (dy, dx) in [-max_shift, max_shift].  Content moves by +shift, so
    the backward-warp convention implies net(im1, im2) ~ -shift."""
    im1 = np.stack([smooth_pattern(rng, size) for _ in range(batch)])
    shifts = rng.randint(-max_shift, max_shift + 1, size=(batch, 2))
    im2 = np.stack([np.roll(im1[i], (shifts[i][0], shifts[i][1]), axis=(0, 1))
                    for i in range(batch)])
    return im1, im2, shifts


def _affine_field(rng: np.random.RandomState, size: int,
                  max_angle_deg: float = 10.0, max_log_scale: float = 0.08,
                  max_shift: float = 4.0) -> np.ndarray:
    """Dense backward-warp flow (H,W,2) of a random similarity transform
    about the image center: rotation + isotropic scale + translation.

    With im2 = flow_warp(im1, g) (i.e. im2[p] = im1[p + g(p)]), the field a
    flow net trained under our convention must recover IS g — so these
    fields are usable both as training pairs and as EPE ground truth."""
    theta = np.deg2rad(rng.uniform(-max_angle_deg, max_angle_deg))
    s = np.exp(rng.uniform(-max_log_scale, max_log_scale))
    tx, ty = rng.uniform(-max_shift, max_shift, size=2)
    c, si = s * np.cos(theta), s * np.sin(theta)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cx = cy = (size - 1) / 2.0
    x0, y0 = xx - cx, yy - cy
    # g(p) = M (p - c) + c + t - p, with M = s R(theta)
    gx = (c * x0 - si * y0) + cx + tx - xx
    gy = (si * x0 + c * y0) + cy + ty - yy
    return np.stack([gx, gy], axis=-1).astype(np.float32)


def _two_object_field(rng: np.random.RandomState, size: int,
                      max_shift: float = 6.0) -> np.ndarray:
    """Piecewise-constant flow: two random rectangles moving independently
    over a static background (the multi-object case a constant-shift test
    cannot exercise).  Discontinuous at object borders by construction."""
    field = np.zeros((size, size, 2), np.float32)
    for _ in range(2):
        h = rng.randint(size // 4, size // 2)
        w = rng.randint(size // 4, size // 2)
        y = rng.randint(0, size - h)
        x = rng.randint(0, size - w)
        field[y:y + h, x:x + w] = rng.uniform(-max_shift, max_shift, size=2)
    return field


def warped_pairs(rng: np.random.RandomState, batch: int, size: int,
                 kind: str = "affine") -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(im1, im2, gt_flow): im2 = flow_warp(im1, gt) for a random
    NON-CONSTANT field — 'affine' (rotation/scale/translation) or
    'two_object' (independently moving rectangles).  gt_flow is exactly the
    field the net must output under the backward-warp convention."""
    make = _affine_field if kind == "affine" else _two_object_field
    im1 = np.stack([smooth_pattern(rng, size) for _ in range(batch)])
    gt = np.stack([make(rng, size) for _ in range(batch)])
    im2 = np.asarray(flow_warp(jnp.asarray(im1), jnp.asarray(gt)))
    return im1, im2, gt


def epe(pred: np.ndarray, gt: np.ndarray, margin: int = 4) -> float:
    """Mean endpoint error over the interior (borders excluded: the warp
    samples out of bounds there, so no estimator can be graded on them)."""
    d = np.linalg.norm(np.asarray(pred, np.float64) - gt, axis=-1)
    return float(d[:, margin:-margin, margin:-margin].mean())


def run_pretrain(cfg: ExperimentConfig, steps_cap: int = 0,
                 tag: str = FLOW_TAG, smooth_weight: float = 0.05,
                 learning_rate: float = 1e-4) -> dict:
    """Unsupervised FlowNetLite pretraining loop with checkpointing.

    Real data: consecutive-frame pairs from training clips.  Synthetic:
    translating patterns (known ground-truth shift, logged as an EPE proxy).
    """
    d, o = cfg.data, cfg.optim
    mesh = make_data_mesh(o.batch_size)
    state = create_flow_state(jax.random.PRNGKey(cfg.train.seed + 11),
                              d.image_size, learning_rate)
    state = replicate(mesh, state)

    start_epoch = 0
    if cfg.train.use_pretrained:
        ckpt = cfg.train.pretrained_path or latest_checkpoint(
            cfg.train.summaries_dir, tag)
        if ckpt:
            state, start_epoch = restore_checkpoint(ckpt, state)
            start_epoch += 1

    logger = MetricLogger(cfg.train.summaries_dir, run_name=tag)
    guard = PreemptionGuard()
    last: dict = {}
    # synthetic mode: a fixed held-out probe with known NON-CONSTANT ground
    # truth, so training reports a real EPE (not just the photometric loss)
    probe = None
    if d.synthetic:
        probe = {k: warped_pairs(np.random.RandomState(1234 + i), 4,
                                 d.image_size, kind=k)
                 for i, k in enumerate(("affine", "two_object"))}
    for epoch in range(start_epoch, o.epochs):
        if d.synthetic:
            batches = _synthetic_pair_batches(cfg, epoch, steps_cap or 50)
        else:
            batches = _clip_pair_batches(cfg, epoch)
        step_in_epoch = 0
        metrics = None
        for im1, im2 in batches:
            if steps_cap and step_in_epoch >= steps_cap:
                break
            im1, im2 = shard_batch(mesh, (jnp.asarray(im1), jnp.asarray(im2)))
            state, metrics = flow_pretrain_step(state, im1, im2, smooth_weight)
            step_in_epoch += 1
            if step_in_epoch % cfg.train.log_every == 0 or steps_cap:
                logger.log(step=int(state.step), epoch=epoch,
                           **{k: float(v) for k, v in metrics.items()})
            if guard.preempted:
                break
        if metrics is not None:  # an epoch can yield zero usable batches
            last = {k: float(v) for k, v in metrics.items()}
        if probe is not None and metrics is not None:
            apply = jax.jit(state.apply_fn)
            for kind, (p1, p2, gt) in probe.items():
                pred = np.asarray(apply({"params": state.params},
                                        jnp.asarray(p1), jnp.asarray(p2)))
                last[f"epe_{kind}"] = epe(pred, gt)
            logger.log(step=int(state.step), epoch=epoch,
                       **{k: v for k, v in last.items() if k.startswith("epe_")})
        if guard.preempted:
            save_checkpoint(cfg.train.summaries_dir, tag, epoch - 1, state)
            # (epoch-1 may be -1: a resume then restarts at epoch 0 —
            # max()ing to 0 would mark the partial epoch 0 as complete)
            print(f"[flow] preempted during epoch {epoch}; checkpoint saved")
            break
        save_checkpoint(cfg.train.summaries_dir, tag, epoch, state)
    logger.close()
    guard.restore()
    return last


def _synthetic_pair_batches(cfg: ExperimentConfig, epoch: int, steps: int):
    """Mixed-motion synthetic pairs: translations, random affine fields
    (rotation/scale), and two-object motion — so the pretrained net has seen
    non-constant flow, not just global shifts."""
    rng = np.random.RandomState(cfg.train.seed * 7919 + epoch)
    kinds = ("translate", "affine", "two_object")
    for step in range(steps):
        kind = kinds[step % len(kinds)]
        if kind == "translate":
            im1, im2, _ = translating_pairs(rng, cfg.optim.batch_size,
                                            cfg.data.image_size)
        else:
            im1, im2, _ = warped_pairs(rng, cfg.optim.batch_size,
                                       cfg.data.image_size, kind)
        yield im1, im2


def _clip_pair_batches(cfg: ExperimentConfig, epoch: int):
    """Consecutive-frame pairs from the training clips, in [0,1]."""
    from avtubes.train.hardway import build_sources

    train_src, _, _ = build_sources(cfg)
    loader = BatchLoader(train_src, cfg.optim.batch_size,
                         num_workers=cfg.data.n_threads, shuffle=True,
                         seed=cfg.train.seed)
    for batch in loader.epoch(epoch):
        clip = batch["clip"].astype(np.float32) / 255.0  # (B,T,H,W,3)
        if clip.shape[1] < 2:
            continue
        b, t = clip.shape[:2]
        im1 = clip[:, :-1].reshape(b * (t - 1), *clip.shape[2:])
        im2 = clip[:, 1:].reshape(b * (t - 1), *clip.shape[2:])
        yield im1, im2
