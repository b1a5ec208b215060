"""Jitted training/eval steps.

`hardway_train_step` reproduces the flagship 4-term objective of
`/root/reference/train_hardway.py:125-145`:

    hardway  = CE(logits_clean, 0)       * loss_weight
    aug      = CE(logits_augmented, 0)   * loss_weight
    l2       = MSE(weighted_clean, weighted_aug) * (100 - loss_weight)
    prop     = PropagationLoss(weighted_clean as (B,T,14,14))
             + PropagationLoss(weighted_aug  as (B,T,14,14))
    combined = (hardway + aug)/2 + l2 + prop

on 16-frame clips flattened to the batch axis ((b t) folding,
`train_hardway.py:128-131`), with the spectrogram repeated per frame.

The two forward passes share parameters; BatchNorm running stats are
updated by the clean pass and then by the augmented pass, in that order,
matching the reference's sequential `model(...)` calls.  The audio tower
(encoded once on the shared spectrograms) gets its second reference-parity
EMA advance in closed form (`_advance_audio_stats`).

TPU notes: the whole step is one jit program — both backbones, the
pairwise-similarity matmul, the four losses, and the Adam update fuse into
a single XLA executable.  Under a data-sharded mesh the (b t) batch axis is
the sharded axis; XLA inserts psum for the gradient all-reduce and the
all-gather implied by the cross-batch A0 matmul (global negative pool).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from avtubes.losses import consistency_l2, hardway_loss, propagation_loss
from avtubes.train.state import AVTrainState


def _fold_time(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, ...) -> (B*T, ...)."""
    return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])


def _advance_audio_stats(old_stats, new_stats, momentum: float = 0.9):
    """Advance the audnet BN running stats one extra EMA step.

    Reference parity: `train_hardway.py:132-133` forwards the model twice
    per step (once per view) on the SAME audio batch, so torch's audio-tower
    BN running stats advance TWO EMA steps per training step.
    `two_view_forward` encodes the shared audio once (one EMA step) — same
    trajectory, fewer FLOPs — so the second EMA step is composed here in
    closed form.  With the same batch statistic x in both updates:

        new  = m*old + (1-m)*x
        next = m*new + (1-m)*x = (1+m)*new - m*old

    Exact for whatever statistic the BN layer stored (biased or unbiased
    variance alike); imgnet already updates twice (two image forwards).
    """
    m = momentum
    aud2 = jax.tree_util.tree_map(
        lambda n, o: (1.0 + m) * n - m * o,
        new_stats["audnet"], old_stats["audnet"])
    return {**new_stats, "audnet": aud2}


def pytree_group_norms(tree, prefix: str, depth: int = 2) -> dict[str, jnp.ndarray]:
    """Per-module L2 norms of a params/grads pytree, grouped `depth` levels
    deep (e.g. ``grad_norm/imgnet/layer1_block0``) — the scalar equivalent of
    the reference's `wandb.watch(model, log="all")` gradient/parameter
    histograms (`/root/reference/train_hardway.py:119`).  All reductions fuse
    into the step program; cost is ~a few dozen tiny scalars."""
    out: dict[str, jnp.ndarray] = {}

    def rec(node, path):
        if isinstance(node, dict) and len(path) < depth:
            for k, v in node.items():
                rec(v, path + (k,))
        else:
            sq = sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                     for l in jax.tree_util.tree_leaves(node))
            out["/".join((prefix,) + path)] = jnp.sqrt(sq)

    rec(tree, ())
    return out


@functools.partial(jax.jit, static_argnames=("loss_weight", "watch"),
                   donate_argnums=(0,))
def hardway_train_step(
    state: AVTrainState,
    frames: jnp.ndarray,      # (B, T, H, W, 3) clean view
    augmented: jnp.ndarray,   # (B, T, H, W, 3) aggressive-augment view
    spec: jnp.ndarray,        # (B, F, Tt, 1) per-clip log-spectrogram
    loss_weight: float = 0.1,
    watch: bool = False,      # add per-layer grad/param norms to metrics
) -> tuple[AVTrainState, dict[str, jnp.ndarray]]:
    b, t = frames.shape[:2]
    frames_f = _fold_time(frames)
    augmented_f = _fold_time(augmented)

    def loss_fn(params):
        (out, out2), mut2 = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            frames_f, augmented_f, spec, t, train=True,
            mutable=["batch_stats"], method="two_view_forward",
        )
        hw = hardway_loss(out.logits) * loss_weight
        aug = hardway_loss(out2.logits) * loss_weight
        l2 = consistency_l2(out.weighted_map, out2.weighted_map) * (100.0 - loss_weight)
        att1 = out.weighted_map.reshape(b, t, *out.weighted_map.shape[1:])
        att2 = out2.weighted_map.reshape(b, t, *out2.weighted_map.shape[1:])
        prop = propagation_loss(att1) + propagation_loss(att2)
        combined = (hw + aug) / 2.0 + l2 + prop
        metrics = {
            "loss": combined, "hardway_loss": hw, "aug_loss": aug,
            "l2_loss": l2, "consistency_loss": prop,
        }
        return combined, (mut2["batch_stats"], metrics)

    old_stats = state.batch_stats
    grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(
        batch_stats=_advance_audio_stats(old_stats, new_stats))
    if watch:
        metrics.update(pytree_group_norms(grads, "grad_norm"))
        metrics.update(pytree_group_norms(state.params, "param_norm"))
    return state, metrics


@functools.partial(jax.jit, static_argnames=("loss_weight", "watch"),
                   donate_argnums=(0,))
def hardway_train_step_ghost(
    state: AVTrainState,
    frames: jnp.ndarray,      # (B, T, H, W, 3) clean view
    augmented: jnp.ndarray,   # (B, T, H, W, 3) aggressive-augment view
    spec: jnp.ndarray,        # (B, F, Tt, 1) per-clip log-spectrogram
    loss_weight: float = 0.1,
    watch: bool = False,
) -> tuple[AVTrainState, dict[str, jnp.ndarray]]:
    """`hardway_train_step` with both image views through ONE vmapped
    encoder pass — ghost BatchNorm over the view axis.

    ``jax.vmap`` over the view axis computes BN batch statistics per view
    (vmap maps the reduction per slice), so the normalization math is
    IDENTICAL to the sequential two-pass step; the convs lower to a single
    batch-2N conv per layer instead of two batch-N launches.  Both views'
    running-stat updates come out computed from the same pre-step stats
    s0 (n_i = m*s0 + (1-m)*x_i); the reference's sequential semantics
    (`train_hardway.py:132-133`: view-1 update then view-2 update) is
    recomposed in closed form:

        s2 = m*(m*s0 + (1-m)*x1) + (1-m)*x2 = m*n1 + n2 - m*s0

    Equality with the sequential step is pinned by
    tests/test_two_view.py; the measured step time vs the sequential pass
    is recorded in DESIGN.md.
    """
    b, t = frames.shape[:2]
    frames_f = _fold_time(frames)
    augmented_f = _fold_time(augmented)
    m = 0.9  # TorchBatchNorm momentum (torch BatchNorm2d default 0.1)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        aud, aud_mut = state.apply_fn(
            variables, spec, True, mutable=["batch_stats"],
            method="encode_audio")
        aud_f = jnp.repeat(aud, t, axis=0)

        views = jnp.stack([frames_f, augmented_f])  # (2, B*T, H, W, 3)

        def enc(v):
            feats, mut = state.apply_fn(
                variables, v, True, mutable=["batch_stats"],
                method="encode_image")
            return feats, mut["batch_stats"]["imgnet"]

        img_both, img_stats_both = jax.vmap(enc)(views)
        out = state.apply_fn(variables, img_both[0], aud_f, method="head")
        out2 = state.apply_fn(variables, img_both[1], aud_f, method="head")

        hw = hardway_loss(out.logits) * loss_weight
        aug = hardway_loss(out2.logits) * loss_weight
        l2 = consistency_l2(out.weighted_map, out2.weighted_map) * (100.0 - loss_weight)
        att1 = out.weighted_map.reshape(b, t, *out.weighted_map.shape[1:])
        att2 = out2.weighted_map.reshape(b, t, *out2.weighted_map.shape[1:])
        prop = propagation_loss(att1) + propagation_loss(att2)
        combined = (hw + aug) / 2.0 + l2 + prop
        metrics = {
            "loss": combined, "hardway_loss": hw, "aug_loss": aug,
            "l2_loss": l2, "consistency_loss": prop,
        }
        # sequential view-1-then-view-2 EMA recomposed from the two
        # same-origin updates (exact; see docstring)
        img_stats = jax.tree_util.tree_map(
            lambda n, o: m * n[0] + n[1] - m * o,
            img_stats_both, state.batch_stats["imgnet"])
        new_stats = {
            **state.batch_stats,
            "imgnet": img_stats,
            "audnet": aud_mut["batch_stats"]["audnet"],
        }
        return combined, (new_stats, metrics)

    old_stats = state.batch_stats
    grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(
        batch_stats=_advance_audio_stats(old_stats, new_stats))
    if watch:
        metrics.update(pytree_group_norms(grads, "grad_norm"))
        metrics.update(pytree_group_norms(state.params, "param_norm"))
    return state, metrics


@functools.partial(jax.jit, static_argnames=("watch",), donate_argnums=(0,))
def hardway_1frame_train_step(
    state: AVTrainState,
    frames: jnp.ndarray,   # (B, H, W, 3) single middle frame
    spec: jnp.ndarray,     # (B, F, Tt, 1)
    watch: bool = False,
) -> tuple[AVTrainState, dict[str, jnp.ndarray]]:
    """Plain hard-way CE, single frame (`train_hardway_1frame.py:131` semantics)."""

    def loss_fn(params):
        out, mut = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            frames, spec, train=True, mutable=["batch_stats"],
        )
        loss = hardway_loss(out.logits)
        return loss, (mut["batch_stats"], {"loss": loss})

    grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_stats)
    if watch:
        metrics.update(pytree_group_norms(grads, "grad_norm"))
        metrics.update(pytree_group_norms(state.params, "param_norm"))
    return state, metrics


@functools.partial(jax.jit,
                   static_argnames=("loss_weight", "spec_cfg", "image_size",
                                    "watch", "ghost", "jitter_order"),
                   donate_argnums=(0,))
def hardway_fused_train_step(
    state: AVTrainState,
    clips_uint8: jnp.ndarray,   # (B, T, S, S, 3) host-cropped clip, raw uint8
    waveforms: jnp.ndarray,     # (B, num_samples) prepared waveforms
    key: jax.Array,
    spec_cfg,
    loss_weight: float = 0.1,
    image_size: int = 224,
    watch: bool = False,
    ghost: bool = False,        # both views in one vmapped encoder pass
    #                             (ghost BN over the view axis; same math)
    jitter_order: str = "random",  # 'fixed' drops torchvision random-order
    #                                parity for a measured 4.8 ms/step
) -> tuple[AVTrainState, dict[str, jnp.ndarray]]:
    """The whole training step as ONE program: log-spectrogram (DFT matmuls),
    two-view augmentation, both forward passes, 4-term loss, Adam update.

    One device dispatch per step matters doubly here: XLA can overlap the
    preprocessing with the backbones, and hosts driving remote accelerators
    pay a fixed RTT per dispatch (3 separate programs = 3 RTTs).
    """
    from avtubes.data.spectrogram import log_spectrogram
    from avtubes.data.transforms import augment_train_batch

    spec = log_spectrogram(waveforms, spec_cfg)[..., None]
    v1, v2 = augment_train_batch(key, clips_uint8, image_size, jitter_order)
    step = hardway_train_step_ghost if ghost else hardway_train_step
    return step(state, v1, v2, spec, loss_weight, watch)


@functools.partial(jax.jit,
                   static_argnames=("loss_weight", "spec_cfg", "image_size",
                                    "watch", "ghost", "jitter_order"),
                   donate_argnums=(0,))
def hardway_multi_step(
    state: AVTrainState,
    clips_uint8: jnp.ndarray,   # (G, B, T, S, S, 3) a group of G micro-batches
    waveforms: jnp.ndarray,     # (G, B, num_samples)
    keys: jax.Array,            # (G, 2) PRNG keys
    spec_cfg,
    loss_weight: float = 0.1,
    image_size: int = 224,
    watch: bool = False,
    ghost: bool = False,
    jitter_order: str = "random",
) -> tuple[AVTrainState, dict[str, jnp.ndarray]]:
    """G sequential optimizer steps inside ONE program (lax.scan).

    Amortizes per-dispatch host overhead across G steps — the standard
    trick for keeping a fast accelerator fed from a slow/remote host; the
    returned metrics are those of the group's last step.
    """

    def body(st, inputs):
        clips, waves, key = inputs
        st, metrics = hardway_fused_train_step(
            st, clips, waves, key, spec_cfg, loss_weight, image_size, watch,
            ghost, jitter_order)
        return st, metrics

    state, metrics = jax.lax.scan(body, state, (clips_uint8, waveforms, keys))
    return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)


@functools.partial(jax.jit, static_argnames=("watch",), donate_argnums=(0,))
def train3d_step(
    state: AVTrainState,
    video: jnp.ndarray,    # (B, T, H, W, 3) clip
    spec: jnp.ndarray,     # (B, F, Tt, 1) per-clip log-spectrogram
    watch: bool = False,
) -> tuple[AVTrainState, dict[str, jnp.ndarray]]:
    """3D tube training: hard-way CE over (b·t); NP-ratio logged, not
    backpropagated (working-path semantics of `train_3D.py:126-139`, where
    only the CE term reaches backward()).

    Audio is encoded once per clip and the pooled features tiled over T
    (forward_shared_audio) — identical math to the reference's T-fold
    spectrogram repeat (`train_3D.py:128-131`), ~T x less audio compute."""
    from avtubes.losses import np_ratio_loss

    b, t = video.shape[:2]

    def loss_fn(params):
        out, mut = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            spec, video, train=True, mutable=["batch_stats"],
            method="forward_shared_audio",
        )
        loss = hardway_loss(out.logits)
        heat = out.heatmap.reshape(b, t, *out.heatmap.shape[1:])
        np_ratio = jax.lax.stop_gradient(np_ratio_loss(heat))
        return loss, (mut["batch_stats"], {"loss": loss, "np_ratio": np_ratio})

    grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_stats)
    if watch:
        metrics.update(pytree_group_norms(grads, "grad_norm"))
        metrics.update(pytree_group_norms(state.params, "param_norm"))
    return state, metrics


@functools.partial(jax.jit, static_argnames=("spec_cfg", "watch"),
                   donate_argnums=(0,))
def hardway_1frame_fused_step(
    state: AVTrainState,
    frames_uint8: jnp.ndarray,  # (B, S, S, 3) middle frame, raw uint8
    waveforms: jnp.ndarray,     # (B, num_samples)
    key: jax.Array,
    spec_cfg,
    watch: bool = False,
) -> tuple[AVTrainState, dict[str, jnp.ndarray]]:
    """1-frame step as one program: spectrogram + normalize + random hflip +
    plain hard-way CE update."""
    from avtubes.data.spectrogram import log_spectrogram
    from avtubes.data.transforms import normalize_imagenet, random_hflip

    spec = log_spectrogram(waveforms, spec_cfg)[..., None]
    frames = normalize_imagenet(frames_uint8)
    keys = jax.random.split(key, frames.shape[0])
    frames = jax.vmap(random_hflip)(keys, frames)
    return hardway_1frame_train_step(state, frames, spec, watch)


@functools.partial(jax.jit, static_argnames=("spec_cfg", "image_size", "watch"),
                   donate_argnums=(0,))
def train3d_fused_step(
    state: AVTrainState,
    clips_uint8: jnp.ndarray,   # (B, T, S, S, 3)
    waveforms: jnp.ndarray,     # (B, num_samples)
    key: jax.Array,
    spec_cfg,
    image_size: int = 224,
    watch: bool = False,
) -> tuple[AVTrainState, dict[str, jnp.ndarray]]:
    """3D tube step as one program: spectrogram + view-1 augmentation +
    FullModel fwd/bwd + update."""
    from avtubes.data.spectrogram import log_spectrogram
    from avtubes.data.transforms import augment_train_batch

    spec = log_spectrogram(waveforms, spec_cfg)[..., None]
    v1, _ = augment_train_batch(key, clips_uint8, image_size)
    return train3d_step(state, v1, spec, watch)


@jax.jit
def eval3d_heatmap_step(state: AVTrainState, video: jnp.ndarray, spec: jnp.ndarray):
    """3D inference: (B,T,H,W,3)+(B,F,Tt,1) -> (B, T, h, w) heatmaps."""
    b, t = video.shape[:2]
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        spec, video, train=False, method="forward_shared_audio",
    )
    return out.heatmap.reshape(b, t, *out.heatmap.shape[1:])


@jax.jit
def eval_heatmap_step(state: AVTrainState, frames: jnp.ndarray, spec: jnp.ndarray):
    """Inference: (B,H,W,3)+(B,F,T,1) -> raw (B,14,14) heatmaps (no BN update)."""
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        frames, spec, train=False,
    )
    return out.heatmap


@jax.jit
def eval_heatmap_shared_step(state: AVTrainState, frames: jnp.ndarray,
                             spec: jnp.ndarray):
    """Per-frame inference with shared clip audio: (B*K,H,W,3)+(B,F,T,1) ->
    (B*K,14,14) heatmaps, audio encoded once per clip instead of per frame."""
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        frames, spec, train=False, method="forward_shared_audio",
    )
    return out.heatmap
