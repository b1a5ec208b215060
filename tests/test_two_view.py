"""Shared-audio two-view forward == the naive repeated-spectrogram path."""

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.models import AVENet


def test_two_view_forward_matches_repeated_audio():
    rng = np.random.RandomState(0)
    b, t, s = 2, 3, 64
    frames = jnp.asarray(rng.randn(b * t, s, s, 3), jnp.float32)
    augmented = jnp.asarray(rng.randn(b * t, s, s, 3), jnp.float32)
    spec = jnp.asarray(rng.randn(b, s, s, 1), jnp.float32)
    spec_rep = jnp.repeat(spec, t, axis=0)

    model = AVENet()
    variables = model.init(jax.random.PRNGKey(0), frames, spec_rep, train=False)

    # naive path: audio encoder on B*T duplicated spectrograms, two applies
    out_naive, mut = model.apply(variables, frames, spec_rep, train=True,
                                 mutable=["batch_stats"])
    out2_naive, _ = model.apply(
        {"params": variables["params"], "batch_stats": mut["batch_stats"]},
        augmented, spec_rep, train=True, mutable=["batch_stats"])

    # shared-audio path: one apply, audio encoded once per clip
    (out, out2), _ = model.apply(variables, frames, augmented, spec, t,
                                 train=True, mutable=["batch_stats"],
                                 method="two_view_forward")

    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(out_naive.logits), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.heatmap),
                               np.asarray(out_naive.heatmap), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weighted_map),
                               np.asarray(out_naive.weighted_map), atol=1e-5)
    # second view: the naive path's augmented pass ran with audnet BN stats
    # already updated once, but stats only affect eval mode — train-mode
    # outputs must match exactly
    np.testing.assert_allclose(np.asarray(out2.logits),
                               np.asarray(out2_naive.logits), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2.heatmap),
                               np.asarray(out2_naive.heatmap), atol=1e-5)


def test_ghost_step_matches_sequential_step():
    """hardway_train_step_ghost (one vmapped encoder pass, per-view ghost-BN
    stats) == hardway_train_step (two sequential passes): identical loss,
    updated params, and BN running stats."""
    from avtubes.core.config import OptimConfig
    from avtubes.train.state import create_train_state
    from avtubes.train.steps import hardway_train_step, hardway_train_step_ghost

    rng = np.random.RandomState(2)
    b, t, s = 2, 3, 64
    frames = jnp.asarray(rng.randn(b, t, s, s, 3), jnp.float32)
    augmented = jnp.asarray(rng.randn(b, t, s, s, 3), jnp.float32)
    spec = jnp.asarray(rng.randn(b, s, s, 1), jnp.float32)

    def fresh_state():
        return create_train_state(
            AVENet(), jax.random.PRNGKey(3),
            (jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 1))),
            OptimConfig())

    st_seq, m_seq = hardway_train_step(fresh_state(), frames, augmented, spec)
    st_gho, m_gho = hardway_train_step_ghost(fresh_state(), frames, augmented, spec)

    np.testing.assert_allclose(float(m_gho["loss"]), float(m_seq["loss"]),
                               rtol=1e-5)
    for key in ("hardway_loss", "aug_loss", "l2_loss", "consistency_loss"):
        np.testing.assert_allclose(float(m_gho[key]), float(m_seq[key]),
                                   rtol=1e-4, atol=1e-6)
    flat_seq, _ = jax.tree_util.tree_flatten_with_path(st_seq.params)
    flat_gho = jax.tree_util.tree_leaves(st_gho.params)
    for (path, a), bleaf in zip(flat_seq, flat_gho):
        np.testing.assert_allclose(
            np.asarray(bleaf), np.asarray(a), rtol=1e-4, atol=2e-6,
            err_msg=f"params mismatch at {jax.tree_util.keystr(path)}")
    flat_seq, _ = jax.tree_util.tree_flatten_with_path(st_seq.batch_stats)
    flat_gho = jax.tree_util.tree_leaves(st_gho.batch_stats)
    for (path, a), bleaf in zip(flat_seq, flat_gho):
        np.testing.assert_allclose(
            np.asarray(bleaf), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=f"batch_stats mismatch at {jax.tree_util.keystr(path)}")


def test_two_view_gradients_flow_to_audio_once():
    """Gradient through the tiled audio features equals the sum over uses."""
    rng = np.random.RandomState(1)
    b, t, s = 2, 2, 32
    frames = jnp.asarray(rng.randn(b * t, s, s, 3), jnp.float32)
    spec = jnp.asarray(rng.randn(b, s, s, 1), jnp.float32)
    model = AVENet()
    variables = model.init(jax.random.PRNGKey(0), frames, jnp.repeat(spec, t, 0),
                           train=False)

    def loss(params):
        (out, out2), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            frames, frames, spec, t, train=True, mutable=["batch_stats"],
            method="two_view_forward")
        return out.logits.sum() + out2.logits.sum()

    g = jax.grad(loss)(variables["params"])
    aud_leaves = jax.tree_util.tree_leaves(g["audnet"])
    assert all(np.all(np.isfinite(x)) for x in aud_leaves)
    assert max(float(np.abs(x).max()) for x in aud_leaves) > 0
