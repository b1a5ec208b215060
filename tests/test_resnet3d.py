"""3D tube model tests: geometry, FullModel end-to-end, 3D train step."""

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.core.config import OptimConfig
from avtubes.models import FullModel, ResNet3D
from avtubes.train import create_train_state
from avtubes.train.steps import eval3d_heatmap_step, train3d_step


def test_resnet3d_preserves_time_halves_space_16x():
    model = ResNet3D()
    x = jnp.zeros((1, 4, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(vars_, x, train=False)
    # T preserved; 64 spatial -> /16 -> 4
    assert y.shape == (1, 4, 4, 4, 512)


def test_fullmodel_shapes():
    model = FullModel()
    b, t = 2, 2
    video = jnp.zeros((b, t, 64, 64, 3))
    audio = jnp.zeros((b * t, 64, 64, 1))
    vars_ = model.init(jax.random.PRNGKey(0), audio, video, train=False)
    out = model.apply(vars_, audio, video, train=False)
    assert out.heatmap.shape == (b * t, 4, 4)
    assert out.logits.shape == (b * t, b * t + 2)


def test_conv3d_lowered_impls_match_direct():
    """The time-lowered Conv2D impls ('stacked' = one wide conv, 'sum' = kt
    shifted convs) are the SAME function as XLA Conv3D: identical param
    pytree, forward, and gradients (f32, atol to reassociated contraction)."""
    direct = ResNet3D(conv_impl="direct")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 32, 32, 3),
                    jnp.float32)
    vars_ = direct.init(jax.random.PRNGKey(0), x, train=False)
    y_d = direct.apply(vars_, x, train=False)

    def loss(params, model):
        y, _ = model.apply({**vars_, "params": params}, x, train=True,
                           mutable=["batch_stats"])
        return jnp.sum(y ** 2) / y.size

    g_d = jax.grad(loss)(vars_["params"], direct)
    for impl in ("stacked", "sum"):
        lowered = ResNet3D(conv_impl=impl)
        vars_l = lowered.init(jax.random.PRNGKey(0), x, train=False)
        assert jax.tree_util.tree_structure(vars_) == \
            jax.tree_util.tree_structure(vars_l)
        y_l = lowered.apply(vars_, x, train=False)
        np.testing.assert_allclose(np.asarray(y_l), np.asarray(y_d),
                                   atol=2e-4, rtol=2e-4, err_msg=impl)
        g_l = jax.grad(loss)(vars_["params"], lowered)
        for gd, gl in zip(jax.tree_util.tree_leaves(g_d),
                          jax.tree_util.tree_leaves(g_l)):
            np.testing.assert_allclose(np.asarray(gl), np.asarray(gd),
                                       atol=2e-4, rtol=2e-3, err_msg=impl)


def test_train3d_step_decreases_loss():
    rng = np.random.RandomState(0)
    b, t = 2, 2
    video = jnp.asarray(rng.randn(b, t, 64, 64, 3), jnp.float32)
    spec = jnp.asarray(rng.randn(b, 64, 64, 1), jnp.float32)
    model = FullModel()
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((b * t, 64, 64, 1)), jnp.zeros((b, t, 64, 64, 3))),
        OptimConfig(learning_rate=1e-3),
    )
    losses = []
    for _ in range(8):
        state, m = train3d_step(state, video, spec)
        losses.append(float(m["loss"]))
        assert np.isfinite(float(m["np_ratio"]))
    assert losses[-1] < losses[0]
    heat = eval3d_heatmap_step(state, video, spec)
    assert heat.shape == (b, t, 4, 4)
