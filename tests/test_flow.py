"""Flow stack tests: .flo round-trip, color render, FlowNetLite, flow train step."""

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.models.flownet import FlowNetLite
from avtubes.utils.flow_io import flow_to_image, make_color_wheel, read_flo, write_flo


def test_flo_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    flow = rng.randn(6, 9, 2).astype(np.float32)
    p = tmp_path / "t.flo"
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_array_equal(back, flow)


def test_color_wheel_shape_and_range():
    wheel = make_color_wheel()
    assert wheel.shape == (55, 3)
    assert wheel.min() >= 0 and wheel.max() <= 255


def test_flow_to_image_basic():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[:, :4, 0] = 1.0   # rightward motion left half
    flow[:, 4:, 0] = -1.0  # leftward right half
    img = flow_to_image(flow)
    assert img.shape == (8, 8, 3)
    assert img.dtype == np.uint8
    # opposite motions get different colors
    assert not np.array_equal(img[0, 0], img[0, 7])


def test_flownet_lite_shapes_and_grad():
    model = FlowNetLite()
    im1 = jnp.zeros((2, 64, 64, 3))
    im2 = jnp.zeros((2, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), im1, im2)
    flow = model.apply(vars_, im1, im2)
    assert flow.shape == (2, 64, 64, 2)

    def loss(v):
        return (model.apply(v, im1, im2) ** 2).sum()

    g = jax.grad(lambda v: loss(v))(vars_)
    assert all(np.all(np.isfinite(x)) for x in jax.tree_util.tree_leaves(g))


def test_flow_train_step_runs():
    from avtubes.core.config import OptimConfig
    from avtubes.models import AVENet
    from avtubes.train import create_train_state
    from avtubes.train.flow import flow_train_step

    rng = np.random.RandomState(1)
    b, t, s = 2, 3, 64
    frames = jnp.asarray(rng.randn(b, t, s, s, 3), jnp.float32)
    spec = jnp.asarray(rng.randn(b, s, s, 1), jnp.float32)
    model = AVENet()
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, s, s, 3)), jnp.zeros((2, s, s, 1))),
        OptimConfig(learning_rate=1e-3))
    flow_vars = FlowNetLite().init(jax.random.PRNGKey(1),
                                   jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)))
    # weight 0: reference semantics (warp metric logged, CE-only gradient)
    state, m0 = flow_train_step(state, flow_vars, frames, spec, flow_loss_weight=0.0)
    assert np.isfinite(float(m0["loss"]))
    assert np.isfinite(float(m0["warp_consistency"]))
    # weight > 0: consistency term contributes
    state, m1 = flow_train_step(state, flow_vars, frames, spec, flow_loss_weight=0.5)
    assert float(m1["loss"]) >= float(m1["hardway_loss"]) - 1e-6


def test_flow_train_step_compute_flow_off():
    """compute_flow=False drops the flow net from the program: loss == CE,
    warp probe reads 0, and enabling the warp term without the flow net is
    rejected at trace time."""
    import pytest

    from avtubes.core.config import OptimConfig
    from avtubes.models import AVENet
    from avtubes.train import create_train_state
    from avtubes.train.flow import flow_train_step

    rng = np.random.RandomState(2)
    b, t, s = 2, 3, 64
    frames = jnp.asarray(rng.randn(b, t, s, s, 3), jnp.float32)
    spec = jnp.asarray(rng.randn(b, s, s, 1), jnp.float32)
    model = AVENet()

    def make_state():  # the step donates its state arg — fresh one per call
        return create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((2, s, s, 3)), jnp.zeros((2, s, s, 1))),
            OptimConfig(learning_rate=1e-3))

    flow_vars = FlowNetLite().init(
        jax.random.PRNGKey(1), jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)))

    _, m_off = flow_train_step(make_state(), flow_vars, frames, spec,
                               flow_loss_weight=0.0, compute_flow=False)
    _, m_on = flow_train_step(make_state(), flow_vars, frames, spec,
                              flow_loss_weight=0.0, compute_flow=True)
    assert float(m_off["warp_consistency"]) == 0.0
    assert float(m_off["loss"]) == float(m_off["hardway_loss"])
    # weight-0 objective identical with or without the probe
    np.testing.assert_allclose(float(m_off["hardway_loss"]),
                               float(m_on["hardway_loss"]), rtol=1e-6)
    with pytest.raises(ValueError, match="compute_flow"):
        flow_train_step(make_state(), flow_vars, frames, spec,
                        flow_loss_weight=0.5, compute_flow=False)
