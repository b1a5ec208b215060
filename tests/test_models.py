"""Model tests: shapes, hard-way head math vs independent numpy reference, init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avtubes.models import AVENet, HardwayConfig, hardway_head, resnet18


def test_resnet18_vision_is_stride16():
    """stride-1 layer4 => 224 input -> 14x14x512 (the load-bearing detail)."""
    model = resnet18(modal="vision")
    x = jnp.zeros((1, 224, 224, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(vars_, x, train=False)
    assert y.shape == (1, 14, 14, 512)


def test_resnet18_audio_shape():
    model = resnet18(modal="audio")
    x = jnp.zeros((1, 257, 431, 1))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(vars_, x, train=False)
    assert y.shape == (1, 17, 27, 512)


def test_resnet18_wrong_channels_raises():
    model = resnet18(modal="audio")
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)


def _numpy_hardway_reference(img, aud, eps, eps2, tau, temp):
    """Independent numpy transcription of the hard-way math (model.py:112-154)."""
    b, h, w, c = img.shape
    img = img / np.linalg.norm(img, axis=-1, keepdims=True)
    aud = aud / np.linalg.norm(aud, axis=-1, keepdims=True)
    A = np.einsum("bhwc,bc->bhw", img, aud).reshape(b, -1)
    A0 = np.einsum("bhwc,kc->bkhw", img, aud).reshape(b, b, -1)
    sig = lambda z: 1 / (1 + np.exp(-z))
    Pos = sig((A - eps) / tau)
    Neg = 1 - sig((A - eps2) / tau)
    PosAll = sig((A0 - eps) / tau)
    sim1 = (Pos * A).sum(-1, keepdims=True) / Pos.sum(-1, keepdims=True)
    mask = 1 - 100 * np.eye(b)
    sim = ((PosAll * A0).sum(-1) / PosAll.sum(-1)) * mask
    sim2 = (Neg * A).sum(-1, keepdims=True) / Neg.sum(-1, keepdims=True)
    logits = np.concatenate([sim1, sim, sim2], axis=1) / temp
    norm_pos = Pos / np.linalg.norm(Pos, axis=-1, keepdims=True)
    weighted = (img * norm_pos.reshape(b, h, w, 1)).mean(axis=-1)
    return A.reshape(b, h, w), logits, weighted


def test_hardway_head_matches_numpy_reference():
    rng = np.random.RandomState(0)
    b, h, w, c = 5, 14, 14, 32
    img = rng.randn(b, h, w, c).astype(np.float32)
    aud = rng.randn(b, c).astype(np.float32)
    cfg = HardwayConfig()
    out = hardway_head(jnp.asarray(img), jnp.asarray(aud), cfg)
    ref_A, ref_logits, ref_weighted = _numpy_hardway_reference(
        img.astype(np.float64), aud.astype(np.float64), cfg.epsilon, cfg.epsilon2,
        cfg.tau, cfg.temperature)
    assert out.logits.shape == (b, b + 2)
    np.testing.assert_allclose(np.asarray(out.heatmap), ref_A, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.logits), ref_logits, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.weighted_map), ref_weighted, atol=1e-5)


def test_hardway_head_no_trimap_no_neg():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(3, 4, 4, 16), jnp.float32)
    aud = jnp.asarray(rng.randn(3, 16), jnp.float32)
    out = hardway_head(img, aud, HardwayConfig(trimap=False, use_neg=False))
    assert out.logits.shape == (3, 4)  # (B, B+1)
    # Neg must equal 1 - Pos when trimap off
    np.testing.assert_allclose(np.asarray(out.neg), 1 - np.asarray(out.pos), atol=1e-6)


def test_hardway_mask_pushes_diagonal_down():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(4, 4, 4, 16), jnp.float32)
    aud = jnp.asarray(rng.randn(4, 16), jnp.float32)
    out = hardway_head(img, aud)
    # columns 1..B of logits are the masked cross-sims; diagonal entries are
    # scaled by (1-100) so they are large-magnitude (excluded from softmax race)
    sims = np.asarray(out.logits)[:, 1:-1]
    diag = np.abs(np.diag(sims))
    offdiag = np.abs(sims - np.diag(np.diag(sims))).max()
    assert np.all(diag > offdiag)


def test_avenet_end_to_end_shapes():
    model = AVENet()
    image = jnp.zeros((2, 224, 224, 3))
    audio = jnp.zeros((2, 257, 431, 1))
    vars_ = model.init(jax.random.PRNGKey(0), image, audio, train=False)
    out = model.apply(vars_, image, audio, train=False)
    assert out.heatmap.shape == (2, 14, 14)
    assert out.logits.shape == (2, 4)
    assert out.weighted_map.shape == (2, 14, 14)
    assert out.pos.shape == (2, 14, 14)


def test_avenet_train_mode_updates_batch_stats():
    model = AVENet()
    image = jnp.ones((2, 64, 64, 3))
    audio = jnp.ones((2, 64, 64, 1))
    vars_ = model.init(jax.random.PRNGKey(0), image, audio, train=True)
    assert "batch_stats" in vars_
    out, mutated = model.apply(vars_, image, audio, train=True, mutable=["batch_stats"])
    leaves_before = jax.tree_util.tree_leaves(vars_["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(leaves_before, leaves_after))


def test_remat_is_math_invariant():
    """remat=True must keep the variable tree, outputs, and train-step loss
    identical (it trades HBM for recompute, nothing else)."""
    import jax

    from avtubes.core.config import ExperimentConfig
    from avtubes.train.state import create_train_state
    from avtubes.train.steps import hardway_train_step

    cfg = ExperimentConfig()
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    aud = jnp.asarray(rng.random((2, 80, 90, 1), np.float32))
    m0 = AVENet(hardway=cfg.hardway)
    m1 = AVENet(hardway=cfg.hardway, remat=True)
    v0 = m0.init(jax.random.PRNGKey(0), img, aud, train=False)
    v1 = m1.init(jax.random.PRNGKey(0), img, aud, train=False)
    assert (jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1))
    o0 = m0.apply(v0, img, aud, train=False)
    o1 = m1.apply(v1, img, aud, train=False)
    np.testing.assert_allclose(np.asarray(o0.logits), np.asarray(o1.logits),
                               rtol=1e-6)
    frames = jnp.asarray(rng.random((2, 2, 64, 64, 3), np.float32))
    st0 = create_train_state(m0, jax.random.PRNGKey(0), (img, aud), cfg.optim, 4)
    st1 = create_train_state(m1, jax.random.PRNGKey(0), (img, aud), cfg.optim, 4)
    _, mt0 = hardway_train_step(st0, frames, frames, aud, 0.1)
    _, mt1 = hardway_train_step(st1, frames, frames, aud, 0.1)
    np.testing.assert_allclose(float(mt0["loss"]), float(mt1["loss"]), rtol=1e-6)


def test_fullmodel_audnet_bn_init_is_constant_one():
    """The N(1, .02) BN re-init lives only in the reference AVENet.__init__
    (`model.py:104-110`); FullModel's 2D audnet keeps torch's constant-1
    default (`model.py:21`) — the 3D path must init from the same
    distribution."""
    from avtubes.models.fullmodel import FullModel

    m = FullModel()
    v = jax.jit(lambda r: m.init(r, jnp.zeros((4, 32, 32, 1)),
                                 jnp.zeros((2, 2, 32, 32, 3)),
                                 train=False))(jax.random.PRNGKey(0))
    for name in ("stem_bn", "layer1_block0"):
        node = v["params"]["audnet"][name]
        scale = node["scale"] if "scale" in node else node["bn1"]["scale"]
        assert np.unique(np.asarray(scale)) == np.asarray([1.0])
    # AVENet keeps the noisy re-init
    from avtubes.models import AVENet

    a = AVENet()
    va = jax.jit(lambda r: a.init(r, jnp.zeros((2, 32, 32, 3)),
                                  jnp.zeros((2, 32, 32, 1)),
                                  train=False))(jax.random.PRNGKey(0))
    s = np.asarray(va["params"]["audnet"]["stem_bn"]["scale"])
    assert s.std() > 0.005  # N(1, .02), not constant


def test_torch_batchnorm_matches_torch_semantics():
    """TorchBatchNorm vs torch.nn.BatchNorm2d: train-mode output, eval-mode
    output, AND the running statistics after two train steps (the unbiased
    running-var update is the point — flax's BatchNorm stores the biased
    one)."""
    torch = pytest.importorskip("torch")

    from avtubes.models.norm import TorchBatchNorm

    rng = np.random.RandomState(0)
    n, h, w, c = 3, 5, 4, 6
    x1 = rng.randn(n, h, w, c).astype(np.float32)
    x2 = rng.randn(n, h, w, c).astype(np.float32) * 2.0 + 0.5

    ref = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        ref.weight.copy_(torch.tensor(rng.rand(c).astype(np.float32) + 0.5))
        ref.bias.copy_(torch.tensor(rng.randn(c).astype(np.float32)))
    ref.train()
    y1_t = ref(torch.tensor(x1.transpose(0, 3, 1, 2)))
    ref(torch.tensor(x2.transpose(0, 3, 1, 2)))
    ref.eval()
    ye_t = ref(torch.tensor(x1.transpose(0, 3, 1, 2)))

    bn = TorchBatchNorm(use_running_average=False)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x1))
    variables = {
        "params": {"scale": jnp.asarray(ref.weight.detach().numpy()),
                   "bias": jnp.asarray(ref.bias.detach().numpy())},
        "batch_stats": variables["batch_stats"],
    }
    y1, mut = bn.apply(variables, jnp.asarray(x1), mutable=["batch_stats"])
    _, mut = bn.apply({**variables, "batch_stats": mut["batch_stats"]},
                      jnp.asarray(x2), mutable=["batch_stats"])

    np.testing.assert_allclose(
        np.asarray(y1), y1_t.detach().numpy().transpose(0, 2, 3, 1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               ref.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               ref.running_var.numpy(), rtol=1e-5)

    bn_eval = TorchBatchNorm(use_running_average=True)
    ye = bn_eval.apply({"params": variables["params"],
                        "batch_stats": mut["batch_stats"]}, jnp.asarray(x1))
    np.testing.assert_allclose(
        np.asarray(ye), ye_t.detach().numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_advance_audio_stats_composes_second_ema_step():
    """(1+m)*new - m*old == applying the EMA update twice with the same
    batch statistic, for the audnet subtree only."""
    from avtubes.train.steps import _advance_audio_stats

    m = 0.9
    rng = np.random.RandomState(1)
    old = {"audnet": {"bn": {"mean": jnp.asarray(rng.randn(4)),
                             "var": jnp.asarray(rng.rand(4) + 0.5)}},
           "imgnet": {"bn": {"mean": jnp.asarray(rng.randn(4)),
                             "var": jnp.asarray(rng.rand(4) + 0.5)}}}
    x = {"mean": jnp.asarray(rng.randn(4)), "var": jnp.asarray(rng.rand(4) + 0.5)}
    new = {"audnet": {"bn": {k: m * old["audnet"]["bn"][k] + (1 - m) * x[k]
                             for k in x}},
           "imgnet": old["imgnet"]}
    out = _advance_audio_stats(old, new, momentum=m)
    for k in x:
        twice = m * new["audnet"]["bn"][k] + (1 - m) * x[k]
        np.testing.assert_allclose(np.asarray(out["audnet"]["bn"][k]),
                                   np.asarray(twice), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out["imgnet"]["bn"][k]),
                                      np.asarray(new["imgnet"]["bn"][k]))
