"""Numerical parity against the reference PyTorch model (gold-standard check).

Builds the reference AVENet on CPU (monkeypatching away its hard .cuda()
calls), exports its state_dict, imports it through our torch->flax
converter, and compares heatmaps/logits on identical inputs.

Requires /root/reference (read-only) + torch CPU; skipped if absent.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(), reason="reference repo not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def reference_avenet():
    """Instantiate the reference AVENet on CPU with default hard-way args."""
    sys.path.insert(0, str(REFERENCE))
    # the reference hard-codes .cuda() in forward (`model.py:115`); run on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import importlib

    ref_model = importlib.import_module("model")

    class Args:
        epsilon, epsilon2, tri_map, Neg = 0.65, 0.4, True, True

    torch.manual_seed(0)
    model = ref_model.AVENet(Args(), pretrained=False)
    model.eval()
    return model


def test_avenet_forward_parity(reference_avenet, tmp_path):
    import jax.numpy as jnp

    from avtubes.core.torch_import import avenet_from_torch
    from avtubes.models import AVENet

    ckpt = tmp_path / "ref.pth.tar"
    torch.save({"model_state_dict": reference_avenet.state_dict()}, ckpt)
    variables = avenet_from_torch(ckpt)

    rng = np.random.RandomState(0)
    b = 3
    image = rng.randn(b, 3, 96, 96).astype(np.float32)
    audio = rng.randn(b, 1, 96, 96).astype(np.float32)

    with torch.no_grad():
        A, logits, weighted, pos, neg = reference_avenet(
            torch.tensor(image), torch.tensor(audio))

    ours = AVENet().apply(
        variables,
        jnp.asarray(image.transpose(0, 2, 3, 1)),
        jnp.asarray(audio.transpose(0, 2, 3, 1)),
        train=False,
    )

    np.testing.assert_allclose(np.asarray(ours.heatmap), A.numpy()[:, 0], atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours.logits), logits.numpy(),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(ours.pos), pos.numpy()[:, 0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours.weighted_map), weighted.numpy(),
                               atol=2e-4)


@pytest.mark.slow
def test_avenet_full_geometry_parity(reference_avenet, tmp_path):
    """Forward parity at the REAL eval geometry: 224x224 images and 257x431
    log-spectrograms (the shapes `train_hardway.py`/`test.py` actually run),
    f32 — exercises the stride/padding/pool geometry the 96x96 test doesn't
    (maxpool after the audio backbone, 14x14 head, odd spectrogram extents).
    Also pins plain-stem vs s2d-stem equality at the same geometry (the
    bench/serving default is s2d; previously only pinned at small shapes)."""
    import jax.numpy as jnp

    from avtubes.core.torch_import import avenet_from_torch
    from avtubes.models import AVENet
    from avtubes.models.avenet import variables_to_s2d

    ckpt = tmp_path / "ref.pth.tar"
    torch.save({"model_state_dict": reference_avenet.state_dict()}, ckpt)
    variables = avenet_from_torch(ckpt)

    rng = np.random.RandomState(7)
    b = 2
    image = rng.randn(b, 3, 224, 224).astype(np.float32)
    audio = (rng.randn(b, 1, 257, 431) * 0.5).astype(np.float32)

    with torch.no_grad():
        A, logits, weighted, pos, neg = reference_avenet(
            torch.tensor(image), torch.tensor(audio))

    image_j = jnp.asarray(image.transpose(0, 2, 3, 1))
    audio_j = jnp.asarray(audio.transpose(0, 2, 3, 1))
    ours = AVENet().apply(variables, image_j, audio_j, train=False)

    assert ours.heatmap.shape == (b, 14, 14)
    np.testing.assert_allclose(np.asarray(ours.heatmap), A.numpy()[:, 0], atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours.logits), logits.numpy(),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(ours.pos), pos.numpy()[:, 0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours.weighted_map), weighted.numpy(),
                               atol=2e-4)

    s2d = AVENet(s2d_stem=True).apply(variables_to_s2d(variables),
                                      image_j, audio_j, train=False)
    np.testing.assert_allclose(np.asarray(s2d.heatmap), A.numpy()[:, 0], atol=5e-4)
    np.testing.assert_allclose(np.asarray(s2d.logits), logits.numpy(),
                               rtol=1e-3, atol=5e-3)


def test_fullmodel_3d_forward_parity(tmp_path):
    """Reference FullModel (ResNet3D tubes + HardWayAttention) vs ours."""
    import jax.numpy as jnp

    from avtubes.core.torch_import import fullmodel_from_torch
    from avtubes.models import FullModel

    sys.path.insert(0, str(REFERENCE))
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import importlib

    ref_model_mod = importlib.import_module("model")

    class Args:
        pass

    torch.manual_seed(1)
    ref = ref_model_mod.FullModel(Args())
    ref.eval()
    ckpt = tmp_path / "full.pth.tar"
    torch.save({"model_state_dict": ref.state_dict()}, ckpt)
    variables = fullmodel_from_torch(ckpt)

    rng = np.random.RandomState(2)
    b, t = 2, 2
    video = rng.randn(b, 3, t, 64, 64).astype(np.float32)   # torch NCDHW
    audio = rng.randn(b * t, 1, 64, 64).astype(np.float32)

    with torch.no_grad():
        A, logits = ref(torch.tensor(audio), torch.tensor(video))

    ours = FullModel().apply(
        variables,
        jnp.asarray(audio.transpose(0, 2, 3, 1)),
        jnp.asarray(video.transpose(0, 2, 3, 4, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours.heatmap), A.numpy()[:, 0], atol=5e-4)
    np.testing.assert_allclose(np.asarray(ours.logits), logits.numpy(),
                               rtol=1e-3, atol=2e-2)


@pytest.mark.slow
def test_training_trajectory_parity(reference_avenet, tmp_path):
    """THREE full optimizer steps, torch vs flax, from the same weights on the
    same batch: the loss curve and the post-training parameters must track.

    This covers what forward-parity tests can't: backward through train-mode
    BatchNorm batch statistics, the full 4-term hard-way objective exactly as
    the reference trainer composes it (`train_hardway.py:125-145`: CE x w on
    both views /2 + MSE x (100-w) + propagation on both attention stacks),
    and torch-Adam semantics with weight decay COUPLED into the gradient
    before the moments (`train_hardway.py:115` — NOT AdamW).  lr is cranked
    to 1e-3 (ref default 4e-6) and wd to 0.05 so three steps move parameters
    ~3e-3 and any optimizer or backward divergence is visible above noise.

    Running-average BN stats are deliberately NOT compared: the shared-audio
    two-view forward updates audnet stats once per step where the reference's
    duplicated audio forward updates them twice — train-mode forwards use
    batch stats, so the trajectory is unaffected (see
    models/avenet.py two_view_forward docstring)."""
    import copy

    import jax
    import jax.numpy as jnp

    from avtubes.core.config import OptimConfig
    from avtubes.core.torch_import import avenet_from_torch
    from avtubes.models import AVENet
    from avtubes.train.state import AVTrainState, make_optimizer
    from avtubes.train.steps import hardway_train_step

    lr, wd, w = 1e-3, 0.05, 0.1
    b, t, s = 2, 2, 64
    rng = np.random.RandomState(11)
    frames = rng.randn(b, t, 3, s, s).astype(np.float32)
    augmented = frames + 0.1 * rng.randn(b, t, 3, s, s).astype(np.float32)
    spec = (rng.randn(b, 1, s, s) * 0.5).astype(np.float32)

    # ---- torch: the reference trainer's loop math, verbatim semantics ----
    model = copy.deepcopy(reference_avenet)
    model.train()
    optim = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd)
    ce, mse = torch.nn.CrossEntropyLoss(), torch.nn.MSELoss()
    # PropagationLoss math (losses.py:22-23); inlined because importing the
    # reference module pulls optional deps (pytorch_metric_learning)
    prop = lambda h: torch.abs(torch.diff(h, dim=1)).mean(dim=(2, 3)).mean()
    frames_f = torch.tensor(frames.reshape(b * t, 3, s, s))
    augmented_f = torch.tensor(augmented.reshape(b * t, 3, s, s))
    spec_f = torch.tensor(np.repeat(spec[:, None], t, axis=1)
                          .reshape(b * t, 1, s, s))
    torch_losses = []
    for _ in range(3):
        _, out, weighted, _, _ = model(frames_f, spec_f)
        _, out2, weighted2, _, _ = model(augmented_f, spec_f)
        target = torch.zeros(out.shape[0]).long()
        hw_hm = weighted.shape[-2:]
        loss = (
            (ce(out, target) * w + ce(out2, target) * w) / 2
            + mse(weighted, weighted2) * (100 - w)
            + prop(weighted.reshape(b, t, *hw_hm))
            + prop(weighted2.reshape(b, t, *hw_hm))
        )
        optim.zero_grad()
        loss.backward()
        optim.step()
        torch_losses.append(float(loss.detach()))

    # ---- flax: same init, same batch, our jitted train step ----
    ckpt = tmp_path / "ref_init.pth.tar"
    torch.save({"model_state_dict": reference_avenet.state_dict()}, ckpt)
    variables = avenet_from_torch(ckpt)
    tx = make_optimizer(OptimConfig(learning_rate=lr, weight_decay=wd), 1)
    state = AVTrainState.create(
        apply_fn=AVENet().apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"])
    jax_losses = []
    for _ in range(3):
        state, metrics = hardway_train_step(
            state,
            jnp.asarray(frames.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(augmented.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(spec.transpose(0, 2, 3, 1)),
            loss_weight=w)
        jax_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3, atol=2e-4)

    # parameters after 3 steps: convert torch's trained weights and diff.
    # A max-|diff| assertion is statistically wrong here: with zero-init
    # moments Adam's first update is ~lr*sign(grad), so float noise on
    # near-zero-gradient elements flips their sign and costs 2*lr of
    # divergence per flip — measured 0.02% of the 22.3M params, max 3.8e-3
    # vs a uniform ~3e-3 movement.  Assert the trajectory statistically:
    # the bulk of parameters bit-track (median), the relative trajectory
    # error is small in norm, and sign-flips stay rare.
    ckpt2 = tmp_path / "ref_trained.pth.tar"
    torch.save({"model_state_dict": model.state_dict()}, ckpt2)
    expected = avenet_from_torch(ckpt2)["params"]
    diffs = np.concatenate([
        np.abs(np.asarray(a, np.float32) - np.asarray(e, np.float32)).ravel()
        for a, e in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(expected))])
    move = np.concatenate([
        np.abs(np.asarray(e, np.float32) - np.asarray(i, np.float32)).ravel()
        for e, i in zip(jax.tree_util.tree_leaves(expected),
                        jax.tree_util.tree_leaves(variables["params"]))])
    rel = float(np.linalg.norm(diffs) / np.linalg.norm(move))
    assert float(np.median(diffs)) < 1e-5, "bulk of params not tracking"
    assert rel < 0.05, f"relative trajectory error {rel}"
    assert float((diffs > 2 * lr).mean()) < 1e-4, "too many sign flips"


def test_converter_covers_all_backbone_tensors(reference_avenet, tmp_path):
    """Every live tensor in the torch checkpoint lands in our pytree."""
    import jax

    from avtubes.core.torch_import import avenet_from_torch

    ckpt = tmp_path / "ref.pth.tar"
    torch.save({"model_state_dict": reference_avenet.state_dict()}, ckpt)
    variables = avenet_from_torch(ckpt)
    n_ours = len(jax.tree_util.tree_leaves(variables))
    sd = reference_avenet.state_dict()
    # reference tensors minus: dead fc/avgpool (4: weight+bias x2 nets), the
    # 2 unused stems per net (4 convs), and num_batches_tracked counters
    n_live = sum(1 for k in sd
                 if "num_batches_tracked" not in k
                 and ".fc." not in k
                 and not k.endswith(("conv1_a.weight", "conv1_flow.weight"))
                 or k.startswith("audnet.conv1_a"))
    # exact accounting is fiddly; assert we imported the overwhelming majority
    assert n_ours >= 0.9 * sum(1 for k in sd if "num_batches_tracked" not in k) - 8


# --- torch EXPORT (core/torch_export.py): the reverse direction -------------

_DEAD = ("fc.", "num_batches_tracked", "imgnet.conv1_a.", "imgnet.conv1_flow.",
         "audnet.conv1.", "audnet.conv1_flow.")  # tensors the forward ignores


def test_torch_export_roundtrip_strict(reference_avenet, tmp_path):
    """import(ref ckpt) -> export -> strict-load into a FRESH reference
    AVENet: the exported file must have the exact reference key set, every
    live tensor bit-equal to the original, and the clone's forward must
    bit-match the original model (the synthesized dead tensors are inert)."""
    from avtubes.core.torch_export import avenet_to_torch, save_torch_checkpoint
    from avtubes.core.torch_import import avenet_from_torch

    ckpt = tmp_path / "ref.pth.tar"
    torch.save({"model_state_dict": reference_avenet.state_dict()}, ckpt)
    variables = avenet_from_torch(ckpt)

    sd = avenet_to_torch(variables, strict=True)
    out = save_torch_checkpoint(tmp_path / "exported.pth.tar", sd, epoch=7)
    blob = torch.load(out, map_location="cpu", weights_only=False)
    assert blob["epoch"] == 7 and "optimizer_state_dict" in blob
    exported = blob["model_state_dict"]

    orig = reference_avenet.state_dict()
    assert set(exported) == set(orig)
    live = 0
    for k, v in orig.items():
        if any(d in k for d in _DEAD):
            continue
        np.testing.assert_array_equal(exported[k].numpy(), v.numpy(),
                                      err_msg=k)
        live += 1
    assert live >= 100  # 2 backbones x (stem + 8 blocks x 2convs+2bns + ...)

    import importlib

    ref_model = importlib.import_module("model")

    class Args:
        epsilon, epsilon2, tri_map, Neg = 0.65, 0.4, True, True

    torch.manual_seed(123)  # different init from the fixture on purpose
    clone = ref_model.AVENet(Args(), pretrained=False)
    clone.eval()
    clone.load_state_dict(exported, strict=True)

    rng = np.random.RandomState(5)
    image = torch.tensor(rng.randn(2, 3, 96, 96).astype(np.float32))
    audio = torch.tensor(rng.randn(2, 1, 96, 96).astype(np.float32))
    with torch.no_grad():
        a0 = reference_avenet(image, audio)
        a1 = clone(image, audio)
    for t0, t1 in zip(a0, a1):
        np.testing.assert_array_equal(t0.numpy(), t1.numpy())


def test_torch_export_import_is_identity(tmp_path):
    """export(flax init) then import must reproduce the flax tree exactly
    (covers the inverse name map + HWIO<->OIHW transposes without needing
    the reference)."""
    import jax
    import jax.numpy as jnp

    from avtubes.core.torch_export import avenet_to_torch, save_torch_checkpoint
    from avtubes.core.torch_import import avenet_from_torch
    from avtubes.models import AVENet

    variables = AVENet().init(
        jax.random.PRNGKey(3),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1)), train=False)
    variables = jax.device_get(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]})

    path = save_torch_checkpoint(
        tmp_path / "rt.pth.tar", avenet_to_torch(variables, strict=True))
    back = avenet_from_torch(path)

    leaves0, tree0 = jax.tree_util.tree_flatten(variables)
    leaves1, tree1 = jax.tree_util.tree_flatten(back)
    assert tree0 == tree1
    for l0, l1 in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_torch_export_fullmodel_strict_load(tmp_path):
    """FullModel (3D tubes) round trip: ref -> flax -> ref, strict load,
    bit-identical forward."""
    from avtubes.core.torch_export import (fullmodel_to_torch,
                                           save_torch_checkpoint)
    from avtubes.core.torch_import import fullmodel_from_torch

    sys.path.insert(0, str(REFERENCE))
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import importlib

    ref_model_mod = importlib.import_module("model")

    class Args:
        pass

    torch.manual_seed(4)
    ref = ref_model_mod.FullModel(Args())
    ref.eval()
    ckpt = tmp_path / "full.pth.tar"
    torch.save({"model_state_dict": ref.state_dict()}, ckpt)

    sd = fullmodel_to_torch(fullmodel_from_torch(ckpt), strict=True)
    out = save_torch_checkpoint(tmp_path / "full_exported.pth.tar", sd)
    exported = torch.load(out, map_location="cpu",
                          weights_only=False)["model_state_dict"]
    assert set(exported) == set(ref.state_dict())

    torch.manual_seed(99)
    clone = ref_model_mod.FullModel(Args())
    clone.eval()
    clone.load_state_dict(exported, strict=True)

    rng = np.random.RandomState(6)
    video = torch.tensor(rng.randn(2, 3, 2, 64, 64).astype(np.float32))
    audio = torch.tensor(rng.randn(4, 1, 64, 64).astype(np.float32))
    with torch.no_grad():
        a0 = ref(audio, video)
        a1 = clone(audio, video)
    for t0, t1 in zip(a0, a1):
        np.testing.assert_array_equal(t0.numpy(), t1.numpy())
