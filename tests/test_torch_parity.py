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
