"""Long-horizon training SYSTEM parity: the full trainer for 40 real steps,
torch vs avtubes, from the same imported init — then each stack's OWN eval.

This closes the last leg of the accuracy north star that is runnable in
this environment (no real data/checkpoints exist here): after a multi-epoch
mini-run with everything the flagship recipe exercises —

  * a per-step two-view augmentation STREAM (fresh clips each step, views
    built by the production device augmentation, identical float batches
    fed to both stacks),
  * the 4-term hard-way objective exactly as `train_hardway.py:125-145`
    composes it,
  * torch-Adam with coupled weight decay (`train_hardway.py:115`),
  * MultiStepLR milestones that FIRE mid-run (`train_hardway.py:117`),
  * BatchNorm running-stat evolution including the shared-audio dedup's
    closed-form second EMA advance (train/steps.py:_advance_audio_stats)
    and torch's unbiased running-var update (models/norm.py),

— the two stacks' *eval numbers* (cIoU@0.5 / AUC through each side's own
eval code: the reference's verbatim `train_hardway.py:208-239` block vs our
`evaluate_hardway`) must agree within the 0.5-pt north-star band.

Requires /root/reference + torch CPU; skipped if absent.  ~5 min on CPU.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference repo not mounted")

torch = pytest.importorskip("torch")
pytest.importorskip("cv2")
pytest.importorskip("sklearn.metrics")


@pytest.fixture(scope="module")
def ref_stack():
    """(reference AVENet, reference utils module) on CPU, hard-way args."""
    sys.path.insert(0, str(REFERENCE))
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import importlib
    import types

    for name in ("torchvision", "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    ref_model = importlib.import_module("model")
    ref_utils = importlib.import_module("utils")

    class Args:
        epsilon, epsilon2, tri_map, Neg = 0.65, 0.4, True, True

    torch.manual_seed(7)
    model = ref_model.AVENet(Args(), pretrained=False)
    model.eval()
    return model, ref_utils


def _make_stream(n_steps, b, t, s, seed):
    """Per-step (view1, view2, spec) float batches: fresh random clips each
    step pushed through the PRODUCTION device augmentation (random crop,
    random-order color jitter, bicubic resize, flips, ImageNet normalize) —
    the actual training view distribution, materialized once and fed
    bit-identically to both stacks."""
    import jax

    from avtubes.data.transforms import augment_train_batch

    rng = np.random.RandomState(seed)
    stream = []
    for i in range(n_steps):
        clips = rng.randint(0, 256, (b, t, s, s, 3)).astype(np.uint8)
        v1, v2 = augment_train_batch(jax.random.PRNGKey(1000 + i),
                                     np.asarray(clips), s)
        spec = (rng.randn(b, 1, s, s) * 0.5).astype(np.float32)
        stream.append((np.asarray(v1, np.float32),
                       np.asarray(v2, np.float32), spec))
    return stream


@pytest.mark.slow
def test_long_horizon_training_then_eval_parity(ref_stack, tmp_path):
    import jax

    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from avtubes.core.config import DataConfig, OptimConfig
    from avtubes.core.torch_import import avenet_from_torch
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train.evaluate import evaluate_hardway
    from avtubes.train.state import AVTrainState, make_optimizer
    from avtubes.train.steps import hardway_train_step

    ref_model, ref_utils = ref_stack
    lr, wd, w = 3e-4, 1e-2, 0.1
    b, t, s = 2, 2, 64
    epochs, steps_per_epoch = 8, 5
    milestones = (4, 6)  # fire mid-run: steps 20 and 30 drop lr x0.1
    n_steps = epochs * steps_per_epoch
    stream = _make_stream(n_steps, b, t, s, seed=17)

    # ---- torch: the reference trainer's loop math + scheduler, verbatim ----
    import copy

    model = copy.deepcopy(ref_model)
    model.train()
    optim = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        optim, milestones=list(milestones), gamma=0.1)
    ce, mse = torch.nn.CrossEntropyLoss(), torch.nn.MSELoss()
    prop = lambda h: torch.abs(torch.diff(h, dim=1)).mean(dim=(2, 3)).mean()
    torch_losses = []
    for epoch in range(epochs):
        for step in range(steps_per_epoch):
            v1, v2, spec = stream[epoch * steps_per_epoch + step]
            frames_f = torch.tensor(v1.reshape(b * t, s, s, 3)
                                    .transpose(0, 3, 1, 2).copy())
            augmented_f = torch.tensor(v2.reshape(b * t, s, s, 3)
                                       .transpose(0, 3, 1, 2).copy())
            spec_f = torch.tensor(np.repeat(spec[:, None], t, axis=1)
                                  .reshape(b * t, 1, s, s))
            _, out, weighted, _, _ = model(frames_f, spec_f)
            _, out2, weighted2, _, _ = model(augmented_f, spec_f)
            target = torch.zeros(out.shape[0]).long()
            hw_hm = weighted.shape[-2:]
            loss = ((ce(out, target) * w + ce(out2, target) * w) / 2
                    + mse(weighted, weighted2) * (100 - w)
                    + prop(weighted.reshape(b, t, *hw_hm))
                    + prop(weighted2.reshape(b, t, *hw_hm)))
            optim.zero_grad()
            loss.backward()
            optim.step()
            torch_losses.append(float(loss.detach()))
        sched.step()
    model.eval()

    # ---- avtubes: same init via the converter, our jitted step + schedule --
    ckpt = tmp_path / "ref_init.pth.tar"
    torch.save({"model_state_dict": ref_model.state_dict()}, ckpt)
    variables = avenet_from_torch(ckpt)
    tx = make_optimizer(
        OptimConfig(learning_rate=lr, weight_decay=wd,
                    lr_milestones=milestones, lr_gamma=0.1),
        steps_per_epoch=steps_per_epoch)
    state = AVTrainState.create(
        apply_fn=AVENet().apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"])
    jax_losses = []
    for i in range(n_steps):
        v1, v2, spec = stream[i]
        state, metrics = hardway_train_step(
            state, jnp.asarray(v1), jnp.asarray(v2),
            jnp.asarray(spec.transpose(0, 2, 3, 1)), loss_weight=w)
        jax_losses.append(float(metrics["loss"]))

    # loss curves track across all 40 steps (milestone mis-alignment or any
    # optimizer/backward divergence shows up here first)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-2, atol=2e-4)

    # post-training parameters and BN running stats track torch's
    # (tree-aligned via the converter).  Stats residual = the dedup 1/n
    # variance-count difference on audnet + accumulated trajectory drift.
    ckpt2 = tmp_path / "ref_trained.pth.tar"
    torch.save({"model_state_dict": model.state_dict()}, ckpt2)
    expected = avenet_from_torch(ckpt2)
    for net in ("imgnet", "audnet"):
        ours_cat = np.concatenate([
            np.asarray(l, np.float32).ravel()
            for l in jax.tree_util.tree_leaves(state.batch_stats[net])])
        ref_cat = np.concatenate([
            np.asarray(l, np.float32).ravel()
            for l in jax.tree_util.tree_leaves(expected["batch_stats"][net])])
        rel = (np.linalg.norm(ours_cat - ref_cat)
               / max(np.linalg.norm(ref_cat), 1e-12))
        assert rel < 0.05, f"{net} running stats off by rel {rel}"
    p_ours = np.concatenate([np.asarray(l, np.float32).ravel()
                             for l in jax.tree_util.tree_leaves(state.params)])
    p_ref = np.concatenate([np.asarray(l, np.float32).ravel()
                            for l in jax.tree_util.tree_leaves(expected["params"])])
    p_init = np.concatenate([np.asarray(l, np.float32).ravel()
                             for l in jax.tree_util.tree_leaves(variables["params"])])
    rel_traj = (np.linalg.norm(p_ours - p_ref)
                / max(np.linalg.norm(p_ref - p_init), 1e-12))
    assert rel_traj < 0.1, f"relative parameter-trajectory error {rel_traj}"

    # ---- eval: each stack's OWN eval code on the same synthetic test set --
    from test_system_parity import _ListLoader, _synthetic_testset, _torch_eval

    samplerate, seconds, n = 22050, 10, 8
    rng = np.random.RandomState(91)
    frames, waves, gts = _synthetic_testset(n, rng, samplerate, seconds)

    ref_eval = _torch_eval(model, ref_utils, frames, waves, gts, samplerate)

    bsz = 4
    batches = [
        {"frame": frames[i:i + bsz], "waveform": waves[i:i + bsz],
         "id": [f"vid{j}" for j in range(i, min(i + bsz, n))]}
        for i in range(0, n, bsz)
    ]
    ours = evaluate_hardway(
        state, _ListLoader(batches), DataConfig(),
        SpectrogramConfig(samplerate=samplerate, seconds=seconds),
        lambda vid, frame=None: gts[vid])

    from avtubes.evaluation import ciou_single
    from avtubes.train.evaluate import _hardway_eval_masks

    masks = np.asarray(_hardway_eval_masks(
        state, frames, waves,
        SpectrogramConfig(samplerate=samplerate, seconds=seconds)))
    ours_cious = [ciou_single(masks[i], gts[f"vid{i}"], 0.5) for i in range(n)]

    print("torch cious:", [round(c, 4) for c in ref_eval["cious"]])
    print("ours  cious:", [round(c, 4) for c in ours_cious])
    print("headline: torch", ref_eval["hardway_ciou"], ref_eval["hardway_auc"],
          "ours", ours["hardway_ciou"], ours["hardway_auc"])

    # the north-star band is 0.5 pts on cIoU@0.5/AUC; per-sample agreement
    # implies it at any test-set size
    np.testing.assert_allclose(ours_cious, ref_eval["cious"], atol=2e-2)
    assert ours["hardway_ciou"] == ref_eval["hardway_ciou"]
    assert abs(ours["hardway_auc"] - ref_eval["hardway_auc"]) <= 0.005
    jax.clear_caches()
