"""Trainer integration: end-to-end run() on synthetic data + checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.core.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from avtubes.core.config import DataConfig, ExperimentConfig, OptimConfig, TrainConfig
from avtubes.models import AVENet
from avtubes.train import create_train_state


def _tiny_cfg(tmp_path, epochs=1):
    return ExperimentConfig(
        data=DataConfig(synthetic=True, image_size=64, frame_density=2,
                        samplerate=2000, audio_seconds=1, n_threads=2),
        optim=OptimConfig(batch_size=2, epochs=epochs, learning_rate=1e-4),
        train=TrainConfig(summaries_dir=str(tmp_path), compute_dtype="float32",
                          log_every=1),
    )


def test_checkpoint_roundtrip(tmp_path):
    model = AVENet()
    img = jnp.zeros((1, 64, 64, 3))
    aud = jnp.zeros((1, 64, 64, 1))
    state = create_train_state(model, jax.random.PRNGKey(0), (img, aud), OptimConfig())
    path = save_checkpoint(tmp_path, "t", 3, state)
    assert path.exists()
    # perturb then restore
    zeroed = state.replace(params=jax.tree_util.tree_map(jnp.zeros_like, state.params))
    restored, epoch = restore_checkpoint(path, zeroed)
    assert epoch == 3
    orig = jax.tree_util.tree_leaves(state.params)
    rest = jax.tree_util.tree_leaves(restored.params)
    assert all(np.allclose(a, b) for a, b in zip(orig, rest))
    assert latest_checkpoint(tmp_path, "t") == path


def test_run_synthetic_end_to_end(tmp_path):
    from avtubes.train.hardway import run

    cfg = _tiny_cfg(tmp_path)
    metrics = run(cfg, steps_cap=2, tag="smoke")
    for key in ("loss", "hardway_loss", "aug_loss", "l2_loss",
                "consistency_loss", "hardway_ciou", "hardway_auc"):
        assert key in metrics and np.isfinite(metrics[key]), key
    assert latest_checkpoint(tmp_path, "smoke") is not None
    assert (tmp_path / "smoke.metrics.jsonl").exists()


def test_run_resume(tmp_path):
    from avtubes.train.hardway import run

    cfg = _tiny_cfg(tmp_path, epochs=1)
    run(cfg, steps_cap=1, tag="smoke", do_eval=False)
    cfg2 = ExperimentConfig(
        data=cfg.data, optim=OptimConfig(batch_size=2, epochs=2, learning_rate=1e-4),
        train=TrainConfig(summaries_dir=str(tmp_path), compute_dtype="float32",
                          use_pretrained=True, log_every=1),
    )
    metrics = run(cfg2, steps_cap=1, tag="smoke", do_eval=False)
    assert np.isfinite(metrics["loss"])
    assert latest_checkpoint(tmp_path, "smoke").name == "smoke_ep1"


def test_run_3d_with_perframe_eval(tmp_path):
    """The 3D trainer's per-epoch eval block (train_3D.py:146-186 parity):
    test_ciou/test_auc/test_mtc must be produced each epoch, and
    record_qualitative must dump overlay JPEGs."""
    from avtubes.train.train3d import run

    cfg = ExperimentConfig(
        data=DataConfig(synthetic=True, image_size=64, frame_density=4,
                        sampling_rate=1, samplerate=2000, audio_seconds=1,
                        n_threads=2),
        optim=OptimConfig(batch_size=2, epochs=1, learning_rate=1e-4),
        train=TrainConfig(summaries_dir=str(tmp_path), compute_dtype="float32",
                          log_every=1, record_qualitative=1),
    )
    metrics = run(cfg, steps_cap=1, tag="tube3d")
    for key in ("loss", "np_ratio", "test_ciou", "test_auc", "test_mtc"):
        assert key in metrics and np.isfinite(metrics[key]), key
    overlays = list((tmp_path / "images").glob("*_test_frame_*.jpg"))
    assert overlays, "record_qualitative should dump per-frame overlays"
    assert latest_checkpoint(tmp_path, "tube3d") is not None
