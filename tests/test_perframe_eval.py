"""Per-frame whole-video eval path: mp4 decode source + evaluate_perframe."""

import numpy as np
import pytest

from avtubes.core.config import DataConfig
from avtubes.data.pipeline import PerFrameEvalSource
from avtubes.data.synthetic import write_synthetic_dataset

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def mp4_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp4set")
    ids = write_synthetic_dataset(root, n_videos=2, frames=10, mp4=True)
    return root, ids


def test_perframe_source_decodes_all_frames(mp4_dataset):
    root, ids = mp4_dataset
    cfg = DataConfig(image_size=64)
    src = PerFrameEvalSource(root, ids, cfg)
    s = src.load(0)
    assert s["clip"].shape == (10, 64, 64, 3)
    assert s["clip"].dtype == np.uint8
    assert s["waveform"].shape == (22050 * 10,)


def test_evaluate_perframe_end_to_end(mp4_dataset):
    import jax
    import jax.numpy as jnp

    from avtubes.core.config import OptimConfig
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train import create_train_state
    from avtubes.train.evaluate import evaluate_perframe
    from avtubes.train.hardway import _synthetic_gt_lookup

    root, ids = mp4_dataset
    cfg = DataConfig(image_size=64, sampling_rate=4)
    spec_cfg = SpectrogramConfig()
    src = PerFrameEvalSource(root, ids, cfg)
    state = create_train_state(
        AVENet(), jax.random.PRNGKey(0),
        (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, *spec_cfg.shape, 1))),
        OptimConfig())
    metrics = evaluate_perframe(state, src, cfg, spec_cfg, _synthetic_gt_lookup())
    assert np.isfinite(metrics["test_ciou"])
    assert np.isfinite(metrics["test_auc"])
    assert np.isfinite(metrics["test_mtc"])
    assert 0.0 <= metrics["test_mtc"] <= 1.0


def test_bucket_len_values():
    from avtubes.train.evaluate import bucket_len

    assert [bucket_len(n) for n in (1, 2, 3, 5, 8, 9, 17, 32, 33, 100)] == \
        [1, 2, 4, 8, 8, 16, 32, 32, 64, 128]


def test_bucketed_eval_matches_unpadded():
    """Padding the 2d per-frame batch to a shape bucket must not change the
    heatmaps of the real frames (no cross-sample coupling in eval)."""
    import jax
    import jax.numpy as jnp

    from avtubes.core.config import OptimConfig
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train import create_train_state
    from avtubes.train.steps import eval_heatmap_shared_step

    spec_cfg = SpectrogramConfig()
    state = create_train_state(
        AVENet(), jax.random.PRNGKey(0),
        (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, *spec_cfg.shape, 1))),
        OptimConfig())
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(3, 64, 64, 3).astype(np.float32))
    spec = jnp.asarray(rng.randn(1, *spec_cfg.shape, 1).astype(np.float32))
    direct = np.asarray(eval_heatmap_shared_step(state, frames, spec))
    padded = jnp.concatenate([frames, jnp.broadcast_to(frames[:1], (5, 64, 64, 3))])
    bucketed = np.asarray(eval_heatmap_shared_step(state, padded, spec))[:3]
    np.testing.assert_allclose(direct, bucketed, atol=1e-6)


def test_evaluate_hardway_partial_batch_padded():
    """A last partial batch is padded to the steady-state shape (one compiled
    program, not two) and the padded rows do not leak into the metrics."""
    import jax
    import jax.numpy as jnp

    from avtubes.core.config import OptimConfig
    from avtubes.data.pipeline import BatchLoader, SyntheticSource
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train import create_train_state
    from avtubes.train.evaluate import evaluate_hardway
    from avtubes.train.hardway import _synthetic_gt_lookup

    cfg = DataConfig(image_size=64, synthetic=True)
    spec_cfg = SpectrogramConfig()
    state = create_train_state(
        AVENet(), jax.random.PRNGKey(0),
        (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, *spec_cfg.shape, 1))),
        OptimConfig())
    src = SyntheticSource(cfg, n=5, clip=False, seed=3)
    gt = _synthetic_gt_lookup()
    # batch 2 -> batches of 2,2,1; the 1 is padded to 2 and sliced back
    m_part = evaluate_hardway(state, BatchLoader(src, 2, num_workers=1,
                                                 shuffle=False, drop_last=False),
                              cfg, spec_cfg, gt)
    # batch 5 -> one exact batch, no padding anywhere
    m_full = evaluate_hardway(state, BatchLoader(src, 5, num_workers=1,
                                                 shuffle=False, drop_last=False),
                              cfg, spec_cfg, gt)
    assert m_part["hardway_n"] == m_full["hardway_n"] == 5
    assert m_part["hardway_ciou"] == m_full["hardway_ciou"]
    assert abs(m_part["hardway_auc"] - m_full["hardway_auc"]) < 1e-9


def test_evaluate_perframe_3d_end_to_end(mp4_dataset):
    """FullModel per-frame eval: the sampled frames run as ONE clip through
    the fused 3D mask program (`train_3D.py:152-154` batched-clip trick)."""
    import jax
    import jax.numpy as jnp

    from avtubes.core.config import OptimConfig
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import FullModel
    from avtubes.train import create_train_state
    from avtubes.train.evaluate import evaluate_perframe
    from avtubes.train.hardway import _synthetic_gt_lookup

    root, ids = mp4_dataset
    cfg = DataConfig(image_size=64, sampling_rate=4)
    spec_cfg = SpectrogramConfig()
    src = PerFrameEvalSource(root, ids, cfg)
    state = create_train_state(
        FullModel(), jax.random.PRNGKey(0),
        (jnp.zeros((2, *spec_cfg.shape, 1)), jnp.zeros((1, 2, 64, 64, 3))),
        OptimConfig())
    metrics = evaluate_perframe(state, src, cfg, spec_cfg,
                                _synthetic_gt_lookup(), model_kind="3d")
    assert np.isfinite(metrics["test_ciou"])
    assert np.isfinite(metrics["test_auc"])
    assert 0.0 <= metrics["test_mtc"] <= 1.0
