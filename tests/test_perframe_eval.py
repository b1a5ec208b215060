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
