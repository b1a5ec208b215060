"""VGGSS end-to-end: synthetic vggss fixture through eval + training paths.

The reference's VGGSS protocol (`/root/reference/test.py:77-83`,
`utils.py:264-274`): vggss.json is preloaded into an id->bbox index, GT is
normalized-coordinate boxes rasterized to 224x224, the test loader reads
`frames/<id>.jpg` + `audio/<id>.wav` off vggss_test.csv.
"""

import numpy as np
import pytest

from avtubes.data.synthetic import write_synthetic_vggss


@pytest.fixture(scope="module")
def vggss_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vggss")
    ids = write_synthetic_vggss(root, n_clips=3, frames=4,
                                samplerate=2000, seconds=1, image_hw=(128, 160))
    return root, ids


def test_vggss_fixture_layout(vggss_root):
    root, ids = vggss_root
    assert (root / "metadata" / "vggss.json").exists()
    assert (root / "metadata" / "vggss_test.csv").exists()
    for vid in ids:
        assert (root / "frames" / f"{vid}.jpg").exists()
        assert (root / "audio" / f"{vid}.wav").exists()
        assert (root / "videos" / vid / "0.jpg").exists()


def test_vggss_gt_lookup(vggss_root):
    root, ids = vggss_root
    from avtubes.core.config import DataConfig
    from avtubes.train.evaluate import make_gt_lookup_auto

    cfg = DataConfig(testset="vggss", metadata_dir=str(root / "metadata"))
    lookup = make_gt_lookup_auto(cfg)
    gt = lookup(ids[0], None)
    assert gt.shape == (224, 224)
    # centered normalized box [0.25,0.25,0.75,0.75] -> 112x112 ones block
    assert gt[112, 112] == 1.0 and gt[10, 10] == 0.0
    assert gt.sum() == 112 * 112


def test_vggss_quantitative_cli(vggss_root):
    root, ids = vggss_root
    from avtubes.cli.test_quantitative import main

    metrics = main([
        "--testset", "vggss", "--og_data_path", str(root),
        "--metadata_dir", str(root / "metadata"), "--summaries_dir", str(root),
        "--image_size", "64", "--compute_dtype", "float32",
        "--samplerate", "2000", "--audio_seconds", "1", "--n_threads", "2",
    ])
    assert metrics["hardway_n"] == len(ids)
    assert np.isfinite(metrics["hardway_ciou"])
    assert np.isfinite(metrics["hardway_auc"])
    # the center-gaussian comparison column (test.py:93,106-107) is always
    # reported next to the model's numbers
    assert 0.0 <= metrics["gaussian_ciou"] <= 1.0
    assert np.isfinite(metrics["gaussian_auc"])


def test_vggss_training_eval(vggss_root, tmp_path):
    """Training with --testset vggss must run its per-epoch hard-way eval
    against vggss.json GT without asserting (the round-1 failure mode)."""
    from avtubes.core.config import (
        DataConfig,
        ExperimentConfig,
        OptimConfig,
        TrainConfig,
    )
    from avtubes.train.hardway import run

    root, ids = vggss_root
    cfg = ExperimentConfig(
        data=DataConfig(testset="vggss", data_path=str(root),
                        metadata_dir=str(root / "metadata"), image_size=64,
                        frame_density=2, samplerate=2000, audio_seconds=1,
                        n_threads=2),
        optim=OptimConfig(batch_size=2, epochs=1, learning_rate=1e-4),
        train=TrainConfig(summaries_dir=str(tmp_path), compute_dtype="float32",
                          log_every=1),
    )
    metrics = run(cfg, steps_cap=1, tag="vggss_smoke")
    for key in ("loss", "hardway_ciou", "hardway_auc"):
        assert key in metrics and np.isfinite(metrics[key]), key
