"""SYSTEM-level metric parity: the reference's full eval pipeline vs ours.

The forward-parity tests compare tensors; this compares the *numbers a
user reads*.  Both stacks score the same synthetic hard-way test set from
the same raw inputs (uint8 frames + waveforms) with the same weights:

  torch side — the reference's own code path, end to end: ImageNet
    normalize, scipy.signal.spectrogram -> log -> /12, reference AVENet
    forward, the verbatim postprocess of `train_hardway.py:219-230`
    (cv2.resize INTER_LINEAR, the reference's `normalize_img`, 1-h,
    sorted-index-25088 median threshold), the reference's own
    `Evaluator.cal_CIOU` (`utils.py:209-214`) and the 21-point
    sklearn-auc success curve (`train_hardway.py:230-236`).

  avtubes side — our production eval driver `evaluate_hardway` over a
    loader of the same raw batches, weights imported through the torch
    converter: device spectrogram, fused jitted mask program, our
    cIoU/AUC.

If a reference user switches frameworks, these are the cIoU/AUC they
compare.  Asserts per-sample cIoU agreement and equal headline metrics.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference repo not mounted")

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")
scipy_signal = pytest.importorskip("scipy.signal")
sk_metrics = pytest.importorskip("sklearn.metrics")

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@pytest.fixture(scope="module")
def ref_stack():
    """(reference AVENet, reference utils module) on CPU."""
    sys.path.insert(0, str(REFERENCE))
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import importlib
    import types

    # `utils.py:5-6` imports torchvision at module level but the functions
    # under test (normalize_img, Evaluator) never touch it — stub it out
    for name in ("torchvision", "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))

    ref_model = importlib.import_module("model")
    ref_utils = importlib.import_module("utils")

    class Args:
        epsilon, epsilon2, tri_map, Neg = 0.65, 0.4, True, True

    torch.manual_seed(21)
    model = ref_model.AVENet(Args(), pretrained=False)
    model.eval()
    return model, ref_utils


def _synthetic_testset(n, rng, samplerate, seconds):
    """n hard-way samples: uint8 frame, [-1,1] waveform, 224x224 GT box."""
    frames = rng.randint(0, 256, (n, 224, 224, 3)).astype(np.uint8)
    waves = (rng.rand(n, samplerate * seconds).astype(np.float32) * 2 - 1)
    gts = {}
    for i in range(n):
        x0, y0 = rng.randint(10, 100, 2)
        w, h = rng.randint(60, 120, 2)
        gt = np.zeros((224, 224), np.float32)
        gt[y0:y0 + h, x0:x0 + w] = 1.0
        gts[f"vid{i}"] = gt
    return frames, waves, gts


def _torch_eval(model, ref_utils, frames, waves, gts, samplerate):
    """The reference hard-way test block (`train_hardway.py:208-239`), fed
    the same raw arrays our loader would yield."""
    from sklearn.metrics import auc

    cious = []
    with torch.no_grad():
        for i in range(frames.shape[0]):
            img = (frames[i].astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
            image_t = torch.tensor(img.transpose(2, 0, 1))[None]
            _, _, S = scipy_signal.spectrogram(
                waves[i], samplerate, nperseg=512, noverlap=1)
            spec = np.log(S + 1e-7).astype(np.float32) / 12.0
            spec_t = torch.tensor(spec)[None, None]
            heatmap, _, _, _, _ = model(image_t.float(), spec_t.float())
            heatmap_arr = heatmap.data.numpy()
            heatmap_now = cv2.resize(heatmap_arr[0, 0], dsize=(224, 224),
                                     interpolation=cv2.INTER_LINEAR)
            heatmap_now = ref_utils.normalize_img(-heatmap_now)
            pred = 1 - heatmap_now
            threshold = np.sort(pred.flatten())[int(pred.shape[0] * pred.shape[1] / 2)]
            pred[pred > threshold] = 1
            pred[pred < 1] = 0
            ciou, _, _ = ref_utils.Evaluator().cal_CIOU(pred, gts[f"vid{i}"], 0.5)
            cious.append(float(ciou))
    results = [np.sum(np.array(cious) >= 0.05 * i) / len(cious) for i in range(21)]
    return {
        "cious": cious,
        "hardway_ciou": float(np.sum(np.array(cious) >= 0.5) / len(cious)),
        "hardway_auc": float(auc([0.05 * i for i in range(21)], results)),
    }


class _ListLoader:
    """Minimal loader: pre-built batches, the epoch()/batch_size contract."""

    def __init__(self, batches):
        self._batches = batches
        self.batch_size = batches[0]["frame"].shape[0]

    def epoch(self, epoch):
        return iter(self._batches)


@pytest.mark.slow
def test_hardway_eval_metric_parity(ref_stack, tmp_path):
    import jax
    import optax

    from avtubes.core.config import DataConfig
    from avtubes.core.torch_import import avenet_from_torch
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train.evaluate import evaluate_hardway
    from avtubes.train.state import AVTrainState

    model, ref_utils = ref_stack
    samplerate, seconds, n = 22050, 10, 4
    rng = np.random.RandomState(33)
    frames, waves, gts = _synthetic_testset(n, rng, samplerate, seconds)

    ref = _torch_eval(model, ref_utils, frames, waves, gts, samplerate)

    ckpt = tmp_path / "ref.pth.tar"
    torch.save({"model_state_dict": model.state_dict()}, ckpt)
    variables = avenet_from_torch(ckpt)
    state = AVTrainState.create(
        apply_fn=AVENet().apply, params=variables["params"],
        tx=optax.sgd(0.0), batch_stats=variables["batch_stats"])

    bsz = 2
    batches = [
        {"frame": frames[i:i + bsz], "waveform": waves[i:i + bsz],
         "id": [f"vid{j}" for j in range(i, min(i + bsz, n))]}
        for i in range(0, n, bsz)
    ]
    evaluated = []
    ours = evaluate_hardway(
        state, _ListLoader(batches), DataConfig(),
        SpectrogramConfig(samplerate=samplerate, seconds=seconds),
        lambda vid, frame=None: gts[vid], evaluated_ids=evaluated)

    assert evaluated == [f"vid{i}" for i in range(n)]
    assert ours["hardway_n"] == n

    # per-sample cIoU: recompute ours sample-by-sample from the same driver
    # internals would re-test plumbing; instead compare the aggregate curve
    # AND per-sample values via a second independent pass of our mask fn.
    from avtubes.evaluation import ciou_single
    from avtubes.train.evaluate import _hardway_eval_masks

    masks = np.asarray(_hardway_eval_masks(
        state, frames, waves,
        SpectrogramConfig(samplerate=samplerate, seconds=seconds)))
    ours_cious = [ciou_single(masks[i], gts[f"vid{i}"], 0.5) for i in range(n)]

    # bilinear-resize + f32-vs-f64-spectrogram noise flips at most a handful
    # of median-tied pixels out of 50,176 -> per-sample cIoU drift << 1e-2
    np.testing.assert_allclose(ours_cious, ref["cious"], atol=1e-2)
    # headline numbers: the 0.5-threshold count must agree exactly; AUC is a
    # 21-point trapezoid of counts -- exact unless a sample sits on a grid
    # boundary, so allow one grid cell of slack
    assert ours["hardway_ciou"] == ref["hardway_ciou"]
    assert abs(ours["hardway_auc"] - ref["hardway_auc"]) <= 0.05 / 2
    jax.clear_caches()


def _torch_eval_perframe(model, ref_utils, videos, samplerate, sampling_rate,
                         gt_lookup):
    """The reference per-frame test block (`train_hardway.py:164-207`):
    per-video cIoU@0.5 / 21-point AUC / mTC over consecutive predictions,
    averaged over videos."""
    from sklearn.metrics import auc

    ious, aucs, mtcs = [], [], []
    with torch.no_grad():
        for vid, clip, wave in videos:
            _, _, S = scipy_signal.spectrogram(
                wave, samplerate, nperseg=512, noverlap=1)
            spec = np.log(S + 1e-7).astype(np.float32) / 12.0
            spec_t = torch.tensor(spec)[None, None]
            iou, preds = [], []
            for i in range(sampling_rate, clip.shape[0] - 1, sampling_rate):
                img = (clip[i].astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
                image_t = torch.tensor(img.transpose(2, 0, 1))[None]
                heatmap, _, _, _, _ = model(image_t.float(), spec_t.float())
                heatmap_now = cv2.resize(heatmap.data.numpy()[0, 0],
                                         dsize=(224, 224),
                                         interpolation=cv2.INTER_LINEAR)
                heatmap_now = ref_utils.normalize_img(-heatmap_now)
                pred = 1 - heatmap_now
                threshold = np.sort(pred.flatten())[int(50176 * 0.5)]
                pred[pred > threshold] = 1
                pred[pred < 1] = 0
                ciou, _, _ = ref_utils.Evaluator().cal_CIOU(
                    pred, gt_lookup(vid, i), 0.5)
                iou.append(float(ciou))
                preds.append(pred)
            mtcs.append(float(ref_utils.mTC(preds, preds)))  # gt arg unused
            results = [np.sum(np.array(iou) >= 0.05 * t) / len(iou)
                       for t in range(21)]
            aucs.append(float(auc([0.05 * t for t in range(21)], results)))
            ious.append(float(np.sum(np.array(iou) >= 0.5) / len(iou)))
    return {"test_ciou": float(np.mean(ious)), "test_auc": float(np.mean(aucs)),
            "test_mtc": float(np.mean(mtcs))}


class _ListSource:
    """Minimal per-frame eval source: len()/load(i) over prebuilt videos."""

    def __init__(self, videos):
        self._videos = videos

    def __len__(self):
        return len(self._videos)

    def load(self, i):
        vid, clip, wave = self._videos[i]
        return {"clip": clip, "waveform": wave, "id": vid}


@pytest.mark.slow
def test_perframe_eval_metric_parity(ref_stack, tmp_path):
    """Whole-video per-frame eval: cIoU/AUC/mTC through the reference's loop
    vs our `evaluate_perframe` driver, same weights, same raw videos."""
    import jax
    import optax

    from avtubes.core.config import DataConfig
    from avtubes.core.torch_import import avenet_from_torch
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train.evaluate import evaluate_perframe
    from avtubes.train.state import AVTrainState

    model, ref_utils = ref_stack
    samplerate, seconds, sampling_rate = 22050, 10, 4
    rng = np.random.RandomState(44)
    videos = []
    gts = {}
    for v in range(2):
        t = 18  # frames i = 4, 8, 12, 16 are scored
        clip = rng.randint(0, 256, (t, 224, 224, 3)).astype(np.uint8)
        wave = rng.rand(samplerate * seconds).astype(np.float32) * 2 - 1
        videos.append((f"vid{v}", clip, wave))
        for i in range(sampling_rate, t - 1, sampling_rate):
            x0, y0 = rng.randint(10, 100, 2)
            w, h = rng.randint(60, 120, 2)
            gt = np.zeros((224, 224), np.float32)
            gt[y0:y0 + h, x0:x0 + w] = 1.0
            gts[(f"vid{v}", i)] = gt

    def gt_lookup(vid, frame=None):
        return gts[(vid, frame)]

    ref = _torch_eval_perframe(model, ref_utils, videos, samplerate,
                               sampling_rate, gt_lookup)

    ckpt = tmp_path / "ref.pth.tar"
    torch.save({"model_state_dict": model.state_dict()}, ckpt)
    variables = avenet_from_torch(ckpt)
    state = AVTrainState.create(
        apply_fn=AVENet().apply, params=variables["params"],
        tx=optax.sgd(0.0), batch_stats=variables["batch_stats"])

    ours = evaluate_perframe(
        state, _ListSource(videos), DataConfig(sampling_rate=sampling_rate),
        SpectrogramConfig(samplerate=samplerate, seconds=seconds), gt_lookup)

    # thresholded per-video fractions must agree exactly; AUC and mTC are
    # continuous means -- tiny pixel-level drift only
    assert ours["test_ciou"] == ref["test_ciou"]
    assert abs(ours["test_auc"] - ref["test_auc"]) <= 0.05 / 2
    assert abs(ours["test_mtc"] - ref["test_mtc"]) <= 1e-2
    jax.clear_caches()
