"""Unit tests for cIoU / AUC / mTC against hand-computed fixtures."""

import numpy as np

from avtubes.evaluation import Evaluator, auc_from_ciou, ciou_single, mtc, success_curve


def _box_map(x0, y0, x1, y1):
    m = np.zeros((224, 224))
    m[y0:y1, x0:x1] = 1.0
    return m


def test_ciou_perfect_overlap():
    gt = _box_map(10, 10, 110, 110)
    assert ciou_single(gt, gt, 0.5) == 1.0


def test_ciou_disjoint():
    a = _box_map(0, 0, 50, 50)
    b = _box_map(100, 100, 150, 150)
    # intersection 0; union = sum(gt) + sum(pred outside gt)
    assert ciou_single(a, b, 0.5) == 0.0


def test_ciou_half_overlap_hand_computed():
    pred = _box_map(0, 0, 100, 100)    # 10000 px
    gt = _box_map(50, 0, 150, 100)     # 10000 px
    inter = 50 * 100                   # 5000
    union = 10000 + 5000               # gt + pred-outside-gt
    assert np.isclose(ciou_single(pred, gt, 0.5), inter / union)


def test_ciou_soft_gt():
    """Flickr whole-video GT is soft (values 0.5 where one annotator marked)."""
    gt = _box_map(0, 0, 100, 100) * 0.5
    pred = _box_map(0, 0, 100, 100)
    # inter = sum(pred*gt) = 5000 ; union = sum(gt)=5000 + 0
    assert np.isclose(ciou_single(pred, gt, 0.5), 1.0)


def test_evaluator_accumulates_and_final():
    ev = Evaluator()
    gt = _box_map(0, 0, 100, 100)
    ev.cal_CIOU(gt, gt, 0.5)                      # ciou 1.0
    ev.cal_CIOU(_box_map(200, 200, 224, 224), gt, 0.5)  # ciou 0.0
    assert ev.final() == 0.5
    assert len(ev.ciou) == 2
    ev.clear()
    assert ev.ciou == []


def test_success_curve_and_auc():
    # cious [0.0, 1.0]: success = 1.0 at x=0, 0.5 for 0 < x <= 1
    x, y = success_curve(np.array([0.0, 1.0]))
    assert y[0] == 1.0
    assert np.all(y[1:] == 0.5)
    # trapezoid: first interval (1.0+0.5)/2*0.05 + 19 intervals of 0.5*0.05
    expected = (1.0 + 0.5) / 2 * 0.05 + 19 * 0.5 * 0.05
    assert np.isclose(auc_from_ciou(np.array([0.0, 1.0])), expected)


def test_auc_all_perfect():
    assert np.isclose(auc_from_ciou(np.ones(10)), 1.0)


def test_auc_matches_sklearn():
    from sklearn.metrics import auc as sk_auc

    rng = np.random.RandomState(0)
    cious = rng.rand(50)
    x, y = success_curve(cious)
    assert np.isclose(auc_from_ciou(cious), sk_auc(x, y))


def test_mtc_identical_predictions():
    p = _box_map(10, 10, 100, 100)
    assert mtc([p, p, p]) == 1.0


def test_mtc_alternating():
    a = _box_map(0, 0, 50, 50)
    b = _box_map(100, 100, 150, 150)
    assert mtc([a, b, a]) == 0.0


def test_ciou_empty_gt_empty_pred_is_nan_not_crash():
    """0/0 follows the reference's numpy-scalar semantics (`utils.py:209-214`):
    nan, and the eval loop keeps going — not a ZeroDivisionError."""
    empty = np.zeros((224, 224), np.float32)
    assert np.isnan(ciou_single(empty, empty, 0.5))
    ev = Evaluator()
    c, inter, union = ev.cal_CIOU(empty, empty)
    assert np.isnan(c) and inter == 0 and union == 0
