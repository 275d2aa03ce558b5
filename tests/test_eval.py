"""Evaluation metrics: AP math on constructed scenarios with known answers."""
import numpy as np
import pytest

from xrseg_tpu.eval.metrics import (Detection, GroundTruth, average_precision,
                                    box_iou_xywh, evaluate, mask_iou)


def _d(x, y, w, h, label=0, score=0.9, mask=None):
    return Detection(np.array([x, y, w, h], np.float32), label, score, mask)


def _g(x, y, w, h, label=0, mask=None):
    return GroundTruth(np.array([x, y, w, h], np.float32), label, mask)


def test_box_iou():
    assert box_iou_xywh(np.array([5., 5., 10., 10.]),
                        np.array([5., 5., 10., 10.])) == 1.0
    np.testing.assert_allclose(
        box_iou_xywh(np.array([5., 5., 10., 10.]),
                     np.array([10., 5., 10., 10.])), 50 / 150)


def test_mask_iou():
    a = np.zeros((10, 10), bool); a[:5] = True
    b = np.zeros((10, 10), bool); b[2:7] = True
    np.testing.assert_allclose(mask_iou(a, b), 30 / 70)


def test_perfect_detections_map_one():
    gts = [_g(10, 10, 8, 8), _g(40, 40, 8, 8, label=1)]
    dets = [_d(10, 10, 8, 8, score=0.9), _d(40, 40, 8, 8, label=1, score=0.8)]
    r = evaluate([(dets, gts)])
    assert r["mAP"] == pytest.approx(1.0)
    assert r["AP50"] == pytest.approx(1.0)


def test_false_positive_lowers_ap():
    gts = [_g(10, 10, 8, 8)]
    dets = [_d(100, 100, 8, 8, score=0.95),       # FP, higher score
            _d(10, 10, 8, 8, score=0.9)]          # TP
    r = evaluate([(dets, gts)], iou_thresholds=[0.5])
    # precision at the TP is 1/2; AP ~ 0.5
    assert 0.4 < r["mAP"] < 0.6


def test_missed_gt_lowers_ap():
    gts = [_g(10, 10, 8, 8), _g(40, 40, 8, 8)]
    dets = [_d(10, 10, 8, 8, score=0.9)]
    r = evaluate([(dets, gts)], iou_thresholds=[0.5])
    assert 0.45 < r["mAP"] < 0.55


def test_localization_quality_affects_high_thresholds():
    gts = [_g(10, 10, 10, 10)]
    dets = [_d(11.5, 10, 10, 10, score=0.9)]      # IoU ~0.74
    r = evaluate([(dets, gts)])
    assert r["AP50"] == pytest.approx(1.0)
    assert r["AP75"] == pytest.approx(0.0)
    assert 0.0 < r["mAP"] < 1.0


def test_class_confusion_is_fp():
    gts = [_g(10, 10, 8, 8, label=2)]
    dets = [_d(10, 10, 8, 8, label=3, score=0.9)]
    r = evaluate([(dets, gts)], iou_thresholds=[0.5])
    assert r["mAP"] == 0.0


def test_mask_map():
    m_gt = np.zeros((64, 64), bool); m_gt[10:30, 10:30] = True
    m_good = m_gt.copy()
    m_bad = np.zeros((64, 64), bool); m_bad[40:60, 40:60] = True
    gts = [_g(20, 20, 20, 20, mask=m_gt)]
    r_good = evaluate([([_d(20, 20, 20, 20, mask=m_good)], gts)],
                      use_mask=True, iou_thresholds=[0.5])
    r_bad = evaluate([([_d(20, 20, 20, 20, mask=m_bad)], gts)],
                     use_mask=True, iou_thresholds=[0.5])
    assert r_good["mAP"] == pytest.approx(1.0)
    assert r_bad["mAP"] == 0.0


def test_average_precision_basic():
    # 3 dets, 2nd is FP, 2 GTs total
    ap = average_precision(np.array([0.9, 0.8, 0.7]),
                           np.array([True, False, True]), 2)
    # P@r=0.5 -> 1.0; P@r=1.0 -> 2/3
    assert 0.8 < ap < 0.9
