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


def test_oks_keypoint_ap():
    """Pose AP with OKS similarity: exact keypoints score 1.0; keypoints
    displaced by ~the object size drop OKS below the usable range."""
    from xrseg_tpu.eval.metrics import Detection, GroundTruth, evaluate, oks

    rng = np.random.default_rng(0)
    per_image = []
    for _ in range(4):
        k = np.concatenate([rng.uniform(20, 100, (5, 2)),
                            np.ones((5, 1))], -1).astype(np.float32)
        box = np.asarray([60, 60, 40, 40], np.float32)
        gt = GroundTruth(box, 0, kpts=k)
        det = Detection(box, 0, 0.9, kpts=k.copy())
        per_image.append(([det], [gt]))
    r = evaluate(per_image, similarity="oks")
    np.testing.assert_allclose([r["mAP"], r["AP50"]], 1.0, rtol=1e-9)

    # displace keypoints by ~object scale: OKS collapses
    far = [([Detection(g[1][0].box_xywh, 0, 0.9,
                       kpts=g[1][0].kpts + np.asarray([120, 120, 0]))],
            g[1]) for g in per_image]
    r2 = evaluate(far, similarity="oks")
    assert r2["mAP"] < 0.2
    # oks() itself: exact = 1, and visibility gating works
    k0 = per_image[0][1][0].kpts
    assert abs(oks(k0, k0, 1600.0) - 1.0) < 1e-9
    kv = k0.copy()
    kv[:, 2] = 0
    assert oks(k0, kv, 1600.0) == 0.0


def test_rotated_box_ap():
    """OBB AP with probIoU similarity: exact rotated boxes score 1.0; a
    90-degree-rotated thin box is a miss at AP50."""
    from xrseg_tpu.eval.metrics import Detection, GroundTruth, evaluate

    rng = np.random.default_rng(1)
    per_image = []
    for _ in range(4):
        rb = np.asarray([rng.uniform(40, 90), rng.uniform(40, 90),
                         60, 12, rng.uniform(0, np.pi / 2)], np.float32)
        axis = np.asarray([rb[0], rb[1], 60, 60], np.float32)
        gt = GroundTruth(axis, 0, box_xywhr=rb)
        det = Detection(axis, 0, 0.9, box_xywhr=rb.copy())
        per_image.append(([det], [gt]))
    r = evaluate(per_image, similarity="rbox")
    np.testing.assert_allclose(r["mAP"], 1.0, rtol=1e-9)

    rot = []
    for dets, gts in per_image:
        bad = dets[0].box_xywhr.copy()
        bad[4] += np.pi / 2              # thin box rotated 90 degrees
        rot.append(([Detection(dets[0].box_xywh, 0, 0.9,
                               box_xywhr=bad)], gts))
    r2 = evaluate(rot, similarity="rbox")
    assert r2["AP50"] == 0.0


def test_crowd_ignore_regions():
    """COCO iscrowd semantics: a detection whose only overlap is an
    ignore GT is dropped from scoring (neither TP nor FP); crowd overlap
    is intersection-over-DETECTION-area; crowds are never consumed and
    never count as GT."""
    gt_real = GroundTruth(np.asarray([10.0, 10, 4, 4], np.float32), 0)
    crowd = GroundTruth(np.asarray([25.0, 25, 10, 10], np.float32), 0,
                        ignore=True)
    d_tp = Detection(np.asarray([10.0, 10, 4, 4], np.float32), 0, 0.90)
    # fully inside the crowd (inter/det_area = 1.0), HIGHEST score: would
    # cap AP at 0.5 if counted as FP
    d_crowd = Detection(np.asarray([24.0, 24, 3, 3], np.float32), 0, 0.95)
    d_crowd2 = Detection(np.asarray([27.0, 27, 3, 3], np.float32), 0, 0.93)

    r = evaluate([([d_crowd, d_crowd2, d_tp], [gt_real, crowd])])
    assert r["AP50"] == pytest.approx(1.0)     # both crowd dets ignored

    # same dets with the crowd ABSENT: the two extras become FPs
    r2 = evaluate([([d_crowd, d_crowd2, d_tp], [gt_real])])
    assert r2["AP50"] == pytest.approx(1.0 / 3.0, abs=0.01)

    # crowd of a DIFFERENT class does not shield the detection
    crowd_other = GroundTruth(crowd.box_xywh, 1, ignore=True)
    r3 = evaluate([([d_crowd, d_tp], [gt_real, crowd_other])])
    assert r3["AP50"] < 1.0

    # a det overlapping crowd by under the threshold stays an FP:
    # inter/det_area = (2*6)/(6*6) ≈ 0.33 < 0.5
    d_edge = Detection(np.asarray([19.0, 24, 6, 6], np.float32), 0, 0.94)
    r4 = evaluate([([d_edge, d_tp], [gt_real, crowd])])
    assert r4["AP50"] < 1.0

    # mask-form crowd: ignore region as pixels, det mask area rules
    h = w = 40
    cm = np.zeros((h, w), bool)
    cm[20:30, 20:30] = True
    dm = np.zeros((h, w), bool)
    dm[22:25, 22:25] = True
    gm_real = np.zeros((h, w), bool)
    gm_real[8:12, 8:12] = True
    crowd_m = GroundTruth(crowd.box_xywh, 0, mask=cm, ignore=True)
    gt_m = GroundTruth(gt_real.box_xywh, 0, mask=gm_real)
    d_m_tp = Detection(gt_real.box_xywh, 0, 0.9, mask=gm_real)
    d_m_crowd = Detection(np.asarray([23.0, 23, 3, 3], np.float32), 0,
                          0.95, mask=dm)
    rm = evaluate([([d_m_crowd, d_m_tp], [gt_m, crowd_m])],
                  similarity="mask")
    assert rm["AP50"] == pytest.approx(1.0)


def test_decode_coco_rle():
    """Uncompressed counts list and mask-API compressed string both
    decode; column-major order; round-trip against a reference encoder."""
    from xrseg_tpu.train.data import decode_coco_rle

    # hand case: 3x3, column-major runs [1,2,3,3] -> F-order flat
    m = decode_coco_rle({"size": [3, 3], "counts": [1, 2, 3, 3]})
    flat = m.T.reshape(-1)             # back to column-major
    np.testing.assert_array_equal(
        flat, [0, 1, 1, 0, 0, 0, 1, 1, 1])

    rng = np.random.default_rng(0)
    ref = rng.uniform(size=(17, 23)) > 0.6

    def encode_counts(mask):
        f = mask.T.reshape(-1).astype(np.int8)
        edges = np.flatnonzero(np.diff(f)) + 1
        runs = np.diff(np.concatenate([[0], edges, [len(f)]]))
        if f[0] == 1:                  # must start with a zero-run
            runs = np.concatenate([[0], runs])
        return runs.tolist()

    counts = encode_counts(ref)
    np.testing.assert_array_equal(
        decode_coco_rle({"size": list(ref.shape), "counts": counts}), ref)

    def compress(counts):              # pycocotools rleToString
        s = []
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = (x != -1) if (c & 0x10) else (x != 0)
                if more:
                    c |= 0x20
                s.append(chr(c + 48))
        return "".join(s)

    comp = compress(counts)
    np.testing.assert_array_equal(
        decode_coco_rle({"size": list(ref.shape), "counts": comp}), ref)
