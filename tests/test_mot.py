"""MOT metrics (eval/mot.py): CLEAR MOT arithmetic pinned on constructed
sequences, then MultiTargetTracker driven end to end and scored."""
import numpy as np
import pytest

from xrseg_tpu.eval.mot import evaluate_mot, track_sequence


def _box(x, y, w=10.0, h=10.0):
    return np.asarray([x, y, w, h], np.float64)


def test_perfect_tracking_scores_one():
    gt = [[(1, _box(10, 10)), (2, _box(50, 50))] for _ in range(5)]
    r = evaluate_mot(gt, gt)
    assert r["MOTA"] == pytest.approx(1.0)
    assert r["IDF1"] == pytest.approx(1.0)
    assert r["id_switches"] == 0 and r["fp"] == 0 and r["fn"] == 0
    assert r["n_gt"] == 10


def test_missed_and_spurious_counts():
    gt = [[(1, _box(10, 10))] for _ in range(4)]
    pred = [[(7, _box(10, 10))],
            [],                                     # miss -> FN
            [(7, _box(10, 10)), (8, _box(90, 90))],  # extra -> FP
            [(7, _box(10, 10))]]
    r = evaluate_mot(gt, pred)
    assert r["fn"] == 1 and r["fp"] == 1 and r["id_switches"] == 0
    assert r["MOTA"] == pytest.approx(1.0 - 2 / 4)


def test_id_switch_counted_once_and_idf1_penalized():
    gt = [[(1, _box(10, 10))] for _ in range(6)]
    pred = ([[(5, _box(10, 10))] for _ in range(3)]
            + [[(6, _box(10, 10))] for _ in range(3)])   # identity flips
    r = evaluate_mot(gt, pred)
    assert r["id_switches"] == 1
    assert r["MOTA"] == pytest.approx(1.0 - 1 / 6)
    # IDF1's global assignment can credit only ONE of the two hyp ids
    assert r["IDF1"] == pytest.approx(2 * 3 / (6 + 6))


def test_continuity_beats_greedy_iou():
    """CLEAR's carry-over rule: a slightly better-IoU stranger must not
    steal a GT's standing correspondence."""
    gt = [[(1, _box(10.0, 10))], [(1, _box(12.0, 10))]]
    # frame 2: hyp 5 (the standing match) drifts to IoU~0.67 while a new
    # hyp 6 sits exactly on the GT
    pred = [[(5, _box(10.0, 10))],
            [(5, _box(14.0, 10)), (6, _box(12.0, 10))]]
    r = evaluate_mot(gt, pred)
    assert r["id_switches"] == 0
    assert r["fp"] == 1                    # hyp 6 is the spurious one


def test_tracker_end_to_end_clean_sequence():
    """MultiTargetTracker on noiseless linear motion: perfect identity."""
    rng = np.random.default_rng(0)
    gt = []
    for t in range(10):
        gt.append([(1, _box(20 + 3 * t, 20)),
                   (2, _box(80 - 3 * t, 60))])
    pred = track_sequence(gt, min_hits=1, iou_threshold=0.2)
    r = evaluate_mot(gt, pred)
    assert r["MOTA"] == pytest.approx(1.0)
    assert r["IDF1"] == pytest.approx(1.0)
    assert r["id_switches"] == 0


def test_tracker_occlusion_coasting_keeps_identity():
    """motion=True (Kalman coasting): through a 2-frame detection
    dropout the track keeps reporting its PREDICTED box (constant
    velocity), so on noiseless linear motion the sequence scores a
    perfect MOTA — no FN, no id switch — where a memoryless tracker
    would at least pay the dropout frames."""
    gt, det = [], []
    for t in range(12):
        b = _box(10 + 6 * t, 30)
        gt.append([(1, b)])
        det.append([] if t in (5, 6) else [(0, b)])
    pred = track_sequence(det, min_hits=1, motion=True, max_misses=4,
                          iou_threshold=0.2)
    r = evaluate_mot(gt, pred)
    assert r["id_switches"] == 0
    assert r["fn"] == 0                    # coasting covers the dropout
    assert r["MOTA"] == pytest.approx(1.0)
    assert r["IDF1"] == pytest.approx(1.0)
    # the same dropout WITHOUT the motion model: the stale box can't
    # re-match the fast mover (18 px of travel vs a 10 px box), so the
    # reacquired object gets a NEW id — an ID SWITCH plus lost frames
    pred2 = track_sequence(det, min_hits=1, motion=False, max_misses=4,
                           iou_threshold=0.2)
    r2 = evaluate_mot(gt, pred2)
    assert r2["MOTA"] < 1.0 and r2["id_switches"] >= 1


def test_motion_model_no_worse_on_crossing_paths():
    """Two same-class objects crossing: the Kalman tracker must not
    produce MORE id switches than memoryless greedy IoU."""
    det = []
    gt = []
    for t in range(16):
        a = _box(10 + 5 * t, 40 + 0.5 * t, 12, 12)
        b = _box(85 - 5 * t, 44 - 0.5 * t, 12, 12)
        gt.append([(1, a), (2, b)])
        det.append([(0, a), (0, b)])
    kwargs = dict(min_hits=1, iou_threshold=0.1, max_misses=3)
    r_greedy = evaluate_mot(gt, track_sequence(det, **kwargs))
    r_kalman = evaluate_mot(gt, track_sequence(det, motion=True, **kwargs))
    assert r_kalman["id_switches"] <= r_greedy["id_switches"]
    assert r_kalman["IDF1"] >= r_greedy["IDF1"] - 1e-9


def test_frame_count_mismatch_raises():
    with pytest.raises(ValueError, match="frames"):
        evaluate_mot([[]], [[], []])
