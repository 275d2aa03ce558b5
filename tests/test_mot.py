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


def test_shared_hypothesis_memory_cannot_double_match():
    """Two GTs that both remember the same hyp id (after an occlusion)
    must not BOTH carry it over — FP/FN stay non-negative and correct."""
    gt = [
        [(1, _box(10, 10))],                       # f0: gt1 <- hyp5
        [(2, _box(50, 50))],                       # f1: gt2 <- hyp5 (!)
        [(1, _box(10, 10)), (2, _box(14, 10))],    # f2: both near hyp5
    ]
    pred = [
        [(5, _box(10, 10))],
        [(5, _box(50, 50))],
        [(5, _box(12, 10, 14, 14))],               # overlaps both GTs
    ]
    r = evaluate_mot(gt, pred, iou_threshold=0.3)
    assert r["fp"] >= 0 and r["fn"] >= 0
    # frame 2: one GT matched, one FN; never negative-FP accounting
    assert r["fn"] == 1 and r["fp"] == 0
    assert r["MOTA"] <= 1.0


def test_idf1_association_is_independent_of_clear_matching():
    """Ristani IDF1: a hypothesis overlapping a GT in EVERY frame is
    credited globally even where CLEAR's continuity rule matched a
    different hypothesis."""
    gt, pred = [], []
    for t in range(6):
        gt.append([(1, _box(10, 10))])
        hyps = [(6, _box(10, 10))]                 # hyp6: all 6 frames
        if t < 3:
            hyps.insert(0, (5, _box(10, 10)))      # hyp5: frames 0-2
        pred.append(hyps)
    r = evaluate_mot(gt, pred)
    # CLEAR matches hyp5 first (greedy/continuity) for frames 0-2, but
    # the global ID assignment credits hyp6 with all 6 frames:
    # IDF1 = 2*6 / (6 gt + 9 pred) = 0.8
    assert r["IDF1"] == pytest.approx(2 * 6 / (6 + 9))


def test_hungarian_fallback_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    from xrseg_tpu.eval.mot import _lsa_maximize
    rng = np.random.default_rng(0)
    for shape in [(3, 3), (5, 2), (2, 5), (7, 7), (1, 4), (6, 1)]:
        m = rng.uniform(0, 10, shape)
        ri, ci = linear_sum_assignment(-m)
        want = m[ri, ci].sum()
        fr, fc = _lsa_maximize(m)
        assert len(set(fr)) == len(fr) and len(set(fc)) == len(fc)
        np.testing.assert_allclose(m[fr, fc].sum(), want, rtol=1e-12)


def test_motchallenge_loader_and_cli(tmp_path):
    """MOTChallenge txt round trip: ltwh -> cxcywh, conf-0 GT rows
    dropped, sparse frames densified; CLI prints the metric JSON."""
    import json
    import subprocess
    import sys

    gt = tmp_path / "gt.txt"
    gt.write_text(
        "1,1,5,5,10,10,1,1,1\n"
        "1,2,50,50,10,10,0,1,1\n"      # conf 0: inactive, dropped
        "2,1,8,5,10,10,1,1,1\n"
        "4,1,14,5,10,10,1,1,1\n")      # frame 3 empty (densified)
    frames = __import__("xrseg_tpu.eval.mot", fromlist=["x"]
                        ).load_motchallenge(str(gt))
    assert len(frames) == 4
    assert len(frames[0]) == 1 and len(frames[2]) == 0
    np.testing.assert_allclose(frames[0][0][1], [10, 10, 10, 10])

    pred = tmp_path / "pred.txt"
    pred.write_text(
        "1,7,5,5,10,10,0.9\n"
        "2,7,8,5,10,10,0.9\n"
        "4,7,14,5,10,10,0.9\n")
    out = subprocess.run(
        [sys.executable, "-m", "xrseg_tpu.eval.mot",
         "--gt", str(gt), "--pred", str(pred)],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    r = json.loads(out.stdout.strip().splitlines()[-1])
    assert r["MOTA"] == pytest.approx(1.0)
    assert r["IDF1"] == pytest.approx(1.0)
