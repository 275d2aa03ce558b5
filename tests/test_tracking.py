"""Tracking, selection, and coordinate-convention golden tests.

The reference's screen-space conventions (center origin, Y flip at
IEExecutor.cs:543-544) are easy to get subtly wrong — encoded here as
goldens per SURVEY.md §7 hard part (d).
"""
import numpy as np

from xrseg_tpu.perception.tracking import (
    BoundingBox, TargetTracker, box_to_model_space, iou, parse_boxes)
from xrseg_tpu.viz.labels import COCO_LABELS


def test_parse_boxes_y_flip_golden():
    # model-space box at (320,320) = image center -> screen (0,0)
    boxes = np.array([[320.0, 320.0, 64.0, 32.0],
                      [0.0, 0.0, 10.0, 10.0],       # top-left model corner
                      [640.0, 640.0, 10.0, 10.0]])  # bottom-right
    labels = np.array([0, 2, 5])
    scores = np.array([0.9, 0.8, 0.7])
    out = parse_boxes(boxes, labels, scores, 3, (1280.0, 960.0), COCO_LABELS)
    sx, sy = 2.0, 1.5
    assert (out[0].center_x, out[0].center_y) == (0.0, 0.0)
    assert (out[0].width, out[0].height) == (64 * sx, 32 * sy)
    # model (0,0) -> screen (-320*sx, +320*sy): top of screen is +Y
    assert (out[1].center_x, out[1].center_y) == (-320 * sx, 320 * sy)
    assert (out[2].center_x, out[2].center_y) == (320 * sx, -320 * sy)
    assert out[0].class_name == "person" and out[2].class_name == "bus"


def test_parse_boxes_roundtrip():
    boxes = np.array([[100.0, 480.0, 50.0, 80.0]])
    out = parse_boxes(boxes, np.array([1]), np.array([0.5]), 1, (1920.0, 1080.0),
                      COCO_LABELS)
    back = box_to_model_space(out[0], (1920.0, 1080.0))
    np.testing.assert_allclose(back, boxes[0], rtol=1e-6)


def test_parse_boxes_caps_at_50():
    boxes = np.tile([[320.0, 320.0, 10.0, 10.0]], (80, 1))
    out = parse_boxes(boxes, np.zeros(80, int), np.ones(80), 80,
                      (640.0, 640.0), COCO_LABELS)
    assert len(out) == 50     # ref cap IEExecutor.cs:534


def test_iou_golden():
    a = BoundingBox(0, 0, 10, 10)
    b = BoundingBox(5, 0, 10, 10)
    np.testing.assert_allclose(iou(a, b), 50 / 150, rtol=1e-6)
    assert iou(a, BoundingBox(100, 100, 10, 10)) == 0.0
    assert iou(a, a) == 1.0


def _box(cx, cy, name="person", label=0):
    return BoundingBox(cx, cy, 50, 50, label=label, class_name=name)


def test_tracker_lock_and_follow():
    tr = TargetTracker()
    boxes = [_box(0, 0), _box(300, 300, "car", 2)]
    # select near (0,0) in centered coords -> screen pos center
    assert tr.select_target(boxes, (640, 480), (1280, 960))
    assert tr.is_tracking and tr.locked_box.class_name == "person"
    # next frame: person moved slightly, car closer to old pos but wrong class
    nxt = [_box(40, 30), _box(5, 5, "car", 2)]
    m = tr.update(nxt)
    assert m is not None and m.center_x == 40
    assert tr.locked_box.center_x == 40   # lock follows


def test_tracker_gate_300px():
    tr = TargetTracker()
    tr.locked_box = _box(0, 0)
    tr.is_tracking = True
    # same class but 400px away -> lost frame, lock kept
    assert tr.update([_box(400, 0)]) is None
    assert tr.is_tracking and tr.locked_box.center_x == 0
    # 200px away -> match
    assert tr.update([_box(200, 0)]) is not None


def test_select_margin_50px():
    tr = TargetTracker()
    # box at center, 50x50: margin-expanded half-extent = 25+50 = 75
    boxes = [_box(0, 0)]
    assert tr.select_target(boxes, (640 + 74, 480), (1280, 960))
    tr.reset()
    assert not tr.select_target(boxes, (640 + 76, 480), (1280, 960))
    assert not tr.is_tracking


def test_find_at_screen_pos_miss_returns_none():
    tr = TargetTracker()
    assert tr.find_at_screen_pos([_box(0, 0)], (0, 0), (1280, 960)) is None


def test_reset_clears_state():
    tr = TargetTracker()
    tr.select_target([_box(0, 0)], (640, 480), (1280, 960))
    tr.reset()
    assert not tr.is_tracking and tr.locked_box is None


def test_multi_target_tracker_lifecycle():
    from xrseg_tpu.perception.tracking import MultiTargetTracker
    tr = MultiTargetTracker(iou_threshold=0.3, max_misses=2, min_hits=2)
    a0 = _box(0, 0)
    b0 = _box(300, 300, "car", 2)
    assert tr.update([a0, b0]) == []          # first frame: unconfirmed
    # second frame: both move slightly -> confirmed, ids stable
    a1 = _box(10, 0)
    b1 = _box(305, 300, "car", 2)
    conf = tr.update([a1, b1])
    assert len(conf) == 2
    ids = {t.box.class_name: t.track_id for t in conf}
    # third frame: person disappears; car persists
    conf = tr.update([_box(310, 300, "car", 2)])
    assert [t.box.class_name for t in conf if t.misses == 0] == ["car"]
    car = [t for t in conf if t.box.class_name == "car"][0]
    assert car.track_id == ids["car"]
    # person track survives max_misses frames then retires
    tr.update([]); tr.update([])
    assert all(t.box.class_name != "person" for t in tr.tracks)


def test_multi_target_no_cross_class_match():
    from xrseg_tpu.perception.tracking import MultiTargetTracker
    tr = MultiTargetTracker(min_hits=1)
    tr.update([_box(0, 0, "person", 0)])
    conf = tr.update([_box(0, 0, "car", 2)])   # same spot, wrong class
    names = {t.box.class_name for t in tr.tracks}
    assert names == {"person", "car"}          # two tracks, not one


def test_multi_target_reset():
    from xrseg_tpu.perception.tracking import MultiTargetTracker
    tr = MultiTargetTracker(min_hits=1)
    tr.update([_box(0, 0)])
    tr.reset()
    assert tr.tracks == [] and tr.update([_box(0, 0)])[0].track_id == 1


# ---------------------------------------------------------------------------
# Kalman motion model (SORT-style capability extension)
# ---------------------------------------------------------------------------

def _bb(cx, cy, w=40.0, h=40.0, name="person"):
    from xrseg_tpu.perception.tracking import BoundingBox
    return BoundingBox(center_x=cx, center_y=cy, width=w, height=h,
                       label=0, class_name=name, score=0.9)


def test_kalman_learns_constant_velocity():
    from xrseg_tpu.perception.tracking import KalmanBoxFilter

    kf = KalmanBoxFilter(_bb(0.0, 0.0))
    # observe an object moving +10 px/frame in x
    for i in range(1, 8):
        kf.predict()
        kf.update(_bb(10.0 * i, 0.0))
    # predicting two more frames extrapolates along the learned velocity
    p1 = kf.predict()
    p2 = kf.predict()
    assert abs(p1[0] - 80.0) < 2.0
    assert abs(p2[0] - 90.0) < 2.0
    assert abs(p2[1]) < 1.0


def test_motion_tracker_survives_occlusion_of_fast_mover():
    """A fast mover (step > box size) occluded for 2 frames: the motion
    tracker coasts on predicted velocity and re-associates (same id);
    the memoryless tracker cannot (zero IoU with the stale box)."""
    from xrseg_tpu.perception.tracking import MultiTargetTracker

    def run(motion):
        tr = MultiTargetTracker(iou_threshold=0.3, max_misses=3,
                                min_hits=1, motion=motion)
        # visible for 6 frames at +20 px/frame (box is 40 px wide, so
        # consecutive frames still overlap enough for the initial match)
        for i in range(6):
            tr.update([_bb(20.0 * i, 0.0)])
        tid = tr.confirmed[0].track_id
        tr.update([])                      # occluded
        tr.update([])                      # occluded
        # reappears on-trajectory, 60 px past the last sighting: zero IoU
        # with the stale box, but the prediction has coasted there
        out = tr.update([_bb(20.0 * 8, 0.0)])
        # id of the track that owns the reappeared detection (x=160)
        owner = [t.track_id for t in out
                 if abs(t.box.center_x - 160.0) < 5.0]
        return tid, owner

    tid, owner = run(motion=True)
    assert owner == [tid], f"motion tracker should re-associate {tid}: {owner}"
    tid2, owner2 = run(motion=False)
    assert owner2 and tid2 not in owner2, \
        "memoryless tracker should give the reappearance a new id"


def test_motion_tracker_smooths_noisy_boxes():
    """Matched updates publish the filtered box: with zero-mean observation
    noise the track position stays closer to truth than the raw detection."""
    from xrseg_tpu.perception.tracking import MultiTargetTracker

    rng = np.random.default_rng(0)
    tr = MultiTargetTracker(min_hits=1, motion=True)
    err_det, err_trk = [], []
    for i in range(30):
        truth = 5.0 * i
        noise = float(rng.normal(0, 4.0))
        det = _bb(truth + noise, 0.0)
        tr.update([det])
        if i >= 10:                       # after velocity converges
            err_det.append(abs(noise))
            err_trk.append(abs(tr.confirmed[0].box.center_x - truth))
    assert np.mean(err_trk) < np.mean(err_det)


def test_reid_reacquires_after_long_occlusion():
    """Appearance re-ID: after an occlusion too long for IoU/motion gating,
    a lost track reacquires the unmatched same-class detection whose
    embedding matches (cosine), while a distractor with a different
    embedding spawns a new track."""
    from xrseg_tpu.perception.tracking import MultiTargetTracker

    rng = np.random.default_rng(0)
    e_target = rng.normal(0, 1, 32).astype(np.float32)
    e_other = rng.normal(0, 1, 32).astype(np.float32)

    tr = MultiTargetTracker(iou_threshold=0.3, max_misses=6, min_hits=1,
                            reid_threshold=0.7)
    # target visible at x=0 for 3 frames
    for _ in range(3):
        tr.update([_bb(0.0, 0.0)], embeddings=e_target[None])
    tid = tr.confirmed[0].track_id
    tr.update([])                          # occluded
    tr.update([])                          # occluded
    # reappears FAR away (zero IoU with the stale box) + a distractor
    out = tr.update([_bb(300.0, 0.0), _bb(-300.0, 0.0)],
                    embeddings=np.stack([
                        e_target + rng.normal(0, 0.05, 32).astype(np.float32),
                        e_other]))
    by_x = {round(t.box.center_x): t.track_id for t in out}
    assert by_x[300] == tid, "matching embedding should keep the id"
    assert by_x[-300] != tid, "distractor must get a new id"


def test_reid_respects_class_gate():
    from xrseg_tpu.perception.tracking import MultiTargetTracker

    e = np.ones(32, np.float32)
    tr = MultiTargetTracker(min_hits=1, max_misses=5, reid_threshold=0.5)
    tr.update([_bb(0.0, 0.0, name="person")], embeddings=e[None])
    tid = tr.confirmed[0].track_id
    tr.update([])
    # same embedding but different class: no re-ID
    out = tr.update([_bb(300.0, 0.0, name="dog")], embeddings=e[None])
    assert all(t.track_id != tid or t.box.class_name == "person"
               for t in out)
    assert any(t.box.class_name == "dog" and t.track_id != tid
               for t in out)


def test_reid_embedding_ema():
    from xrseg_tpu.perception.tracking import MultiTargetTracker

    tr = MultiTargetTracker(min_hits=1, reid_threshold=0.5,
                            embedding_momentum=0.5)
    e1 = np.zeros(32, np.float32); e1[0] = 1.0
    e2 = np.zeros(32, np.float32); e2[1] = 1.0
    tr.update([_bb(0.0, 0.0)], embeddings=e1[None])
    tr.update([_bb(0.0, 0.0)], embeddings=e2[None])
    emb = tr.tracks[0].embedding
    np.testing.assert_allclose(emb[:2], [0.5, 0.5])


def _scored_box(cx, cy, score, name="person", label=0):
    return BoundingBox(cx, cy, 50, 50, label=label, class_name=name,
                       score=score)


def test_bytetrack_survives_confidence_dip():
    """ByteTrack two-stage association (high_score>0): a track whose
    detection confidence dips below the gate for a few frames keeps its
    identity through the LOW-score detections; the classic setup (only
    gate-passing detections reach the tracker) breaks the identity.
    Scored with the CLEAR-MOT/IDF1 harness."""
    from xrseg_tpu.eval.mot import evaluate_mot
    from xrseg_tpu.perception.tracking import MultiTargetTracker

    # one object drifting right; frames 4-6 are "occluded" (score 0.12)
    scores = [0.8, 0.8, 0.8, 0.8, 0.12, 0.12, 0.12, 0.8, 0.8, 0.8, 0.8]
    dets = [_scored_box(10 * f, 0, s) for f, s in enumerate(scores)]
    # plus per-frame background noise that must never become a track
    noise = [_scored_box(400, 400, 0.11, "person") for _ in scores]

    byte_tr = MultiTargetTracker(max_misses=2, min_hits=2,
                                 high_score=0.25)
    classic = MultiTargetTracker(max_misses=2, min_hits=2)

    byte_frames, classic_frames, gt_frames = [], [], []
    for f, d in enumerate(dets):
        gt_frames.append([(1, np.asarray([d.center_x, d.center_y,
                                          50.0, 50.0]))])
        bt = byte_tr.update([d, noise[f]])       # low gate: sees all
        high = [b for b in (d, noise[f]) if b.score >= 0.25]
        ct = classic.update(high)                # deploy gate: high only
        byte_frames.append([(t.track_id, np.asarray(
            [t.box.center_x, t.box.center_y, 50.0, 50.0])) for t in bt])
        classic_frames.append([(t.track_id, np.asarray(
            [t.box.center_x, t.box.center_y, 50.0, 50.0])) for t in ct])

    byte_ids = {i for fr in byte_frames for i, _ in fr}
    classic_ids = {i for fr in classic_frames for i, _ in fr}
    assert len(byte_ids) == 1, byte_frames       # identity survives dip
    assert len(classic_ids) >= 2, classic_frames  # classic re-spawns
    # the noise detection never confirmed (low scores don't spawn)
    assert all(len(fr) <= 1 for fr in byte_frames)

    mb = evaluate_mot(gt_frames, byte_frames)
    mc = evaluate_mot(gt_frames, classic_frames)
    assert mb["IDF1"] > mc["IDF1"], (mb, mc)
    assert mb["id_switches"] == 0
    assert mb["MOTA"] >= mc["MOTA"]
