"""Visualization layer: boxer, masker smoothing, gradient, PLY export."""
import os

import numpy as np

from xrseg_tpu.perception.camera import Pose, quat_from_axis_angle, quat_identity
from xrseg_tpu.perception.tracking import BoundingBox
from xrseg_tpu.viz.boxer import Boxer, MAX_DRAWN_BOXES
from xrseg_tpu.viz.masker import Masker, composite_overlay, smooth_damp
from xrseg_tpu.viz.pointcloud import DepthGradient, world_to_local, write_ply


def test_boxer_draws_rectangle():
    frame = np.zeros((100, 200, 3), np.uint8)
    b = BoundingBox(0, 0, 40, 20, label=0, class_name="person", score=0.9)
    out = Boxer().draw_boxes(frame, [b])
    # center of 200x100 frame is (100,50); box spans x 80..120, y 40..60
    assert out[40, 100].any()          # top edge colored
    assert out[50, 80].any()           # left edge
    assert not out[50, 100].any()      # interior untouched
    assert not frame.any()             # original untouched


def test_boxer_cap_200():
    frame = np.zeros((64, 64, 3), np.uint8)
    boxes = [BoundingBox(0, 0, 10, 10, label=i % 80) for i in range(300)]
    Boxer().draw_boxes(frame, boxes)   # must not raise; cap applied
    assert MAX_DRAWN_BOXES == 200


def test_smooth_damp_converges_no_overshoot():
    cur = np.array([0.0, 0.0])
    vel = np.zeros(2)
    target = np.array([10.0, -5.0])
    for _ in range(200):
        cur, vel = smooth_damp(cur, target, vel, 0.05, 1 / 60)
        assert cur[0] <= 10.0 + 1e-5 and cur[1] >= -5.0 - 1e-5
    np.testing.assert_allclose(cur, target, atol=1e-3)


def test_masker_overlay_placement():
    mk = Masker(confidence_threshold=0.5)
    mask = np.zeros((160, 160), np.float32)
    mask[40:120, 40:120] = 0.9
    box = BoundingBox(0, 0, 160, 160, label=3)
    mk.draw_single_mask(box, mask, (640, 640), dt=1 / 30)
    ov = mk.render_overlay((640, 640))
    assert ov.shape == (640, 640, 4)
    assert ov[320, 320, 3] == 191          # center inside mask, alpha 0.75
    assert ov[10, 10, 3] == 0              # outside
    frame = np.zeros((640, 640, 3), np.uint8)
    blended = composite_overlay(frame, ov)
    assert blended[320, 320].any()


def test_masker_crop_to_box():
    mk = Masker(confidence_threshold=0.5)
    mask = np.ones((160, 160), np.float32)        # everything confident
    box = BoundingBox(0, 0, 80, 80, label=0)      # small centered box
    mk.draw_single_mask(box, mask, (640, 640), dt=1 / 30)
    # cached mask cropped to box bounds in mask space
    m = mk._cached_mask
    assert m[80, 80] and not m[10, 10]


def test_masker_keep_on_lost_frame():
    mk = Masker()
    mask = np.ones((160, 160), np.float32)
    mk.draw_single_mask(BoundingBox(0, 0, 100, 100), mask, (640, 640))
    mk.keep_current_mask()
    assert mk.has_cached_mask
    mk.reset()
    assert not mk.has_cached_mask
    assert not mk.render_overlay((640, 640)).any()


def test_depth_gradient_golden():
    g = DepthGradient()
    # ref mapping: t = (depth-0.2)/2 ; red at near, blue at far
    c = g.color_by_depth(np.array([0.2, 2.2, 1.2]))
    np.testing.assert_array_equal(c[0], [255, 0, 0])
    np.testing.assert_array_equal(c[1], [0, 0, 255])
    assert c[2][0] == c[2][2]    # midpoint purple-ish


def test_world_to_local_drift_free():
    pts = np.array([[1.0, 2.0, 3.0]])
    pose = Pose(np.array([1.0, 0.0, 0.0]),
                quat_from_axis_angle([0, 1, 0], np.pi / 2))
    loc = world_to_local(pts, pose)
    # inverse transform: R^-1 (p - t); 90° about Y maps world +z to local...
    np.testing.assert_allclose(loc, [[-3.0, 2.0, 0.0]], atol=1e-5)


def test_ply_writer(tmp_path):
    path = os.path.join(tmp_path, "cloud.ply")
    pts = np.array([[0, 0, 1], [1, 0, 0]], np.float32)
    cols = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    write_ply(path, pts, cols)
    txt = open(path).read()
    assert "element vertex 2" in txt and "255 0 0" in txt


def test_draw_masks_multi():
    from xrseg_tpu.viz.masker import draw_masks_multi
    masks = np.zeros((2, 160, 160), np.float32)
    masks[0, 70:90, 70:90] = 0.9       # centered object
    masks[1, :, :] = 0.9               # full mask, cropped by its box
    boxes = [BoundingBox(0, 0, 160, 160, label=0, index=0),
             BoundingBox(-200, 0, 40, 40, label=1, index=1)]
    ov = draw_masks_multi(boxes, masks, (640, 480))
    assert ov.shape == (480, 640, 4)
    assert ov[240, 320, 3] == 191           # object 0 center lit
    assert ov[240, 120, 3] == 191           # object 1 (cropped to its box)
    assert ov[10, 10, 3] == 0
    # colors differ per class
    assert tuple(ov[240, 320, :3]) != tuple(ov[240, 120, :3])


def test_masker_lost_frame_keeps_damping():
    """A lost frame must keep SmoothDamp advancing toward the last target
    (ref runs SmoothDamp from Update() every frame, IEMasker.cs:65-80)."""
    mk = Masker()
    mask = np.ones((160, 160), np.float32)
    mk.draw_single_mask(BoundingBox(0, 0, 100, 100), mask, (640, 640))
    # target jumps; one short-dt draw leaves the smoothed pos lagging
    mk.draw_single_mask(BoundingBox(200, 100, 100, 100), mask, (640, 640),
                        dt=1e-3)
    target = mk._target_pos.copy()
    d0 = np.linalg.norm(mk._pos - target)
    assert d0 > 1.0                      # still far from the new target
    mk.keep_current_mask(dt=1 / 30)      # lost frame
    d1 = np.linalg.norm(mk._pos - target)
    assert d1 < d0                       # kept moving, didn't freeze
    mk.keep_current_mask(dt=1 / 30)
    d2 = np.linalg.norm(mk._pos - target)
    assert d2 < d1


def test_draw_rotated_boxes_and_keypoints():
    from xrseg_tpu.viz.boxer import draw_keypoints, draw_rotated_boxes

    frame = np.zeros((64, 64, 3), np.uint8)
    rb = np.asarray([[32, 32, 24, 10, 0.6]], np.float32)
    out = draw_rotated_boxes(frame, rb, np.asarray([1]),
                             np.asarray([0.9]), count=1)
    assert out.shape == frame.shape and out.sum() > 0
    assert frame.sum() == 0                   # input untouched

    kpts = np.asarray([[[20, 20, 1.0], [40, 20, 1.0], [30, 40, 0.1]]],
                      np.float32)
    out2 = draw_keypoints(frame, kpts, skeleton=[(0, 1), (1, 2)])
    assert out2.sum() > 0
    # the low-visibility keypoint is not drawn
    assert out2[38:42, 28:32].sum() == 0
