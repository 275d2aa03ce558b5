"""XRLoop: feed-when-idle + controller-event protocol vs the reference's
IEPassthroughTrigger (Assets/Scripts/InferenceEngine/IEPassthroughTrigger.cs).
"""
import numpy as np
import pytest

from xrseg_tpu.config import ExecutorConfig, ModelConfig, PostprocessConfig
from xrseg_tpu.perception.camera import (CameraIntrinsics, Pose,
                                         quat_identity)
from xrseg_tpu.runtime.executor import Executor
from xrseg_tpu.runtime.frame_source import FrameData
from xrseg_tpu.runtime.xr_loop import (ControllerState, XRLoop,
                                       aim_controller_at_frame_point)


def _tiny_cfg(score_threshold=1e-7):
    return ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(pre_nms_topk=64, max_detections=10,
                               score_threshold=score_threshold))


@pytest.fixture(scope="module")
def executor():
    # detection-guaranteeing fixture weights: every anchor fires, so the
    # select/track/extract paths always execute (no seed luck)
    import jax

    from xrseg_tpu.testing import detection_params
    cfg = _tiny_cfg()
    return Executor(cfg, params=detection_params(jax.random.key(3),
                                                 cfg.model),
                    frame_hw=(64, 64))


def _frame(seed=0, t=0.0):
    rng = np.random.default_rng(seed)
    depth = np.full((32, 32), 1.5, np.float16).view(np.uint16)
    return FrameData(rgb=rng.integers(0, 255, (64, 64, 3), np.uint8),
                     timestamp=t,
                     pose=Pose(np.zeros(3, np.float32), quat_identity()),
                     intrinsics=CameraIntrinsics.quest3_like(),
                     depth_fp16=depth)


def _run_to_result(loop, frame, ctl=None, max_ticks=2000):
    """Tick until a FrameResult completes (the reference likewise spreads
    one inference over several Update ticks, IEExecutor.cs:395-399)."""
    import time
    for _ in range(max_ticks):
        r = loop.tick(frame, ctl)
        if r is not None:
            return r
        time.sleep(0.001)          # display-tick cadence stand-in
    raise AssertionError("no result within max_ticks")


def test_feed_when_idle_and_results(executor):
    loop = XRLoop(executor)
    r = _run_to_result(loop, _frame(0))
    assert r.count >= 0
    # the loop immediately re-feeds on the next tick (Update :67-72)
    loop.tick(_frame(1, t=1 / 30))
    assert executor.is_running()
    _run_to_result(loop, _frame(1, t=1 / 30))


def test_trigger_down_selects_and_held_extracts(executor):
    executor.reset_tracking()
    loop = XRLoop(executor)
    r = _run_to_result(loop, _frame(5))
    assert r.count > 0, "fixture weights must always detect"
    b = r.boxes[0]
    frame_sp = (b.center_x + executor.screen_wh[0] / 2,
                b.center_y + executor.screen_wh[1] / 2)
    fd = _frame(5, t=1 / 30)
    ctl = aim_controller_at_frame_point(fd.intrinsics, fd.pose, frame_sp,
                                        executor.screen_wh)
    # trigger DOWN edge: laser shows, selection locks (:87-104)
    ctl.trigger = True
    loop.tick(fd, ctl)
    assert loop.laser_visible and loop.laser_segment is not None
    assert loop.last_laser_frame_pos is not None
    np.testing.assert_allclose(loop.last_laser_frame_pos, frame_sp, atol=1.5)
    assert loop.selected and executor.is_tracking
    # held (no edge): extraction continues, no re-selection crash
    loop.tick(fd, ctl)
    # release: laser hides, point cloud is kept (:106-112)
    ctl2 = ControllerState(position=ctl.position, forward=ctl.forward,
                           trigger=False)
    loop.tick(fd, ctl2)
    assert not loop.laser_visible and loop.laser_segment is None


def test_b_button_edge_resets_tracking(executor):
    loop = XRLoop(executor)
    r = _run_to_result(loop, _frame(5))
    assert r.count > 0                       # fixture weights always fire
    # select deterministically (no dependence on prior-test state)
    b = r.boxes[0]
    executor.current_frame_boxes = r.boxes
    executor.select_target_from_screen_pos(
        (b.center_x + executor.screen_wh[0] / 2,
         b.center_y + executor.screen_wh[1] / 2))
    assert executor.is_tracking
    ctl = ControllerState(button_b=True)
    loop.tick(_frame(5, t=0.1), ctl)
    assert not executor.is_tracking          # B down edge -> reset (:80-84)
    # holding B does not spam resets: select again while B stays down
    executor.current_frame_boxes = r.boxes
    executor.select_target_from_screen_pos(
        (b.center_x + executor.screen_wh[0] / 2,
         b.center_y + executor.screen_wh[1] / 2))
    loop.tick(_frame(5, t=0.2), ControllerState(button_b=True))
    assert executor.is_tracking              # level, not edge: no reset


def test_controller_handled_without_camera(executor):
    """Controller input works regardless of webcam availability (:60-65)."""
    loop = XRLoop(executor)
    fd = _frame(0)
    fd.rgb = None
    assert loop.tick(fd, ControllerState(button_b=True)) is None


def test_aim_controller_roundtrip():
    """aim_controller_at_frame_point inverts the laser projection."""
    intr = CameraIntrinsics.quest3_like()
    pose = Pose(np.array([0.3, -0.2, 0.1], np.float32), quat_identity())
    for target in [(100.0, 200.0), (320.0, 240.0), (600.0, 50.0)]:
        ctl = aim_controller_at_frame_point(intr, pose, target, (640, 480))
        from xrseg_tpu.perception.camera import laser_screen_position
        cam_px = laser_screen_position(intr, pose, ctl.position, ctl.forward)
        sx = intr.resolution[0] / 640.0
        sy = intr.resolution[1] / 480.0
        np.testing.assert_allclose((cam_px[0] / sx, cam_px[1] / sy), target,
                                   atol=1e-3)
