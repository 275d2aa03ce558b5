"""End-to-end XR loop on CPU with the reference's real weights:

synthetic passthrough camera (bus-image background + synthetic depth +
orbiting pose) -> executor -> laser selection -> tracking -> device-fused
RGBD extraction -> overlays + PLY. This is the XRScene-parity flow as a
repeatable test (the demo drives the same path interactively on TPU).
"""
import os

import numpy as np
import pytest

SENTIS = "/root/reference/Assets/Resources/Model/yolo11n-seg-sentis.sentis"
IMAGES = "/root/reference/Assets/Resources/Images"

pytestmark = pytest.mark.skipif(not os.path.exists(SENTIS),
                                reason="reference assets not available")


@pytest.fixture(scope="module")
def xr_executor():
    from xrseg_tpu.config import ExecutorConfig, PostprocessConfig, DepthConfig
    from xrseg_tpu.io.sentis import load_yolo11_params
    from xrseg_tpu.runtime.executor import Executor
    params, mcfg = load_yolo11_params(SENTIS)
    cfg = ExecutorConfig(
        model=mcfg,
        post=PostprocessConfig(iou_threshold=0.43, score_threshold=0.301),
        depth=DepthConfig(sampling_step=5),
        enable_ui_rendering=True)
    return Executor(cfg, params=params, frame_hw=(480, 640))


@pytest.fixture(scope="module")
def source():
    from PIL import Image
    from xrseg_tpu.runtime.frame_source import SyntheticCameraSource
    bg = np.asarray(Image.open(
        os.path.join(IMAGES, "000000002006.jpg")).convert("RGB"), np.uint8)
    return SyntheticCameraSource(frame_hw=(480, 640), depth_hw=(128, 128),
                                 max_frames=6, background_rgb=bg)


def test_full_xr_loop(xr_executor, source, tmp_path):
    from xrseg_tpu.runtime.xr_loop import XRLoop, aim_controller_at_frame_point
    from xrseg_tpu.viz.masker import composite_overlay
    from xrseg_tpu.viz.pointcloud import write_ply

    ex = xr_executor
    loop = XRLoop(ex, intrinsics=source.intrinsics)
    results = []
    cloud = None
    ctl = None
    for fd in source.frames():
        # drain the state machine synchronously (tick until a result;
        # one frame takes seconds on this 1-core CPU box)
        import time
        r = None
        deadline = time.monotonic() + 300
        while r is None and time.monotonic() < deadline:
            r = loop.tick(fd, ctl)
            if r is None:
                time.sleep(0.005)
        assert r is not None
        results.append(r)
        if not loop.selected and r.count > 0:
            # laser-select the top detection (bus) through the library loop
            b = r.boxes[0]
            assert b.class_name == "bus" and b.score > 0.7
            frame_sp = (b.center_x + ex.screen_wh[0] / 2,
                        b.center_y + ex.screen_wh[1] / 2)
            ctl = aim_controller_at_frame_point(
                source.intrinsics, fd.pose, frame_sp, ex.screen_wh)
            ctl.trigger = True                 # held: extract every tick
            loop.tick(fd, ctl)                 # down edge: select
            assert loop.selected
        if r.tracked is not None:
            assert r.tracked.class_name == "bus"
            if r.point_cloud is not None and len(r.point_cloud.positions):
                cloud = r.point_cloud

    assert loop.selected, "bus was never detected/selected"
    assert any(r.tracked is not None for r in results), "tracking never locked"
    assert cloud is not None and len(cloud.positions) > 100
    # depth plane at 1.5 m: extracted points sit near it
    assert 1.0 < np.median(cloud.depths) < 2.0
    assert cloud.colors.shape == (len(cloud.positions), 3)

    # overlay render path
    assert ex.masker.has_cached_mask
    over = ex.boxer.draw_boxes(
        np.zeros((480, 640, 3), np.uint8), results[-1].boxes)
    over = composite_overlay(over, ex.masker.render_overlay((640, 480)))
    assert over.any()

    # PLY export
    ply = os.path.join(tmp_path, "cloud.ply")
    write_ply(ply, cloud.positions, cloud.colors)
    assert f"element vertex {len(cloud.positions)}" in open(ply).read()

    # reset clears everything (ResetTracking parity)
    ex.reset_tracking()
    assert not ex.is_tracking and ex.point_buffer is None
