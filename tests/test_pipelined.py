"""PipelinedTickRunner (runtime/streaming.py): depth-K pipelined fused
XR tick.

depth=1 must be EXACTLY the executor's sequential fused tick (same
tracked slate indices, point counts and depths). depth=2 introduces a
one-result-stale re-lock box — on a static scene that staleness is
invisible, so parity with sequential must again be exact; on moving
scenes we pin structural health (every frame yields a result, FIFO
order, the overlap actually engaged).
"""
import jax
import numpy as np
import pytest

from xrseg_tpu.config import ExecutorConfig, ModelConfig, PostprocessConfig
from xrseg_tpu.perception.camera import CameraIntrinsics, Pose, quat_identity
from xrseg_tpu.runtime.executor import Executor
from xrseg_tpu.runtime.frame_source import FrameData
from xrseg_tpu.runtime.streaming import PipelinedTickRunner


def _cfg(fused: bool = True) -> ExecutorConfig:
    return ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(pre_nms_topk=64, max_detections=10,
                               score_threshold=1e-7),
        fused_tick=fused)


def _frame(seed=0, t=0.0):
    rng = np.random.default_rng(seed)
    depth = np.full((32, 32), 1.5, np.float16).view(np.uint16)
    return FrameData(rgb=rng.integers(0, 255, (64, 64, 3), np.uint8),
                     timestamp=t,
                     pose=Pose(np.zeros(3, np.float32), quat_identity()),
                     intrinsics=CameraIntrinsics.quest3_like(),
                     depth_fp16=depth)


@pytest.fixture(scope="module")
def params():
    from xrseg_tpu.testing import detection_params
    return detection_params(jax.random.key(3), _cfg().model)


def _lock(ex: Executor, seed=0):
    r0 = ex.run_sync(_frame(seed))
    assert r0.count > 0
    b = r0.boxes[0]
    assert ex.select_target_from_screen_pos(
        (b.center_x + ex.screen_wh[0] / 2,
         b.center_y + ex.screen_wh[1] / 2))


def _sig(r):
    return (r.tracked.index if r.tracked is not None else -1,
            len(r.point_cloud.positions) if r.point_cloud is not None else 0,
            np.sort(r.point_cloud.depths) if r.point_cloud is not None
            else np.zeros(0))


def _run_sequential(ex, frames):
    return [_sig(ex.run_sync(f)) for f in frames]


def _run_pipelined(ex, frames, depth):
    runner = PipelinedTickRunner(ex, depth=depth)
    return [_sig(r) for r in runner.run(iter(frames))]


def _moving_frames(n):
    return [_frame(i, t=i / 30) for i in range(1, n + 1)]


def _static_frames(n):
    return [_frame(1, t=i / 30) for i in range(1, n + 1)]


def test_depth1_is_exactly_sequential(params):
    frames = _moving_frames(5)
    seq = Executor(_cfg(), params=params, frame_hw=(64, 64))
    _lock(seq)
    want = _run_sequential(seq, frames)

    pl = Executor(_cfg(), params=params, frame_hw=(64, 64))
    _lock(pl)
    got = _run_pipelined(pl, frames, depth=1)

    assert len(got) == len(want)
    for (iw, nw, dw), (ig, ng, dg) in zip(want, got):
        assert ig == iw
        assert ng == nw
        np.testing.assert_allclose(dg, dw, rtol=1e-5, atol=1e-6)


def test_depth2_static_scene_matches_sequential(params):
    # static scene: the one-result-stale re-lock box is identical to the
    # fresh one, so double buffering must not change ANY result
    frames = _static_frames(6)
    seq = Executor(_cfg(), params=params, frame_hw=(64, 64))
    _lock(seq)
    want = _run_sequential(seq, frames)

    pl = Executor(_cfg(), params=params, frame_hw=(64, 64))
    _lock(pl)
    got = _run_pipelined(pl, frames, depth=2)

    assert len(got) == len(want)
    for (iw, nw, dw), (ig, ng, dg) in zip(want, got):
        assert ig == iw
        assert ng == nw
        np.testing.assert_allclose(dg, dw, rtol=1e-5, atol=1e-6)


def test_depth2_moving_scene_structural(params):
    frames = _moving_frames(8)
    ex = Executor(_cfg(), params=params, frame_hw=(64, 64))
    _lock(ex)
    runner = PipelinedTickRunner(ex, depth=2)
    fill_none = 0
    results = []
    for f in frames:
        r = runner.submit(f)
        if r is None:
            fill_none += 1
            assert runner.inflight >= 1
        else:
            results.append(r)
    results.extend(runner.drain())
    assert fill_none == 1                  # exactly the depth-1 fill frames
    assert len(results) == len(frames)     # every frame became a result
    assert runner.inflight == 0
    # the overlap machinery actually ran through the executor's split
    st = ex.tracer.summary()
    for stage in ("dispatch", "device_wait", "readback", "process"):
        assert stage in st
    # fused path only: no serialized per-frame mask/depth round-trips
    assert "mask_fetch" not in st and "depth_fusion" not in st


def test_runner_guards(params):
    ex = Executor(_cfg(), params=params, frame_hw=(64, 64))
    with pytest.raises(ValueError):
        PipelinedTickRunner(ex, depth=0)
    classic = Executor(_cfg(False), params=params, frame_hw=(64, 64))
    with pytest.raises(ValueError):
        PipelinedTickRunner(classic)
    runner = PipelinedTickRunner(ex, depth=2)
    bare = FrameData(rgb=np.zeros((64, 64, 3), np.uint8), timestamp=0.0)
    with pytest.raises(ValueError):
        runner.submit(bare)                # no depth/intrinsics
    # a classic frame in flight blocks pipelined submits
    assert ex.run_inference(_frame(0))
    with pytest.raises(RuntimeError):
        runner.submit(_frame(1))
    while ex.update() is None and ex.is_running():
        pass
    ex.update()
