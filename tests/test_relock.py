"""Device-side re-lock (ops/relock.py) + fused XR tick parity.

The host TargetTracker (perception/tracking.py — the exact
IEExecutor.cs:485-526 semantics, golden-tested in test_tracking.py) is
the oracle: the compiled match must agree with it on randomized scenes,
and the fused-tick executor (ExecutorConfig.fused_tick — ONE packed
readback per tracked frame) must produce the same tracked target and
the same fused point cloud as the classic three-round-trip path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrseg_tpu.config import ExecutorConfig, ModelConfig, PostprocessConfig
from xrseg_tpu.ops.relock import relock_match
from xrseg_tpu.perception.camera import CameraIntrinsics, Pose, quat_identity
from xrseg_tpu.perception.tracking import TargetTracker, parse_boxes
from xrseg_tpu.runtime.executor import Executor
from xrseg_tpu.runtime.frame_source import FrameData

NAMES = [f"c{i}" for i in range(6)]


def test_relock_matches_host_tracker_randomized():
    rng = np.random.default_rng(7)
    model = (64.0, 64.0)
    screen = (96.0, 64.0)              # non-square: per-axis scales differ
    scale = (screen[0] / model[1], screen[1] / model[0])
    gate = 30.0
    jfn = jax.jit(lambda b, l, v, p, s: relock_match(b, l, v, p, s,
                                                     gate_px=gate))
    agree_some_match = 0
    for _ in range(300):
        D = 16
        k = int(rng.integers(0, D + 1))
        boxes = rng.uniform(0, 64, (D, 4)).astype(np.float32)
        labels = rng.integers(0, 6, D).astype(np.int32)
        valid = np.zeros(D, bool)
        valid[:k] = True
        count = k

        # host oracle: parse to screen space, lock a random prev box
        host_boxes = parse_boxes(boxes, labels, np.ones(D, np.float32),
                                 count, screen, NAMES, max_boxes=D,
                                 model_size=model)
        prev_np = rng.uniform(0, 64, 2).astype(np.float32)
        prev_label = int(rng.integers(0, 6))
        prev_parsed = parse_boxes(
            np.array([[prev_np[0], prev_np[1], 5.0, 5.0]], np.float32),
            np.array([prev_label], np.int32), np.ones(1, np.float32), 1,
            screen, NAMES, model_size=model)[0]
        tr = TargetTracker(gate_px=gate)
        tr.locked_box = prev_parsed
        tr.is_tracking = True
        want = tr.update(host_boxes)

        matched, idx = jfn(
            jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid),
            jnp.asarray([prev_np[0], prev_np[1], prev_label, 1.0],
                        dtype=jnp.float32),
            jnp.asarray(scale, dtype=jnp.float32))
        if want is None:
            assert not bool(matched)
        else:
            assert bool(matched)
            assert int(idx) == want.index
            agree_some_match += 1
    assert agree_some_match > 30      # the sweep actually exercised matches


def test_relock_invalid_prev_never_matches():
    boxes = jnp.zeros((8, 4), jnp.float32)
    matched, _ = relock_match(boxes, jnp.zeros(8, jnp.int32),
                              jnp.ones(8, bool),
                              jnp.asarray([0, 0, 0, 0.0], jnp.float32),
                              jnp.ones(2, jnp.float32))
    assert not bool(matched)


# ---------------------------------------------------------------------------
# fused executor vs the classic three-round-trip path
# ---------------------------------------------------------------------------

def _cfg(fused: bool) -> ExecutorConfig:
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
def param_pair():
    from xrseg_tpu.testing import detection_params
    cfg = _cfg(False)
    return detection_params(jax.random.key(3), cfg.model)


def _drive(ex: Executor, n_frames: int = 5):
    """Select the first detection, then track n_frames; return
    [(tracked_index, n_points, depths)] per tracked frame."""
    r0 = ex.run_sync(_frame(0))
    assert r0.count > 0
    b = r0.boxes[0]
    ok = ex.select_target_from_screen_pos(
        (b.center_x + ex.screen_wh[0] / 2,
         b.center_y + ex.screen_wh[1] / 2))
    assert ok
    out = []
    for i in range(1, n_frames + 1):
        r = ex.run_sync(_frame(i, t=i / 30))
        out.append((
            r.tracked.index if r.tracked is not None else -1,
            len(r.point_cloud.positions) if r.point_cloud is not None
            else 0,
            np.sort(r.point_cloud.depths) if r.point_cloud is not None
            else np.zeros(0),
        ))
    return out


def test_fused_executor_matches_classic(param_pair):
    classic = Executor(_cfg(False), params=param_pair, frame_hw=(64, 64))
    fused = Executor(_cfg(True), params=param_pair, frame_hw=(64, 64))
    got_c = _drive(classic)
    got_f = _drive(fused)
    for (ic, nc, dc), (iff, nf, dfs) in zip(got_c, got_f):
        assert iff == ic                 # same tracked slate index
        assert nf == nc                  # same fused point count
        np.testing.assert_allclose(dfs, dc, rtol=1e-5, atol=1e-6)
    # the fused path must actually have taken the one-DMA route
    st = fused.tracer.summary()
    assert "mask_fetch" not in st and "depth_fusion" not in st
    assert "readback" in st


def test_tick_pipeline_packed_layout(param_pair):
    from xrseg_tpu.compile import build_xr_tick_pipeline
    cfg = _cfg(True)
    pipe = build_xr_tick_pipeline(cfg, param_pair, frame_hw=(64, 64),
                                  depth_hw=(32, 32)).warmup()
    out = pipe(jnp.zeros((1, 64, 64, 3), jnp.uint8),
               jnp.zeros((32, 32), jnp.uint16),
               jnp.zeros((pipe.AUX_LEN,), jnp.float32))
    h = pipe.unpack(np.asarray(out["packed"]))
    D = cfg.post.max_detections
    assert h["boxes_xywh"].shape == (D, 4)
    assert not h["matched"]              # prev.valid = 0: never matches
    mh, mw = cfg.model.mask_size
    assert h["target_mask"].shape == (mh, mw)
    assert (h["target_mask"] == 0).all()     # zeroed when unmatched
    assert h["points_packed"].shape == (pipe.n_points, 5)
    assert (h["points_packed"][:, 4] == 0).all()
