"""Camera math vs scipy Rotation oracle + latency compensation behavior."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

from xrseg_tpu.perception import camera as C


def _rand_quat(rng):
    q = rng.standard_normal(4)
    return (q / np.linalg.norm(q)).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_quat_rotate_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    q = _rand_quat(rng)
    v = rng.standard_normal((5, 3)).astype(np.float32)
    ours = C.quat_rotate(q, v)
    ref = Rotation.from_quat(q).apply(v)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_quat_multiply_matches_scipy():
    rng = np.random.default_rng(3)
    a, b = _rand_quat(rng), _rand_quat(rng)
    ours = C.quat_multiply(a, b)
    ref = (Rotation.from_quat(a) * Rotation.from_quat(b)).as_quat()
    # sign ambiguity
    assert (np.allclose(ours, ref, atol=1e-5) or
            np.allclose(ours, -ref, atol=1e-5))


def test_slerp_matches_scipy():
    rng = np.random.default_rng(4)
    a, b = _rand_quat(rng), _rand_quat(rng)
    sl = Slerp([0, 1], Rotation.from_quat(np.stack([a, b])))
    for t in (0.0, 0.3, 0.7, 1.0):
        ours = C.quat_slerp(a, b, t)
        ref = sl(t).as_quat()
        assert (np.allclose(ours, ref, atol=1e-4) or
                np.allclose(ours, -ref, atol=1e-4))


def test_pose_compose_and_flip():
    head = C.Pose(np.array([1.0, 2.0, 3.0]),
                  C.quat_from_axis_angle([0, 1, 0], np.pi / 2))
    extr = C.Pose(np.array([0.1, 0.0, 0.0]), C.quat_identity())
    cam = C.camera_pose_from_head(head, extr)
    # position: head + R_head * offset; 90° about Y maps +x -> -z
    np.testing.assert_allclose(cam.position, [1.0, 2.0, 3.0 - 0.1], atol=1e-6)
    # the 180° X flip maps camera +z to -z in the unflipped frame
    d = C.quat_rotate(cam.rotation, np.array([0, 0, 1.0]))
    d_noflip = C.quat_rotate(head.rotation, np.array([0, 0, 1.0]))
    np.testing.assert_allclose(d, -d_noflip, atol=1e-6)


def test_screen_point_to_ray():
    intr = C.CameraIntrinsics((500.0, 500.0), (640.0, 480.0), (1280, 960))
    d = C.screen_point_to_ray_in_camera(intr, (640.0, 480.0))
    np.testing.assert_allclose(d, [0, 0, 1])
    d2 = C.screen_point_to_ray_in_camera(intr, (1140.0, 480.0))
    np.testing.assert_allclose(d2, [1.0, 0, 1])


def test_latency_compensation():
    lc = C.LatencyCompensator(latency_seconds=0.033)
    p0 = C.Pose(np.zeros(3), C.quat_identity())
    # first frame: no history -> current pose
    out = lc.compensate(p0, dt=1 / 30)
    np.testing.assert_allclose(out.position, 0)
    # second frame: moved 1m in x; t = 0.033/0.0333 ≈ 0.99 -> near previous
    p1 = C.Pose(np.array([1.0, 0, 0]), C.quat_identity())
    out = lc.compensate(p1, dt=1 / 30)
    assert out.position[0] < 0.05
    # large dt -> small correction toward previous
    p2 = C.Pose(np.array([2.0, 0, 0]), C.quat_identity())
    out = lc.compensate(p2, dt=1.0)
    assert 1.9 < out.position[0] < 2.0


def test_latency_clamps_at_one():
    lc = C.LatencyCompensator(latency_seconds=0.5)
    lc.compensate(C.Pose(np.zeros(3), C.quat_identity()), dt=1 / 30)
    out = lc.compensate(C.Pose(np.array([1.0, 0, 0]), C.quat_identity()),
                        dt=1 / 30)
    np.testing.assert_allclose(out.position, 0, atol=1e-6)   # fully previous


def test_world_to_screen_roundtrip():
    intr = C.CameraIntrinsics((500.0, 500.0), (640.0, 480.0), (1280, 960))
    pose = C.Pose(np.array([0.5, 1.0, -0.2], np.float32),
                  C.quat_from_axis_angle([0, 1, 0], 0.3))
    # take a pixel, cast a ray, pick a point on it, project back
    px = (800.0, 300.0)
    origin, direction = C.screen_point_to_ray_in_world(intr, pose, px)
    point = origin + direction * 2.5
    back = C.world_point_to_screen(intr, pose, point)
    np.testing.assert_allclose(back, px, atol=1e-3)


def test_world_to_screen_behind_camera():
    intr = C.CameraIntrinsics((500.0, 500.0), (640.0, 480.0), (1280, 960))
    pose = C.Pose.identity()
    assert C.world_point_to_screen(intr, pose, np.array([0, 0, -1.0])) is None


def test_laser_screen_position():
    intr = C.CameraIntrinsics((500.0, 500.0), (640.0, 480.0), (1280, 960))
    pose = C.Pose.identity()
    # controller at origin pointing straight ahead -> principal point
    sp = C.laser_screen_position(intr, pose, np.zeros(3), np.array([0, 0, 1.0]))
    np.testing.assert_allclose(sp, (640.0, 480.0))
    # pointing right by atan(0.5) at 2m -> 1m right -> x = fx*0.5 + cx
    sp2 = C.laser_screen_position(intr, pose, np.zeros(3),
                                  np.array([0.5, 0, 1.0]) / np.linalg.norm([0.5, 0, 1.0]))
    np.testing.assert_allclose(sp2, (640.0 + 250.0, 480.0), atol=1e-3)
