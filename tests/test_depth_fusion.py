"""Depth-fusion kernel: JAX vs pure-numpy oracle vs C++ native, all paths."""
import numpy as np
import pytest

import jax.numpy as jnp

from xrseg_tpu.ops import depth_fusion as df


def _scenario(seed=0, dh=64, dw=96):
    rng = np.random.default_rng(seed)
    depth_m = rng.uniform(0.0, 4.0, (dh, dw)).astype(np.float16)
    depth_fp16 = depth_m.view(np.uint16)
    mask = rng.uniform(0, 1, (160, 160)).astype(np.float32)
    box = np.array([300.0, 280.0, 200.0, 260.0], np.float32)
    focal = np.array([450.0, 452.0], np.float32)
    principal = np.array([640.0, 480.0], np.float32)
    sensor = np.array([1280.0, 960.0], np.float32)
    pos = np.array([0.2, 1.5, -0.3], np.float32)
    q = rng.standard_normal(4).astype(np.float32)
    q /= np.linalg.norm(q)
    return depth_fp16, mask, box, focal, principal, sensor, pos, q


@pytest.mark.parametrize("step", [4, 5, 8])
def test_jax_matches_numpy_oracle(step):
    args = _scenario()
    ref = df.extract_points_numpy(*args, sampling_step=step)
    out = df.extract_points(
        jnp.asarray(args[0]), jnp.asarray(args[1]), *map(jnp.asarray, args[2:]),
        sampling_step=step)
    np.testing.assert_array_equal(np.asarray(out["valid"]), ref["valid"])
    np.testing.assert_allclose(np.asarray(out["positions"]), ref["positions"],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["depths"]), ref["depths"],
                               atol=1e-5)


def test_native_matches_numpy_oracle():
    pytest.importorskip("ctypes")
    from xrseg_tpu.io.native import depth_fusion_native, NativeUnavailable
    args = _scenario(seed=1)
    try:
        pos, dep, valid = depth_fusion_native(
            args[0], args[1], args[2], args[6], args[7], args[3], args[4],
            args[5], sampling_step=4)
    except NativeUnavailable:
        pytest.skip("native toolchain unavailable")
    ref = df.extract_points_numpy(*args, sampling_step=4)
    np.testing.assert_array_equal(valid, ref["valid"])
    np.testing.assert_allclose(pos, ref["positions"], atol=2e-4)
    np.testing.assert_allclose(dep, ref["depths"], atol=1e-6)


def test_range_filter_and_threshold():
    dh, dw = 32, 32
    depth_m = np.full((dh, dw), 0.05, np.float16)   # all too near
    args = list(_scenario())
    args[0] = depth_m.view(np.uint16)
    out = df.extract_points(*map(jnp.asarray, args), sampling_step=4)
    assert not np.asarray(out["valid"]).any()
    # mask below threshold
    args = list(_scenario())
    args[1] = np.zeros((160, 160), np.float32)
    out = df.extract_points(*map(jnp.asarray, args), sampling_step=4)
    assert not np.asarray(out["valid"]).any()


def test_identity_geometry():
    """Camera at origin, identity rotation, principal-centered box: the
    center grid point unprojects along +z at the sampled depth."""
    dh, dw = 64, 64
    depth_m = np.full((dh, dw), 2.0, np.float16)
    mask = np.ones((160, 160), np.float32)
    box = np.array([320.0, 320.0, 640.0, 640.0], np.float32)
    focal = np.array([500.0, 500.0], np.float32)
    principal = np.array([320.0, 240.0], np.float32)
    sensor = np.array([640.0, 480.0], np.float32)
    pos = np.zeros(3, np.float32)
    quat = np.array([0, 0, 0, 1], np.float32)
    out = df.extract_points(
        jnp.asarray(depth_m.view(np.uint16)), jnp.asarray(mask),
        jnp.asarray(box), jnp.asarray(focal), jnp.asarray(principal),
        jnp.asarray(sensor), jnp.asarray(pos), jnp.asarray(quat),
        sampling_step=4)
    pts = np.asarray(out["positions"])
    valid = np.asarray(out["valid"])
    assert valid.all()
    # find the grid point at mask (80,80): u=v=0.5 -> cam pixel (320,240)
    # = principal -> direction exactly +z -> point (0,0,2)
    idx = (80 // 4) * 40 + (80 // 4)
    np.testing.assert_allclose(pts[idx], [0, 0, 2.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depths"])[valid], 2.0)


def test_batched_targets():
    args = _scenario()
    masks = np.stack([args[1], np.zeros_like(args[1])])
    boxes = np.stack([args[2], args[2]])
    out = df.extract_points_batched(
        jnp.asarray(args[0]), jnp.asarray(masks), jnp.asarray(boxes),
        *map(jnp.asarray, args[3:]), sampling_step=4)
    assert out["positions"].shape[0] == 2
    assert np.asarray(out["valid"][1]).sum() == 0


def test_extract_for_target_matches_indexed():
    """Device-fused slate-gather path == manual mask indexing."""
    args = _scenario(seed=2)
    masks = np.stack([np.zeros((160, 160), np.float32), args[1]])
    out_fused = df.extract_points_for_target(
        jnp.asarray(masks), jnp.int32(1), jnp.asarray(args[0]),
        *map(jnp.asarray, args[2:]), sampling_step=4)
    out_ref = df.extract_points(
        jnp.asarray(args[0]), jnp.asarray(args[1]), *map(jnp.asarray, args[2:]),
        sampling_step=4)
    np.testing.assert_array_equal(np.asarray(out_fused["valid"]),
                                  np.asarray(out_ref["valid"]))
    np.testing.assert_allclose(np.asarray(out_fused["positions"]),
                               np.asarray(out_ref["positions"]), atol=1e-6)
