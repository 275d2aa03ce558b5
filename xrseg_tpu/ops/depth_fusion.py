"""Mask->RGBD point-cloud fusion kernel.

TPU-native rebuild of the reference's Burst `DepthExtractionJob`
(Assets/Scripts/InferenceEngine/IEExecutor.cs:53-179): over a strided
160x160 mask grid, threshold -> box-relative image coords -> depth-UV (with
the depth texture's bottom-up Y flip) -> fp16 depth decode -> 0.1-3.0 m
range filter -> pinhole unprojection with camera intrinsics -> world
transform with the (latency-compensated) depth-capture pose.

The reference runs this as a batch-64 IJobParallelFor across CPU worker
threads; here the whole grid is one fused vectorized XLA program (the grid
is only (160/step)^2 points — a single VPU tile's worth of work), jitted
with static shapes. fp16 decode is a native bitcast (the reference
hand-decodes fp16 bits because Burst lacks half support, IEExecutor.cs:159-178).

A C++ host reference implementation lives in native/src/depth_fusion.cpp for
CPU-path parity testing (SURVEY.md §2.2).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("sampling_step", "mask_hw"))
def extract_points(depth_fp16: jax.Array, mask: jax.Array,
                   box_xywh_640: jax.Array, focal: jax.Array,
                   principal: jax.Array, sensor_res: jax.Array,
                   cam_pos: jax.Array, cam_quat: jax.Array,
                   *, confidence_threshold: float = 0.5,
                   min_depth: float = 0.1, max_depth: float = 3.0,
                   sampling_step: int = 4,
                   mask_hw: Tuple[int, int] = (160, 160)
                   ) -> Dict[str, jax.Array]:
    """Fixed-shape point extraction.

    Args:
      depth_fp16: [Dh,Dw] uint16 — raw fp16 bits (RHalf texture readback).
      mask:       [mh,mw] float — target instance's sigmoid mask.
      box_xywh_640: [4] — target box, model-640 space (cx, cy, w, h).
      focal/principal/sensor_res: [2] camera intrinsics (pixels).
      cam_pos: [3], cam_quat: [4] (x,y,z,w) — depth-capture camera pose.
    Returns:
      positions [N,3] world-space, depths [N], valid [N] bool,
      N = (mh/step)*(mw/step).
    """
    mh, mw = mask_hw
    step = sampling_step
    gh, gw = mh // step, mw // step
    dh, dw = depth_fp16.shape

    ys = (jnp.arange(gh) * step)
    xs = (jnp.arange(gw) * step)
    yy = jnp.repeat(ys, gw)              # [N] row-major like the ref kernel
    xx = jnp.tile(xs, gh)

    mval = mask[yy, xx]
    alive = mval > confidence_threshold

    # mask coords -> model-image coords inside the box (IEExecutor.cs:108-116)
    norm_x = xx.astype(jnp.float32) / mw
    norm_y = yy.astype(jnp.float32) / mh
    cx, cy, bw, bh = (box_xywh_640[i] for i in range(4))
    img_x = cx - bw * 0.5 + norm_x * bw
    img_y = cy - bh * 0.5 + norm_y * bh
    u = jnp.clip(img_x / 640.0, 0.0, 1.0)
    v = jnp.clip(img_y / 640.0, 0.0, 1.0)

    # depth sampling with bottom-up Y (IEExecutor.cs:119-127)
    dx = (u * (dw - 1)).astype(jnp.int32)
    dy = ((1.0 - v) * (dh - 1)).astype(jnp.int32)
    bits = depth_fp16[dy, dx]
    depth_m = jax.lax.bitcast_convert_type(bits, jnp.float16).astype(jnp.float32)

    alive = alive & (depth_m > min_depth) & (depth_m < max_depth)

    # pinhole unprojection (IEExecutor.cs:138-147)
    cam_px = u * sensor_res[0]
    cam_py = (1.0 - v) * sensor_res[1]
    dir_cam = jnp.stack([
        (cam_px - principal[0]) / focal[0],
        (cam_py - principal[1]) / focal[1],
        jnp.ones_like(u),
    ], axis=-1)
    dir_cam = dir_cam / jnp.linalg.norm(dir_cam, axis=-1, keepdims=True)

    # quaternion rotate + translate (IEExecutor.cs:149-151)
    qv = cam_quat[:3]
    qw = cam_quat[3]
    t = 2.0 * jnp.cross(jnp.broadcast_to(qv, dir_cam.shape), dir_cam)
    dir_world = dir_cam + qw * t + jnp.cross(jnp.broadcast_to(qv, t.shape), t)
    positions = cam_pos[None, :] + dir_world * depth_m[:, None]

    zero = jnp.zeros_like(positions)
    positions = jnp.where(alive[:, None], positions, zero)
    depths = jnp.where(alive, depth_m, 0.0)
    return {
        "positions": positions,
        "depths": depths,
        "valid": alive,
        # single-DMA packed form: [N, 5] = xyz | depth | valid
        "packed": jnp.concatenate(
            [positions, depths[:, None], alive[:, None].astype(jnp.float32)],
            axis=-1),
    }


@partial(jax.jit, static_argnames=("confidence_threshold", "min_depth",
                                   "max_depth", "sampling_step", "mask_hw"))
def extract_points_for_target(masks: jax.Array, target_index: jax.Array,
                              depth_fp16: jax.Array, box_xywh_640: jax.Array,
                              focal: jax.Array, principal: jax.Array,
                              sensor_res: jax.Array, cam_pos: jax.Array,
                              cam_quat: jax.Array, **kw):
    """Device-fused variant for the tracking hot path: gathers the tracked
    target's mask row from the (device-resident) detection slate and runs
    the fusion kernel in the SAME dispatch — the host never downloads the
    mask (the reference copies the full mask to the CPU every frame,
    IEExecutor.cs:615-621).

    masks: [D,mh,mw] (one image's slate), target_index: scalar int.
    """
    mask = masks[target_index]
    return extract_points(depth_fp16, mask, box_xywh_640, focal, principal,
                          sensor_res, cam_pos, cam_quat,
                          mask_hw=masks.shape[1:], **kw)


def extract_points_batched(depth_fp16, masks, boxes, focal, principal,
                           sensor_res, cam_pos, cam_quat, **kw):
    """vmap over targets sharing one depth frame ([T,...] masks/boxes)."""
    fn = lambda m, b: extract_points(depth_fp16, m, b, focal, principal,
                                     sensor_res, cam_pos, cam_quat, **kw)
    return jax.vmap(fn)(masks, boxes)


def extract_points_numpy(depth_fp16, mask, box_xywh_640, focal, principal,
                         sensor_res, cam_pos, cam_quat,
                         confidence_threshold=0.5, min_depth=0.1,
                         max_depth=3.0, sampling_step=4):
    """Pure-numpy scalar reference (mirrors the Burst job literally) —
    test oracle for both the JAX kernel and the C++ implementation."""
    import numpy as np
    mh, mw = mask.shape
    dh, dw = depth_fp16.shape
    gh, gw = mh // sampling_step, mw // sampling_step
    N = gh * gw
    positions = np.zeros((N, 3), np.float32)
    depths = np.zeros(N, np.float32)
    valid = np.zeros(N, bool)
    cx, cy, bw, bh = (float(v) for v in box_xywh_640)
    qx, qy, qz, qw = (float(v) for v in cam_quat)

    for idx in range(N):
        ly, lx = divmod(idx, gw)
        y, x = ly * sampling_step, lx * sampling_step
        if mask[y, x] <= confidence_threshold:
            continue
        nx_, ny_ = x / mw, y / mh
        img_x = cx - bw / 2 + nx_ * bw
        img_y = cy - bh / 2 + ny_ * bh
        u = min(max(img_x / 640.0, 0.0), 1.0)
        v = min(max(img_y / 640.0, 0.0), 1.0)
        dx = int(u * (dw - 1))
        dy = int((1.0 - v) * (dh - 1))
        d = float(np.frombuffer(np.uint16(depth_fp16[dy, dx]).tobytes(),
                                np.float16)[0])
        if d <= min_depth or d >= max_depth:
            continue
        cam_px = u * sensor_res[0]
        cam_py = (1.0 - v) * sensor_res[1]
        dirc = np.array([(cam_px - principal[0]) / focal[0],
                         (cam_py - principal[1]) / focal[1], 1.0], np.float32)
        dirc /= np.linalg.norm(dirc)
        uvec = np.array([qx, qy, qz], np.float32)
        t = 2.0 * np.cross(uvec, dirc)
        dirw = dirc + qw * t + np.cross(uvec, t)
        positions[idx] = np.asarray(cam_pos, np.float32) + dirw * d
        depths[idx] = d
        valid[idx] = True
    return {"positions": positions, "depths": depths, "valid": valid}
