"""RGBD point-cloud extraction orchestration (L4).

Ties together: latency-compensated depth pose (perception.camera), the
fusion kernel (ops.depth_fusion JAX path, io.native C++ path), the
max-points cap + depth-gradient coloring + double-buffered fallback of the
reference's CollectJobResults (IEExecutor.cs:653-682).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from xrseg_tpu.config import DepthConfig
from xrseg_tpu.ops import depth_fusion as df
from xrseg_tpu.perception.camera import CameraIntrinsics, Pose
from xrseg_tpu.viz.pointcloud import DepthGradient


@dataclasses.dataclass
class PointCloud:
    positions: np.ndarray   # [N,3] world
    colors: np.ndarray      # [N,3] uint8
    depths: np.ndarray      # [N] meters


class PointCloudExtractor:
    """Per-target point extraction with the reference's buffering semantics:
    a successful extraction replaces the buffer and refreshes the backup; an
    empty one falls back to the backup (IEExecutor.cs:671-681)."""

    def __init__(self, cfg: DepthConfig = DepthConfig(),
                 backend: str = "jax", num_threads: int = 0):
        if backend not in ("jax", "native"):
            raise ValueError(f"unknown depth-fusion backend {backend!r}")
        self.cfg = cfg
        self.backend = backend
        self.num_threads = num_threads
        self.gradient = DepthGradient()
        self._current: Optional[PointCloud] = None
        self._backup: Optional[PointCloud] = None

    @property
    def current(self) -> Optional[PointCloud]:
        return self._current

    def clear(self) -> None:
        """ClearPointCloud (IEExecutor.cs:714-718)."""
        self._current = None
        self._backup = None

    def extract(self, depth_fp16: np.ndarray, mask_160: np.ndarray,
                box_xywh_640, intrinsics: CameraIntrinsics,
                depth_pose: Pose) -> PointCloud:
        """ExtractDepthData + CollectJobResults equivalent."""
        c = self.cfg
        focal = np.asarray(intrinsics.focal_length, np.float32)
        principal = np.asarray(intrinsics.principal_point, np.float32)
        sensor = np.asarray(intrinsics.resolution, np.float32)
        box = np.asarray(box_xywh_640, np.float32)

        if self.backend == "native":
            from xrseg_tpu.io.native import depth_fusion_native
            pos, dep, valid = depth_fusion_native(
                depth_fp16, mask_160, box, depth_pose.position,
                depth_pose.rotation, focal, principal, sensor,
                confidence_threshold=c.confidence_threshold,
                min_depth=c.min_depth_m, max_depth=c.max_depth_m,
                sampling_step=c.sampling_step,
                num_threads=self.num_threads)
        else:
            import jax.numpy as jnp
            out = df.extract_points(
                jnp.asarray(np.ascontiguousarray(depth_fp16, np.uint16)),
                jnp.asarray(np.ascontiguousarray(mask_160, np.float32)),
                jnp.asarray(box), jnp.asarray(focal), jnp.asarray(principal),
                jnp.asarray(sensor),
                jnp.asarray(depth_pose.position, dtype=jnp.float32),
                jnp.asarray(depth_pose.rotation, dtype=jnp.float32),
                confidence_threshold=c.confidence_threshold,
                min_depth=c.min_depth_m, max_depth=c.max_depth_m,
                sampling_step=c.sampling_step,
                mask_hw=mask_160.shape)
            pos = np.asarray(out["positions"])
            dep = np.asarray(out["depths"])
            valid = np.asarray(out["valid"])

        return self._collect(pos, dep, valid)

    def extract_from_slate(self, depth_fp16: np.ndarray, masks_device,
                           target_index: int, box_xywh_640,
                           intrinsics: CameraIntrinsics,
                           depth_pose: Pose) -> PointCloud:
        """Device-fused path: the tracked target's mask stays on device; the
        gather + fusion run in one dispatch and only the (tiny) point set
        comes back (vs the reference's full-mask CPU copy,
        IEExecutor.cs:615-621)."""
        import jax.numpy as jnp
        c = self.cfg
        out = df.extract_points_for_target(
            masks_device, jnp.int32(target_index),
            jnp.asarray(np.ascontiguousarray(depth_fp16, np.uint16)),
            jnp.asarray(np.asarray(box_xywh_640, np.float32)),
            jnp.asarray(np.asarray(intrinsics.focal_length, np.float32)),
            jnp.asarray(np.asarray(intrinsics.principal_point, np.float32)),
            jnp.asarray(np.asarray(intrinsics.resolution, np.float32)),
            jnp.asarray(depth_pose.position, dtype=jnp.float32),
            jnp.asarray(depth_pose.rotation, dtype=jnp.float32),
            confidence_threshold=c.confidence_threshold,
            min_depth=c.min_depth_m, max_depth=c.max_depth_m,
            sampling_step=c.sampling_step)
        packed = np.asarray(out["packed"])          # ONE host transfer
        return self._collect(packed[:, :3], packed[:, 3], packed[:, 4] > 0.5)

    def collect_packed(self, packed: np.ndarray) -> PointCloud:
        """Fused-tick path (compile.build_xr_tick_pipeline): the fusion
        kernel already ran inside the frame program; `packed` [N,5] =
        xyz | depth | valid arrived in the frame's single readback. Only
        the cap/color/backup-buffer semantics remain host-side."""
        return self._collect(packed[:, :3], packed[:, 3],
                             packed[:, 4] > 0.5)

    def _collect(self, pos, dep, valid) -> PointCloud:
        """CollectJobResults semantics (IEExecutor.cs:653-682)."""
        c = self.cfg
        idx = np.nonzero(valid)[0][:c.max_points]   # cap (IEExecutor.cs:658)
        cloud = PointCloud(
            positions=pos[idx],
            colors=self.gradient.color_by_depth(dep[idx]),
            depths=dep[idx],
        )
        if len(idx) > 0:
            self._current = cloud
            self._backup = cloud
        elif self._backup is not None:
            self._current = self._backup
            cloud = self._backup
        return cloud
