"""Pre-deployment environment validation.

The reference validates its deployment environment before build/run:
supported-device gating (Quest 3/3S + HorizonOS >= v74,
PassthroughCameraUtils.cs:60-74) and an Android-manifest pre-build hook
injecting required permissions (PassthroughCameraEditorUpdateManifest.cs).
The TPU equivalent checks the serving environment up front — devices,
memory headroom, mesh divisibility, artifact compatibility — so failures
happen at deploy time with clear messages, not mid-stream.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple


@dataclasses.dataclass
class CheckResult:
    ok: bool
    checks: List[Tuple[str, bool, str]]    # (name, passed, detail)

    def raise_if_failed(self) -> None:
        if not self.ok:
            failed = "\n".join(f"  - {n}: {d}" for n, p, d in self.checks
                               if not p)
            raise RuntimeError(f"deployment checks failed:\n{failed}")


def check_environment(cfg=None, *, batch: int = 1,
                      mesh_shape: Optional[Tuple[int, int]] = None,
                      require_tpu: bool = False,
                      frame_source=None) -> CheckResult:
    """Validate devices/config for serving. Returns per-check results.

    frame_source: optional ManagedFrameSource — its support/permission/
    availability gates are surfaced as checks (the reference gates these
    at scene startup, WebCamTextureManager.cs:40-56)."""
    import jax

    checks: List[Tuple[str, bool, str]] = []

    if frame_source is not None:
        from xrseg_tpu.runtime.permissions import ManagedSourceState
        checks.append(("camera_supported", frame_source.is_supported,
                       "passthrough camera device support"))
        perm = frame_source.permissions.has_camera_permission
        checks.append(("camera_permission", perm is True,
                       f"has_camera_permission={perm}"))
        checks.append(("camera_available",
                       frame_source.state != ManagedSourceState.FAILED,
                       f"state={frame_source.state.value} after "
                       f"{frame_source.open_attempts} open attempt(s)"))

    devs = jax.devices()
    checks.append(("devices_present", len(devs) > 0,
                   f"{len(devs)} device(s): {devs[0].platform if devs else 'none'}"))

    if require_tpu:
        is_tpu = bool(devs) and "tpu" in devs[0].platform.lower()
        checks.append(("tpu_platform", is_tpu,
                       f"platform={devs[0].platform if devs else 'none'}"))

    if mesh_shape is not None:
        n = mesh_shape[0] * mesh_shape[1]
        checks.append(("mesh_fits_devices", n <= len(devs),
                       f"mesh {mesh_shape} needs {n}, have {len(devs)}"))
        checks.append(("batch_divisible", batch % max(mesh_shape[0], 1) == 0,
                       f"batch {batch} over data axis {mesh_shape[0]}"))

    if cfg is not None:
        h, w = cfg.model.input_size
        checks.append(("input_stride_aligned", h % 32 == 0 and w % 32 == 0,
                       f"input {cfg.model.input_size} % 32"))
        checks.append(("thresholds_sane",
                       0.0 < cfg.post.score_threshold < 1.0
                       and 0.0 < cfg.post.iou_threshold <= 1.0,
                       f"score={cfg.post.score_threshold} "
                       f"iou={cfg.post.iou_threshold}"))
        checks.append(("topk_covers_maxdet",
                       cfg.post.pre_nms_topk == 0
                       or cfg.post.pre_nms_topk >= cfg.post.max_detections,
                       f"topk={cfg.post.pre_nms_topk} (0=all anchors) "
                       f"max_det={cfg.post.max_detections}"))

    # native runtime availability (degraded mode is allowed, but surfaced)
    try:
        from xrseg_tpu.io.native import load_library
        load_library(auto_build=True)
        checks.append(("native_runtime", True, "libxrseg_native.so loaded"))
    except Exception as e:
        checks.append(("native_runtime", True,
                       f"unavailable (CPU fallback paths disabled): {e}"))

    return CheckResult(ok=all(p for _, p, _ in checks), checks=checks)
