"""xrseg_tpu — TPU-native instance-segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
netlab-dgist/xr-image-segmentation (a Unity/Sentis Quest-3 passthrough
YOLO11-seg pipeline): model graph, baked postprocess (decode + NMS + mask
synthesis), streaming executor runtime, single-target tracking, RGBD
point-cloud fusion, and visualization — all designed TPU-first.

Layer map (mirrors SURVEY.md §1, reimagined for TPU):
  L7 app loop        -> runtime.xr_loop (+ examples/demo as a thin caller)
  L6 visualization   -> viz.boxer / viz.masker / viz.pointcloud
  L5 tracking        -> perception.tracking (single-target parity +
                        multi-target/Kalman extensions)
  L4 RGBD fusion     -> ops.depth_fusion + native/depth_fusion.cpp
  L3 inference rt    -> runtime.executor (async dispatch + readback
                        polling), runtime.server (HTTP, micro-batching)
  L2 model compile   -> compile.build_pipeline (jit of net + baked
                        postprocess); io.onnx_export for the Unity loop
  L1 camera/sensors  -> perception.camera + runtime.frame_source +
                        runtime.v4l2 (live), runtime.permissions
  L0 engine          -> JAX/XLA on TPU (Pallas NMS kernel on the hot path)
"""

__version__ = "0.1.0"

from xrseg_tpu.config import (  # noqa: F401
    ExecutorConfig,
    ModelConfig,
    PostprocessConfig,
    DepthConfig,
)


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (repeat runs skip multi-minute
    pipeline compiles). Safe to call multiple times."""
    import os
    import jax
    cache = path or os.path.expanduser("~/.cache/xrseg_jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
