"""Data/tensor-parallel batched inference over a device mesh.

The multi-chip serving path (BASELINE configs 2-5): batch (or multi-camera
stream) axis sharded over `data`, optional channel sharding over `model`
for the x-scale. One jit, XLA inserts the ICI collectives.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xrseg_tpu.config import ExecutorConfig
from xrseg_tpu.models import yolo11
from xrseg_tpu.ops import preprocess as pre_ops
from xrseg_tpu.parallel import mesh as mesh_lib


def build_sharded_pipeline(cfg: ExecutorConfig, params: Any, mesh: Mesh,
                           *, batch: int,
                           frame_hw: Optional[Tuple[int, int]] = None,
                           resize_mode: str = "stretch",
                           tp_min_channels: int = 100000,
                           emit_masks: str = "all",
                           mask_display_hw: Optional[Tuple[int, int]] = None):
    """Compile frames[B,H,W,3]u8 -> detection slate, B sharded over `data`.

    Returns (fn, sharded_params). tp_min_channels below a model's widest
    conv enables tensor parallelism on those layers (useful for yolo11x);
    the default effectively disables TP (DP-only), which is optimal for
    n/s/m-sized models that fit one chip.
    """
    mcfg, pcfg = cfg.model, cfg.post
    fh, fw = frame_hw or mcfg.input_size
    if batch % mesh.shape["data"]:
        raise ValueError(f"batch {batch} not divisible by data axis "
                         f"{mesh.shape['data']}")

    sharded_params = mesh_lib.shard_params(params, mesh, tp_min_channels)
    frames_sh = NamedSharding(mesh, P("data"))

    from xrseg_tpu.compile import decode_task_outputs
    from xrseg_tpu.precision import precision_scope

    def _run(p, frames):
        with precision_scope(mcfg.matmul_precision):
            x = pre_ops.preprocess(frames, mcfg.input_size, mode=resize_mode,
                                   dtype=jnp.dtype(mcfg.dtype))
            out = yolo11.forward(p, x, mcfg, concat_preds=False)
            # the SAME task-family decode tail as compile.build_pipeline
            # (detect/segment/pose/obb/classify) — batch-sharded outputs,
            # same packed-slate readback contract
            return decode_task_outputs(out, mcfg, pcfg,
                                       emit_masks=emit_masks,
                                       mask_display_hw=mask_display_hw)

    fn = jax.jit(_run,
                 in_shardings=(mesh_lib.param_shardings(params, mesh,
                                                        tp_min_channels),
                               frames_sh),
                 out_shardings=NamedSharding(mesh, P("data")))
    return fn, sharded_params


@dataclasses.dataclass
class ShardedPipeline:
    """CompiledPipeline-shaped adapter over a sharded pipeline: the
    multi-chip serving unit (runtime/server.py --mesh). __call__ takes a
    HOST batch, places it on the data axis, and returns the det dict
    (incl. the packed slate). Params live sharded on the mesh; reshard()
    re-applies the TP/replication rules to fresh (hot-swapped) weights."""
    cfg: ExecutorConfig
    params: Any
    fn: Any
    mesh: Mesh
    input_shape: Tuple[int, ...]
    tp_min_channels: int = 100000

    def __call__(self, frames) -> Dict[str, jax.Array]:
        return self.fn(self.params,
                       mesh_lib.shard_batch(jnp.asarray(frames), self.mesh))

    def warmup(self) -> "ShardedPipeline":
        import numpy as np
        out = self(jnp.zeros(self.input_shape, jnp.uint8))
        jax.block_until_ready(out)
        np.asarray(out["slate"])     # absorb first-transfer setup cost
        return self

    def reshard(self, host_params) -> Any:
        return mesh_lib.shard_params(host_params, self.mesh,
                                     self.tp_min_channels)


def build_serving_pipeline(cfg: ExecutorConfig, params: Any, mesh: Mesh, *,
                           batch: int,
                           frame_hw: Optional[Tuple[int, int]] = None,
                           resize_mode: str = "stretch",
                           tp_min_channels: int = 100000,
                           emit_masks: str = "all",
                           mask_display_hw: Optional[Tuple[int, int]] = None
                           ) -> ShardedPipeline:
    """build_sharded_pipeline wrapped in the CompiledPipeline call shape
    so the HTTP server's dispatch/bucket machinery serves multi-chip
    unchanged (BASELINE configs 2-3 as a product surface)."""
    fn, sparams = build_sharded_pipeline(
        cfg, params, mesh, batch=batch, frame_hw=frame_hw,
        resize_mode=resize_mode, tp_min_channels=tp_min_channels,
        emit_masks=emit_masks, mask_display_hw=mask_display_hw)
    fh, fw = frame_hw or cfg.model.input_size
    return ShardedPipeline(cfg=cfg, params=sparams, fn=fn, mesh=mesh,
                           input_shape=(batch, fh, fw, 3),
                           tp_min_channels=tp_min_channels)


@partial(jax.jit, static_argnames=("n",))
def _split_streams(frames: jax.Array, n: int):
    return jnp.reshape(frames, (n, -1) + frames.shape[1:])


class MultiStreamRunner:
    """N camera streams as one sharded batch (BASELINE config 5: stereo
    multi-stream at headset rate)."""

    def __init__(self, cfg: ExecutorConfig, params: Any, mesh: Mesh,
                 n_streams: int = 2,
                 frame_hw: Optional[Tuple[int, int]] = None):
        self.n = n_streams
        self.fn, self.params = build_sharded_pipeline(
            cfg, params, mesh, batch=n_streams, frame_hw=frame_hw)
        self.mesh = mesh

    def __call__(self, frames) -> Dict[str, jax.Array]:
        """frames: [n_streams, H, W, 3] uint8 -> per-stream slates."""
        frames = mesh_lib.shard_batch(frames, self.mesh)
        return self.fn(self.params, frames)
