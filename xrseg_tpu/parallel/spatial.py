"""Spatial partitioning (SP): shard the image H axis across chips.

The CNN equivalent of sequence parallelism — for latency-critical batch=1
frames (the XR passthrough case), the *spatial* dimension is the only axis
with enough parallelism to occupy multiple chips. Activations are sharded
on H; XLA's SPMD partitioner inserts the halo exchanges every 3x3 conv
needs at shard boundaries, and the all-gathers where the detect heads
flatten spatial dims. No hand-written collectives.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xrseg_tpu.config import ExecutorConfig
from xrseg_tpu.models import yolo11
from xrseg_tpu.ops import preprocess as pre_ops


def build_spatial_pipeline(cfg: ExecutorConfig, params: Any, mesh: Mesh,
                           *, axis: str = "data", batch: int = 1,
                           frame_hw: Optional[Tuple[int, int]] = None,
                           resize_mode: str = "stretch"):
    """Compile frames [B,H,W,3]u8 -> slate with activations sharded on H.

    The mesh axis `axis` partitions image rows. Param tree is replicated.
    Returns (fn, replicated_params).
    """
    mcfg, pcfg = cfg.model, cfg.post
    n_shards = mesh.shape[axis]
    if mcfg.input_size[0] % (n_shards * 32):
        raise ValueError(
            f"input H {mcfg.input_size[0]} must divide into {n_shards} "
            "shards of multiple-of-32 rows")

    repl = NamedSharding(mesh, P())
    params_r = jax.tree.map(lambda x: jax.device_put(x, repl), params)
    frames_sh = NamedSharding(mesh, P(None, axis, None, None))   # shard H

    from xrseg_tpu.compile import decode_task_outputs

    def _run(p, frames):
        x = pre_ops.preprocess(frames, mcfg.input_size, mode=resize_mode,
                               dtype=jnp.dtype(mcfg.dtype))
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, axis, None, None)))
        out = yolo11.forward(p, x, mcfg, concat_preds=False)
        # shared task-family decode tail (detect/segment/pose/obb/
        # classify) — identical numerics to compile.build_pipeline
        return decode_task_outputs(out, mcfg, pcfg)

    fn = jax.jit(_run, in_shardings=(repl, frames_sh), out_shardings=repl)
    return fn, params_r
