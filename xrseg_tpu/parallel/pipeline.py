"""Pipeline parallelism (PP): stage-split serving across devices.

For serving the wide scales (yolo11x-seg) or freeing HBM per chip, the graph
splits at the backbone/neck boundary into two stages placed on different
devices. Activations cross the boundary as device-to-device transfers (ICI
on real multi-chip TPU). JAX's async dispatch gives the pipelining for
free: while stage B of frame i runs on device 1, stage A of frame i+1 is
already running on device 0 — the classic 2-deep inference pipeline with no
bubbles at steady state.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from xrseg_tpu.config import ExecutorConfig
from xrseg_tpu.models import yolo11
from xrseg_tpu.ops import preprocess as pre_ops



class PipelinedRunner:
    """Two-stage pipelined inference over two devices.

    stage A (device 0): preprocess + backbone
    stage B (device 1): neck + detect/segment heads + baked postprocess
    """

    def __init__(self, cfg: ExecutorConfig, params: Any,
                 devices: Optional[Sequence] = None, *,
                 frame_hw: Optional[Tuple[int, int]] = None,
                 batch: int = 1, resize_mode: str = "stretch"):
        devs = list(devices if devices is not None else jax.devices())
        if len(devs) < 2:
            raise ValueError("pipeline parallelism needs >= 2 devices")
        self.d0, self.d1 = devs[0], devs[1]
        mcfg, pcfg = cfg.model, cfg.post
        self.mcfg = mcfg
        dt = jnp.dtype(mcfg.dtype)

        # split params by stage
        backbone_keys = [k for k in params if k.startswith("b")]
        self.params_a = jax.device_put(
            {k: params[k] for k in backbone_keys}, self.d0)
        self.params_b = jax.device_put(
            {k: v for k, v in params.items() if k not in backbone_keys},
            self.d1)

        def stage_a(p, frames):
            x = pre_ops.preprocess(frames, mcfg.input_size, mode=resize_mode,
                                   dtype=dt)
            return yolo11.backbone(p, x, mcfg, dt)

        if mcfg.task == "classify":
            # classify has no neck/heads to split at the backbone|neck
            # boundary (its head hangs off x10 directly)
            raise ValueError("pipeline parallelism does not apply to "
                             "task 'classify' (no neck stage)")

        from xrseg_tpu.compile import decode_task_outputs

        def stage_b(p, feats):
            # neck/head params live in the same flat dict namespace
            f3, f4, f5 = yolo11.neck(p, feats, mcfg, dt)
            out = yolo11.head_outputs(p, (f3, f4, f5), mcfg,
                                      concat_preds=False)
            # shared task-family decode tail (pose/obb included) —
            # identical numerics to compile.build_pipeline
            return decode_task_outputs(out, mcfg, pcfg)

        self.stage_a = jax.jit(stage_a, device=self.d0)
        self.stage_b = jax.jit(stage_b, device=self.d1)
        fh, fw = frame_hw or mcfg.input_size
        self.input_shape = (batch, fh, fw, 3)

    def warmup(self) -> "PipelinedRunner":
        dummy = jnp.zeros(self.input_shape, jnp.uint8)
        jax.block_until_ready(self(dummy))
        return self

    def __call__(self, frames) -> Dict[str, jax.Array]:
        feats = self.stage_a(self.params_a, frames)
        feats = jax.device_put(feats, self.d1)       # ICI hop
        return self.stage_b(self.params_b, feats)

    def run_stream(self, frames_iter,
                   max_inflight: int = 2) -> List[Dict[str, jax.Array]]:
        """Pipelined streaming: the host enqueues stage A, the ICI hop, and
        stage B of each frame WITHOUT waiting on earlier frames — JAX async
        dispatch keeps both devices busy and the host never sits in a
        per-frame sync. `max_inflight` bounds queued frames (device-memory
        backpressure): the host only materializes frame i-max_inflight when
        enqueueing frame i, by which point it is long done at steady state.
        """
        from collections import deque
        results: List[Dict[str, jax.Array]] = []
        pending: "deque" = deque()
        for frames in frames_iter:
            feats = self.stage_a(self.params_a, frames)
            feats = jax.device_put(feats, self.d1)       # ICI hop
            pending.append(self.stage_b(self.params_b, feats))
            if len(pending) > max_inflight:
                results.append(jax.block_until_ready(pending.popleft()))
        while pending:
            results.append(jax.block_until_ready(pending.popleft()))
        return results
