"""Streaming runner: multi-frame-in-flight pipelined inference.

The throughput-oriented counterpart of runtime.executor's interactive state
machine (BASELINE config 4: "streaming, double-buffered"). Keeps up to
`depth` frames in flight: dispatch(i+1..i+depth) overlaps compute(i) and the
slate D2H of (i-1) — the reference approximates the same overlap with
time-sliced scheduling + 4-way async readback (IEExecutor.cs:395-456);
here XLA's async dispatch queue does it natively.

Results come back in FIFO order via `poll()` or the `results()` iterator.
"""
from __future__ import annotations

import collections
import dataclasses
import time
from typing import Any, Deque, Dict, Iterator, Optional, Tuple

import numpy as np

from xrseg_tpu.compile import CompiledPipeline, unpack_slate
from xrseg_tpu.runtime.tracing import Tracer


@dataclasses.dataclass
class StreamResult:
    frame_id: int
    slate: Dict[str, Any]           # unpacked host slate (boxes/labels/...)
    latency_s: float
    device_out: Dict[str, Any]      # device-side arrays (masks, coefs)


class StreamingRunner:
    """Pipelined frame streaming over a compiled pipeline.

    depth=2 is classic double buffering; deeper helps on high-latency
    host links (it hides D2H latency, at the cost of result lag).
    """

    def __init__(self, pipeline: CompiledPipeline, depth: int = 2):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.pipeline = pipeline
        self.depth = depth
        self.tracer = Tracer()
        self._inflight: Deque[Tuple[int, float, Dict[str, Any]]] = \
            collections.deque()
        self._next_id = 0

    @property
    def inflight(self) -> int:
        return len(self._inflight)

    def submit(self, frames) -> Optional[StreamResult]:
        """Dispatch a frame batch; returns the oldest completed result once
        the pipeline is full, else None (fill phase)."""
        with self.tracer.section("dispatch"):
            out = self.pipeline(frames)
            out["slate"].copy_to_host_async()
        self._inflight.append((self._next_id, time.perf_counter(), out))
        self._next_id += 1
        self.tracer.count("frames_submitted")
        if len(self._inflight) > self.depth:
            return self._pop()
        return None

    def _pop(self) -> StreamResult:
        fid, t0, out = self._inflight.popleft()
        with self.tracer.section("readback"):
            slate_host = np.asarray(out["slate"])
        boxes = out.get("boxes_xywhr", out.get("boxes_xywh"))
        if boxes is None:          # classify: the slate IS the prob row
            slates = [{"probs": row} for row in slate_host]
        else:
            max_det, box_dim = boxes.shape[1], boxes.shape[2]
            slates = [unpack_slate(row, max_det, box_dim=box_dim)
                      for row in slate_host]
        slate = slates[0] if len(slates) == 1 else {
            k: [s[k] for s in slates] for k in slates[0]}
        return StreamResult(frame_id=fid, slate=slate,
                            latency_s=time.perf_counter() - t0,
                            device_out=out)

    def drain(self) -> Iterator[StreamResult]:
        """Yield all remaining in-flight results."""
        while self._inflight:
            yield self._pop()

    def run(self, frames_iter) -> Iterator[StreamResult]:
        """Stream an iterator of frame batches end-to-end."""
        for frames in frames_iter:
            r = self.submit(frames)
            if r is not None:
                yield r
        yield from self.drain()


class PipelinedTickRunner:
    """Depth-K pipelined FUSED XR tick over an Executor.

    The interactive state machine (runtime.executor, mirroring
    IEExecutor.cs:389-417) keeps ONE frame in flight, so every tracked
    tick serializes the full dispatch->ready transport window against
    host processing (~77 ms/frame of `device_wait` on the tunneled dev
    chip — the r5 fused-tick split). In fused-tick mode the ONLY
    frame-to-frame data dependency is the previous target box riding
    into the next dispatch (ops/relock.py), so frame N+1 can dispatch
    with a one-result-stale box while frame N is still on device,
    overlapping the wait windows. Staleness is bounded by depth-1
    results (~33-90 ms at interactive rates) — inside the tracker's
    300 px same-class gate by construction; the reference itself
    tolerates a stale pose via its latency compensator
    (IEExecutor.cs:317-361).

    depth=1 degenerates to the executor's own sequential fused tick
    (pinned by tests/test_pipelined.py); depth=2 is double buffering.
    The executor remains the single owner of tracker/masker/point-cloud
    state: results pop in FIFO dispatch order and are processed through
    Executor._process_result, so overlays, re-ID tracks and lost-frame
    damping behave exactly as in sequential mode.
    """

    def __init__(self, executor, depth: int = 2):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        if not executor.cfg.fused_tick:
            raise ValueError("PipelinedTickRunner requires an executor "
                             "built with ExecutorConfig(fused_tick=True)")
        self.ex = executor
        self.depth = depth
        # (device outputs, tick pipeline, frame meta, dispatch t0)
        self._q: Deque[Tuple[Dict[str, Any], Any, Any, float]] = \
            collections.deque()

    @property
    def inflight(self) -> int:
        return len(self._q)

    def submit(self, frame) -> Optional[Any]:
        """Dispatch one tracked tick; returns the oldest completed
        FrameResult once `depth` frames are in flight, else None."""
        ex = self.ex
        if ex.is_running():
            raise RuntimeError("executor has a classic frame in flight")
        if frame.depth_fp16 is None or frame.intrinsics is None:
            raise ValueError("fused tick needs depth_fp16 + intrinsics")
        ex.prepare_depth_data(frame)
        with ex.tracer.section("dispatch"):
            frames = frame.rgb[None]
            dev = ex._dispatch_fused(frame, frames)
            out = dev.get("packed")
            if out is not None:
                try:
                    # eager D2H (same idiom as run_inference): the copy
                    # rides behind the compute, so the blocking read in
                    # _pop only pays materialization
                    out.copy_to_host_async()
                except Exception:
                    pass
        self._q.append((dev, ex._inflight_tick_pipe, frame,
                        time.perf_counter()))
        ex.tracer.count("frames_dispatched")
        if len(self._q) >= self.depth:
            return self._pop()
        return None

    def _pop(self):
        ex = self.ex
        dev, pipe, frame, t0 = self._q.popleft()
        probe = dev["packed"]
        # poll-then-read mirrors the executor's stage split: device_wait
        # here is the RESIDUAL blocked wait (un-overlapped transport +
        # compute), so pipelined per-frame stages still sum to wall time
        t_wait = time.perf_counter()
        while not probe.is_ready():
            time.sleep(0)
        ex.tracer.stages["device_wait"].add(time.perf_counter() - t_wait)
        with ex.tracer.section("readback"):
            host = pipe.unpack(np.asarray(probe))
        # stage the executor's in-flight slots, then reuse its exact
        # ProcessInferenceResult path (tracker/masker/points/re-ID)
        ex._inflight = dev
        ex._inflight_fused = True
        ex._inflight_tick_pipe = pipe
        ex._inflight_meta = frame
        ex._dispatch_t0 = t0
        ex._host = host
        with ex.tracer.section("process"):
            result = ex._process_result()
        ex.last_result = result
        ex.last_device_out = dev
        ex._readbacks_initiated = False
        return result

    def drain(self) -> Iterator[Any]:
        """Yield all remaining in-flight results (FIFO)."""
        while self._q:
            yield self._pop()

    def run(self, frames_iter) -> Iterator[Any]:
        """Stream FrameData end-to-end through the pipelined tick."""
        for frame in frames_iter:
            r = self.submit(frame)
            if r is not None:
                yield r
        yield from self.drain()
