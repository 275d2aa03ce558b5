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
