"""Per-stage timing/observability (the instrumentation the reference lacks).

SURVEY.md §5 notes the reference has zero profiling affordances; since our
headline metric is fps + p50 latency, the runtime carries a lightweight
tracer: named sections, ring-buffered durations, percentile summaries, and a
single-line JSON export for benches.
"""
from __future__ import annotations

import collections
import contextlib
import json
import time
from typing import Dict, Iterator


class StageTimer:
    def __init__(self, maxlen: int = 512):
        self.samples: collections.deque = collections.deque(maxlen=maxlen)

    def add(self, seconds: float) -> None:
        self.samples.append(seconds)

    def percentile(self, p: float) -> float:
        if not self.samples:
            return 0.0
        s = sorted(self.samples)
        k = min(len(s) - 1, max(0, int(round(p / 100.0 * (len(s) - 1)))))
        return s[k]

    @property
    def mean(self) -> float:
        return sum(self.samples) / len(self.samples) if self.samples else 0.0

    @property
    def count(self) -> int:
        return len(self.samples)


class Tracer:
    """Named-section wall-clock tracer.

    with tracer.section("preprocess"): ...
    print(tracer.summary())
    """

    def __init__(self):
        self.stages: Dict[str, StageTimer] = collections.defaultdict(StageTimer)
        self.counters: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name].add(time.perf_counter() - t0)

    def count(self, name: str, inc: int = 1) -> None:
        self.counters[name] += inc

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, st in self.stages.items():
            out[name] = {
                "count": st.count,
                "mean_ms": st.mean * 1e3,
                "p50_ms": st.percentile(50) * 1e3,
                "p95_ms": st.percentile(95) * 1e3,
            }
        for name, c in self.counters.items():
            out.setdefault("counters", {})[name] = c
        return out

    def summary_json(self) -> str:
        return json.dumps(self.summary(), sort_keys=True)

    def reset(self) -> None:
        self.stages.clear()
        self.counters.clear()
