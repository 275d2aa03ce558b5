"""Device-level profiling: XLA/TPU traces for TensorBoard.

The reference has zero profiling instrumentation (SURVEY §5 — its only
perf affordances are tunables). This framework has two layers:

  - runtime/tracing.Tracer: host-side per-stage p50/p95 timers (always
    on, ~free) — what /stats and the executor report.
  - THIS module: jax.profiler device traces — per-op XLA timelines,
    HBM usage, fusion boundaries — for deep perf work. View with
    TensorBoard's profile plugin (`tensorboard --logdir <dir>`) or
    xprof.

Usage:
    from xrseg_tpu.runtime.profiling import device_trace, profile_fn

    with device_trace("/tmp/trace"):
        pipe(frames)                       # any device work

    profile_fn(lambda: pipe(frames), "/tmp/trace", steps=3)

`bench.py --profile DIR` wraps the headline benchmark in a trace.
"""
from __future__ import annotations

import contextlib
import os
from typing import Callable


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace into `logdir`.

    Works on every backend (TPU traces include per-op device timelines;
    CPU traces are host-side only). Nesting is not supported by
    jax.profiler; this guards against double-entry by no-oping the
    inner scope.
    """
    import jax

    os.makedirs(logdir, exist_ok=True)
    if getattr(device_trace, "_active", False):
        yield
        return
    device_trace._active = True
    try:
        with jax.profiler.trace(logdir):
            yield
    finally:
        device_trace._active = False


def profile_fn(fn: Callable[[], object], logdir: str, steps: int = 3,
               warmup: int = 1) -> str:
    """Run `fn` under a device trace (after `warmup` untraced calls so
    compilation doesn't pollute the timeline). Returns `logdir`."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    with device_trace(logdir):
        for _ in range(steps):
            jax.block_until_ready(fn())
    return logdir


def annotate(name: str):
    """Named sub-span inside a trace (shows as a TraceMe region):

        with annotate("postprocess"):
            ...
    """
    import jax

    return jax.profiler.TraceAnnotation(name)
