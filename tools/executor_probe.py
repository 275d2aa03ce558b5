"""Interactive Executor probe: measure the L3 state machine on real hardware.

VERDICT r1 ("what's weak" #3) asked for evidence of how the executor's
non-blocking story behaves on the actual TPU: `is_ready()` polling on the
tunneled axon PJRT does not reflect real execution completion (CLAUDE.md),
so the state machine may degrade to synchronous. This tool drives the real
interactive loop — SyntheticCameraSource -> run_inference -> update() ticks
— on whatever backend the process sees (axon TPU by default, CPU with
JAX_PLATFORMS=cpu) and reports:

  - per-frame completed latency (dispatch -> SUCCESS), p50/p95
  - interactive frames/sec sustained by the tick loop
  - ticks spent in RUNNING before the readiness probe flipped
    (0-1 ticks everywhere == is_ready() returned immediately, i.e. the
    poll carries no information on this backend and the latency is paid
    in the readback instead)
  - time split: RUNNING-poll wait vs readback materialization

Usage:  python tools/executor_probe.py [n_frames]
Output: one JSON line (plus a human-readable summary on stderr).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_frames: int = 60, warmup: int = 8) -> int:
    from xrseg_tpu.config import ExecutorConfig, ModelConfig
    from xrseg_tpu.runtime.executor import ExecState, Executor
    from xrseg_tpu.runtime.frame_source import SyntheticCameraSource

    import jax
    platform = jax.devices()[0].platform

    frame_hw = (480, 640)
    cfg = ExecutorConfig(model=ModelConfig(scale="n"))
    t0 = time.perf_counter()
    ex = Executor(cfg, frame_hw=frame_hw)
    load_s = time.perf_counter() - t0

    src = SyntheticCameraSource(frame_hw=frame_hw,
                                max_frames=n_frames + warmup + 4)
    frames = src.frames()

    lat, run_ticks_hist, run_wait_s, readback_s = [], [], [], []
    done = 0
    t_loop0 = None
    while done < n_frames + warmup:
        frame = next(frames)
        assert ex.run_inference(frame)
        ticks = 0
        t_run0 = time.perf_counter()
        t_ready = None
        while True:
            r = ex.update()
            if ex.state == ExecState.REQUESTING_OUTPUTS and t_ready is None:
                t_ready = time.perf_counter()
            if r is not None:
                ex.update()       # CLEANUP -> COMPLETED
                break
            if ex.state == ExecState.COMPLETED:
                raise RuntimeError("executor ERROR state")
            if ex.state == ExecState.RUNNING:
                ticks += 1
        done += 1
        if done == warmup:
            t_loop0 = time.perf_counter()
        if done > warmup:
            lat.append(r.latency_s)
            run_ticks_hist.append(ticks)
            run_wait_s.append((t_ready or t_run0) - t_run0)
            readback_s.append(time.perf_counter() - (t_ready or t_run0))
    elapsed = time.perf_counter() - t_loop0

    out = {
        "platform": platform,
        "frame_hw": list(frame_hw),
        "n_frames": n_frames,
        "load_s": round(load_s, 1),
        "interactive_fps": round(n_frames / elapsed, 1),
        "p50_latency_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "p95_latency_ms": round(float(np.percentile(lat, 95)) * 1e3, 2),
        "running_ticks_p50": int(np.percentile(run_ticks_hist, 50)),
        "running_ticks_max": int(np.max(run_ticks_hist)),
        "running_wait_ms_p50": round(
            float(np.percentile(run_wait_s, 50)) * 1e3, 2),
        "readback_ms_p50": round(
            float(np.percentile(readback_s, 50)) * 1e3, 2),
    }
    print(json.dumps(out), flush=True)
    poll_informative = out["running_ticks_p50"] > 0
    print(
        f"[probe] {platform}: {out['interactive_fps']} interactive fps, "
        f"p50 {out['p50_latency_ms']} ms "
        f"(poll wait {out['running_wait_ms_p50']} ms / readback "
        f"{out['readback_ms_p50']} ms). is_ready() poll "
        + ("tracks completion" if poll_informative else
           "returns immediately — completion is only observable at the "
           "readback, so the per-frame cost lands in REQUESTING_OUTPUTS"),
        file=sys.stderr)
    return 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    raise SystemExit(main(n))
