"""Benchmark: YOLO11n-seg 640x640 sustained frames/sec/chip.

Measures the full pipeline (uint8 frames -> preprocess -> network ->
decode+NMS+mask synthesis -> packed slate readback to host) with pipelined
dispatch: the next batch is dispatched while the previous batch's slate
transfers, so D2H hides behind compute — the TPU equivalent of the
reference's time-sliced schedule + async readback (IEExecutor.cs:395-456).

Baseline: the reference's design target is 20-30 FPS on Quest 3
(Assets/Scripts/1.21~~.txt:6; BASELINE.md). vs_baseline uses 30 FPS.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _enable_compile_cache() -> None:
    try:
        from xrseg_tpu import enable_compile_cache
        enable_compile_cache()
    except Exception:
        pass


def _probe_backend(timeout_s: float = 150.0) -> str | None:
    """Bounded backend-liveness probe, run BEFORE any in-process jax import.

    The tunneled PJRT ("axon") fails by HANGING at backend init when the
    relay is down (observed r3: 10+ h outage, `jax.devices()` never
    returns), which would otherwise turn this gate into 10 minutes of
    driver timeout + a raw traceback. Probe in a subprocess with a hard
    timeout: backend init + device enumeration only (no transfers — the
    first D2H legitimately costs 100-250 s on this tunnel and must not
    fail the probe). Returns None when healthy, else a short error slug.
    """
    import os
    import subprocess
    # sitecustomize force-registers the axon plugin and overrides the
    # platform at import, so the env var alone is too late (CLAUDE.md);
    # re-apply it via jax.config so JAX_PLATFORMS=cpu smoke runs probe CPU.
    code = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "print('ndev=%d' % len(jax.devices()))\n"
    )
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True, env=dict(os.environ))
        if p.returncode == 0 and "ndev=" in p.stdout:
            return None
        return "tpu-backend-error"
    except subprocess.TimeoutExpired:
        return "tpu-backend-unavailable"
    except Exception:
        return "tpu-backend-error"


def _backend_gate() -> None:
    """Exit nonzero with ONE parseable JSON line if the backend is down."""
    err = _probe_backend()
    if err is None:
        return
    print(json.dumps({
        "metric": "yolo11n_seg_640_fps_per_chip",
        "value": None,
        "unit": "frames/sec/chip",
        "vs_baseline": None,
        "error": err,
        "detail": "jax backend init did not complete within the probe "
                  "timeout; the axon TPU tunnel is likely down (see "
                  "docs/ROADMAP.md r3 incident). No code was benchmarked.",
    }), flush=True)
    raise SystemExit(3)


def run_device_bench(batch: int = 32, n_chained: int = 30, scale: str = "n",
                     repeats: int = 2, task: str = "segment",
                     frame_hw=None, input_size=(640, 640),
                     post_overrides: dict | None = None,
                     params_dtype: str | None = None,
                     matmul_precision: str = "default",
                     emit_masks: bool = True,
                     arch: str = "yolo11",
                     o2o: bool = False) -> dict:
    """Pure device throughput: N pipeline invocations CHAINED on-device via
    lax.scan (each batch's input depends on the previous batch's output, so
    nothing can be elided or overlapped away), one scalar readback at the
    end. This is the honest frames/sec/chip number — host-link latency
    (which on this dev tunnel is ~23 ms/round-trip, vs ~us on production
    TPU hosts) is excluded and reported separately by run_bench.
    """
    import jax
    import jax.numpy as jnp

    from xrseg_tpu.config import ExecutorConfig, ModelConfig
    from xrseg_tpu.models import yolo11
    from xrseg_tpu.ops import preprocess as pre_ops
    
    cfg = ExecutorConfig(model=ModelConfig(arch=arch, scale=scale, task=task,
                                           input_size=tuple(input_size),
                                           matmul_precision=matmul_precision,
                                           o2o=o2o))
    if post_overrides:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, post=_dc.replace(cfg.post, **post_overrides))
    mcfg, pcfg = cfg.model, cfg.post
    params = yolo11.init_params(jax.random.key(0), mcfg)
    if params_dtype:
        from xrseg_tpu.io.weights import cast_params
        params = cast_params(params, params_dtype)

    from xrseg_tpu.ops.postprocess import postprocess_batch_parts

    from xrseg_tpu.precision import precision_scope

    def one(params, frames):
        with precision_scope(mcfg.matmul_precision):
            x = pre_ops.preprocess(frames, mcfg.input_size,
                                   dtype=jnp.bfloat16)
            out = yolo11.forward(params, x, mcfg, concat_preds=False)
            return postprocess_batch_parts(
                out["boxes_xywh"], out["cls_logits"], out.get("mask_coefs"),
                out.get("protos"), pcfg, False, mcfg.input_size,
                mask_dtype=jnp.bfloat16, scores_are_logits=True,
                with_masks=emit_masks)

    @jax.jit
    def chained(params, frames):
        def body(carry, _):
            det = one(params, frames + carry)   # data dependency
            c = (det["count"].sum() % 2).astype(jnp.uint8)
            return c, det["count"].sum()
        c, counts = jax.lax.scan(body, jnp.uint8(0), None, length=n_chained)
        return counts.sum()

    fh, fw = frame_hw or mcfg.input_size
    frames = jnp.zeros((batch, fh, fw, 3), jnp.uint8)
    r = chained(params, frames)
    _ = np.asarray(r)                        # compile + absorb first D2H
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = np.asarray(chained(params, frames))
        best = min(best, time.perf_counter() - t0)
    per_batch = best / n_chained
    return {
        "fps_per_chip": batch / per_batch,
        "ms_per_batch": per_batch * 1e3,
        "batch": batch,
    }


def run_latency_bench(n_frames: int = 60, warmup: int = 8,
                      scale: str = "n", arch: str = "yolo11",
                      o2o: bool = False) -> dict:
    """Interactive single-frame latency: batch=1, synchronous dispatch ->
    slate materialized on host each frame (host-transfer-anchored, the only
    timing this tunneled PJRT reports honestly). This is the p50-latency
    half of the BASELINE metric (SURVEY §6: "fps + p50 latency"); the
    reference's analogue is one full inference spread over ~display frames
    at 20-30 FPS (33-50 ms)."""
    import jax.numpy as jnp

    from xrseg_tpu.compile import load_model
    from xrseg_tpu.config import ExecutorConfig, ModelConfig

    cfg = ExecutorConfig(model=ModelConfig(arch=arch, scale=scale, o2o=o2o))
    # bf16 weight storage: the batch-1 serving configuration (see README)
    pipe = load_model(cfg, batch=1, params_dtype="bfloat16")
    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.integers(0, 255, (1, 640, 640, 3)), jnp.uint8)
              for _ in range(2)]
    lat = []
    for i in range(warmup + n_frames):
        t0 = time.perf_counter()
        out = pipe(frames[i % 2])
        np.asarray(out["slate"])     # block: frame result on host
        if i >= warmup:
            lat.append(time.perf_counter() - t0)
    return {
        "p50_latency_ms": float(np.percentile(lat, 50) * 1e3),
        "p95_latency_ms": float(np.percentile(lat, 95) * 1e3),
        "n_frames": n_frames,
    }


def run_bench(batch: int = 32, n_batches: int = 60, warmup_batches: int = 8,
              scale: str = "n", inflight: int = 4) -> dict:
    import jax
    import jax.numpy as jnp

    from xrseg_tpu.compile import load_model
    from xrseg_tpu.config import ExecutorConfig, ModelConfig

    cfg = ExecutorConfig(model=ModelConfig(scale=scale))
    pipe = load_model(cfg, batch=batch)   # warms up + absorbs first D2H

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.integers(0, 255, (batch, 640, 640, 3)),
                          jnp.uint8) for _ in range(2)]

    # warmup steady-state path
    for i in range(warmup_batches):
        out = pipe(frames[i % 2])
        np.asarray(out["slate"])

    # pipelined loop: keep `inflight` batches in flight; issue async host
    # copies immediately; materialize in FIFO order.
    lat = []
    queue = []
    t_start = time.perf_counter()
    for i in range(n_batches):
        t0 = time.perf_counter()
        out = pipe(frames[i % 2])
        out["slate"].copy_to_host_async()
        queue.append((t0, out["slate"]))
        if len(queue) >= inflight:
            q0, slate = queue.pop(0)
            np.asarray(slate)
            lat.append(time.perf_counter() - q0)
    for q0, slate in queue:
        np.asarray(slate)
        lat.append(time.perf_counter() - q0)
    elapsed = time.perf_counter() - t_start

    fps = batch * n_batches / elapsed
    return {
        "fps_per_chip": fps,
        "p50_latency_ms": float(np.percentile(lat, 50) * 1e3),
        "batch": batch,
        "elapsed_s": elapsed,
    }


def run_streaming_bench(scale: str = "m", frame_hw=(960, 1280),
                        batch: int = 1, depth: int = 2,
                        n_frames: int = 40, warmup: int = 6) -> dict:
    """BASELINE config 4 through the ACTUAL StreamingRunner surface
    (double-buffered, sustained): submit keeps `depth` frames in flight,
    results materialize FIFO. Unlike run_device_bench's on-device scan
    chain, every frame's slate crosses the host link — on this dev
    tunnel (~23 ms RTT) that bounds throughput; on production TPU hosts
    the link is ~us and the same loop tracks device speed."""
    import jax.numpy as jnp

    from xrseg_tpu.compile import load_model
    from xrseg_tpu.config import ExecutorConfig, ModelConfig
    from xrseg_tpu.runtime.streaming import StreamingRunner

    cfg = ExecutorConfig(model=ModelConfig(scale=scale))
    pipe = load_model(cfg, batch=batch, frame_hw=frame_hw)
    runner = StreamingRunner(pipe, depth=depth)
    rng = np.random.default_rng(0)
    bufs = [jnp.asarray(rng.integers(0, 255, (batch,) + tuple(frame_hw)
                                     + (3,)), jnp.uint8) for _ in range(2)]
    lat = []
    n_done = 0
    t0 = None
    for i in range(warmup + n_frames):
        if i == warmup:
            t0 = time.perf_counter()
        r = runner.submit(bufs[i % 2])
        if r is not None and i >= warmup:
            lat.append(r.latency_s)
            n_done += 1
    for r in runner.drain():
        lat.append(r.latency_s)
        n_done += 1
    elapsed = time.perf_counter() - t0
    return {
        "fps_per_chip": batch * n_done / elapsed,
        "p50_latency_ms": float(np.percentile(lat, 50) * 1e3),
        "batch": batch, "depth": depth, "harness": "StreamingRunner",
    }


def run_multistream_bench(scale: str = "x", n_streams: int = 2,
                          n_frames: int = 30, warmup: int = 5,
                          inflight: int = 2) -> dict:
    """BASELINE config 5 through the ACTUAL MultiStreamRunner surface:
    n camera streams as one mesh-sharded batch (a (1,1) mesh on the
    single bench chip — same code path as multi-chip), dispatched with
    `inflight` results pending so D2H overlaps compute."""
    import jax.numpy as jnp

    from xrseg_tpu.config import ExecutorConfig, ModelConfig
    from xrseg_tpu.parallel import mesh as mesh_lib
    from xrseg_tpu.parallel.batch import MultiStreamRunner

    import jax

    from xrseg_tpu.models import yolo11

    cfg = ExecutorConfig(model=ModelConfig(scale=scale))
    params = yolo11.init_params(jax.random.key(0), cfg.model)
    mesh = mesh_lib.make_mesh((1, 1))
    runner = MultiStreamRunner(cfg, params, mesh, n_streams=n_streams)
    rng = np.random.default_rng(0)
    bufs = [jnp.asarray(rng.integers(0, 255, (n_streams, 640, 640, 3)),
                        jnp.uint8) for _ in range(2)]
    for i in range(warmup):                      # compile + steady-state
        np.asarray(runner(bufs[i % 2])["slate"])
    lat = []
    queue = []
    t0 = time.perf_counter()
    for i in range(n_frames):
        ts = time.perf_counter()
        det = runner(bufs[i % 2])
        det["slate"].copy_to_host_async()
        queue.append((ts, det["slate"]))
        if len(queue) >= inflight:
            q0, slate = queue.pop(0)
            np.asarray(slate)
            lat.append(time.perf_counter() - q0)
    for q0, slate in queue:
        np.asarray(slate)
        lat.append(time.perf_counter() - q0)
    elapsed = time.perf_counter() - t0
    return {
        "fps_per_chip": n_streams * n_frames / elapsed,
        "p50_latency_ms": float(np.percentile(lat, 50) * 1e3),
        "n_streams": n_streams, "harness": "MultiStreamRunner",
    }


def run_task_bench(task: str, batch: int = 128, n_chained: int = 20,
                   scale: str = "n", repeats: int = 2) -> dict:
    """Throughput of the extended task family's compiled pipelines
    (pose / obb / classify), same chained-on-device methodology."""
    import jax
    import jax.numpy as jnp

    from xrseg_tpu.compile import build_pipeline
    from xrseg_tpu.config import ExecutorConfig, ModelConfig
    from xrseg_tpu.models import yolo11

    cfg = ExecutorConfig(model=ModelConfig(scale=scale, task=task))
    params = yolo11.init_params(jax.random.key(0), cfg.model)
    pipe = build_pipeline(cfg, params, batch=batch)

    @jax.jit
    def chained(params, frames):
        def body(carry, _):
            det = pipe.fn(params, frames + carry)
            s = det["slate"].sum()
            return (s % 2).astype(jnp.uint8), s
        c, ss = jax.lax.scan(body, jnp.uint8(0), None, length=n_chained)
        return ss.sum()

    frames = jnp.zeros((batch, 640, 640, 3), jnp.uint8)
    _ = np.asarray(chained(params, frames))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = np.asarray(chained(params, frames))
        best = min(best, time.perf_counter() - t0)
    per_batch = best / n_chained
    return {"task": task, "fps_per_chip": batch / per_batch,
            "ms_per_batch": per_batch * 1e3, "batch": batch}


def run_accuracy_modes_bench(batch: int = 128, n_chained: int = 10,
                             scale: str = "n", repeats: int = 2,
                             b1_frames: int = 30,
                             input_size=(640, 640)) -> list:
    """On-chip cost of the r3 accuracy modes, priced with the same
    chained-on-device methodology as the headline: plain pipeline vs
    2-view TTA vs ultralytics 3-view TTA vs WBF merge vs 2-model
    ensemble, each at the headline batch and at batch=1.

    These modes all feed the reference's deployed-output contract
    (IEModelEditorConverter.cs:50-58); this table replaces the README's
    former "~V× device cost" estimate with measured numbers.
    """
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from xrseg_tpu.compile import (ULTRALYTICS_TTA_VIEWS,
                                   build_ensemble_pipeline, build_pipeline)
    from xrseg_tpu.config import ExecutorConfig, ModelConfig
    from xrseg_tpu.models import yolo11

    isz = tuple(input_size)
    seg_cfg = ExecutorConfig(model=ModelConfig(scale=scale, task="segment",
                                               input_size=isz))
    det_cfg = ExecutorConfig(model=ModelConfig(scale=scale, task="detect",
                                               input_size=isz))
    wbf_cfg = _dc.replace(seg_cfg, post=_dc.replace(seg_cfg.post,
                                                    merge="wbf"))
    params = yolo11.init_params(jax.random.key(0), seg_cfg.model)
    params2 = yolo11.init_params(jax.random.key(1), seg_cfg.model)

    # (name, build(batch) -> pipeline); each pipeline's .params feed .fn
    modes = [
        ("plain_segment", lambda b: build_pipeline(seg_cfg, params,
                                                   batch=b)),
        ("tta2_segment", lambda b: build_pipeline(seg_cfg, params,
                                                  batch=b, tta=True)),
        # scaled multi-scale views are detect/obb-only (compile.py guard)
        ("tta3_detect", lambda b: build_pipeline(
            det_cfg, params, batch=b, tta=True,
            tta_views=ULTRALYTICS_TTA_VIEWS)),
        ("wbf_segment", lambda b: build_pipeline(wbf_cfg, params,
                                                 batch=b)),
        # same merge with the exact top-512 candidate compaction (the
        # WBF scan is one sequential step per candidate; see ops/wbf.py)
        ("wbf_topk512_segment", lambda b: build_pipeline(
            _dc.replace(wbf_cfg, post=_dc.replace(wbf_cfg.post,
                                                  pre_nms_topk=512)),
            params, batch=b)),
        ("ensemble2_segment", lambda b: build_ensemble_pipeline(
            wbf_cfg, [params, params2], batch=b)),
        # the ensemble merge scans M*A candidates sequentially, so the
        # same top-512 compaction matters M times more here (indices
        # stay in pre-compaction M*A space — member mapping intact)
        ("ensemble2_topk512_segment", lambda b: build_ensemble_pipeline(
            _dc.replace(wbf_cfg, post=_dc.replace(wbf_cfg.post,
                                                  pre_nms_topk=512)),
            [params, params2], batch=b)),
    ]

    def chained_fps(pipe, b, n, reps):
        @jax.jit
        def chained(p, frames):
            def body(carry, _):
                det = pipe.fn(p, frames + carry)
                s = det["slate"].sum()
                return (s % 2).astype(jnp.uint8), s
            c, ss = jax.lax.scan(body, jnp.uint8(0), None, length=n)
            return ss.sum()
        frames = jnp.zeros((b,) + isz + (3,), jnp.uint8)
        _ = np.asarray(chained(pipe.params, frames))   # compile
        best = float("inf")
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(chained(pipe.params, frames))
            best = min(best, time.perf_counter() - t0)
        return b / (best / n)

    rows = []
    plain = {}
    for name, build in modes:
        fps_b = chained_fps(build(batch), batch, n_chained, repeats)
        fps_1 = chained_fps(build(1), 1, b1_frames, repeats)
        if name.startswith("plain"):
            plain = {"b": fps_b, "1": fps_1}
        rows.append({
            "metric": f"accuracy_mode_{name}_yolo11{scale}",
            "value": round(fps_b, 1),
            "unit": f"frames/sec/chip (b={batch})",
            "vs_baseline": round(fps_b / 30.0, 1),
            "ms_per_frame_b1": round(1e3 / fps_1, 2),
            "cost_vs_plain_bN": round(plain["b"] / fps_b, 2),
            "cost_vs_plain_b1": round(fps_1 and plain["1"] / fps_1, 2),
        })
    return rows


# The five BASELINE.json configs (single chip; config 5's two stereo
# streams = batch 2).
BASELINE_CONFIGS = {
    # config 1 is the latency mode: bf16 weight storage halves weight HBM
    # reads, measured ~7% faster at batch=1 (neutral at large batch)
    1: dict(scale="n", task="segment", batch=1, params_dtype="bfloat16"),
    2: dict(scale="n", task="detect", batch=8),
    3: dict(scale="s", task="segment", batch=32),
    4: dict(scale="m", task="segment", batch=1, frame_hw=(960, 1280)),
    5: dict(scale="x", task="segment", batch=2),
}


def main() -> int:
    import os
    if os.environ.get("JAX_PLATFORMS"):
        # honor the env var even under the axon sitecustomize (which
        # overrides the platform at import): lets JAX_PLATFORMS=cpu run
        # this file as a smoke test. No-op in the driver's axon env.
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    _enable_compile_cache()
    _backend_gate()
    if len(sys.argv) > 1 and sys.argv[1] == "--streaming":
        # BASELINE configs 4-5 through their REAL runner surfaces (the
        # numbers the README streaming table cites; host-link-bound on
        # this dev tunnel, see run_streaming_bench docstring)
        r4 = run_streaming_bench()
        print(json.dumps({
            "metric": "config4_streaming_yolo11m_960x1280_b1",
            "value": round(r4["fps_per_chip"], 1),
            "unit": "frames/sec/chip (StreamingRunner, host-anchored)",
            "vs_baseline": round(r4["fps_per_chip"] / 30.0, 1),
            "p50_latency_ms": round(r4["p50_latency_ms"], 2),
        }), flush=True)
        r5 = run_multistream_bench()
        print(json.dumps({
            "metric": "config5_multistream_yolo11x_2x640",
            "value": round(r5["fps_per_chip"], 1),
            "unit": "frames/sec/chip (MultiStreamRunner, host-anchored)",
            "vs_baseline": round(r5["fps_per_chip"] / 30.0, 1),
            "p50_latency_ms": round(r5["p50_latency_ms"], 2),
        }), flush=True)
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "--accuracy-modes":
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        for row in run_accuracy_modes_bench(batch=batch):
            print(json.dumps(row), flush=True)
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "--tasks":
        for task in ("pose", "obb", "classify"):
            r = run_task_bench(task)
            print(json.dumps({
                "metric": f"task_{task}_yolo11n_640_b128",
                "value": round(r["fps_per_chip"], 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(r["fps_per_chip"] / 30.0, 1),
            }), flush=True)
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "--configs":
        for i, kw in BASELINE_CONFIGS.items():
            r = run_device_bench(n_chained=20, repeats=2, **kw)
            print(json.dumps({
                "metric": f"config{i}_yolo11{kw['scale']}_"
                          f"{kw['task']}_b{kw['batch']}",
                "value": round(r["fps_per_chip"], 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(r["fps_per_chip"] / 30.0, 1),
            }), flush=True)
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "--xla-sweep":
        # XLA:TPU compiler-flag A/B on the headline workload. TPU flags
        # ride LIBTPU_INIT_ARGS (XLA_FLAGS is parsed by the HOST-side XLA,
        # which hard-aborts on unknown --xla_tpu_* names) and bind at
        # backend init, so each variant runs `bench.py <batch>` in a fresh
        # subprocess; the persistent compile cache keys on compile
        # options, so variants don't poison each other's entries. Control
        # runs first. On the CPU smoke path libtpu never loads and every
        # variant legitimately reports the control number.
        import os
        import subprocess
        batch = sys.argv[2] if len(sys.argv) > 2 else "128"
        variants = [
            ("control", ""),
            ("scoped_vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
            ("latency_hiding_sched",
             "--xla_tpu_enable_latency_hiding_scheduler=true"),
            ("vmem64m+lhs",
             "--xla_tpu_scoped_vmem_limit_kib=65536 "
             "--xla_tpu_enable_latency_hiding_scheduler=true"),
        ]
        for name, flags in variants:
            env = dict(os.environ)
            if flags:
                env["LIBTPU_INIT_ARGS"] = (
                    env.get("LIBTPU_INIT_ARGS", "") + " " + flags).strip()
            try:
                p = subprocess.run([sys.executable, __file__, batch],
                                   capture_output=True, text=True,
                                   timeout=1800, env=env)
                row = None
                for line in p.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        row = json.loads(line)
                print(json.dumps({
                    "metric": f"xla_sweep_{name}_b{batch}",
                    "value": (row or {}).get("value"),
                    "unit": "frames/sec/chip",
                    "vs_baseline": (row or {}).get("vs_baseline"),
                    "libtpu_init_args": flags or "(default)",
                    "rc": p.returncode,
                }), flush=True)
            except subprocess.TimeoutExpired:
                print(json.dumps({
                    "metric": f"xla_sweep_{name}_b{batch}",
                    "value": None, "error": "timeout",
                    "libtpu_init_args": flags or "(default)",
                }), flush=True)
        return 0
    if len(sys.argv) > 2 and sys.argv[1] == "--profile":
        # device trace of the headline workload for TensorBoard/xprof
        from xrseg_tpu.runtime.profiling import device_trace
        with device_trace(sys.argv[2]):
            r = run_device_bench(batch=128, n_chained=5, repeats=1)
        print(json.dumps({"metric": "profiled_b128", "value":
                          round(r["fps_per_chip"], 1),
                          "unit": "frames/sec/chip",
                          "trace_dir": sys.argv[2],
                          "vs_baseline": round(r["fps_per_chip"] / 30, 1)}))
        return 0
    argv = list(sys.argv[1:])
    arch = "yolo11"
    if "--arch" in argv:                   # e.g. `bench.py 128 --arch yolov8`
        i = argv.index("--arch")
        arch = argv[i + 1]
        del argv[i:i + 2]
    o2o = "--o2o" in argv                  # NMS-free serving (dual head)
    if o2o:
        argv.remove("--o2o")
    batch = int(argv[0]) if argv else 128
    r = run_device_bench(batch=batch, arch=arch, o2o=o2o)
    lat = run_latency_bench(arch=arch, o2o=o2o)
    # ONE JSON line; headline metric is throughput, and the BASELINE's
    # second metric (p50 single-frame latency, batch=1, host-anchored)
    # rides along as extra keys.
    name = "yolo11n" if arch == "yolo11" else "yolov8n"
    if o2o:
        name += "_o2o"                     # NMS-free pipeline variant
    print(json.dumps({
        "metric": f"{name}_seg_640_fps_per_chip_b{batch}",
        "value": round(r["fps_per_chip"], 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(r["fps_per_chip"] / 30.0, 1),
        "p50_latency_ms_b1": round(lat["p50_latency_ms"], 2),
        "p95_latency_ms_b1": round(lat["p95_latency_ms"], 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
