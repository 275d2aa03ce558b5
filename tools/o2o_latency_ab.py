"""o2o vs classic-NMS b=1 latency, apples to apples (VERDICT r4 weak #5).

The r4 chip queue measured o2o b=1 at 31.4 ms p50 / 46.6 ms p95 in one
process vs 24.3/26 plain in ANOTHER process — but cross-process chip
numbers drift ±5-8% on the tunnel, and the p95 outlier was unexplained.
This tool removes both confounds: ONE process, both pipelines built
up front (plain and ModelConfig(o2o=True), b=1, bf16 weights — the
latency-mode serving configuration), then ROUND-ROBIN interleaved
timed frames so any tunnel weather hits both arms equally. Reports
p50/p95/p99 per arm plus each arm's 5 slowest frames with their
positions in the sequence (a periodic spike pattern = host/tunnel; an
o2o-only tail = the o2o program itself).

Chip: python tools/o2o_latency_ab.py --frames 150
CPU:  python tools/o2o_latency_ab.py --cpu --frames 20 --size 64
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..")))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150,
                    help="timed frames per arm")
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--scale", default="n")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import xrseg_tpu
    xrseg_tpu.enable_compile_cache()
    from xrseg_tpu.compile import load_model
    from xrseg_tpu.config import ExecutorConfig, ModelConfig

    hw = (args.size, args.size)
    pipes = {}
    for name, o2o in (("plain", False), ("o2o", True)):
        cfg = ExecutorConfig(model=ModelConfig(
            scale=args.scale, input_size=hw, o2o=o2o, dtype="float32"))
        print(f"building {name}...", flush=True)
        pipes[name] = load_model(cfg, batch=1, params_dtype="bfloat16",
                                 seed=0)

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.integers(0, 255, (1, *hw, 3)), jnp.uint8)
              for _ in range(2)]
    lats = {"plain": [], "o2o": []}
    for i in range(args.warmup + args.frames):
        for name in ("plain", "o2o"):        # round-robin: shared weather
            t0 = time.perf_counter()
            out = pipes[name](frames[i % 2])
            np.asarray(out["slate"])         # host-anchored
            if i >= args.warmup:
                lats[name].append(time.perf_counter() - t0)

    row = {"metric": "o2o_latency_ab_b1", "unit": "ms",
           "frames": args.frames, "size": args.size}
    for name, ls in lats.items():
        a = np.asarray(ls) * 1e3
        worst = np.argsort(a)[-5:][::-1]
        row[name] = {
            "p50": round(float(np.percentile(a, 50)), 2),
            "p95": round(float(np.percentile(a, 95)), 2),
            "p99": round(float(np.percentile(a, 99)), 2),
            "worst_ms": [round(float(a[i]), 1) for i in worst],
            "worst_at_frame": [int(i) for i in worst],
        }
    row["p50_delta_ms"] = round(row["o2o"]["p50"] - row["plain"]["p50"], 2)
    print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(row, f, indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
