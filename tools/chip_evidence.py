"""Unattended chip-evidence runner for the round-4 TPU queue.

The axon tunnel has been down since 2026-08-17 ~19:30 (VERDICT.md §"What's
missing" item 1); every chip-bound deliverable is queued behind it. This
runner executes the WHOLE queue in priority order the moment the tunnel
returns, so no wall-clock is lost between "tunnel up" and "evidence
captured" — chain it onto the watcher:

    bash /tmp/tpu_watch.sh && python tools/chip_evidence.py

Each step runs as a bounded subprocess (fresh backend per step — the
tunneled PJRT is a per-process channel, CLAUDE.md), its stdout/stderr go
to <out>/<name>.log, every parseable JSON line it printed is collected
into <out>/<name>.json, and a running <out>/summary.jsonl records
rc/duration per step. Steps continue past individual failures; a step
that dies with the bench's structured "tpu-backend-unavailable" marker
is retried once after a 10-min wait (tunnel flap tolerance).

Priority order mirrors VERDICT.md "Next round" item 1:
  1. bench headline (b=128) + b=1 latency  -> the BENCH_r04 numbers
  2. --configs / --accuracy-modes / --tasks / --streaming sections
  3. full-XR-tick probe on hardware (VERDICT item 3)
  4. bf16 640^2 fine-tune FROM the deployed .sentis (VERDICT item 1b)
  5. letterbox-vs-stretch A/B at 640^2 (VERDICT item 6, chip arm)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SENTIS = ("/root/reference/Assets/Resources/Model/"
          "yolo11n-seg-sentis.sentis")
PY = sys.executable


def steps(out):
    b = [PY, "bench.py"]
    t = [PY, "tools/"]
    s = []
    s.append(("bench_headline", b + ["128"], 2400))
    s.append(("bench_b1", b + ["1"], 1200))
    s.append(("bench_configs", b + ["--configs"], 3000))
    s.append(("bench_accuracy_modes", b + ["--accuracy-modes"], 3600))
    s.append(("bench_accuracy_modes_b1", b + ["--accuracy-modes", "1"],
              3600))
    s.append(("bench_tasks", b + ["--tasks"], 3000))
    s.append(("bench_streaming", b + ["--streaming"], 2400))
    s.append(("bench_xla_sweep", b + ["--xla-sweep", "128"], 7200))
    s.append(("bench_v8", b + ["128", "--arch", "yolov8"], 2400))
    s.append(("bench_o2o", b + ["128", "--o2o"], 2400))
    s.append(("xr_probe", [PY, "tools/xr_probe.py", "--frames", "120",
                           "--out", f"{out}/xr_probe_chip.json"], 2400))
    if os.path.exists(SENTIS):
        s.append(("finetune640_bf16",
                  [PY, "examples/train.py", "--synthetic", "--size",
                   "640", "--epochs", "6", "--batch", "8", "--lr",
                   "5e-5", "--dtype", "bfloat16", "--weights", SENTIS,
                   "--out", f"{out}/ft640"], 7200))
    s.append(("ab_letterbox640",
              [PY, "tools/ab_letterbox.py", "--size", "640", "--epochs",
               "8", "--out", f"{out}/ab_letterbox_640.json"], 9000))
    if os.path.exists(SENTIS):
        # r4 distill/pseudo pricing at chip scale (CPU rows: TRAINING.md)
        s.append(("ab_distill640",
                  [PY, "tools/ab_distill.py", "--size", "640", "--steps",
                   "600", "--batch", "8", "--teacher-epochs", "12",
                   "--cls-weight", "0.3", "--box-weight", "0.3",
                   "--fg-power", "2.0", "--label-fraction", "0.1",
                   "--pure-arm", "--pseudo-arm",
                   "--out", f"{out}/ab_distill_640.json"], 10800))
    # --- r5 queue: fused-tick probe, tracer-fixed classic split, o2o ---
    s.append(("xr_probe_fused",
              [PY, "tools/xr_probe.py", "--frames", "120", "--fused",
               "--out", f"{out}/xr_probe_fused.json"], 2400))
    s.append(("xr_probe_classic",
              [PY, "tools/xr_probe.py", "--frames", "120",
               "--out", f"{out}/xr_probe_classic.json"], 2400))
    s.append(("o2o_latency_ab",
              [PY, "tools/o2o_latency_ab.py", "--frames", "150",
               "--out", f"{out}/o2o_latency_ab.json"], 2400))
    if os.path.exists(SENTIS):
        # o2o accuracy gap at schedule convergence (VERDICT r4 weak #5):
        # 250 epochs x 16 steps = 4000 steps vs r4's 288/960
        s.append(("ab_o2o_4k",
                  [PY, "tools/ab_o2o.py", "--size", "96", "--epochs",
                   "250", "--out", f"{out}/ab_o2o_4k.json"], 7200))
    s.append(("ab_active640",
              [PY, "tools/ab_active.py", "--size", "640", "--batch", "8",
               "--epochs", "8", "--seed-epochs", "10",
               "--out", f"{out}/ab_active_640.json"], 10800))
    return s


def run_step(name, cmd, timeout, out):
    log = os.path.join(out, name + ".log")
    t0 = time.time()
    try:
        with open(log, "w") as lf:
            rc = subprocess.run(cmd, cwd=REPO, stdout=lf,
                                stderr=subprocess.STDOUT,
                                timeout=timeout).returncode
    except subprocess.TimeoutExpired:
        rc = -9
    dur = round(time.time() - t0, 1)
    rows = []
    try:
        with open(log) as lf:
            for line in lf:
                line = line.strip()
                if line.startswith("{") and line.endswith("}"):
                    try:
                        rows.append(json.loads(line))
                    except ValueError:
                        pass
    except OSError:
        pass
    if rows:
        # harvested array of every parseable JSON line the step printed
        # (tools that take --out also write their own canonical bare-
        # object artifact, e.g. xr_probe_chip.json — different filename,
        # both kept: the harvest proves what the step PRINTED)
        with open(os.path.join(out, name + ".json"), "w") as jf:
            json.dump(rows, jf, indent=1)
            jf.write("\n")
    if rc != 0:
        # a dead step must not vanish (r4: three 640^2 OOMs sat as
        # uncommitted rc=1 logs while docs said "still running" —
        # VERDICT r4 weak #2): summarize every failure into a committed
        # FAILURES.md with the log tail
        tail = []
        try:
            with open(log) as lf:
                tail = lf.readlines()[-15:]
        except OSError:
            pass
        with open(os.path.join(out, "FAILURES.md"), "a") as ff:
            ff.write(f"## {name} (rc={rc}, {dur}s)\n\n```\n"
                     + "".join(tail) + "```\n\n")
    outage = any(r.get("error") == "tpu-backend-unavailable"
                 for r in rows if isinstance(r, dict))
    return {"step": name, "rc": rc, "seconds": dur,
            "json_lines": len(rows), "outage": outage}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else "/tmp/chip_r4"
    only = None  # --only=a,b,c resumes a partial queue in the given order
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    os.makedirs(out, exist_ok=True)
    summary = os.path.join(out, "summary.jsonl")
    queue = steps(out)
    if only:
        by_name = {n: (n, c, t) for n, c, t in queue}
        queue = [by_name[n] for n in only]
    for name, cmd, timeout in queue:
        row = run_step(name, cmd, timeout, out)
        if row["outage"]:  # tunnel flapped mid-queue: wait, retry once
            time.sleep(600)
            row = run_step(name, cmd, timeout, out)
        with open(summary, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
