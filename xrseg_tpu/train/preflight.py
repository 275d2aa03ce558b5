"""Pre-compile HBM preflight for the train step (VERDICT r4 item 4).

Round 4 lost three 640^2 chip-queue training rows to HBM OOM discovered
only AFTER a 2-3 minute XLA compile (artifacts/chip_r4/summary.jsonl:
rc=1 x3; 16.97 G requested of 15.75 G). The trainer now estimates the
step's peak HBM from STATIC shapes before compiling and auto-engages
`grad_accum` (smaller microbatches, same effective batch — train_step
scan semantics) with a logged warning instead of dying.

How the estimate works: trace the step to a jaxpr (seconds, no XLA
compile) and run a linear-scan liveness analysis over it — each
equation's output buffers become live, each input buffer dies at its
last use, nested jaxprs (pjit / remat / scan / cond bodies) contribute
their own recursive peak on top of the caller's live set. Elementwise
ops whose input dies at that very equation are modeled as in-place
(XLA reuses the buffer). This is an UPPER-ish bound: XLA's fusion
typically does better, while its scheduler occasionally overlaps more
— so the trainer compares against a margined budget rather than the
raw HBM size. A ~2x overestimate still picks the right grad_accum
power-of-two in practice; what matters is catching the 10-100x blowups
(the r4 failure was 5x over budget) before a dead compile.

No reference analogue: the reference is inference-only (SURVEY §5);
this protects the training subsystem we add on top of it.
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import numpy as np

# ops where XLA reuses a dying same-shape input buffer for the output
# (elementwise family): counting both sides would double the footprint
# of every conv -> bn -> silu chain.
_ELEMENTWISE = {
    "add", "sub", "mul", "div", "max", "min", "pow", "rem",
    "neg", "exp", "log", "log1p", "tanh", "logistic", "sqrt", "rsqrt",
    "abs", "sign", "floor", "ceil", "round", "clamp", "select_n",
    "convert_element_type", "integer_pow", "erf", "expm1", "square",
    "copy", "stop_gradient", "add_any",
}


def _aval_bytes(aval) -> int:
    shape = getattr(aval, "shape", None)
    dtype = getattr(aval, "dtype", None)
    if shape is None or dtype is None:
        return 0
    n = int(np.prod(shape, dtype=np.int64)) if len(shape) else 1
    return n * np.dtype(dtype).itemsize


def _var_bytes(v) -> int:
    aval = getattr(v, "aval", None)
    return _aval_bytes(aval) if aval is not None else 0


def _sub_jaxprs(params: Dict) -> Iterable:
    """Yield every (Closed)Jaxpr reachable from an eqn's params."""
    from jax.extend import core as jex_core  # stable-ish jaxpr types

    jaxpr_types = (jex_core.Jaxpr, jex_core.ClosedJaxpr)

    def walk(obj):
        if isinstance(obj, jaxpr_types):
            yield obj
        elif isinstance(obj, (tuple, list)):
            for o in obj:
                yield from walk(o)
        elif isinstance(obj, dict):
            for o in obj.values():
                yield from walk(o)

    for val in params.values():
        yield from walk(val)


def jaxpr_peak_bytes(jaxpr) -> int:
    """Peak live buffer bytes of a jaxpr under linear-scan liveness.

    Inputs + consts are live at entry; outvars stay live to the end;
    every other var dies after its last consuming equation. Nested
    jaxprs contribute max(0, inner_peak - inner_input_bytes) on top of
    the caller's live set (their inputs are the caller's operands,
    already counted live).
    """
    inner = getattr(jaxpr, "jaxpr", jaxpr)        # ClosedJaxpr -> Jaxpr

    # last-use equation index per var (-1 = never used; outvars = +inf)
    last_use: Dict[int, int] = {}
    var_sz: Dict[int, int] = {}

    def note(v, idx):
        if type(v).__name__ in ("Literal", "DropVar"):
            return
        last_use[id(v)] = idx
        var_sz.setdefault(id(v), _var_bytes(v))

    entry = list(inner.constvars) + list(inner.invars)
    for v in entry:
        note(v, -1)
    for i, eqn in enumerate(inner.eqns):
        for v in eqn.invars:
            note(v, i)
    for v in inner.outvars:
        note(v, len(inner.eqns) + 1)

    live: Dict[int, int] = {}
    for v in entry:
        if type(v).__name__ not in ("Literal", "DropVar"):
            live[id(v)] = var_sz[id(v)]
    live_bytes = sum(live.values())
    peak = live_bytes

    for i, eqn in enumerate(inner.eqns):
        out_bytes = 0
        outs = []
        for v in eqn.outvars:
            if type(v).__name__ == "DropVar":
                continue
            b = _var_bytes(v)
            outs.append((v, b))
            out_bytes += b

        # in-place elementwise: one dying same-size input donates its
        # buffer to one output
        prim = getattr(eqn.primitive, "name", "")
        reuse = 0
        if prim in _ELEMENTWISE and outs:
            for v in eqn.invars:
                if (type(v).__name__ not in ("Literal", "DropVar")
                        and last_use.get(id(v)) == i
                        and var_sz.get(id(v), 0) == outs[0][1]):
                    reuse = outs[0][1]
                    break

        extra = 0
        for sub in _sub_jaxprs(eqn.params):
            in_b = sum(_var_bytes(v) for v in eqn.invars
                       if type(v).__name__ not in ("Literal", "DropVar"))
            extra = max(extra, max(0, jaxpr_peak_bytes(sub) - in_b))

        peak = max(peak, live_bytes + out_bytes - reuse + extra)

        # outputs become live; last-users die
        for v, b in outs:
            if last_use.get(id(v), -1) > i:   # else dead immediately
                live[id(v)] = b
                live_bytes += b
        for v in eqn.invars:
            if (type(v).__name__ not in ("Literal", "DropVar")
                    and last_use.get(id(v)) == i and id(v) in live):
                live_bytes -= live.pop(id(v))
        peak = max(peak, live_bytes)

    return peak


def batch_shapes(cfg, batch: int, max_gt: int,
                 input_hw: Optional[Tuple[int, int]] = None) -> Dict:
    """ShapeDtypeStructs matching data.collate's fixed-shape contract."""
    import jax
    import jax.numpy as jnp

    H, W = input_hw or cfg.input_size
    sds = jax.ShapeDtypeStruct
    if cfg.task == "classify":
        return {"images": sds((batch, H, W, 3), jnp.float32),
                "labels": sds((batch,), jnp.int32),
                "sample_weight": sds((batch,), jnp.float32)}
    out = {"images": sds((batch, H, W, 3), jnp.float32),
           "boxes_xywh": sds((batch, max_gt, 4), jnp.float32),
           "labels": sds((batch, max_gt), jnp.int32),
           "sample_weight": sds((batch,), jnp.float32)}
    if cfg.task == "segment":
        out["masks"] = sds((batch, max_gt, H // 4, W // 4), jnp.float32)
    elif cfg.task == "pose":
        out["kpts"] = sds((batch, max_gt, cfg.num_keypoints, 3),
                          jnp.float32)
    elif cfg.task == "obb":
        out["boxes_xywhr"] = sds((batch, max_gt, 5), jnp.float32)
    return out


def estimate_step_bytes(step_fn, state, batch_sds) -> int:
    """Peak-HBM estimate of one train step: trace (no compile) + scan."""
    import jax

    state_sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    closed = jax.make_jaxpr(step_fn)(state_sds, batch_sds)
    return jaxpr_peak_bytes(closed)


def hbm_budget_bytes(device=None) -> Optional[int]:
    """Usable accelerator memory; None on CPU (no meaningful limit)."""
    import jax

    d = device or jax.devices()[0]
    if d.platform == "cpu":
        return None
    try:
        ms = d.memory_stats()
        if ms and ms.get("bytes_limit"):
            return int(ms["bytes_limit"])
    except Exception:
        pass
    # v5e-class default: 16 GB HBM, ~15.75 G usable (the r4 OOM logs'
    # own denominator, artifacts/chip_r4/finetune640_bf16.log)
    return int(15.75e9)


def auto_grad_accum(build_step, state, batch_sds, budget: int,
                    batch: int, start: int = 1, data_shards: int = 1,
                    margin: float = 0.6,
                    log=print) -> Tuple[int, int]:
    """Smallest valid grad_accum whose estimated step fits margin*budget.

    build_step(grad_accum) -> step_fn (uncompiled OK — tracing only).
    Valid accum values divide `batch` and keep the microbatch divisible
    by `data_shards` (train_step's SPMD guard). Returns (grad_accum,
    estimated_bytes); if nothing fits, returns the largest valid accum
    with a warning — the compile may still succeed.

    margin=0.6 covers (a) XLA workspace/fragmentation headroom and
    (b) the estimator's observed ~1.3x under-read against the one chip
    calibration point (r4 finetune640 b=8 bf16: est 2.47 GB of ~3.2 GB
    actual non-mask footprint) — the liveness model can't see XLA's
    scheduler extending buffer lifetimes across fusions.
    """
    cap = int(margin * budget)

    def valid(a):
        return batch % a == 0 and (batch // a) % data_shards == 0

    accums = [a for a in range(start, batch + 1) if valid(a)]
    if not accums:
        accums = [start]
    est = 0
    for a in accums:
        est = estimate_step_bytes(build_step(a), state, batch_sds)
        if est <= cap:
            if a != start:
                log(f"preflight: estimated step peak {est/1e9:.2f} GB > "
                    f"{margin:.0%} of {budget/1e9:.2f} GB HBM at "
                    f"grad_accum={start}; auto-split to grad_accum={a} "
                    f"(microbatch {batch//a})")
            return a, est
    log(f"preflight: WARNING no grad_accum fits — best estimate "
        f"{est/1e9:.2f} GB vs budget {budget/1e9:.2f} GB; proceeding "
        f"with grad_accum={accums[-1]}")
    return accums[-1], est
