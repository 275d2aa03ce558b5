"""Device-side target re-lock: the tracker's per-frame match, compiled.

The reference re-locks its single tracked target every frame on the CPU:
same-class detections, nearest center, 300 px gate
(Assets/Scripts/InferenceEngine/IEExecutor.cs:485-526) — mirrored on the
host by perception.tracking.TargetTracker.update. Round 4 measured that
keeping this match on the host costs the XR tick TWO extra serialized
D2H round-trips per tracked frame (the mask gather and the depth fusion
both wait on the host's match result — ~60 of ~156 ms on the tunneled
chip, artifacts/chip_r4/xr_probe_chip.json). The match itself is a
50-row argmin — trivially computable on device.

This op runs INSIDE the compiled frame program (compile.
build_xr_tick_pipeline): the previous target is a jit input, the matched
index feeds the mask-synthesis gather and the depth-fusion kernel in the
same dispatch, and the frame emits slate + target mask + fused points in
ONE packed readback. The host tracker stays as the parity oracle
(tests/test_relock.py sweeps randomized scenes against it).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def relock_match(boxes_xywh: jax.Array, labels: jax.Array,
                 valid: jax.Array, prev: jax.Array,
                 screen_scale: jax.Array, gate_px: float = 300.0):
    """TargetTracker.update on device (IEExecutor.cs:485-526).

    boxes_xywh: [D,4] model-space (cx,cy,w,h); labels: [D] int;
    valid: [D] bool — the padded NMS slate.
    prev: [4] f32 — previous target (cx_model, cy_model, label, valid).
    screen_scale: [2] f32 — (screen_w/model_w, screen_h/model_h); the
      gate is measured in SCREEN pixels (the reference tracks in its
      center-origin screen space; distances there are the model-space
      deltas scaled per axis — the Y flip cannot change a magnitude).

    Returns (matched [] bool, index [] int32): nearest same-class valid
    detection strictly inside the gate, or matched=False (index is then
    the argmin over an all-inf row — 0 — and must be ignored).
    """
    dx = (boxes_xywh[:, 0] - prev[0]) * screen_scale[0]
    dy = (boxes_xywh[:, 1] - prev[1]) * screen_scale[1]
    d2 = dx * dx + dy * dy
    cand = valid & (labels == prev[2].astype(labels.dtype)) & (prev[3] > 0.5)
    d2m = jnp.where(cand, d2, jnp.inf)
    idx = jnp.argmin(d2m).astype(jnp.int32)
    matched = d2m[idx] < jnp.float32(gate_px) ** 2
    return matched, idx
