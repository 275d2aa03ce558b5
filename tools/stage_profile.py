"""Per-stage device timing + roofline for the deployed pipeline.

Splits the b=128 pipeline into stages (preprocess / backbone thirds /
neck / detect heads / seg heads / postprocess), times each with the same
chained-lax.scan methodology bench.py uses (data dependency between
iterations, one scalar readback at the end — honest on the tunneled
PJRT), and reports each stage's achieved TF/s against its XLA-counted
FLOPs. This is how we find which stage is furthest from the MXU
roofline (isolated 3x3 convs: ~116 TF/s bf16 on this chip).

Usage: python tools/stage_profile.py [batch]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    import jax
    import jax.numpy as jnp

    import xrseg_tpu
    from xrseg_tpu.config import ExecutorConfig, ModelConfig
    from xrseg_tpu.models import layers as L
    from xrseg_tpu.models import yolo11
    from xrseg_tpu.ops import preprocess as pre_ops
    from xrseg_tpu.ops.postprocess import postprocess_batch_parts

    xrseg_tpu.enable_compile_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = ExecutorConfig(model=ModelConfig(scale="n"))
    mcfg, pcfg = cfg.model, cfg.post
    params = yolo11.init_params(jax.random.key(0), mcfg)
    dt = jnp.bfloat16

    def stem(p, x):                       # b0-b2 (640->160, c->64)
        x = L.conv_apply(p["b0"], x, stride=2, dtype=dt)
        x = L.conv_apply(p["b1"], x, stride=2, dtype=dt)
        return L.c3k2_apply(p["b2"], x, shortcut=True, dtype=dt)

    def mid(p, x):                        # b3-b6 (160->40)
        x = L.conv_apply(p["b3"], x, stride=2, dtype=dt)
        x4 = L.c3k2_apply(p["b4"], x, shortcut=True, dtype=dt)
        x = L.conv_apply(p["b5"], x4, stride=2, dtype=dt)
        return x4, L.c3k2_apply(p["b6"], x, shortcut=True, dtype=dt)

    def deep(p, x6):                      # b7-b10 (40->20, SPPF+C2PSA)
        x = L.conv_apply(p["b7"], x6, stride=2, dtype=dt)
        x = L.c3k2_apply(p["b8"], x, shortcut=True, dtype=dt)
        x = L.sppf_apply(p["b9"], x, dtype=dt)
        return L.c2psa_apply(p["b10"], x, dtype=dt)

    def neck(p, feats):
        return yolo11.neck(p, feats, mcfg, dt)

    def det_heads(p, feats):
        boxes, clss = yolo11._detect_branches(p, feats, mcfg, dt)
        B = feats[0].shape[0]
        box_flat = jnp.concatenate(
            [b.reshape(B, -1, 4 * mcfg.reg_max) for b in boxes], axis=1)
        cls_flat = jnp.concatenate(
            [c.reshape(B, -1, mcfg.num_classes) for c in clss], axis=1)
        return yolo11.dfl_decode(box_flat, mcfg.reg_max), cls_flat

    def seg_heads(p, feats):
        protos = L.proto_apply(p["proto"], feats[0], dtype=dt)
        B = feats[0].shape[0]
        mcs = []
        for i, f in enumerate(feats):
            c4 = p["seg_cv4"][i]
            m = L.conv_apply(c4["conv0"], f, dtype=dt)
            m = L.conv_apply(c4["conv1"], m, dtype=dt)
            mcs.append(L.head_conv_apply(c4["out"], m, dtype=dt))
        return protos, jnp.concatenate(
            [m.reshape(B, -1, mcfg.num_masks) for m in mcs], axis=1)

    # representative inputs for each stage
    H, W = mcfg.input_size
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (batch, H, W, 3)), jnp.uint8)
    s = yolo11.Spec(mcfg)
    x640 = jnp.asarray(rng.normal(0, 1, (batch, H, W, 3)), dt)
    x160 = jnp.asarray(rng.normal(0, 1, (batch, H // 4, W // 4, s.c256)),
                       dt)
    x40 = jnp.asarray(rng.normal(0, 1, (batch, H // 16, W // 16, s.c512)),
                      dt)
    # backbone skips feeding the neck: (x4 [H/8, c512], x6 [H/16, c512],
    # x10 [H/32, c1024])
    sk80 = jnp.asarray(rng.normal(0, 1, (batch, H // 8, W // 8, s.c512)),
                       dt)
    sk20 = jnp.asarray(rng.normal(0, 1, (batch, H // 32, W // 32,
                                         s.c1024)), dt)
    # neck outputs feeding the heads: (P3 [H/8, c256], P4 [H/16, c512],
    # P5 [H/32, c1024])
    p80 = jnp.asarray(rng.normal(0, 1, (batch, H // 8, W // 8,
                                        s.head_ch[0])), dt)
    p40 = jnp.asarray(rng.normal(0, 1, (batch, H // 16, W // 16,
                                        s.head_ch[1])), dt)
    p20 = jnp.asarray(rng.normal(0, 1, (batch, H // 32, W // 32,
                                        s.head_ch[2])), dt)

    out = jax.jit(lambda p, x: yolo11.forward(p, x, mcfg,
                                              concat_preds=False))(
        params, x640.astype(jnp.float32))

    # (fn(c, *ops), operand arrays) — operands are jit ARGUMENTS, not
    # closure constants: baking a [128,640,640,3] input into the HLO
    # overflows the tunneled remote-compile request (HTTP 413)
    stages = {
        "preprocess": (lambda c, fr: pre_ops.preprocess(
            fr, mcfg.input_size, dtype=dt) + c, (frames,)),
        "backbone_stem_b0-2": (lambda c, x: stem(params, x + c), (x640,)),
        "backbone_mid_b3-6": (lambda c, x: mid(params, x + c)[1], (x160,)),
        "backbone_deep_b7-10": (lambda c, x: deep(params, x + c), (x40,)),
        "neck": (lambda c, a, b, d: neck(
            params, (a + c, b + c, d + c))[2], (sk80, x40, sk20)),
        "detect_heads+dfl": (lambda c, a, b, d: det_heads(
            params, (a + c, b + c, d + c))[0], (p80, p40, p20)),
        "seg_heads+proto": (lambda c, a, b, d: seg_heads(
            params, (a + c, b + c, d + c))[0], (p80, p40, p20)),
        "postprocess": (lambda c, bx, cl, mc, pr: postprocess_batch_parts(
            bx + c, cl, mc, pr, pcfg, False, mcfg.input_size,
            mask_dtype=dt, scores_are_logits=True)["scores"],
            (out["boxes_xywh"], out["cls_logits"], out["mask_coefs"],
             out["protos"])),
    }

    def timed(fn, ops, n=20, repeats=2):
        @jax.jit
        def chained(*arrs):
            def body(c, _):
                y = fn(c, *arrs)
                return jnp.asarray(y, jnp.float32).ravel()[0] * 1e-6, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        # FLOPs from a single unrolled body (XLA's cost analysis counts a
        # While body ONCE regardless of trip count, so the scan program
        # would under-report by n)
        cost = jax.jit(lambda *arrs: fn(jnp.float32(0), *arrs)).lower(
            *ops).compile().cost_analysis()
        flops = float(cost.get("flops", 0)) if cost else 0.0
        _ = np.asarray(chained(*ops))      # warm + first D2H
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(chained(*ops))
            best = min(best, time.perf_counter() - t0)
        return best / n, flops

    total_ms = 0.0
    rows = []
    for name, (fn, ops) in stages.items():
        sec, flops = timed(fn, ops)
        total_ms += sec * 1e3
        rows.append({"stage": name, "ms": round(sec * 1e3, 3),
                     "gflops": round(flops / 1e9, 1),
                     "tf_per_s": round(flops / sec / 1e12, 1)})
        print(json.dumps(rows[-1]), flush=True)

    # whole pipeline for cross-check (same methodology as bench.py)
    import bench
    r = bench.run_device_bench(batch=batch, n_chained=20, repeats=2)
    print(json.dumps({"stage": "WHOLE_PIPELINE",
                      "ms": round(r["ms_per_batch"], 2),
                      "sum_of_stages_ms": round(total_ms, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
