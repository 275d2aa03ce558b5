"""Deterministic test fixtures: weights that are GUARANTEED to detect.

Random-init YOLO11 weights fire detections only by seed luck, which used
to make tracking/mask/server tests skip themselves ("no detections at
this seed") and left the multi-chip dryrun asserting shapes of all-zero
slates. `detection_params` removes the luck: it patches the detect-head
output convolutions so that EVERY anchor emits a confident, validly
sized box, with a calibrated input-dependent score spread so scores are
well separated (stable NMS ordering across recompiled/sharded program
variants — the multichip gate compares slates box-for-box).

How: the head's final 1x1 convs become (calibrated-random W, engineered
bias).
- cls branch out-conv bias: class `label` at `score_logit` (sigmoid
  ~0.9), all other classes at -8; its weights are random, scaled so the
  per-anchor logit spread is ~cls_spread (a short calibration forward
  measures the penultimate activation RMS — random-init activations
  decay to ~1e-3 by the head, so a fixed weight scale would leave all
  anchors numerically tied and NMS order would flip under any program
  recompilation).
- box branch (DFL) out-conv bias: per-side distribution mass on bin
  `dist_bin`, so each anchor decodes to a box centered on itself with
  width = height = 2 * dist_bin * stride (16/32/64 px at strides
  8/16/32) — small enough that neighboring anchors' boxes stay under
  NMS IoU gates (IoU 1/3 at 8-px offset), so slates fill to max_det.
The rest of the network (incl. proto/coef heads) stays random init:
masks and coefficients remain input-dependent but deterministic.

ref: the detect head contract these biases feed is the baked decode of
Assets/Scripts/InferenceEngine/Editor/IEModelEditorConverter.cs:63-76.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.models import layers as L
from xrseg_tpu.models import yolo11


def detection_params(key: jax.Array, cfg: ModelConfig, *,
                     label: int = 0, score_logit: float = 2.0,
                     dist_bin: int = 1, cls_spread: float = 0.3):
    """init_params + head patch => params that always detect.

    Every anchor predicts class `label` at sigmoid(score_logit +- ~
    cls_spread) — worst case stays well above a 0.3 score gate — with a
    (2*dist_bin*stride)-px square box centered on itself. Per-anchor
    score gaps (~2*cls_spread/num_anchors) dwarf recompilation-level
    numeric noise, so detection ORDER is deterministic too. Returns a
    normal params pytree (arrays only, jit/shard-safe).
    """
    params = yolo11.init_params(key, cfg)
    nc, reg_max = cfg.num_classes, cfg.reg_max
    if not (0 <= label < nc):
        raise ValueError(f"label {label} out of range [0, {nc})")
    if not (0 < dist_bin < reg_max):
        raise ValueError(f"dist_bin {dist_bin} out of range (0, {reg_max})")

    # calibration features: one fixed synthetic frame through the
    # backbone+neck (same code path the real forward uses)
    dt = jnp.dtype(cfg.dtype)
    x = jax.random.uniform(jax.random.key(20260817),
                           (1,) + tuple(cfg.input_size) + (3,),
                           jnp.float32)
    feats = yolo11._backbone_neck(params, x.astype(dt), cfg, dt)

    kg_key = key
    for i, f in enumerate(feats):
        d3 = params["det"]["cv3"][i]
        box_out = params["det"]["cv2"][i]["out"]
        pd = d3["out"]["w"].dtype
        kg_key, k1, k2 = jax.random.split(kg_key, 3)

        # penultimate cls activation RMS -> out-conv weight scale giving
        # logit std ~= cls_spread (v11 dw-separable / v8 legacy branch,
        # same structure sniff as yolo11._detect_branches)
        if "dw0" in d3:
            c = L.dwconv_apply(d3["dw0"], f, dtype=dt)
            c = L.conv_apply(d3["pw0"], c, dtype=dt)
            c = L.dwconv_apply(d3["dw1"], c, dtype=dt)
            c = L.conv_apply(d3["pw1"], c, dtype=dt)
        else:
            c = L.conv_apply(d3["conv0"], f, dtype=dt)
            c = L.conv_apply(d3["conv1"], c, dtype=dt)
        rms = float(jnp.sqrt(jnp.mean(
            jnp.square(c.astype(jnp.float32))))) + 1e-12
        fan_in = int(c.shape[-1])
        w_scale = cls_spread / (rms * fan_in ** 0.5)
        d3["out"]["w"] = (jax.random.normal(k1, d3["out"]["w"].shape, pd)
                          * w_scale)
        d3["out"]["b"] = jnp.full((nc,), -8.0, pd).at[label].set(score_logit)

        # DFL layout: channel s*reg_max + r is side s's logit for bin r;
        # box-head jitter stays tiny so box geometry barely wobbles
        box_b = jnp.zeros((4 * reg_max,), pd)
        for side in range(4):
            box_b = box_b.at[side * reg_max + dist_bin].set(8.0)
        box_out["w"] = jax.random.normal(k2, box_out["w"].shape, pd) * 1e-3
        box_out["b"] = box_b
    return params
