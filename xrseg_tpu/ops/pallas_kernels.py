"""Pallas TPU kernels for the pipeline's hot ops.

Custom kernels, each replacing a multi-op XLA subgraph with one
VMEM-resident pass:

  nms_select_pallas     — the production NMS hot path: the whole greedy
                          select-and-suppress loop (argmax + IoU row +
                          suppression x max_det steps) in ONE kernel with
                          all candidate data VMEM-resident, instead of a
                          50-step lax.scan of tiny HBM-bound XLA ops.
                          Used by ops/nms.nms_fixed(backend="pallas");
                          the default "auto" picks it on TPU.
  mask_synth_crop_pallas— coef x proto matmul (MXU) + sigmoid + box crop
                          fused. NOT on the production path: measured on
                          v5e it exactly ties XLA at b=1 (1.19 ms) and
                          loses vmapped at b=128 (5.3 vs 2.4 ms — the
                          lifted grid serializes per-image programs), so
                          the pipeline keeps the XLA formulation
                          (ops/masks.py) and this kernel stays as the
                          fused-variant reference.
  nms_rotated_batched_pallas — the OBB task's probIoU greedy loop as
                          one grid-blocked kernel (Gaussian covariance
                          terms precomputed host-side; per-step work is
                          elementwise row algebra). Measured on v5e at
                          b=128: the whole OBB pipeline goes 1992 ->
                          5679 fps (2.85x) vs the vmapped scan path.
(The XLA-formulated bilinear resize+normalize helper used to live here;
it is plain XLA, not Pallas, so it moved to ops/preprocess.py.)

All kernels are fixed-shape and jit-safe; tests run them with
interpret=True on CPU; nms_select_pallas runs on TPU in production
(batch=1: 2.37 vs 2.74 ms/frame end-to-end vs the scan path).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Select-and-suppress NMS kernel (the production hot path)
# ---------------------------------------------------------------------------

_NEG = float(np.finfo(np.float32).min)


def _nms_select_kernel(corners_ref, scores_ref, idx_ref, ok_ref, *,
                       iou_threshold: float, max_det: int, out_pad: int):
    """One whole greedy select-and-suppress NMS in VMEM.

    corners: [4, K] (x1,y1,x2,y2 rows, class-offset applied),
    scores:  [1, K] f32, already masked to _NEG below the score gate.
    idx/ok:  [1, out_pad] i32/f32 — selection order, first max_det valid.

    Replaces ops/nms._select_and_suppress's 50-step lax.scan: each scan
    step is ~10 tiny HBM-bound XLA ops with per-step launch overhead; here
    the entire loop runs on-core with all candidate data VMEM-resident
    (~170 KB for K=8448).
    """
    x1 = corners_ref[0:1, :]
    y1 = corners_ref[1:2, :]
    x2 = corners_ref[2:3, :]
    y2 = corners_ref[3:4, :]
    K = x1.shape[1]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (1, out_pad), 1)

    idx_ref[0:1, :] = jnp.zeros((1, out_pad), jnp.int32)
    ok_ref[0:1, :] = jnp.zeros((1, out_pad), jnp.float32)

    def body(t, masked):
        m = jnp.max(masked)                       # best remaining score
        ok = (m > _NEG * 0.5).astype(jnp.float32)
        # argmax with first-occurrence tie-break (matches lax.scan path)
        at_max = masked == m
        i = jnp.min(jnp.where(at_max, col, K))
        onehot = (col == i).astype(jnp.float32)
        # gather the selected box via one-hot reductions (no dynamic slice)
        bx1 = jnp.sum(x1 * onehot)
        by1 = jnp.sum(y1 * onehot)
        bx2 = jnp.sum(x2 * onehot)
        by2 = jnp.sum(y2 * onehot)
        barea = jnp.sum(area * onehot)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        suppress = (iou > iou_threshold) | (col == i)
        masked = jnp.where(ok > 0, jnp.where(suppress, _NEG, masked), masked)
        sel = (out_col == t)
        idx_ref[0:1, :] = jnp.where(sel, i, idx_ref[0:1, :])
        ok_ref[0:1, :] = jnp.where(sel, ok, ok_ref[0:1, :])
        return masked

    jax.lax.fori_loop(0, max_det, body, scores_ref[0:1, :])


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_det",
                                             "interpret"))
def nms_select_pallas(corners: jax.Array, masked_scores: jax.Array,
                      iou_threshold: float, max_det: int = 50,
                      interpret: bool = False):
    """corners [K,4] f32 (class-offset applied), masked_scores [K] f32
    (score-gated candidates; everything else at float32 min). Returns
    (indices [max_det] i32, ok [max_det] bool) in descending-score order.

    K is padded to a lane multiple internally (pad scores = _NEG).
    vmaps cleanly: the batch dim lifts onto the pallas grid.
    """
    K = corners.shape[0]
    Kp = ((K + 127) // 128) * 128
    out_pad = ((max_det + 127) // 128) * 128
    if Kp != K:
        corners = jnp.pad(corners, ((0, Kp - K), (0, 0)))
        masked_scores = jnp.pad(masked_scores, ((0, Kp - K),),
                                constant_values=_NEG)
    idx, ok = pl.pallas_call(
        functools.partial(_nms_select_kernel, iou_threshold=iou_threshold,
                          max_det=max_det, out_pad=out_pad),
        out_shape=(jax.ShapeDtypeStruct((1, out_pad), jnp.int32),
                   jax.ShapeDtypeStruct((1, out_pad), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(corners.T.astype(jnp.float32),
      masked_scores.astype(jnp.float32)[None, :])
    return idx[0, :max_det], ok[0, :max_det] > 0.0


def _nms_select_batched_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref,
                               idx_ref, ok_ref, *, iou_threshold: float,
                               max_det: int, out_pad: int):
    """Row-parallel variant: each grid program owns a [TB, K] block of TB
    images and runs the whole select-and-suppress loop for all of them at
    once (full sublane utilization — the vmapped single-image kernel only
    drives 1 of 8 sublanes). All per-step reductions are axis=1 row
    reductions, so images never interact.
    """
    x1 = x1_ref[:, :]
    y1 = y1_ref[:, :]
    x2 = x2_ref[:, :]
    y2 = y2_ref[:, :]
    TB, K = x1.shape
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (TB, out_pad), 1)

    idx_ref[:, :] = jnp.zeros((TB, out_pad), jnp.int32)
    ok_ref[:, :] = jnp.zeros((TB, out_pad), jnp.float32)

    def body(t, masked):
        m = jnp.max(masked, axis=1, keepdims=True)            # [TB,1]
        ok = (m > _NEG * 0.5).astype(jnp.float32)
        at_max = masked == m
        i = jnp.min(jnp.where(at_max, col, K), axis=1, keepdims=True)
        onehot = (col == i).astype(jnp.float32)
        gather = lambda v: jnp.sum(v * onehot, axis=1, keepdims=True)
        bx1, by1 = gather(x1), gather(y1)
        bx2, by2 = gather(x2), gather(y2)
        barea = gather(area)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        suppress = (iou > iou_threshold) | (col == i)
        masked = jnp.where((ok > 0) & suppress, _NEG, masked)
        sel = out_col == t
        idx_ref[:, :] = jnp.where(sel, i, idx_ref[:, :])
        ok_ref[:, :] = jnp.where(sel, ok, ok_ref[:, :])
        return masked

    jax.lax.fori_loop(0, max_det, body, scores_ref[:, :])


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_det",
                                             "block_b", "interpret"))
def nms_select_batched_pallas(corners: jax.Array, masked_scores: jax.Array,
                              iou_threshold: float, max_det: int = 50,
                              block_b: int = 8, interpret: bool = False):
    """Batched NMS: corners [B,K,4] f32 (class-offset applied),
    masked_scores [B,K] f32 (below-gate = float32 min). Returns
    (indices [B,max_det] i32, ok [B,max_det] bool).

    Grid = ceil(B/block_b) programs; each keeps its images' candidate data
    VMEM-resident for the whole greedy loop (~1.6 MB per 8x8448 block) —
    the lax.scan formulation re-reads ~35 MB of HBM per step instead.
    """
    B, K = masked_scores.shape
    Kp = ((K + 127) // 128) * 128
    out_pad = ((max_det + 127) // 128) * 128
    if Kp != K:
        corners = jnp.pad(corners, ((0, 0), (0, Kp - K), (0, 0)))
        masked_scores = jnp.pad(masked_scores, ((0, 0), (0, Kp - K)),
                                constant_values=_NEG)
    TB = min(block_b, B)
    Bp = ((B + TB - 1) // TB) * TB
    if Bp != B:
        corners = jnp.pad(corners, ((0, Bp - B), (0, 0), (0, 0)))
        masked_scores = jnp.pad(masked_scores, ((0, Bp - B), (0, 0)),
                                constant_values=_NEG)
    grid = (Bp // TB,)
    row_spec = pl.BlockSpec((TB, Kp), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TB, out_pad), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    c = corners.astype(jnp.float32)
    idx, ok = pl.pallas_call(
        functools.partial(_nms_select_batched_kernel,
                          iou_threshold=iou_threshold, max_det=max_det,
                          out_pad=out_pad),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((Bp, out_pad), jnp.int32),
                   jax.ShapeDtypeStruct((Bp, out_pad), jnp.float32)),
        in_specs=[row_spec] * 5,
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(c[:, :, 0], c[:, :, 1], c[:, :, 2], c[:, :, 3],
      masked_scores.astype(jnp.float32))
    return idx[:B, :max_det], ok[:B, :max_det] > 0.0


# ---------------------------------------------------------------------------
# Fused mask synthesis + crop kernel
# ---------------------------------------------------------------------------

def _mask_kernel(coefs_ref, protos_ref, boxes_ref, out_ref, *,
                 mask_w: int, mask_h: int, tile: int,
                 input_w: float, input_h: float):
    """Grid over flattened mask pixels.
    coefs: [D, nm], protos: [nm, tile], boxes: [D, 4] (cxcywh, input px),
    out: [D, tile]."""
    t = pl.program_id(0)
    logits = jnp.dot(coefs_ref[:], protos_ref[:],
                     preferred_element_type=jnp.float32)     # [D, tile] MXU
    m = jax.nn.sigmoid(logits)

    # pixel coords of this tile (flattened row-major over [H, W])
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)[0] + t * tile
    px = (flat % mask_w).astype(jnp.float32)
    py = (flat // mask_w).astype(jnp.float32)

    # box bounds in mask space (crop_masks semantics, ops/masks.py)
    sx = mask_w / input_w
    sy = mask_h / input_h
    cx = boxes_ref[:, 0] * sx
    cy = boxes_ref[:, 1] * sy
    hw = boxes_ref[:, 2] * sx * 0.5
    hh = boxes_ref[:, 3] * sy * 0.5
    D = cx.shape[0]
    col = lambda v: v.reshape(D, 1)
    inside = ((px[None, :] >= col(cx - hw)) & (px[None, :] <= col(cx + hw)) &
              (py[None, :] >= col(cy - hh)) & (py[None, :] <= col(cy + hh)))
    out_ref[:, :] = jnp.where(inside, m, 0.0)


@functools.partial(jax.jit, static_argnames=("mask_hw", "input_size",
                                             "interpret"))
def mask_synth_crop_pallas(coefs: jax.Array, protos: jax.Array,
                           boxes_xywh: jax.Array,
                           mask_hw: Tuple[int, int] = (160, 160),
                           input_size: Tuple[int, int] = (640, 640),
                           interpret: bool = False) -> jax.Array:
    """coefs [D,nm], protos [h,w,nm], boxes [D,4] -> cropped masks [D,h,w].

    D is padded to a multiple of 8 internally; nm and h*w handled by tiling.
    """
    D, nm = coefs.shape
    h, w = mask_hw
    Dp = ((D + 7) // 8) * 8
    if Dp != D:
        coefs = jnp.pad(coefs, ((0, Dp - D), (0, 0)))
        boxes_xywh = jnp.pad(boxes_xywh, ((0, Dp - D), (0, 0)))
    hw_total = h * w
    # Mosaic tiling: the lane (last) block dim must be a multiple of 128
    # (or the full array). Pick the largest 128-aligned divisor <= 4096.
    TILE = 0
    for cand in range(min(hw_total, 4096), 127, -128):
        if hw_total % cand == 0 and cand % 128 == 0:
            TILE = cand
            break
    if TILE == 0:
        TILE = hw_total          # small masks: single full-width block
    grid = (hw_total // TILE,)

    protos_flat = protos.reshape(hw_total, nm).T                # [nm, HW]
    out = pl.pallas_call(
        functools.partial(_mask_kernel, mask_w=w, mask_h=h, tile=TILE,
                          input_w=float(input_size[1]),
                          input_h=float(input_size[0])),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((Dp, hw_total), jnp.float32),
        in_specs=[
            pl.BlockSpec((Dp, nm), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nm, TILE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, 4), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Dp, TILE), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coefs.astype(jnp.float32), protos_flat.astype(jnp.float32),
      boxes_xywh.astype(jnp.float32))
    return out[:D].reshape(D, h, w)


# ---------------------------------------------------------------------------
# Rotated (probIoU) batched NMS kernel — the OBB task's hot path
# ---------------------------------------------------------------------------

def _nms_rotated_batched_kernel(x_ref, y_ref, a_ref, b_ref, c_ref, det_ref,
                                scores_ref, idx_ref, ok_ref, *,
                                iou_threshold: float, max_det: int,
                                out_pad: int, eps: float = 1e-7):
    """Row-parallel greedy probIoU select-and-suppress.

    Inputs are the rotated boxes' Gaussian embedding, precomputed
    host-side (covariance terms a, b, c and their determinant): the
    per-step work is then pure elementwise algebra on [TB, K] rows —
    same structure as the axis-aligned kernel, with the Bhattacharyya
    overlap in place of the IoU row.
    """
    x = x_ref[:, :]
    y = y_ref[:, :]
    a = a_ref[:, :]
    b = b_ref[:, :]
    c = c_ref[:, :]
    det = det_ref[:, :]
    TB, K = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (TB, out_pad), 1)

    idx_ref[:, :] = jnp.zeros((TB, out_pad), jnp.int32)
    ok_ref[:, :] = jnp.zeros((TB, out_pad), jnp.float32)

    def body(t, masked):
        m = jnp.max(masked, axis=1, keepdims=True)
        ok = (m > _NEG * 0.5).astype(jnp.float32)
        at_max = masked == m
        i = jnp.min(jnp.where(at_max, col, K), axis=1, keepdims=True)
        onehot = (col == i).astype(jnp.float32)
        gather = lambda v: jnp.sum(v * onehot, axis=1, keepdims=True)
        xi, yi = gather(x), gather(y)
        ai, bi, ci = gather(a), gather(b), gather(c)
        deti = gather(det)
        # PSD clamp: the form rounds negative in f32 for degenerate
        # pairs -> NaN log (see ops/nms.probiou; same fix)
        denom = jnp.maximum((ai + a) * (bi + b) - (ci + c) ** 2, 0.0) + eps
        t1 = ((ai + a) * (yi - y) ** 2
              + (bi + b) * (xi - x) ** 2) / denom * 0.25
        t2 = ((ci + c) * (x - xi) * (yi - y)) / denom * 0.5
        t3 = 0.5 * jnp.log(denom / (4.0 * jnp.sqrt(
            jnp.maximum(deti * det, 0.0)) + eps) + eps)
        bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
        iou = 1.0 - jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
        suppress = (iou > iou_threshold) | (col == i)
        masked = jnp.where((ok > 0) & suppress, _NEG, masked)
        sel = out_col == t
        idx_ref[:, :] = jnp.where(sel, i, idx_ref[:, :])
        ok_ref[:, :] = jnp.where(sel, ok, ok_ref[:, :])
        return masked

    jax.lax.fori_loop(0, max_det, body, scores_ref[:, :])


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_det",
                                             "block_b", "interpret"))
def nms_rotated_batched_pallas(boxes_xywhr: jax.Array,
                               masked_scores: jax.Array,
                               iou_threshold: float, max_det: int = 50,
                               block_b: int = 8, interpret: bool = False):
    """Batched rotated NMS: boxes_xywhr [B,K,5] f32 (class offset already
    applied to centers), masked_scores [B,K] f32. Returns
    (indices [B,max_det] i32, ok [B,max_det] bool)."""
    B, K = masked_scores.shape
    bx = boxes_xywhr.astype(jnp.float32)
    w, h, r = bx[..., 2], bx[..., 3], bx[..., 4]
    # same 1e-3 px variance floor as ops/nms._rbox_covariance (zero-area
    # boxes otherwise suppress everything, including cross-class)
    w = jnp.maximum(w, 1e-3)
    h = jnp.maximum(h, 1e-3)
    a0 = w * w / 12.0
    b0 = h * h / 12.0
    cs, sn = jnp.cos(r), jnp.sin(r)
    a = a0 * cs * cs + b0 * sn * sn
    b = a0 * sn * sn + b0 * cs * cs
    c = (a0 - b0) * cs * sn
    det = jnp.maximum(a * b - c * c, 0.0)
    rows = [bx[..., 0], bx[..., 1], a, b, c, det]

    Kp = ((K + 127) // 128) * 128
    out_pad = ((max_det + 127) // 128) * 128
    if Kp != K:
        rows = [jnp.pad(v, ((0, 0), (0, Kp - K))) for v in rows]
        masked_scores = jnp.pad(masked_scores, ((0, 0), (0, Kp - K)),
                                constant_values=_NEG)
    TB = min(block_b, B)
    Bp = ((B + TB - 1) // TB) * TB
    if Bp != B:
        rows = [jnp.pad(v, ((0, Bp - B), (0, 0))) for v in rows]
        masked_scores = jnp.pad(masked_scores, ((0, Bp - B), (0, 0)),
                                constant_values=_NEG)
    grid = (Bp // TB,)
    row_spec = pl.BlockSpec((TB, Kp), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TB, out_pad), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    idx, ok = pl.pallas_call(
        functools.partial(_nms_rotated_batched_kernel,
                          iou_threshold=iou_threshold, max_det=max_det,
                          out_pad=out_pad),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((Bp, out_pad), jnp.int32),
                   jax.ShapeDtypeStruct((Bp, out_pad), jnp.float32)),
        in_specs=[row_spec] * 7,
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(*rows, masked_scores.astype(jnp.float32))
    return idx[:B, :max_det], ok[:B, :max_det] > 0.0
