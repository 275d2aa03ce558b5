"""Fixed-shape, class-aware non-maximum suppression for TPU.

The reference bakes Sentis `Functional.NMS` into its compiled graph
(Assets/Scripts/InferenceEngine/Editor/IEModelEditorConverter.cs:76), which
emits a *dynamic-length* survivor list. Dynamic shapes break XLA, so the
TPU-native formulation is:

  1. per-anchor best class score/label (ReduceMax/ArgMax of the ref graph,
     IEModelEditorConverter.cs:69-70),
  2. select-and-suppress over max_det steps: each lax.scan step picks the
     highest-scoring alive candidate and suppresses everything it overlaps
     (one [A]-wide IoU row, no KxK matrix). This is exactly greedy NMS
     truncated at the output cap, evaluated over ALL anchors — bit-equal to
     the reference's unbounded Functional.NMS + the 50-box parse cap
     (IEExecutor.cs:534), with a sequential chain of max_det (50) steps
     instead of K.
  3. the selections land directly in a padded top-`max_det` slate + count.

Everything is trace-once/compile-once: no host sync, no data-dependent
shapes. Class-aware behavior uses the coordinate-offset trick instead of a
per-class loop. `pre_topk` compacts the above-threshold candidates into a
static slate (cumsum scatter, no sort) so the selection loop runs narrow;
it is exact unless more than pre_topk anchors clear the score gate.
`pre_topk=0` disables compaction for guaranteed exactness at any density.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

# Large offset separating classes in the shared coordinate space. Must exceed
# any real coordinate (inputs are <= a few thousand pixels).
_CLASS_OFFSET = 8192.0


def xywh_to_corners(xywh: jax.Array) -> jax.Array:
    """cxcywh -> x1y1x2y2 (the ref's CENTERS_TO_CORNERS constant matmul,
    IEModelEditorConverter.cs:40-46,73 — here plain arithmetic, XLA fuses it)."""
    cxy, wh = xywh[..., :2], xywh[..., 2:]
    half = wh * 0.5
    return jnp.concatenate([cxy - half, cxy + half], axis=-1)


def pairwise_iou(corners: jax.Array) -> jax.Array:
    """[K,4] x1y1x2y2 -> [K,K] IoU matrix."""
    x1, y1, x2, y2 = (corners[:, i] for i in range(4))
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _select_and_suppress(corners: jax.Array, scores: jax.Array,
                         alive0: jax.Array, iou_threshold: float,
                         max_det: int):
    """max_det steps of: pick argmax-score alive candidate, kill overlaps.

    corners: [K,4] (class-offset already applied when class-aware).
    Returns (indices [max_det] int32, ok [max_det] bool) in selection
    (descending-score) order; ok is monotone (all True then all False).
    """
    sc = scores.astype(jnp.float32)
    x1, y1, x2, y2 = (corners[:, i].astype(jnp.float32) for i in range(4))
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    k_idx = jnp.arange(sc.shape[0])

    # carry the -inf-masked scores directly (suppression = write -inf):
    # one [K] array read+write per step instead of a separate alive mask
    masked0 = jnp.where(alive0, sc, -jnp.inf)

    def body(masked, _):
        i = jnp.argmax(masked)
        ok = masked[i] != -jnp.inf
        iw = jnp.maximum(jnp.minimum(x2, x2[i]) - jnp.maximum(x1, x1[i]), 0)
        ih = jnp.maximum(jnp.minimum(y2, y2[i]) - jnp.maximum(y1, y1[i]), 0)
        inter = iw * ih
        union = area + area[i] - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        # the selected candidate leaves the pool too (k_idx == i covers
        # degenerate zero-area boxes whose self-IoU is 0)
        suppress = (iou > iou_threshold) | (k_idx == i)
        masked = jnp.where(ok & suppress, -jnp.inf, masked)
        return masked, (i.astype(jnp.int32), ok)

    _, (idxs, oks) = jax.lax.scan(body, masked0, None, length=max_det)
    return idxs, oks


# iou_threshold is static so it reaches the pallas kernel as a Python
# constant (closure-captured tracers are rejected by pallas_call)
@partial(jax.jit, static_argnames=("iou_threshold", "pre_topk", "max_det",
                                   "class_aware", "backend"))
def nms_fixed(boxes_xywh: jax.Array, scores: jax.Array, labels: jax.Array,
              *, iou_threshold: float, score_threshold: float,
              pre_topk: int = 0, max_det: int = 50,
              class_aware: bool = True,
              backend: str = "scan") -> Dict[str, jax.Array]:
    """Single-image fixed-shape NMS.

    Args:
      boxes_xywh: [A,4] centers+wh in input-pixel space.
      scores:     [A]   best-class score per anchor.
      labels:     [A]   best-class id per anchor (int32).
      pre_topk:   0 = consider every anchor (guaranteed exact parity with
                  the reference's unbounded NMS); >0 = static candidate cap
                  via threshold-compaction (exact unless more than pre_topk
                  anchors clear score_threshold, in which case the excess
                  is dropped in anchor order).
    Returns dict of padded arrays:
      indices [max_det] int32 — anchor index of each detection (0 where invalid)
      boxes_xywh [max_det,4], scores [max_det], labels [max_det]
      valid [max_det] bool, count [] int32
    """
    A = scores.shape[0]
    alive_full = scores > score_threshold
    if pre_topk and pre_topk < A:
        # Threshold-compaction: scatter above-threshold candidates into a
        # static pre_topk-wide slate (cumsum slot assignment — one pass, no
        # sort; lax.top_k's full sort costs ~1.5 ms/batch at A=8400 b=128).
        # The selection loop below re-ranks by score anyway, so slate order
        # is irrelevant. Overflow (more than pre_topk anchors above the
        # score gate) drops the excess in anchor order — unreachable in
        # practice at deployment thresholds; set pre_topk=0 for a
        # guaranteed-exact full-width pass.
        slot = jnp.where(alive_full, jnp.cumsum(alive_full) - 1, pre_topk)

        def compact(x, fill=0):
            out = jnp.full((pre_topk,) + x.shape[1:], fill, x.dtype)
            return out.at[slot].set(x, mode="drop")

        top_scores = compact(scores)
        top_idx = compact(jnp.arange(A, dtype=jnp.int32))
        top_boxes = compact(boxes_xywh)
        top_labels = compact(labels)
        alive0 = compact(alive_full, fill=False)
    else:
        top_scores = scores
        top_idx = jnp.arange(A, dtype=jnp.int32)
        top_boxes, top_labels = boxes_xywh, labels
        alive0 = alive_full

    corners = xywh_to_corners(top_boxes)
    if class_aware:
        corners = corners + (top_labels[:, None].astype(corners.dtype)
                             * _CLASS_OFFSET)
    if backend == "pallas":
        # same greedy loop, but on-core in one Pallas kernel: the scan
        # path pays ~50 tiny-op launches per image (ops/pallas_kernels.py)
        from xrseg_tpu.ops.pallas_kernels import _NEG, nms_select_pallas
        masked0 = jnp.where(alive0, top_scores.astype(jnp.float32), _NEG)
        sel, ok = nms_select_pallas(corners.astype(jnp.float32), masked0,
                                    iou_threshold, max_det)
    else:
        sel, ok = _select_and_suppress(corners, top_scores, alive0,
                                       iou_threshold, max_det)

    return _take_slate(sel, ok, top_idx, top_boxes, top_scores, top_labels,
                       max_det)


def _take_slate(sel, ok, top_idx, top_boxes, top_scores, top_labels,
                max_det: int) -> Dict[str, jax.Array]:
    """Selection (indices, ok) -> padded output slate (single image)."""
    safe = jnp.where(ok, sel, 0)

    def take(x):
        picked = x[safe]
        mask_shape = (max_det,) + (1,) * (picked.ndim - 1)
        return jnp.where(ok.reshape(mask_shape), picked,
                         jnp.zeros_like(picked))

    return {
        "indices": take(top_idx.astype(jnp.int32)),
        "boxes_xywh": take(top_boxes),
        "scores": take(top_scores),
        "labels": take(top_labels.astype(jnp.int32)),
        "valid": ok,
        "count": ok.sum().astype(jnp.int32),
    }


@partial(jax.jit, static_argnames=("iou_threshold", "max_det", "class_aware",
                                   "backend"))
def nms_fixed_batched(boxes_xywh: jax.Array, scores: jax.Array,
                      labels: jax.Array, *, iou_threshold: float,
                      score_threshold: float, max_det: int = 50,
                      class_aware: bool = True,
                      backend: str = "scan") -> Dict[str, jax.Array]:
    """Batched NMS over [B,A,...] inputs (always full-width: no pre_topk).

    backend="pallas" runs ONE grid-blocked kernel for the whole batch
    (nms_select_batched_pallas: full sublane utilization, candidate data
    VMEM-resident for the entire greedy loop); "scan" vmaps the per-image
    lax.scan path. Results are identical.
    """
    if backend == "pallas":
        from xrseg_tpu.ops.pallas_kernels import (_NEG,
                                                  nms_select_batched_pallas)
        corners = xywh_to_corners(boxes_xywh)
        if class_aware:
            corners = corners + (labels[..., None].astype(corners.dtype)
                                 * _CLASS_OFFSET)
        masked = jnp.where(scores > score_threshold,
                           scores.astype(jnp.float32), _NEG)
        sel, ok = nms_select_batched_pallas(corners.astype(jnp.float32),
                                            masked, iou_threshold, max_det)
        A = scores.shape[-1]
        idx = jnp.arange(A, dtype=jnp.int32)
        return jax.vmap(lambda s_, o_, b_, sc_, lb_: _take_slate(
            s_, o_, idx, b_, sc_, lb_, max_det))(sel, ok, boxes_xywh,
                                                 scores, labels)
    return jax.vmap(lambda b, s, l: nms_fixed(
        b, s, l, iou_threshold=iou_threshold,
        score_threshold=score_threshold, max_det=max_det,
        class_aware=class_aware, backend="scan"))(boxes_xywh, scores, labels)


# ---------------------------------------------------------------------------
# Rotated boxes (OBB task): probIoU select-and-suppress
# ---------------------------------------------------------------------------

def _rbox_covariance(xywhr: jax.Array):
    """Rotated box -> 2D Gaussian covariance terms (a, b, c): the
    probIoU representation (w^2/12, h^2/12 variances rotated by angle)."""
    w, h, r = xywhr[..., 2], xywhr[..., 3], xywhr[..., 4]
    # variance floor (1e-3 px, sub-resolution): a zero-area box has zero
    # covariance, which collapses the Bhattacharyya distance term to
    # 0/eps = 0 and makes probIoU ~1 against ANYTHING anywhere — wrong
    # limit (should ->0 for distinct centers), and it defeats the NMS
    # class-offset embedding (cross-class suppression). The floor keeps
    # the distance term alive in the degenerate limit; boxes >= 0.001 px
    # are unaffected. (Found by tests/test_geometry_fuzz.py.)
    w = jnp.maximum(w, 1e-3)
    h = jnp.maximum(h, 1e-3)
    a0 = w * w / 12.0
    b0 = h * h / 12.0
    cs, sn = jnp.cos(r), jnp.sin(r)
    a = a0 * cs * cs + b0 * sn * sn
    b = a0 * sn * sn + b0 * cs * cs
    c = (a0 - b0) * cs * sn
    return a, b, c


def probiou(obb1: jax.Array, obb2: jax.Array,
            eps: float = 1e-7) -> jax.Array:
    """Elementwise/broadcast probIoU of rotated boxes [..., 5] -> [...].

    Bhattacharyya-distance-based IoU between the boxes' Gaussian
    embeddings (the standard OBB overlap measure ultralytics' rotated
    NMS and OBB box loss use; exact polygon IoU needs clipping loops
    that do not map to fixed-shape XLA). Differentiable — also the OBB
    training box loss (1 - probiou)."""
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _rbox_covariance(obb1)
    a2, b2, c2 = _rbox_covariance(obb2)
    # the quadratic form is PSD mathematically but rounds NEGATIVE in
    # f32 for degenerate pairs (zero-area boxes, near-parallel thin
    # lines: cancellation error ~1e-3 at w=64, far beyond eps) -> log
    # of a negative -> NaN IoU, which un-suppresses in NMS and poisons
    # OBB-loss gradients. Clamp before adding eps. (Found by
    # tests/test_geometry_fuzz.py's degenerate-scene sweep.)
    denom = jnp.maximum((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2, 0.0) + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2
          + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    det1 = jnp.maximum(a1 * b1 - c1 * c1, 0.0)
    det2 = jnp.maximum(a2 * b2 - c2 * c2, 0.0)
    t3 = jnp.log(denom / (4.0 * jnp.sqrt(det1 * det2) + eps) + eps) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    return 1.0 - hd


def probiou_row(box: jax.Array, boxes: jax.Array,
                eps: float = 1e-7) -> jax.Array:
    """probIoU of one rotated box [5] against many [K,5] -> [K]."""
    return probiou(box[None] if box.ndim == 1 else box, boxes, eps)


@partial(jax.jit, static_argnames=("iou_threshold", "max_det",
                                   "class_aware"))
def nms_fixed_rotated(boxes_xywhr: jax.Array, scores: jax.Array,
                      labels: jax.Array, *, iou_threshold: float,
                      score_threshold: float, max_det: int = 50,
                      class_aware: bool = True) -> Dict[str, jax.Array]:
    """Single-image fixed-shape rotated NMS (OBB task): the same greedy
    select-and-suppress slate contract as nms_fixed, with probIoU as the
    overlap measure. Class separation translates box centers by
    label * _CLASS_OFFSET (far-apart Gaussians -> probIoU ~ 0), the same
    trick the axis-aligned path uses.

    boxes_xywhr: [A,5] (cx, cy, w, h, angle_rad). Output slate uses key
    "boxes_xywhr" [max_det,5].
    """
    sc = scores.astype(jnp.float32)
    off = labels.astype(jnp.float32) * _CLASS_OFFSET if class_aware else 0.0
    shifted = boxes_xywhr.astype(jnp.float32)
    if class_aware:
        shifted = shifted.at[..., 0].add(off).at[..., 1].add(off)
    k_idx = jnp.arange(sc.shape[0])
    masked0 = jnp.where(sc > score_threshold, sc, -jnp.inf)

    def body(masked, _):
        i = jnp.argmax(masked)
        ok = masked[i] != -jnp.inf
        iou = probiou_row(shifted[i], shifted)
        suppress = (iou > iou_threshold) | (k_idx == i)
        masked = jnp.where(ok & suppress, -jnp.inf, masked)
        return masked, (i.astype(jnp.int32), ok)

    _, (sel, oks) = jax.lax.scan(body, masked0, None, length=max_det)
    out = _take_slate(sel, oks, jnp.arange(sc.shape[0], dtype=jnp.int32),
                      boxes_xywhr, sc, labels, max_det)
    out["boxes_xywhr"] = out.pop("boxes_xywh")
    return out


def nms_fixed_rotated_batched(boxes_xywhr, scores, labels, *,
                              iou_threshold, score_threshold,
                              max_det: int = 50, class_aware: bool = True,
                              backend: str = "scan"
                              ) -> Dict[str, jax.Array]:
    """Batched rotated NMS over [B,A,...]. backend="pallas" runs ONE
    grid-blocked kernel for the whole batch (the Gaussian-embedding
    probIoU loop, VMEM-resident — measured the OBB pipeline's dominant
    cost as a vmapped scan); "scan" vmaps the per-image path. Identical
    greedy results."""
    if backend == "pallas":
        from xrseg_tpu.ops.pallas_kernels import (_NEG,
                                                  nms_rotated_batched_pallas)
        shifted = boxes_xywhr.astype(jnp.float32)
        if class_aware:
            off = labels.astype(jnp.float32) * _CLASS_OFFSET
            shifted = shifted.at[..., 0].add(off).at[..., 1].add(off)
        masked = jnp.where(scores > score_threshold,
                           scores.astype(jnp.float32), _NEG)
        sel, ok = nms_rotated_batched_pallas(shifted, masked,
                                             iou_threshold, max_det)
        A = scores.shape[-1]
        idx = jnp.arange(A, dtype=jnp.int32)
        out = jax.vmap(lambda s_, o_, b_, sc_, lb_: _take_slate(
            s_, o_, idx, b_, sc_, lb_, max_det))(sel, ok, boxes_xywhr,
                                                 scores, labels)
        out["boxes_xywhr"] = out.pop("boxes_xywh")
        return out
    return jax.vmap(lambda b, s, l: nms_fixed_rotated(
        b, s, l, iou_threshold=iou_threshold,
        score_threshold=score_threshold, max_det=max_det,
        class_aware=class_aware))(boxes_xywhr, scores, labels)


def probiou_numpy(b1, b2, eps=1e-7):
    """Scalar numpy probIoU (test oracle, independent arithmetic)."""
    import numpy as np

    def cov(b):
        # same 1e-3 px variance floor as the jax op (_rbox_covariance)
        a0 = max(b[2], 1e-3) ** 2 / 12.0
        b0 = max(b[3], 1e-3) ** 2 / 12.0
        c, s = np.cos(b[4]), np.sin(b[4])
        return (a0 * c * c + b0 * s * s, a0 * s * s + b0 * c * c,
                (a0 - b0) * c * s)

    b1 = np.asarray(b1, np.float64)
    b2 = np.asarray(b2, np.float64)
    a1, bb1, c1 = cov(b1)
    a2, bb2, c2 = cov(b2)
    # same PSD clamp as the jax op (see probiou): degenerate pairs
    # round the form negative and NaN the log otherwise
    den = max((a1 + a2) * (bb1 + bb2) - (c1 + c2) ** 2, 0.0) + eps
    t1 = ((a1 + a2) * (b1[1] - b2[1]) ** 2
          + (bb1 + bb2) * (b1[0] - b2[0]) ** 2) / den * 0.25
    t2 = ((c1 + c2) * (b2[0] - b1[0]) * (b1[1] - b2[1])) / den * 0.5
    t3 = 0.5 * np.log(den / (4.0 * np.sqrt(
        max((a1 * bb1 - c1 * c1), 0.0) * max((a2 * bb2 - c2 * c2), 0.0))
        + eps) + eps)
    bd = min(max(t1 + t2 + t3, eps), 100.0)
    return 1.0 - np.sqrt(1.0 - np.exp(-bd) + eps)


def nms_rotated_reference_numpy(boxes_xywhr, scores, labels, iou_threshold,
                                score_threshold, class_aware=True,
                                max_keep: int = 0):
    """Naive greedy rotated NMS (test oracle). max_keep>0 stops once that
    many boxes are kept — EXACT for the kept[:max_keep] prefix (greedy
    NMS only ever appends, in score order); essential when thousands of
    candidates survive the gate (fixture weights at 640^2)."""
    import numpy as np
    order = np.argsort(-scores, kind="stable")
    order = [i for i in order if scores[i] > score_threshold]
    kept = []
    for i in order:
        if max_keep and len(kept) >= max_keep:
            break
        ok = True
        for j in kept:
            if class_aware and labels[i] != labels[j]:
                continue
            if probiou_numpy(boxes_xywhr[i], boxes_xywhr[j]) > iou_threshold:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept


def nms_reference_numpy(boxes_xywh, scores, labels, iou_threshold,
                        score_threshold, class_aware=True,
                        max_keep: int = 0):
    """Naive O(N^2) host NMS — test oracle only. max_keep as in
    nms_rotated_reference_numpy (exact early exit for the top prefix)."""
    import numpy as np
    order = np.argsort(-scores, kind="stable")
    order = [i for i in order if scores[i] > score_threshold]
    kept = []

    def iou(a, b):
        ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2
        ax2, ay2 = a[0] + a[2] / 2, a[1] + a[3] / 2
        bx1, by1 = b[0] - b[2] / 2, b[1] - b[3] / 2
        bx2, by2 = b[0] + b[2] / 2, b[1] + b[3] / 2
        iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
        ih = max(0.0, min(ay2, by2) - max(ay1, by1))
        inter = iw * ih
        ua = max(0.0, ax2 - ax1) * max(0.0, ay2 - ay1)
        ub = max(0.0, bx2 - bx1) * max(0.0, by2 - by1)
        u = ua + ub - inter
        return inter / u if u > 0 else 0.0

    for i in order:
        if max_keep and len(kept) >= max_keep:
            break
        ok = True
        for j in kept:
            if class_aware and labels[i] != labels[j]:
                continue
            if iou(boxes_xywh[i], boxes_xywh[j]) > iou_threshold:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept
