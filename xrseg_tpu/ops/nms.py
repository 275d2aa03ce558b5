"""Fixed-shape, class-aware non-maximum suppression for TPU.

The reference bakes Sentis `Functional.NMS` into its compiled graph
(Assets/Scripts/InferenceEngine/Editor/IEModelEditorConverter.cs:76), which
emits a *dynamic-length* survivor list. Dynamic shapes break XLA, so the
TPU-native formulation is:

  1. per-anchor best class score/label (ReduceMax/ArgMax of the ref graph,
     IEModelEditorConverter.cs:69-70),
  2. top-K score pre-selection (static K),
  3. exact greedy suppression over the sorted slate with a lax.fori_loop and
     a precomputed KxK IoU matrix,
  4. compaction into a padded top-`max_det` slate + a valid count.

Everything is trace-once/compile-once: no host sync, no data-dependent
shapes. Class-aware behavior uses the coordinate-offset trick instead of a
per-class loop.
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


def _greedy_suppress(iou: jax.Array, alive0: jax.Array, iou_threshold: float) -> jax.Array:
    """Exact greedy NMS over a score-sorted slate.

    alive0[k]: candidate k passes the score gate. Returns keep mask [K].
    Sequential by nature; each of the K steps is one cheap [K]-vector op.
    """
    K = iou.shape[0]
    idx = jnp.arange(K)

    def body(i, alive):
        kept = alive[i]
        suppress = kept & (iou[i] > iou_threshold) & (idx > i)
        return alive & ~suppress

    return jax.lax.fori_loop(0, K, body, alive0)


@partial(jax.jit, static_argnames=("pre_topk", "max_det", "class_aware"))
def nms_fixed(boxes_xywh: jax.Array, scores: jax.Array, labels: jax.Array,
              *, iou_threshold: float, score_threshold: float,
              pre_topk: int = 256, max_det: int = 50,
              class_aware: bool = True) -> Dict[str, jax.Array]:
    """Single-image fixed-shape NMS.

    Args:
      boxes_xywh: [A,4] centers+wh in input-pixel space.
      scores:     [A]   best-class score per anchor.
      labels:     [A]   best-class id per anchor (int32).
    Returns dict of padded arrays:
      indices [max_det] int32 — anchor index of each detection (0 where invalid)
      boxes_xywh [max_det,4], scores [max_det], labels [max_det]
      valid [max_det] bool, count [] int32
    """
    A = scores.shape[0]
    k = min(pre_topk, A)
    top_scores, top_idx = jax.lax.top_k(scores, k)          # sorted desc
    top_boxes = boxes_xywh[top_idx]
    top_labels = labels[top_idx]

    corners = xywh_to_corners(top_boxes)
    if class_aware:
        corners = corners + (top_labels[:, None].astype(corners.dtype)
                             * _CLASS_OFFSET)
    iou = pairwise_iou(corners)
    alive0 = top_scores > score_threshold
    keep = _greedy_suppress(iou, alive0, iou_threshold)

    # Compact kept candidates (already score-sorted) into max_det slots.
    rank = jnp.cumsum(keep) - 1                              # slot per kept cand
    slot = jnp.where(keep & (rank < max_det), rank, max_det)
    count = jnp.minimum(keep.sum(), max_det).astype(jnp.int32)

    def compact(x, fill=0):
        out_shape = (max_det,) + x.shape[1:]
        out = jnp.full(out_shape, fill, x.dtype)
        return out.at[slot].set(x, mode="drop")

    valid = jnp.arange(max_det) < count
    return {
        "indices": compact(top_idx.astype(jnp.int32)),
        "boxes_xywh": compact(top_boxes),
        "scores": compact(top_scores),
        "labels": compact(top_labels.astype(jnp.int32)),
        "valid": valid,
        "count": count,
    }


def nms_reference_numpy(boxes_xywh, scores, labels, iou_threshold,
                        score_threshold, class_aware=True):
    """Naive O(N^2) host NMS — test oracle only."""
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
