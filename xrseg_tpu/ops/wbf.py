"""Weighted Box Fusion (Solovyev et al. 2021) — TPU-shaped, fixed-size.

NMS *discards* every overlapping candidate but the winner; WBF *fuses*
them (score-weighted coordinate average, mean score), which is the
better merge when candidates come from multiple sources that each saw
the object — exactly the TTA / model-ensemble case this framework's
`build_pipeline(tta=...)` produces. PostprocessConfig(merge="wbf")
swaps it in for the detect/segment decode.

TPU shape discipline (same rules as ops/nms.py): candidates are sorted
once, then a lax.scan greedily assigns each to the best-IoU existing
cluster (same label) or opens a new one, carrying fixed [max_det]
accumulators — no dynamic shapes anywhere. Cost is one [A] sort +
A x max_det IoU rows; an eval/accuracy mode, not the interactive hot
path.

Fused score is the cluster's MEAN member score (the paper's default;
its optional min(n,T)/T rescale needs the source count T, which a
merged-anchor stream does not carry).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from xrseg_tpu.ops.nms import xywh_to_corners


def _iou_row(box_c: jax.Array, boxes_c: jax.Array) -> jax.Array:
    """IoU of one corner-form box [4] against [D,4]."""
    lt = jnp.maximum(box_c[:2], boxes_c[:, :2])
    rb = jnp.minimum(box_c[2:], boxes_c[:, 2:])
    inter = jnp.prod(jnp.maximum(rb - lt, 0.0), axis=-1)
    a1 = jnp.prod(jnp.maximum(box_c[2:] - box_c[:2], 0.0))
    a2 = jnp.prod(jnp.maximum(boxes_c[:, 2:] - boxes_c[:, :2], 0.0),
                  axis=-1)
    return inter / jnp.maximum(a1 + a2 - inter, 1e-12)


def _topk_candidates(boxes, scores, labels, pre_topk: int):
    """Score-descending candidate stream for the WBF scan, optionally
    truncated to the top pre_topk anchors.

    Sub-threshold candidates are NO-OPS in the scan (alive=False rows
    neither merge nor open a cluster), so truncation is EXACT whenever
    at most pre_topk anchors clear the score gate — the same contract
    as nms_fixed's pre_topk. Unlike NMS (whose greedy loop runs only
    max_det iterations over wide vectors, where full width measured
    FASTER on TPU), the WBF scan runs ONE SEQUENTIAL STEP PER CANDIDATE
    — 8400 steps at full width, M*8400 for an M-model ensemble — so
    shortening the stream shortens the dependency chain itself.
    lax.top_k sorts descending with ties broken by lower index, matching
    the stable argsort ordering."""
    A = scores.shape[0]
    if pre_topk and pre_topk < A:
        s_sorted, order = jax.lax.top_k(scores, pre_topk)
    else:
        order = jnp.argsort(-scores)
        s_sorted = scores[order]
    return (boxes[order].astype(jnp.float32), s_sorted, labels[order],
            order.astype(jnp.int32))


def wbf_fixed(boxes_xywh: jax.Array, scores: jax.Array, labels: jax.Array,
              *, iou_threshold: float = 0.55,
              score_threshold: float = 0.0,
              max_det: int = 50,
              class_aware: bool = True,
              pre_topk: int = 0) -> Dict[str, jax.Array]:
    """Single-image fixed-shape WBF.

    boxes_xywh [A,4] / scores [A] / labels [A] -> the nms_fixed output
    contract: {boxes_xywh [D,4] (FUSED), scores [D] (mean member score),
    labels [D], indices [D] (anchor index of each cluster's top-scoring
    member — mask coefficients etc. gather from it), valid [D],
    count []} with D = max_det, score-sorted.

    pre_topk: 0 = scan every anchor (guaranteed exact); >0 = scan only
    the top pre_topk candidates by score (exact unless more than
    pre_topk anchors clear score_threshold — see _topk_candidates).
    """
    D = max_det
    b_sorted, s_sorted, l_sorted, order = _topk_candidates(
        boxes_xywh, scores, labels, pre_topk)
    alive = s_sorted > score_threshold

    def step(carry, inp):
        (wsum, ssum, n, top_i, lab, active, n_open) = carry
        box, score, label, idx, ok = inp
        fused = wsum / jnp.maximum(ssum, 1e-12)[:, None]       # [D,4]
        iou = _iou_row(xywh_to_corners(box[None])[0],
                       xywh_to_corners(fused))
        same = (lab == label) | (not class_aware)
        cand = active & same & (iou >= iou_threshold)
        merge = ok & cand.any()
        best = jnp.argmax(jnp.where(cand, iou, -1.0))
        # merge into `best` (candidates arrive score-DESC, so a cluster's
        # first member is always its top-scoring one — top_i set at open)
        w = score.astype(jnp.float32)
        wsum_m = wsum.at[best].add(w * box)
        ssum_m = ssum.at[best].add(w)
        n_m = n.at[best].add(1)
        # open a new cluster at slot n_open
        can_open = ok & ~cand.any() & (n_open < D)
        wsum_o = wsum.at[n_open].set(w * box)
        ssum_o = ssum.at[n_open].set(w)
        n_o = n.at[n_open].set(1)
        top_i_o = top_i.at[n_open].set(idx)
        lab_o = lab.at[n_open].set(label)
        act_o = active.at[n_open].set(True)

        def pick(m, o, base):
            return jnp.where(merge, m, jnp.where(can_open, o, base))

        carry = (pick(wsum_m, wsum_o, wsum), pick(ssum_m, ssum_o, ssum),
                 pick(n_m, n_o, n),
                 jnp.where(can_open, top_i_o, top_i),
                 jnp.where(can_open, lab_o, lab),
                 jnp.where(can_open, act_o, active),
                 n_open + can_open.astype(n_open.dtype))
        return carry, None

    init = (jnp.zeros((D, 4), jnp.float32),            # wsum
            jnp.zeros((D,), jnp.float32),              # ssum
            jnp.zeros((D,), jnp.int32),                # n members
            jnp.zeros((D,), jnp.int32),                # top member index
            jnp.full((D,), -1, labels.dtype),          # cluster label
            jnp.zeros((D,), bool),                     # active
            jnp.zeros((), jnp.int32))                  # open count
    (wsum, ssum, n, top_i, lab, active, n_open), _ = jax.lax.scan(
        step, init,
        (b_sorted, s_sorted.astype(jnp.float32), l_sorted,
         order.astype(jnp.int32), alive))

    fused = wsum / jnp.maximum(ssum, 1e-12)[:, None]
    mean_score = jnp.where(active, ssum / jnp.maximum(n, 1), 0.0)
    # score-sort the slate (clusters open in first-member order, which
    # is NOT final mean-score order)
    res = jnp.argsort(-mean_score)
    return {"boxes_xywh": fused[res] * active[res][:, None],
            "scores": mean_score[res],
            "labels": jnp.where(active[res], lab[res], 0).astype(jnp.int32),
            "indices": jnp.where(active[res], top_i[res], 0),
            "valid": active[res],
            "count": n_open}


def wbf_fixed_batched(boxes, scores, labels, *, iou_threshold: float,
                      score_threshold: float, max_det: int,
                      class_aware: bool = True,
                      pre_topk: int = 0,
                      backend: str = "scan") -> Dict[str, jax.Array]:
    """Batched WBF with the nms_fixed_batched signature (the `backend`
    arg is accepted for call-site compatibility and ignored — WBF runs
    the scan formulation everywhere)."""
    del backend
    return jax.vmap(lambda b, s, l: wbf_fixed(
        b, s, l, iou_threshold=iou_threshold,
        score_threshold=score_threshold, max_det=max_det,
        class_aware=class_aware, pre_topk=pre_topk))(boxes, scores, labels)


def wbf_rotated_fixed(boxes_xywhr: jax.Array, scores: jax.Array,
                      labels: jax.Array, *, iou_threshold: float = 0.55,
                      score_threshold: float = 0.0, max_det: int = 50,
                      class_aware: bool = True,
                      pre_topk: int = 0) -> Dict[str, jax.Array]:
    """OBB WBF: probIoU cluster matching; cx/cy/w/h fuse score-weighted,
    the ANGLE fuses as the weighted circular mean over DOUBLED angles
    (rotated rectangles have pi symmetry): theta = atan2(sum w sin2t,
    sum w cos2t)/2. Output slate keys use "boxes_xywhr". pre_topk as in
    wbf_fixed (exact candidate-stream truncation)."""
    from xrseg_tpu.ops.nms import probiou_row
    D = max_det
    b_sorted, s_sorted, l_sorted, order = _topk_candidates(
        boxes_xywhr, scores, labels, pre_topk)
    s_sorted = s_sorted.astype(jnp.float32)
    alive = s_sorted > score_threshold

    def fuse(wsum, cs, sn, ssum):
        xywh = wsum / jnp.maximum(ssum, 1e-12)[:, None]
        ang = 0.5 * jnp.arctan2(sn, jnp.where(ssum > 0, cs, 1.0))
        return jnp.concatenate([xywh, ang[:, None]], -1)

    def step(carry, inp):
        (wsum, cs, sn, ssum, n, top_i, lab, active, n_open) = carry
        box, score, label, idx, ok = inp
        fused = fuse(wsum, cs, sn, ssum)
        iou = jnp.maximum(probiou_row(box, fused), 0.0)
        same = (lab == label) | (not class_aware)
        cand = active & same & (iou >= iou_threshold)
        merge = ok & cand.any()
        best = jnp.argmax(jnp.where(cand, iou, -1.0))
        w = score
        upd_m = (wsum.at[best].add(w * box[:4]),
                 cs.at[best].add(w * jnp.cos(2 * box[4])),
                 sn.at[best].add(w * jnp.sin(2 * box[4])),
                 ssum.at[best].add(w), n.at[best].add(1))
        can_open = ok & ~cand.any() & (n_open < D)
        upd_o = (wsum.at[n_open].set(w * box[:4]),
                 cs.at[n_open].set(w * jnp.cos(2 * box[4])),
                 sn.at[n_open].set(w * jnp.sin(2 * box[4])),
                 ssum.at[n_open].set(w), n.at[n_open].set(1))

        def pick(m, o, base):
            return jnp.where(merge, m, jnp.where(can_open, o, base))

        carry = tuple(pick(m, o, b) for m, o, b in
                      zip(upd_m, upd_o, (wsum, cs, sn, ssum, n)))
        carry += (jnp.where(can_open, top_i.at[n_open].set(idx), top_i),
                  jnp.where(can_open, lab.at[n_open].set(label), lab),
                  jnp.where(can_open, active.at[n_open].set(True),
                            active),
                  n_open + can_open.astype(n_open.dtype))
        return carry, None

    init = (jnp.zeros((D, 4), jnp.float32), jnp.zeros((D,), jnp.float32),
            jnp.zeros((D,), jnp.float32), jnp.zeros((D,), jnp.float32),
            jnp.zeros((D,), jnp.int32), jnp.zeros((D,), jnp.int32),
            jnp.full((D,), -1, labels.dtype), jnp.zeros((D,), bool),
            jnp.zeros((), jnp.int32))
    (wsum, cs, sn, ssum, n, top_i, lab, active, n_open), _ = jax.lax.scan(
        step, init, (b_sorted, s_sorted, l_sorted,
                     order.astype(jnp.int32), alive))
    fused = fuse(wsum, cs, sn, ssum)
    mean_score = jnp.where(active, ssum / jnp.maximum(n, 1), 0.0)
    res = jnp.argsort(-mean_score)
    return {"boxes_xywhr": fused[res] * active[res][:, None],
            "scores": mean_score[res],
            "labels": jnp.where(active[res], lab[res], 0).astype(jnp.int32),
            "indices": jnp.where(active[res], top_i[res], 0),
            "valid": active[res],
            "count": n_open}


def wbf_rotated_fixed_batched(boxes, scores, labels, *,
                              iou_threshold: float,
                              score_threshold: float, max_det: int,
                              class_aware: bool = True,
                              pre_topk: int = 0,
                              backend: str = "scan"):
    del backend
    return jax.vmap(lambda b, s, l: wbf_rotated_fixed(
        b, s, l, iou_threshold=iou_threshold,
        score_threshold=score_threshold, max_det=max_det,
        class_aware=class_aware, pre_topk=pre_topk))(boxes, scores, labels)


def wbf_reference_numpy(boxes, scores, labels, *, iou_threshold=0.55,
                        score_threshold=0.0, class_aware=True):
    """Loop-based numpy oracle (same greedy-cluster semantics)."""
    from xrseg_tpu.eval.metrics import box_iou_xywh
    order = np.argsort(-np.asarray(scores), kind="stable")
    clusters = []                     # [wsum, ssum, n, label, top_i, top_s]
    for i in order:
        if scores[i] <= score_threshold:
            continue
        best, best_iou = -1, iou_threshold
        for ci, c in enumerate(clusters):
            if class_aware and c[3] != labels[i]:
                continue
            iou = box_iou_xywh(c[0] / c[1], np.asarray(boxes[i],
                                                       np.float64))
            if iou >= best_iou:
                best, best_iou = ci, iou
        if best >= 0:
            c = clusters[best]
            c[0] = c[0] + scores[i] * np.asarray(boxes[i], np.float64)
            c[1] += scores[i]
            c[2] += 1
            if scores[i] > c[5]:
                c[4], c[5] = int(i), float(scores[i])
        else:
            clusters.append([scores[i] * np.asarray(boxes[i], np.float64),
                             float(scores[i]), 1, int(labels[i]), int(i),
                             float(scores[i])])
    rows = [(c[0] / c[1], c[1] / c[2], c[3], c[4]) for c in clusters]
    rows.sort(key=lambda r: -r[1])
    return rows
