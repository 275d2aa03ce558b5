"""Randomized oracle sweeps for the training assigners.

The TAL assigner decides which anchors carry gradient for which GT —
an assignment bug trains silently wrong (no crash, just worse mAP), so
its vectorized/jit formulation (top_k thresholding, argmax tie-breaks,
one_hot claim resolution in xrseg_tpu/train/losses.py:assign_targets_tal)
is exactly the kind of reformulation the geometry fuzz (r4) caught real
bugs in. The existing pin (tests/test_train.py::test_tal_matches_numpy_
reference) is one seed; this module sweeps hundreds of seeded scenes —
duplicate GTs/preds (exact metric ties at the top-k boundary), nested/
overlapping GTs (multi-claim resolution), near-empty and all-padded
scenes, crowding, and the rotated assigner's angle edges — against
independent loop-per-GT float64 numpy oracles.

Float discipline (same protocol as tests/test_geometry_fuzz.py): the
device path computes the alignment metric in f32, the oracle in f64.
GT geometry uses integer coordinates so the axis-aligned candidacy
tests (strict >/<) are EXACT in both precisions; the metric's
sigmoid^0.5 * ciou^6 chain is transcendental, so a candidate sitting
within ~1e-5 (relative) of its GT's k-th metric can legitimately
resolve differently — such anchors are re-checked against the oracle's
own boundary margin and classified "boundary" (allowed, counted, must
stay rare) vs a real semantic mismatch (failure). The rotated assigner
additionally treats near-zero rotated-containment margins as boundary
(its candidacy test is transcendental in the angle).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.models.yolo11 import make_anchors
from xrseg_tpu.ops.nms import probiou_numpy
from xrseg_tpu.train import losses as L

# Small field so crowding/ties are reachable and the oracle is cheap:
# 64x64 input -> 84 anchors (64 P3 + 16 P4 + 4 P5), centers on exact
# integer pixels (4, 12, ..., 60 / 8, 24, ... / 16, 48).
SIZE = (64, 64)
NC = 4
TOPK = 10
ALPHA, BETA, EPS = 0.5, 6.0, 1e-9
ANCHORS, STRIDES = make_anchors(SIZE)
CENTERS = (ANCHORS * STRIDES).astype(np.float64)        # [A,2]
A = CENTERS.shape[0]
CFG = ModelConfig(num_classes=NC, input_size=SIZE)

MODES = ("random", "overlap", "dup", "sparse", "allpad", "crowd")
ROT_MODES = ("random", "overlap", "dup", "wrap")


# ---------------------------------------------------------------------------
# scene generators (integer GT geometry -> exact axis-aligned candidacy)
# ---------------------------------------------------------------------------

def make_scene(seed: int, mode: str):
    """Returns (pred_boxes [A,4] f32, cls_logits [A,NC] f32,
    gt_boxes [G,4] f32, gt_labels [G] i32)."""
    r = np.random.default_rng(seed * 7919 + MODES.index(mode) * 104729)
    G = {"random": 6, "overlap": 6, "dup": 8, "sparse": 8,
         "allpad": 4, "crowd": 16}[mode]

    cx = r.integers(10, 54, G).astype(np.float64)
    cy = r.integers(10, 54, G).astype(np.float64)
    w = r.integers(6, 40, G).astype(np.float64)
    h = r.integers(6, 40, G).astype(np.float64)
    labels = r.integers(0, NC, G).astype(np.int32)

    if mode == "overlap":
        # nested / heavily overlapping: all GTs share a center region
        cx[:] = cx[0] + r.integers(-3, 4, G)
        cy[:] = cy[0] + r.integers(-3, 4, G)
        w = np.sort(w)[::-1].copy()          # nested sizes
        h = np.sort(h)[::-1].copy()
    elif mode == "dup":
        # exact duplicate GT rows (same box AND label): iou/metric ties
        half = G // 2
        cx[half:] = cx[:half]
        cy[half:] = cy[:half]
        w[half:] = w[:half]
        h[half:] = h[:half]
        labels[half:] = labels[:half]
    elif mode == "sparse":
        # mostly padded; the valid GTs are tiny (few or zero candidates)
        labels[2:] = -1
        w[:2] = r.choice([2.0, 4.0], 2)
        h[:2] = r.choice([2.0, 4.0], 2)
    elif mode == "allpad":
        labels[:] = -1
    elif mode == "crowd":
        w = r.integers(16, 56, G).astype(np.float64)
        h = r.integers(16, 56, G).astype(np.float64)

    gt_boxes = np.stack([cx, cy, w, h], -1)

    # preds jitter around random GTs; in "dup" mode duplicate half the
    # pred rows exactly so the alignment metric has exact ties too
    src = gt_boxes[r.integers(0, G, A)]
    pred = src + r.normal(0, 4, (A, 4))
    pred[:, 2:] = np.abs(pred[:, 2:]) + 2
    if mode == "dup":
        pred[A // 2:] = pred[: A // 2]
    logits = r.normal(0, 1.5, (A, NC))
    if mode == "dup":
        logits[A // 2:] = logits[: A // 2]
    return (pred.astype(np.float32), logits.astype(np.float32),
            gt_boxes.astype(np.float32), labels)


def make_rot_scene(seed: int, mode: str):
    """Returns (pred_rb [A,5], gt_rb [G,5], cls_logits, gt_labels,
    gt_aabb [G,4] shape-carrier)."""
    r = np.random.default_rng(seed * 6101 + ROT_MODES.index(mode) * 99991)
    G = 6 if mode != "dup" else 8
    cx = r.integers(12, 52, G).astype(np.float64)
    cy = r.integers(12, 52, G).astype(np.float64)
    w = r.integers(8, 36, G).astype(np.float64)
    h = r.integers(8, 36, G).astype(np.float64)
    if mode == "wrap":
        # angles hugging the +-pi/2 wrap and exact axis alignments
        ang = r.choice([np.pi / 2 - 1e-3, -np.pi / 2 + 1e-3, np.pi / 2,
                        0.0, np.pi / 4, -np.pi / 4], G)
    else:
        ang = r.uniform(-np.pi / 2, np.pi / 2, G)
    labels = r.integers(0, NC, G).astype(np.int32)
    if mode == "overlap":
        cx[:] = cx[0] + r.integers(-3, 4, G)
        cy[:] = cy[0] + r.integers(-3, 4, G)
    elif mode == "dup":
        half = G // 2
        for arr in (cx, cy, w, h, ang, labels):
            arr[half:] = arr[:half]
    labels[-1] = -1                                  # always one pad slot
    gt_rb = np.stack([cx, cy, w, h, ang], -1)

    src = gt_rb[r.integers(0, G, A)]
    pred = src + r.normal(0, 3, (A, 5))
    pred[:, 2:4] = np.abs(pred[:, 2:4]) + 2
    if mode == "dup":
        pred[A // 2:] = pred[: A // 2]
    logits = r.normal(0, 1.5, (A, NC))
    if mode == "dup":
        logits[A // 2:] = logits[: A // 2]
    gt_aabb = gt_rb[:, :4].copy()                    # shape carrier only
    return (pred.astype(np.float32), gt_rb.astype(np.float32),
            logits.astype(np.float32), labels, gt_aabb.astype(np.float32))


# ---------------------------------------------------------------------------
# independent float64 oracles (loop per GT)
# ---------------------------------------------------------------------------

def ciou_np(pred: np.ndarray, g: np.ndarray, eps: float = 1e-7):
    """CIoU of [A,4] preds vs one GT [4], float64 (Zheng et al. 2020)."""
    ax, ay, aw, ah = pred[:, 0], pred[:, 1], pred[:, 2], pred[:, 3]
    bx, by, bw, bh = g
    ax1, ax2 = ax - aw / 2, ax + aw / 2
    ay1, ay2 = ay - ah / 2, ay + ah / 2
    bx1, bx2 = bx - bw / 2, bx + bw / 2
    by1, by2 = by - bh / 2, by + bh / 2
    iw = np.maximum(np.minimum(ax2, bx2) - np.maximum(ax1, bx1), 0)
    ih = np.maximum(np.minimum(ay2, by2) - np.maximum(ay1, by1), 0)
    inter = iw * ih
    union = aw * ah + bw * bh - inter + eps
    iou = inter / union
    cw = np.maximum(ax2, bx2) - np.minimum(ax1, bx1)
    ch = np.maximum(ay2, by2) - np.minimum(ay1, by1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = (ax - bx) ** 2 + (ay - by) ** 2
    v = (4 / np.pi ** 2) * (np.arctan(bw / (bh + eps))
                            - np.arctan(aw / (ah + eps))) ** 2
    alpha = v / (v - iou + 1 + eps)
    return iou - rho2 / c2 - alpha * v


def tal_oracle(pred_boxes, cls_logits, gt_boxes, gt_labels,
               rot: bool = False, gt_rb=None, pred_rb=None):
    """Loop-per-GT float64 reimplementation of the TAL assigner.

    Returns dict with fg, gt_idx, target_scores plus the f64 metric,
    per-GT kth values and (rotated) containment margins for boundary
    classification.
    """
    G = gt_labels.shape[0]
    probs = 1.0 / (1.0 + np.exp(-cls_logits.astype(np.float64)))
    iou = np.zeros((A, G))
    inside = np.zeros((A, G), bool)
    margin = np.full((A, G), np.inf)     # distance to the candidacy edge
    for g in range(G):
        if gt_labels[g] < 0:
            continue
        if rot:
            cxg, cyg, wg, hg, ag = gt_rb[g].astype(np.float64)
            d = CENTERS - [cxg, cyg]
            du = d[:, 0] * np.cos(ag) + d[:, 1] * np.sin(ag)
            dv = -d[:, 0] * np.sin(ag) + d[:, 1] * np.cos(ag)
            inside[:, g] = (np.abs(du) < wg / 2) & (np.abs(dv) < hg / 2)
            margin[:, g] = np.minimum(np.abs(np.abs(du) - wg / 2),
                                      np.abs(np.abs(dv) - hg / 2))
            iou[:, g] = np.maximum(
                [probiou_numpy(pred_rb[a].astype(np.float64),
                               gt_rb[g].astype(np.float64))
                 for a in range(A)], 0.0)
        else:
            cxg, cyg, wg, hg = gt_boxes[g].astype(np.float64)
            x1, x2 = cxg - wg / 2, cxg + wg / 2
            y1, y2 = cyg - hg / 2, cyg + hg / 2
            inside[:, g] = ((CENTERS[:, 0] > x1) & (CENTERS[:, 0] < x2) &
                            (CENTERS[:, 1] > y1) & (CENTERS[:, 1] < y2))
            iou[:, g] = np.maximum(
                ciou_np(pred_boxes.astype(np.float64),
                        gt_boxes[g].astype(np.float64)), 0.0)
    metric = np.zeros((A, G))
    for g in range(G):
        if gt_labels[g] < 0:
            continue
        metric[:, g] = np.where(
            inside[:, g],
            probs[:, gt_labels[g]] ** ALPHA * iou[:, g] ** BETA, 0.0)
    k = min(TOPK, A)
    kth = np.zeros(G)
    cand = np.zeros((A, G), bool)
    for g in range(G):
        kth[g] = np.sort(metric[:, g])[-k]
        cand[:, g] = (metric[:, g] >= kth[g]) & (metric[:, g] > 0)
    fg = cand.any(1)
    gt_idx = np.zeros(A, np.int64)
    for a in range(A):
        if fg[a]:
            masked = np.where(cand[a], iou[a], -1.0)
            gt_idx[a] = int(np.argmax(masked))       # ties -> first
    assigned = np.zeros((A, G), bool)
    for a in range(A):
        if fg[a]:
            assigned[a, gt_idx[a]] = cand[a, gt_idx[a]]
    m_pos = np.where(assigned, metric, 0.0)
    o_pos = np.where(assigned, iou, 0.0)
    norm = m_pos * (o_pos.max(0) / (m_pos.max(0) + EPS))[None]
    t_score = norm.max(1)
    target_scores = np.zeros((A, NC))
    for a in range(A):
        if fg[a]:
            target_scores[a, max(gt_labels[gt_idx[a]], 0)] = t_score[a]
    return {"fg": fg, "gt_idx": gt_idx, "target_scores": target_scores,
            "metric": metric, "kth": kth, "iou": iou, "margin": margin}


def simple_oracle(gt_boxes, gt_labels):
    """Loop oracle for assign_targets: smallest containing GT, ties to
    the earlier GT index (>=/<= inclusive edges)."""
    G = gt_labels.shape[0]
    gt_idx = np.zeros(A, np.int64)
    fg = np.zeros(A, bool)
    for a in range(A):
        best, best_area = -1, np.inf
        for g in range(G):
            if gt_labels[g] < 0:
                continue
            cxg, cyg, wg, hg = gt_boxes[g].astype(np.float64)
            if (cxg - wg / 2 <= CENTERS[a, 0] <= cxg + wg / 2 and
                    cyg - hg / 2 <= CENTERS[a, 1] <= cyg + hg / 2):
                if wg * hg < best_area:              # strict: ties->earlier
                    best, best_area = g, wg * hg
        fg[a] = best >= 0
        gt_idx[a] = max(best, 0)
    return fg, gt_idx


# ---------------------------------------------------------------------------
# comparison with boundary classification
# ---------------------------------------------------------------------------

def compare_tal(got, ref, rot: bool = False):
    """Returns "ok" / "boundary" / failure message.

    Boundary classification happens at two levels. Per ANCHOR: the
    anchor's own metric sits within f32 tolerance of some GT's k-th
    value (top-k edge), or (rotated) within ~0 of a containment edge.
    Per GT ("taint"): the TAL target-score normalization divides by the
    max metric over the GT's positive pool, so ONE boundary anchor
    flipping in/out of a pool legitimately changes every positive's
    target score for that GT — score mismatches on anchors assigned to
    a tainted GT are boundary, not failures.
    """
    fg = np.asarray(got["fg"])
    gt_idx = np.asarray(got["gt_idx"])
    ts = np.asarray(got["target_scores"], np.float64)
    G = ref["kth"].shape[0]

    m, kth = ref["metric"], ref["kth"]          # [A,G], [G]
    near_kth = (m > 0) & (np.abs(m - kth[None])
                          <= 3e-5 * np.maximum(kth[None], 1e-30))  # [A,G]
    near_edge = (ref["margin"] < 1e-4) if rot else np.zeros_like(near_kth)
    anchor_boundary = (near_kth | near_edge).any(1)                # [A]
    # GTs whose positive pool contains a boundary anchor (either impl's
    # view of the pool): their normalized scores are allowed to differ.
    tainted = np.zeros(G, bool)
    for g in range(G):
        pool = ((ref["fg"] & (ref["gt_idx"] == g))
                | (fg & (gt_idx == g)))
        tainted[g] = bool((pool & anchor_boundary).any()
                          or (near_kth[:, g] | (near_edge[:, g])).any())

    boundary = False
    for a in range(A):
        if fg[a] != ref["fg"][a]:
            if anchor_boundary[a]:
                boundary = True
                continue
            return f"fg mismatch at anchor {a}"
        if fg[a] and gt_idx[a] != ref["gt_idx"][a]:
            # argmax tie on iou between the two claimed GTs?
            i1, i2 = ref["iou"][a, gt_idx[a]], ref["iou"][a, ref["gt_idx"][a]]
            if abs(i1 - i2) <= 1e-5 or anchor_boundary[a]:
                boundary = True
                continue
            return (f"gt_idx mismatch at anchor {a}: "
                    f"{gt_idx[a]} vs {ref['gt_idx'][a]} (iou {i1} vs {i2})")
        if fg[a] and not np.allclose(ts[a], ref["target_scores"][a],
                                     atol=2e-3):
            if anchor_boundary[a] or tainted[gt_idx[a]]:
                boundary = True
                continue
            return (f"target_scores mismatch at anchor {a}: "
                    f"{ts[a]} vs {ref['target_scores'][a]}")
    return "boundary" if boundary else "ok"


def _sweep(one, seeds, modes, allow_boundary_frac=0.10):
    results = {"ok": 0, "boundary": 0}
    failures = []
    for mode in modes:
        for seed in range(seeds):
            r = one(seed, mode)
            if r in results:
                results[r] += 1
            else:
                failures.append(f"[{mode}/{seed}] {r}")
    total = results["ok"] + results["boundary"] + len(failures)
    assert not failures, failures[:5]
    assert results["boundary"] <= allow_boundary_frac * total, results
    return results


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_tal_fuzz_vs_loop_oracle():
    def one(seed, mode):
        pred, logits, gtb, lab = make_scene(seed, mode)
        got = L.assign_targets_tal(jnp.asarray(pred), jnp.asarray(logits),
                                   jnp.asarray(gtb), jnp.asarray(lab),
                                   CFG, topk=TOPK, input_hw=SIZE)
        if mode == "allpad":
            return ("ok" if not np.asarray(got["fg"]).any()
                    else "allpad produced positives")
        ref = tal_oracle(pred, logits, gtb, lab)
        return compare_tal(got, ref)

    res = _sweep(one, seeds=25, modes=MODES)
    assert res["ok"] >= 100       # the sweep must be mostly exact


def test_tal_rotated_fuzz_vs_loop_oracle():
    def one(seed, mode):
        pred_rb, gt_rb, logits, lab, gt_aabb = make_rot_scene(seed, mode)
        got = L.assign_targets_tal(
            jnp.zeros((A, 4), jnp.float32),     # unused in rotated mode
            jnp.asarray(logits), jnp.asarray(gt_aabb), jnp.asarray(lab),
            CFG, topk=TOPK, input_hw=SIZE,
            gt_rboxes=jnp.asarray(gt_rb), pred_rboxes=jnp.asarray(pred_rb))
        ref = tal_oracle(None, logits, None, lab, rot=True,
                         gt_rb=gt_rb, pred_rb=pred_rb)
        return compare_tal(got, ref, rot=True)

    res = _sweep(one, seeds=25, modes=ROT_MODES)
    assert res["ok"] >= 70


def test_simple_assigner_fuzz_exact():
    """assign_targets (smallest containing GT) — integer geometry makes
    every comparison exact; no boundary tolerance at all."""
    def one(seed, mode):
        _, _, gtb, lab = make_scene(seed, mode)
        got = L.assign_targets(jnp.asarray(gtb), jnp.asarray(lab), CFG,
                               input_hw=SIZE)
        fg_ref, idx_ref = simple_oracle(gtb, lab)
        fg = np.asarray(got["fg"])
        idx = np.asarray(got["gt_idx"])
        if not np.array_equal(fg, fg_ref):
            return "fg mismatch"
        if not np.array_equal(idx[fg], idx_ref[fg]):
            return "gt_idx mismatch"
        return "ok"

    res = _sweep(one, seeds=25, modes=MODES, allow_boundary_frac=0.0)
    assert res["ok"] == 25 * len(MODES)
