"""Randomized oracle sweeps for the fixed-shape geometry ops.

The NMS / WBF slates are the baked deployment contract (the reference
bakes NMS into its exported model, IEModelEditorConverter.cs:76); their
existing pins are a handful of seeded scenes. This module hunts the
places fixed-shape reformulations classically diverge from loop-based
semantics — score ties, duplicate boxes, degenerate/zero-area boxes,
empty scenes, >max_det crowding, and the ±π/2 angle wrap — across
hundreds of seeded scenes per op (~900 total), comparing against
independent numpy oracles.

Float discipline: the device ops run float32, oracles run float64, so a
pairwise overlap that lands within ~1e-7 of the decision threshold can
legitimately resolve differently. Scene generators use integer
coordinates and binary-representable thresholds (0.5 / 0.25), which
makes the axis-aligned IoU decisions EXACT in both precisions (ratios
of small ints are ≥ 1/(2·union) ≈ 6e-5 away from 0.5 unless exactly
0.5 — far outside f32 rounding). probIoU is transcendental, so exact
separation is impossible there; any mismatch is re-checked against the
oracle at threshold ± 1e-4 and classified "boundary" (allowed, rare,
counted) vs a real semantic mismatch (failure).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrseg_tpu.ops.nms import (nms_fixed, nms_fixed_rotated,
                               nms_reference_numpy,
                               nms_rotated_reference_numpy, probiou_numpy)
from xrseg_tpu.ops.wbf import wbf_fixed, wbf_rotated_fixed

A = 64            # anchors per scene
D = 12            # max_det (small so crowding is reachable)
IOU_THR = 0.5     # binary-representable
SCORE_THR = 0.25  # binary-representable
MODES = ("random", "clustered", "ties", "degenerate", "empty", "crowded")


# ---------------------------------------------------------------------------
# scene generators
# ---------------------------------------------------------------------------

def make_scene(seed: int, mode: str, rotated: bool = False):
    """Returns (boxes [A,4|5] f32, scores [A] f32, labels [A] i32).

    Integer coordinates (exact in f32 and f64); scores on a 1/16 grid
    in "ties" mode (exact), continuous otherwise.
    """
    r = np.random.default_rng(seed * 1009 + MODES.index(mode) * 100003)
    cx = r.integers(8, 56, A).astype(np.float64)
    cy = r.integers(8, 56, A).astype(np.float64)
    w = r.integers(4, 20, A).astype(np.float64)
    h = r.integers(4, 20, A).astype(np.float64)
    scores = r.uniform(0.05, 1.0, A)
    labels = r.integers(0, 3, A).astype(np.int32)

    if mode == "clustered":
        centers = r.integers(10, 54, (6, 2)).astype(np.float64)
        pick = r.integers(0, 6, A)
        cx = centers[pick, 0] + r.integers(-2, 3, A)
        cy = centers[pick, 1] + r.integers(-2, 3, A)
        w = 10.0 + r.integers(0, 4, A)
        h = 10.0 + r.integers(0, 4, A)
    elif mode == "ties":
        # quantized scores (exact ties), duplicate boxes, duplicate
        # boxes with different labels
        scores = r.integers(1, 16, A) / 16.0
        dup = r.integers(0, A, A // 2)
        cx[A // 2:], cy[A // 2:] = cx[dup], cy[dup]
        w[A // 2:], h[A // 2:] = w[dup], h[dup]
        scores[A // 2:] = scores[dup]
    elif mode == "degenerate":
        k = A // 4
        w[:k] = 0.0                     # zero width
        h[k:2 * k] = 0.0                # zero height
        w[2 * k:2 * k + 4] = 64.0       # huge
        h[2 * k:2 * k + 4] = 64.0
        w[2 * k + 4:2 * k + 8] = 0.0    # zero area
        h[2 * k + 4:2 * k + 8] = 0.0
    elif mode == "empty":
        scores = r.uniform(0.0, 0.2, A)    # all below SCORE_THR
    elif mode == "crowded":
        # far-apart survivors: everything above threshold, little
        # overlap -> way more than D kept
        gx, gy = np.meshgrid(np.arange(8), np.arange(8))
        cx = (gx.ravel()[:A] * 8 + 4).astype(np.float64)
        cy = (gy.ravel()[:A] * 8 + 4).astype(np.float64)
        w = np.full(A, 5.0)
        h = np.full(A, 5.0)
        scores = r.uniform(0.3, 1.0, A)

    boxes = np.stack([cx, cy, w, h], -1)
    if rotated:
        if mode == "ties":
            ang = r.integers(-8, 9, A) / 16.0 * np.pi   # grid incl. ±π/2
        else:
            ang = r.uniform(-np.pi / 2, np.pi / 2, A)
            # force wrap-straddling pairs: half the boxes near ±π/2
            near = r.integers(0, A, A // 3)
            ang[near] = np.pi / 2 - r.uniform(0, 0.1, A // 3)
            ang[near[: A // 6]] *= -1
        boxes = np.concatenate([boxes, ang[:, None]], -1)
        if mode == "ties":        # duplicated rows get duplicated angles
            boxes[A // 2:, 4] = boxes[dup, 4]
    return (boxes.astype(np.float32), scores.astype(np.float32), labels)


# ---------------------------------------------------------------------------
# jitted ops (compile once per module: fixed A / D / thresholds)
# ---------------------------------------------------------------------------

nms_scan_j = jax.jit(functools.partial(
    nms_fixed, iou_threshold=IOU_THR, score_threshold=SCORE_THR,
    max_det=D, class_aware=True, backend="scan"))
nms_rot_j = jax.jit(functools.partial(
    nms_fixed_rotated, iou_threshold=IOU_THR, score_threshold=SCORE_THR,
    max_det=D, class_aware=True))
wbf_j = jax.jit(functools.partial(
    wbf_fixed, iou_threshold=IOU_THR, score_threshold=SCORE_THR,
    max_det=D, class_aware=True))
wbf_rot_j = jax.jit(functools.partial(
    wbf_rotated_fixed, iou_threshold=IOU_THR, score_threshold=SCORE_THR,
    max_det=D, class_aware=True))


def _pallas_nms(boxes, scores, labels):
    """nms_fixed's pallas backend, interpreted on CPU (same math)."""
    from xrseg_tpu.ops.nms import _CLASS_OFFSET, xywh_to_corners
    from xrseg_tpu.ops.pallas_kernels import _NEG, nms_select_pallas
    corners = xywh_to_corners(jnp.asarray(boxes))
    corners = corners + (jnp.asarray(labels)[:, None].astype(jnp.float32)
                         * _CLASS_OFFSET)
    masked = jnp.where(jnp.asarray(scores) > SCORE_THR,
                       jnp.asarray(scores, jnp.float32), _NEG)
    sel, ok = nms_select_pallas(corners.astype(jnp.float32), masked,
                                IOU_THR, D, interpret=True)
    n = int(np.asarray(ok).sum())
    return [int(i) for i in np.asarray(sel)[:n]]


# ---------------------------------------------------------------------------
# comparators (with boundary classification for the probIoU ops)
# ---------------------------------------------------------------------------

def _nms_result(det):
    n = int(det["count"])
    assert bool(np.all(np.asarray(det["valid"])[:n]))
    assert bool(~np.any(np.asarray(det["valid"])[n:]))
    return [int(i) for i in np.asarray(det["indices"])[:n]]


def compare_nms(got_kept, boxes, scores, labels, oracle) -> str:
    want = oracle(boxes, scores, labels, IOU_THR, SCORE_THR)[:D]
    if got_kept == want:
        return "ok"
    for t in (IOU_THR - 1e-4, IOU_THR + 1e-4):
        if got_kept == oracle(boxes, scores, labels, t, SCORE_THR)[:D]:
            return "boundary"
    return "mismatch"


def wbf_capped_oracle(boxes, scores, labels, iou_threshold, score_threshold,
                      max_det, rotated=False):
    """Independent loop WBF with the fixed-shape slate's documented cap:
    candidates arrive score-desc (stable); once max_det clusters are
    open, a non-matching candidate is DROPPED. Tie-break on equal
    cluster IoU: first (lowest-index) cluster, matching both argmax and
    ZFTurbo's `>` comparison. float64 throughout.

    Returns list of (fused_box, mean_score, label, top_index).
    """
    from xrseg_tpu.eval.metrics import box_iou_xywh
    boxes = np.asarray(boxes, np.float64)
    order = np.argsort(-np.asarray(scores), kind="stable")
    clusters = []   # dict: wsum, cs, sn, ssum, n, label, top_i
    for i in order:
        s = float(scores[i])
        if s <= score_threshold:
            continue
        best, best_iou = -1, -1.0
        for ci, c in enumerate(clusters):
            if c["label"] != labels[i]:
                continue
            if rotated:
                fused = np.concatenate(
                    [c["wsum"] / c["ssum"],
                     [0.5 * np.arctan2(c["sn"], c["cs"])]])
                iou = max(probiou_numpy(boxes[i], fused), 0.0)
            else:
                iou = box_iou_xywh(c["wsum"] / c["ssum"], boxes[i][:4])
            if iou >= iou_threshold and iou > best_iou:
                best, best_iou = ci, iou
        if best >= 0:
            c = clusters[best]
            c["wsum"] = c["wsum"] + s * boxes[i][:4]
            c["cs"] += s * np.cos(2 * boxes[i][4]) if rotated else 0.0
            c["sn"] += s * np.sin(2 * boxes[i][4]) if rotated else 0.0
            c["ssum"] += s
            c["n"] += 1
        elif len(clusters) < max_det:
            clusters.append(dict(
                wsum=s * boxes[i][:4],
                cs=s * np.cos(2 * boxes[i][4]) if rotated else 0.0,
                sn=s * np.sin(2 * boxes[i][4]) if rotated else 0.0,
                ssum=s, n=1, label=int(labels[i]), top_i=int(i)))
        # else: slate full -> dropped (the fixed-shape contract)
    rows = []
    for c in clusters:
        fb = c["wsum"] / c["ssum"]
        if rotated:
            fb = np.concatenate([fb, [0.5 * np.arctan2(c["sn"], c["cs"])]])
        rows.append((fb, c["ssum"] / c["n"], c["label"], c["top_i"]))
    rows.sort(key=lambda r_: -r_[1])
    return rows


def _ang_close(a, b, atol):
    """Angles equal modulo π (rotated-rect symmetry)."""
    d = (a - b + np.pi / 2) % np.pi - np.pi / 2
    return abs(d) <= atol


def compare_wbf(det, boxes, scores, labels, rotated=False) -> str:
    key = "boxes_xywhr" if rotated else "boxes_xywh"

    def matches(thr):
        want = wbf_capped_oracle(boxes, scores, labels, thr, SCORE_THR,
                                 D, rotated=rotated)
        n = int(det["count"])
        if n != len(want):
            return False
        gb = np.asarray(det[key])[:n]
        gs = np.asarray(det["scores"])[:n]
        gl = np.asarray(det["labels"])[:n]
        gi = np.asarray(det["indices"])[:n]
        for j, (wb, ws, wl, wi) in enumerate(want):
            if int(gl[j]) != wl or int(gi[j]) != wi:
                return False
            if not np.allclose(gb[j][:4], wb[:4], rtol=1e-4, atol=1e-3):
                return False
            if rotated and not _ang_close(float(gb[j][4]), wb[4], 1e-3):
                return False
            if not np.isclose(float(gs[j]), ws, rtol=1e-5, atol=1e-6):
                return False
        return True

    if matches(IOU_THR):
        return "ok"
    for t in (IOU_THR - 1e-4, IOU_THR + 1e-4):
        if matches(t):
            return "boundary"
    return "mismatch"


def _sweep(fn, n_seeds, allow_boundary_frac=0.05):
    """Run fn(seed, mode) over the full grid; fail on any mismatch,
    tolerate a small rate of threshold-boundary scenes (probIoU ops)."""
    results = {"ok": 0, "boundary": 0}
    bad = []
    for mode in MODES:
        for seed in range(n_seeds):
            r = fn(seed, mode)
            if r == "mismatch":
                bad.append((mode, seed))
            else:
                results[r] += 1
    assert not bad, f"semantic divergence in scenes {bad[:10]}"
    total = results["ok"] + results["boundary"]
    assert results["boundary"] <= allow_boundary_frac * total, results
    return results


# ---------------------------------------------------------------------------
# sweeps
# ---------------------------------------------------------------------------

def test_nms_scan_fuzz_vs_numpy_oracle():
    """240 scenes; integer coords => decisions exact, zero boundary
    cases allowed."""
    def one(seed, mode):
        boxes, scores, labels = make_scene(seed, mode)
        det = nms_scan_j(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.asarray(labels))
        return compare_nms(_nms_result(det), boxes, scores, labels,
                           nms_reference_numpy)
    res = _sweep(one, 40, allow_boundary_frac=0.0)
    assert res["ok"] == 240


def test_nms_pallas_interpret_fuzz_vs_numpy_oracle():
    """Same sweep through the Pallas kernel (interpret mode), 60 scenes
    (interpretation is slow)."""
    def one(seed, mode):
        boxes, scores, labels = make_scene(seed + 500, mode)
        return compare_nms(_pallas_nms(boxes, scores, labels),
                           boxes, scores, labels, nms_reference_numpy)
    res = _sweep(one, 10, allow_boundary_frac=0.0)
    assert res["ok"] == 60


def test_nms_rotated_fuzz_vs_numpy_oracle():
    """210 scenes incl. forced ±π/2-straddling angles; probIoU is
    transcendental so threshold-boundary scenes are classified (not
    failed) and must stay rare."""
    def one(seed, mode):
        boxes, scores, labels = make_scene(seed, mode, rotated=True)
        det = nms_rot_j(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.asarray(labels))
        return compare_nms(_nms_result(det), boxes, scores, labels,
                           nms_rotated_reference_numpy)
    _sweep(one, 35)


def test_wbf_fuzz_vs_capped_oracle():
    """240 scenes vs an independent float64 loop oracle with the slate's
    documented >max_det drop semantics; fused coords are f32 weighted
    means so boundary classification applies (IoU is measured against
    the evolving fused box, not raw integer boxes)."""
    def one(seed, mode):
        boxes, scores, labels = make_scene(seed, mode)
        det = wbf_j(jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.asarray(labels))
        return compare_wbf(det, boxes, scores, labels)
    _sweep(one, 40)


def test_wbf_rotated_fuzz_vs_capped_oracle():
    """210 scenes; doubled-angle circular-mean fusion compared modulo π,
    wrap-straddling pairs forced by the generator."""
    def one(seed, mode):
        boxes, scores, labels = make_scene(seed, mode, rotated=True)
        det = wbf_rot_j(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.asarray(labels))
        return compare_wbf(det, boxes, scores, labels, rotated=True)
    _sweep(one, 35)


@pytest.mark.parametrize("rotated", [False, True])
def test_wbf_symmetric_tie_pinned(rotated):
    """Pinned tie-break: a candidate exactly equidistant (equal IoU)
    between two open clusters must merge into the FIRST (lowest-slot)
    cluster — argmax semantics, = ZFTurbo's strict-`>` scan."""
    # clusters at x=20 and x=36; the third box at x=28 overlaps both
    # with identical IoU by symmetry
    b = [[20.0, 20, 12, 12], [36.0, 20, 12, 12], [28.0, 20, 12, 12]]
    if rotated:
        b = [r + [0.0] for r in b]
    boxes = np.asarray(b, np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    labels = np.zeros(3, np.int32)
    fn = wbf_rot_j if rotated else wbf_j
    # pad to A anchors (the jitted ops are shape-specialized)
    pb = np.zeros((A, boxes.shape[1]), np.float32)
    pb[:3] = boxes
    ps = np.zeros(A, np.float32)
    ps[:3] = scores
    pl_ = np.zeros(A, np.int32)
    det = fn(jnp.asarray(pb), jnp.asarray(ps), jnp.asarray(pl_))
    thr = 0.2   # below both overlaps; rebuild jit-free for custom thr
    fn2 = wbf_rotated_fixed if rotated else wbf_fixed
    det = fn2(jnp.asarray(pb), jnp.asarray(ps), jnp.asarray(pl_),
              iou_threshold=thr, score_threshold=0.25, max_det=D)
    assert int(det["count"]) == 2
    key = "boxes_xywhr" if rotated else "boxes_xywh"
    # merged into cluster 0 (first among equal-IoU clusters): fused
    # x = (.9*20 + .7*28)/1.6 = 23.5 with mean score (.9+.7)/2, which
    # rounds just BELOW the untouched cluster's exact 0.8 in both f32
    # and f64 — so the untouched x=36 cluster sorts first.
    np.testing.assert_allclose(float(np.asarray(det[key])[0, 0]), 36.0,
                               rtol=1e-6)
    np.testing.assert_allclose(float(np.asarray(det[key])[1, 0]), 23.5,
                               rtol=1e-5)


def test_wbf_pre_topk_exact_equivalence():
    """pre_topk truncation of the WBF candidate stream is EXACT whenever
    at most pre_topk anchors clear the score gate (sub-threshold rows
    are scan no-ops): 240 axis + 210 rotated scenes, truncated vs
    full-width, bit-compared; over-threshold-crowded scenes are skipped
    (and counted) since the contract only holds under the cap."""
    import functools as _ft
    K = 56      # A=64 scenes average ~48 above-gate anchors
    wbf_k = jax.jit(_ft.partial(
        wbf_fixed, iou_threshold=IOU_THR, score_threshold=SCORE_THR,
        max_det=D, class_aware=True, pre_topk=K))
    wbf_rot_k = jax.jit(_ft.partial(
        wbf_rotated_fixed, iou_threshold=IOU_THR,
        score_threshold=SCORE_THR, max_det=D, class_aware=True,
        pre_topk=K))
    checked = skipped = 0
    for rotated, full_j, trunc_j, key in (
            (False, wbf_j, wbf_k, "boxes_xywh"),
            (True, wbf_rot_j, wbf_rot_k, "boxes_xywhr")):
        for mode in MODES:
            for seed in range(40 if not rotated else 35):
                boxes, scores, labels = make_scene(seed, mode,
                                                   rotated=rotated)
                if (scores > SCORE_THR).sum() > K:
                    skipped += 1
                    continue
                a = full_j(jnp.asarray(boxes), jnp.asarray(scores),
                           jnp.asarray(labels))
                b = trunc_j(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(labels))
                assert int(a["count"]) == int(b["count"]), (mode, seed)
                np.testing.assert_array_equal(np.asarray(a["indices"]),
                                              np.asarray(b["indices"]))
                np.testing.assert_allclose(np.asarray(a[key]),
                                           np.asarray(b[key]),
                                           rtol=1e-6, atol=1e-5)
                np.testing.assert_allclose(np.asarray(a["scores"]),
                                           np.asarray(b["scores"]),
                                           rtol=1e-6)
                checked += 1
    assert checked >= 250, (checked, skipped)
