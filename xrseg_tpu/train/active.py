"""Active-learning frame selection: spend the labeling budget wisely.

Closes the label-efficiency loop with train/distill.py and
train/pseudo.py: pseudo-label what the deployed model already knows,
and send the frames it is UNSURE about to a human. Uncertainty comes
from the deployed pipeline itself:

  - "margin": per-detection uncertainty u = 1 - |2p - 1| (maximal at
    p = 0.5, zero for confident hits and confident background); an
    image scores the sum over its near-gate detections — images full
    of borderline detections are where labels buy the most.
  - "flip": horizontal-flip disagreement — run the pipeline on the
    frame and its mirror; detections that fail to find a flipped
    match (IoU-gated, same class) are unstable under a symmetry the
    task guarantees, the classic cheap consistency probe. Twice the
    compute of "margin", catches uncertainty that calibrated-looking
    scores hide.

Both run through the standard compiled pipeline at a LOW score gate
(borderline detections must reach the scorer).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable, List, Tuple

import numpy as np


def margin_uncertainty(scores: np.ndarray) -> float:
    """Sum of per-detection uncertainty 1 - |2p - 1| over an image's
    (gate-passing) detections."""
    s = np.asarray(scores, np.float32)
    return float(np.sum(1.0 - np.abs(2.0 * s - 1.0)))


def flip_disagreement(det: Dict[str, np.ndarray],
                      det_flip: Dict[str, np.ndarray],
                      width: float, iou_gate: float = 0.5) -> float:
    """Fraction of detections (both directions) without a same-class
    flipped counterpart, weighted by score — 0 when the two views agree
    perfectly, 1 when nothing matches."""
    def boxes_of(d, flip):
        n = int(d["count"])
        b = np.asarray(d["boxes_xywh"][:n], np.float32).copy()
        if flip:
            b[:, 0] = width - b[:, 0]
        return b, np.asarray(d["labels"][:n]), \
            np.asarray(d["scores"][:n], np.float32)

    ba, la, sa = boxes_of(det, False)
    bb, lb, sb = boxes_of(det_flip, True)
    if len(ba) == 0 and len(bb) == 0:
        return 0.0

    def iou(a, b):
        ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2
        ax2, ay2 = a[0] + a[2] / 2, a[1] + a[3] / 2
        bx1, by1 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
        bx2, by2 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
        iw = np.maximum(0, np.minimum(ax2, bx2) - np.maximum(ax1, bx1))
        ih = np.maximum(0, np.minimum(ay2, by2) - np.maximum(ay1, by1))
        inter = iw * ih
        return inter / (a[2] * a[3] + b[:, 2] * b[:, 3] - inter + 1e-9)

    def unmatched_mass(b1, l1, s1, b2, l2):
        miss = 0.0
        for i in range(len(b1)):
            ok = (len(b2) > 0
                  and bool(((iou(b1[i], b2) >= iou_gate)
                            & (l2 == l1[i])).any()))
            if not ok:
                miss += float(s1[i])
        return miss

    miss = (unmatched_mass(ba, la, sa, bb, lb)
            + unmatched_mass(bb, lb, sb, ba, la))
    total = float(sa.sum() + sb.sum())
    return miss / total if total > 0 else 0.0


def rank_frames(cfg, params, images: Iterable[np.ndarray],
                strategy: str = "margin",
                score_gate: float = 0.05) -> List[Tuple[int, float]]:
    """Rank frames most-uncertain-first. `cfg` is an ExecutorConfig;
    returns [(image_index, uncertainty), ...] sorted descending.
    One pipeline compiles per distinct frame geometry."""
    from xrseg_tpu.compile import build_pipeline, unpack_slate

    if strategy not in ("margin", "flip"):
        raise ValueError(f"unknown strategy {strategy!r}")
    post = dataclasses.replace(cfg.post, score_threshold=score_gate)
    cfg = dataclasses.replace(cfg, post=post)

    pipes: Dict[Tuple[int, int], Any] = {}
    out: List[Tuple[int, float]] = []
    for i, img in enumerate(images):
        img = np.asarray(img, np.uint8)
        hw = img.shape[:2]
        if hw not in pipes:
            pipes[hw] = build_pipeline(cfg, params, frame_hw=hw, batch=1)
        pipe = pipes[hw]
        det = unpack_slate(np.asarray(pipe(img[None])["slate"])[0],
                           cfg.post.max_detections)
        n = int(det["count"])
        if strategy == "margin":
            u = margin_uncertainty(det["scores"][:n])
        else:
            det_f = unpack_slate(
                np.asarray(pipe(img[:, ::-1][None])["slate"])[0],
                cfg.post.max_detections)
            u = flip_disagreement(det, det_f, cfg.model.input_size[1])
        out.append((i, u))
    out.sort(key=lambda t: -t[1])
    return out
