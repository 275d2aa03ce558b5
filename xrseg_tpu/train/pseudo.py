"""Pseudo-labeling (self-training): teacher predictions become labels.

The complement of response distillation (train/distill.py): instead of
soft logits, the teacher's HARD detections — run through the full
deployed pipeline, NMS and all — are converted into standard training
samples. Two properties distillation can't offer:

  - masks transfer: the pipeline's instance masks are polygonized into
    the Sample contract, so a student's segmentation head trains from
    unlabeled frames (mask coefficients themselves are basis-relative
    and do NOT distill — see train/distill.py);
  - the output is ordinary data: `tools/pseudo_label.py` writes a
    standard COCO instances JSON, so `examples/train.py --ann` (and any
    external tool) consumes it with zero new training code.

Polygonization uses row spans (left edge down, right edge up): exact
for row-convex regions (the overwhelming case for single-instance
sigmoid masks), fills per-row concavities/holes — the right fidelity
for GT consumed at proto resolution (rasterize_mask, train/data.py).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np


def mask_to_polygon(mask: np.ndarray, threshold: float = 0.5,
                    step: int = 1) -> Optional[np.ndarray]:
    """Binary/probability mask [h,w] -> normalized polygon [P,2]
    (x, y in [0,1]), or None for an empty mask. `step` subsamples rows
    (coarser polygons, smaller JSON)."""
    m = np.asarray(mask) > threshold
    rows = np.flatnonzero(m.any(axis=1))
    if rows.size == 0:
        return None
    if step > 1:
        keep = rows[::step]
        rows = keep if keep[-1] == rows[-1] else np.append(keep, rows[-1])
    h, w = m.shape
    sel = m[rows]
    first = np.argmax(sel, axis=1).astype(np.float32)
    last = (w - np.argmax(sel[:, ::-1], axis=1)).astype(np.float32)
    ys = (rows.astype(np.float32) + 0.5) / h
    left = np.stack([first / w, ys], axis=-1)
    right = np.stack([last / w, ys], axis=-1)
    poly = np.concatenate([left, right[::-1]], axis=0)
    return poly if len(poly) >= 3 else None


def _crop_to_box(mask: np.ndarray, box_norm: np.ndarray) -> np.ndarray:
    """Zero the mask outside the (normalized cxcywh) box — the display
    semantics (IEMasker.cs:232-247) and the right pseudo-GT: proto
    leakage outside the detection must not become a training target."""
    h, w = mask.shape
    cx, cy, bw, bh = (float(v) for v in box_norm)
    x1 = int(np.clip(np.floor((cx - bw / 2) * w), 0, w))
    x2 = int(np.clip(np.ceil((cx + bw / 2) * w), 0, w))
    y1 = int(np.clip(np.floor((cy - bh / 2) * h), 0, h))
    y2 = int(np.clip(np.ceil((cy + bh / 2) * h), 0, h))
    out = np.zeros_like(mask)
    out[y1:y2, x1:x2] = mask[y1:y2, x1:x2]
    return out


def generate_pseudo_samples(cfg, params,
                            images: Iterable[np.ndarray],
                            score_gate: float = 0.5,
                            max_det: Optional[int] = None,
                            poly_step: int = 1) -> List[Dict[str, Any]]:
    """Run the deployed pipeline over `images` (uint8 [H,W,3], any mix of
    geometries) and return train-ready Samples: {image, boxes (normalized
    cxcywh), labels, polys}. Detections below `score_gate` are dropped
    on top of the pipeline's own NMS gate.

    cfg is an ExecutorConfig; one pipeline is compiled per distinct frame
    geometry (stretch resize, so normalized model coordinates ARE
    normalized image coordinates)."""
    import dataclasses

    from xrseg_tpu.compile import build_pipeline, unpack_slate

    post = cfg.post
    if post.score_threshold > score_gate:
        # the baked gate must not exceed the requested one
        post = dataclasses.replace(post, score_threshold=score_gate)
        cfg = dataclasses.replace(cfg, post=post)
    mdet = max_det if max_det is not None else cfg.post.max_detections
    mh, mw = cfg.model.input_size

    pipes: Dict[Tuple[int, int], Any] = {}
    out: List[Dict[str, Any]] = []
    for img in images:
        img = np.asarray(img, np.uint8)
        hw = img.shape[:2]
        if hw not in pipes:
            pipes[hw] = build_pipeline(cfg, params, frame_hw=hw, batch=1)
        res = pipes[hw](img[None])
        det = unpack_slate(np.asarray(res["slate"])[0],
                           cfg.post.max_detections)
        masks = (np.asarray(res["masks"])[0] if "masks" in res else None)
        n = min(int(det["count"]), mdet)
        boxes, labels, polys = [], [], []
        for i in range(n):
            if det["scores"][i] < score_gate:
                continue
            b = det["boxes_xywh"][i] / (mw, mh, mw, mh)   # -> normalized
            b = np.clip(b, 0.0, 1.0)
            if b[2] <= 0 or b[3] <= 0:
                continue
            poly = None
            if masks is not None:
                poly = mask_to_polygon(_crop_to_box(masks[i], b),
                                       step=poly_step)
            boxes.append(b.astype(np.float32))
            labels.append(int(det["labels"][i]))
            polys.append(poly)
        out.append({
            "image": img,
            "boxes": (np.stack(boxes) if boxes
                      else np.zeros((0, 4), np.float32)),
            "labels": np.asarray(labels, np.int32),
            "polys": polys,
        })
    return out


def coco_from_samples(samples: Sequence[Dict[str, Any]],
                      file_names: Sequence[str],
                      class_names: Sequence[str]) -> Dict[str, Any]:
    """Samples -> standard COCO instances dict (polygon segmentation,
    absolute-pixel boxes; categories id 1..nc so CocoDataset's
    sorted-id remap recovers the same label indices)."""
    images, annotations = [], []
    aid = 1
    for i, (s, fn) in enumerate(zip(samples, file_names)):
        H, W = s["image"].shape[:2]
        images.append({"id": i + 1, "file_name": fn,
                       "width": W, "height": H})
        for g in range(len(s["labels"])):
            cx, cy, bw, bh = (float(v) for v in s["boxes"][g])
            ann: Dict[str, Any] = {
                "id": aid, "image_id": i + 1,
                "category_id": int(s["labels"][g]) + 1,
                "bbox": [round((cx - bw / 2) * W, 2),
                         round((cy - bh / 2) * H, 2),
                         round(bw * W, 2), round(bh * H, 2)],
                "area": round(bw * W * bh * H, 2),
                "iscrowd": 0,
            }
            poly = s["polys"][g]
            if poly is not None:
                ann["segmentation"] = [
                    [round(float(v), 2) for xy in (poly * (W, H))
                     for v in xy]]
            annotations.append(ann)
            aid += 1
    return {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c + 1, "name": (class_names[c]
                                              if c < len(class_names)
                                              else str(c))}
                       for c in range(len(class_names))],
    }
