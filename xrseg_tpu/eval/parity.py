"""End-to-end accuracy parity measurement: this framework vs an
independent torch oracle.

The BASELINE north star is perf + *mask-mAP parity*. With no COCO ground
truth in this environment, parity is measured as agreement between two
full pipelines running the same weights on the same images:

  ours:   uint8 frame -> ops.preprocess -> models.yolo11.forward ->
          ops.postprocess (threshold/NMS/mask bake) — the deployed path
  oracle: torch bilinear resize -> tests/torch_ref.full_forward (torch
          NCHW reimplementation) -> numpy threshold/NMS/mask synthesis

The oracle's detections serve as ground truth and ours are evaluated
against them with the COCO-style AP harness (eval/metrics.py), boxes and
masks separately. This mirrors the reference's own validation style
(golden outputs on bundled COCO images, README.md:14) but quantified.

Mask protocol: both sides emit sigmoid 160x160 prototype-space masks;
each is cropped to its own box (display-layer semantics,
IEMasker.cs:232-247) and thresholded at 0.5 before mask-IoU matching.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from xrseg_tpu.config import ModelConfig, PostprocessConfig
from xrseg_tpu.eval.metrics import Detection, GroundTruth, evaluate


def crop_binary_mask(mask: np.ndarray, box_xywh: np.ndarray,
                     input_size=(640, 640), threshold: float = 0.5
                     ) -> np.ndarray:
    """Threshold a sigmoid mask and zero everything outside the box
    (mask-space crop, IEMasker.cs:232-247 semantics)."""
    H, W = mask.shape
    ih, iw = input_size
    sx, sy = W / float(iw), H / float(ih)
    cx, cy, bw, bh = [float(v) for v in box_xywh]
    x1, x2 = (cx - bw / 2) * sx, (cx + bw / 2) * sx
    y1, y2 = (cy - bh / 2) * sy, (cy + bh / 2) * sy
    xs = np.arange(W)[None, :]
    ys = np.arange(H)[:, None]
    inside = (xs >= x1) & (xs <= x2) & (ys >= y1) & (ys <= y2)
    return (np.asarray(mask, np.float32) > threshold) & inside


def _our_detections(images: Sequence[np.ndarray], params,
                    mcfg: ModelConfig, pcfg: PostprocessConfig
                    ) -> List[List[Detection]]:
    """Run the deployed jitted pipeline per image -> Detection lists
    (boxes in model/640 space; masks cropped+thresholded)."""
    import jax
    import jax.numpy as jnp

    from xrseg_tpu.models import yolo11
    from xrseg_tpu.ops import preprocess as pre_ops
    from xrseg_tpu.ops.postprocess import postprocess_batch_parts

    dtype = jnp.bfloat16 if mcfg.dtype == "bfloat16" else jnp.float32

    from xrseg_tpu.precision import precision_scope

    @jax.jit
    def run(params, frames):
        with precision_scope(mcfg.matmul_precision):
            x = pre_ops.preprocess(frames, mcfg.input_size, dtype=dtype)
            out = yolo11.forward(params, x, mcfg, concat_preds=False)
            return postprocess_batch_parts(
                out["boxes_xywh"], out["cls_logits"], out["mask_coefs"],
                out["protos"], pcfg, False, mcfg.input_size,
                scores_are_logits=True)

    per_image = []
    for img in images:
        det = jax.device_get(run(params, jnp.asarray(img[None], jnp.uint8)))
        n = int(det["count"][0])
        dets = []
        for i in range(n):
            box = np.asarray(det["boxes_xywh"][0][i], np.float32)
            m = crop_binary_mask(np.asarray(det["masks"][0][i], np.float32),
                                 box, mcfg.input_size)
            dets.append(Detection(box, int(det["labels"][0][i]),
                                  float(det["scores"][0][i]), m))
        per_image.append(dets)
    return per_image


def _oracle_detections(images: Sequence[np.ndarray], params,
                       mcfg: ModelConfig, pcfg: PostprocessConfig
                       ) -> List[List[GroundTruth]]:
    import os
    import sys

    import xrseg_tpu
    tests_dir = os.path.abspath(os.path.join(
        os.path.dirname(xrseg_tpu.__file__), "..", "tests"))
    if tests_dir not in sys.path:
        sys.path.insert(0, tests_dir)
    import torch_ref
    import jax

    host_params = jax.device_get(params)
    per_image = []
    for img in images:
        x = torch_ref.oracle_preprocess(img, mcfg.input_size)
        out = torch_ref.full_forward(host_params, x, mcfg)
        dets = torch_ref.oracle_detections(out, pcfg.iou_threshold,
                                           pcfg.score_threshold,
                                           pcfg.max_detections)
        gts = []
        for d in dets:
            m = crop_binary_mask(d["mask"], d["box_xywh"], mcfg.input_size) \
                if d["mask"] is not None else None
            gts.append(GroundTruth(d["box_xywh"], d["label"], m))
        per_image.append(gts)
    return per_image


def parity_report(images: Sequence[np.ndarray], params, mcfg: ModelConfig,
                  pcfg: PostprocessConfig) -> Dict[str, float]:
    """AP agreement of the deployed pipeline vs the torch oracle.

    Returns box_mAP/box_AP50/box_AP75 and mask_mAP/mask_AP50/mask_AP75,
    plus detection-count stats.
    """
    ours = _our_detections(images, params, mcfg, pcfg)
    oracle = _oracle_detections(images, params, mcfg, pcfg)
    pairs = list(zip(ours, oracle))
    box = evaluate(pairs, use_mask=False)
    mask = evaluate(pairs, use_mask=True)
    n_ours = sum(len(d) for d in ours)
    n_oracle = sum(len(g) for g in oracle)
    return {
        "box_mAP": box["mAP"], "box_AP50": box["AP50"],
        "box_AP75": box["AP75"],
        "mask_mAP": mask["mAP"], "mask_AP50": mask["AP50"],
        "mask_AP75": mask["AP75"],
        "n_detections_ours": n_ours, "n_detections_oracle": n_oracle,
        "n_images": len(images),
    }


def augment_images(images: Sequence[np.ndarray], n_variants: int = 4,
                   seed: int = 0) -> List[np.ndarray]:
    """Expand an image set with deterministic photometric/geometric
    variants (flip, brightness, crop) to densify the parity measurement."""
    rng = np.random.default_rng(seed)
    out = [np.asarray(im, np.uint8) for im in images]
    for im in images:
        H, W = im.shape[:2]
        variants = [
            im[:, ::-1],                                        # h-flip
            np.clip(im.astype(np.int16) + 30, 0, 255),          # brighter
            np.clip(im.astype(np.float32) * 0.7, 0, 255),       # darker
            im[H // 8: H - H // 8, W // 8: W - W // 8],         # center crop
        ]
        for v in variants[:n_variants]:
            out.append(np.ascontiguousarray(v).astype(np.uint8))
        rng.shuffle(out)
    return out
