"""The baked postprocess graph: raw heads -> padded detection slate + masks.

This is the TPU-native equivalent of the reference's offline model compile
step (Assets/Scripts/InferenceEngine/Editor/IEModelEditorConverter.cs:31-106):
score max/argmax, centers->corners, NMS, survivor gather, mask matmul +
sigmoid. The reference emits dynamic-N tensors; we emit a fixed
max_det-padded slate + valid count, so the whole thing jits into the forward
graph and the device never syncs with the host mid-pipeline.

Output contract (per image) mirrors the 4-output .sentis model
(IEModelEditorConverter.cs:100, read back at IEExecutor.cs:446-449):
  boxes_xywh [D,4]  — cxcywh in input(640)-pixel space
  labels     [D]    — class ids
  coefs      [D,nm] — mask coefficients (ref output2 "selectedMasks")
  masks      [D,h,w]— sigmoid instance masks (ref output3 "maskWeights")
plus `scores`, `valid`, `count` (the ref encodes validity in dynamic N).
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from xrseg_tpu.config import PostprocessConfig
from xrseg_tpu.ops import masks as mask_ops
from xrseg_tpu.ops import nms as nms_ops


def postprocess_single_parts(boxes: jax.Array, cls_scores: jax.Array,
                             coefs_all: jax.Array | None,
                             protos: jax.Array | None,
                             cfg: PostprocessConfig,
                             crop: bool = False,
                             input_size: tuple = (640, 640),
                             mask_dtype=jnp.float32,
                             scores_are_logits: bool = False,
                             with_masks: bool = True
                             ) -> Dict[str, jax.Array]:
    """Un-concatenated inputs (the hot path — avoids materializing the
    [A, 4+nc+nm] preds tensor): boxes [A,4], cls_scores [A,nc],
    coefs_all [A,nm] or None, protos [h,w,nm] or None.

    scores_are_logits: cls_scores are pre-sigmoid logits (any float dtype).
    Sigmoid is monotonic, so max/argmax/ranking/NMS run on the logits and
    the probability transform applies only to the selected top-K — this
    skips an [A,nc] fp32 sigmoid materialization per image.

    with_masks=False is the coefs-only mode: skip the [D,h,w] mask-slate
    synthesis (the dominant postprocess HBM write) and instead emit the
    gathered coefs plus the prototypes ("protos") so consumers synthesize
    individual masks on demand (ops/masks.synthesize_one_mask). The
    reference always reads back all four outputs (IEExecutor.cs:446-449);
    interactive consumers here discard 49/50 mask rows per frame.
    """
    scores = jnp.max(cls_scores, axis=-1).astype(jnp.float32)
    labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)

    if scores_are_logits:
        t = float(cfg.score_threshold)
        t = min(max(t, 1e-7), 1 - 1e-7)
        thr = float(np.log(t / (1.0 - t)))          # logit-space threshold
    else:
        thr = cfg.score_threshold

    backend = cfg.nms_backend
    if backend == "auto":
        # this function can't see whether it's vmapped over a large batch,
        # so "auto" here falls back to the portable scan path; batch-aware
        # callers (compile.build_pipeline, postprocess) resolve "auto" to
        # the pallas kernel for batch=1 on TPU (measured: -0.37 ms/frame)
        backend = "scan"
    det = nms_ops.nms_fixed(
        boxes, scores, labels,
        iou_threshold=cfg.iou_threshold, score_threshold=thr,
        pre_topk=cfg.pre_nms_topk, max_det=cfg.max_detections,
        class_aware=cfg.class_aware, backend=backend)
    if scores_are_logits:
        det["scores"] = jax.nn.sigmoid(det["scores"]) * det["valid"]

    if protos is not None and coefs_all is not None:
        coefs = coefs_all[det["indices"]]                     # [D,nm]
        coefs = coefs * det["valid"][:, None]                 # zero invalid
        det["coefs"] = coefs
        if with_masks:
            m = mask_ops.synthesize_masks(
                coefs.astype(mask_dtype), protos.astype(mask_dtype))
            if crop:
                m = mask_ops.crop_masks(m, det["boxes_xywh"], input_size)
            det["masks"] = m.astype(mask_dtype)
        else:
            det["protos"] = protos.astype(mask_dtype)
    return det


def postprocess_batch_parts(boxes: jax.Array, cls_scores: jax.Array,
                            coefs_all: jax.Array | None,
                            protos: jax.Array | None,
                            cfg: PostprocessConfig,
                            crop: bool = False,
                            input_size: tuple = (640, 640),
                            mask_dtype=jnp.float32,
                            scores_are_logits: bool = False,
                            with_masks: bool = True
                            ) -> Dict[str, jax.Array]:
    """Batched hot path: boxes [B,A,4], cls_scores [B,A,nc],
    coefs_all [B,A,nm]|None, protos [B,h,w,nm]|None.
    with_masks=False: coefs-only mode (see postprocess_single_parts).

    Same math as vmap(postprocess_single_parts) but the NMS backend is
    chosen batch-aware: on TPU the whole batch runs through ONE
    grid-blocked pallas kernel (nms_fixed_batched) — the vmapped scan
    path re-reads ~35 MB of HBM per greedy step at b=128.
    """
    scores = jnp.max(cls_scores, axis=-1).astype(jnp.float32)
    labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)

    if scores_are_logits:
        t = float(cfg.score_threshold)
        t = min(max(t, 1e-7), 1 - 1e-7)
        thr = float(np.log(t / (1.0 - t)))
    else:
        thr = cfg.score_threshold

    backend = cfg.nms_backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    if getattr(cfg, "merge", "nms") == "wbf":
        # WBF's coordinate weights must be POSITIVE probabilities, not
        # logits — convert up front and gate in probability space
        from xrseg_tpu.ops.wbf import wbf_fixed_batched
        if scores_are_logits:
            scores = jax.nn.sigmoid(scores)
        det = wbf_fixed_batched(
            boxes, scores, labels, iou_threshold=cfg.iou_threshold,
            score_threshold=cfg.score_threshold,
            max_det=cfg.max_detections, class_aware=cfg.class_aware,
            pre_topk=cfg.pre_nms_topk)
        det["scores"] = det["scores"] * det["valid"]
    else:
        det = nms_ops.nms_fixed_batched(
            boxes, scores, labels,
            iou_threshold=cfg.iou_threshold, score_threshold=thr,
            max_det=cfg.max_detections, class_aware=cfg.class_aware,
            backend=backend)
        if scores_are_logits:
            det["scores"] = jax.nn.sigmoid(det["scores"]) * det["valid"]

    if protos is not None and coefs_all is not None:
        coefs = jnp.take_along_axis(coefs_all,
                                    det["indices"][..., None], axis=1)
        coefs = coefs * det["valid"][..., None]
        det["coefs"] = coefs
        if with_masks:
            m = jax.vmap(lambda c, p: mask_ops.synthesize_masks(
                c.astype(mask_dtype), p.astype(mask_dtype)))(coefs, protos)
            if crop:
                m = jax.vmap(lambda mm, b: mask_ops.crop_masks(
                    mm, b, input_size))(m, det["boxes_xywh"])
            det["masks"] = m.astype(mask_dtype)
        else:
            det["protos"] = protos.astype(mask_dtype)
    return det


def postprocess_o2o_batch(boxes: jax.Array, cls_scores: jax.Array,
                          coefs_all: jax.Array | None,
                          protos: jax.Array | None,
                          cfg: PostprocessConfig,
                          crop: bool = False,
                          input_size: tuple = (640, 640),
                          mask_dtype=jnp.float32,
                          scores_are_logits: bool = False,
                          with_masks: bool = True
                          ) -> Dict[str, jax.Array]:
    """NMS-FREE batched postprocess for the one-to-one head
    (ModelConfig.o2o, YOLOv10-style dual assignment): the head is
    TRAINED to emit one detection per object, so deploy reduces to a
    score gate + top-K gather — the greedy-suppression loop (the one
    sequentially-dependent part of postprocess, ops/nms.py) leaves the
    compiled program entirely. Same det contract as
    postprocess_batch_parts; `indices` are anchor ids, so the shared
    mask-coefficient head gathers exactly as in the NMS path."""
    scores = jnp.max(cls_scores, axis=-1).astype(jnp.float32)  # [B,A]
    labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)
    thr = _logit_threshold(cfg, scores_are_logits)

    D = cfg.max_detections
    A = scores.shape[-1]
    top_s, idx = jax.lax.top_k(scores, min(D, A))              # [B,D]
    if A < D:                 # tiny-geometry pipelines: pad to the slate
        pad = ((0, 0), (0, D - A))
        top_s = jnp.pad(top_s, pad, constant_values=-jnp.inf)
        idx = jnp.pad(idx, pad)
    det: Dict[str, jax.Array] = {
        "indices": idx.astype(jnp.int32),
        "boxes_xywh": jnp.take_along_axis(boxes, idx[..., None], axis=1),
        "labels": jnp.take_along_axis(labels, idx, axis=1),
        "valid": top_s > thr,
    }
    det["count"] = det["valid"].sum(axis=-1).astype(jnp.int32)
    s = jax.nn.sigmoid(top_s) if scores_are_logits else top_s
    det["scores"] = s * det["valid"]

    if protos is not None and coefs_all is not None:
        coefs = jnp.take_along_axis(coefs_all,
                                    det["indices"][..., None], axis=1)
        coefs = coefs * det["valid"][..., None]
        det["coefs"] = coefs
        if with_masks:
            m = jax.vmap(lambda c, p: mask_ops.synthesize_masks(
                c.astype(mask_dtype), p.astype(mask_dtype)))(coefs, protos)
            if crop:
                m = jax.vmap(lambda mm, b: mask_ops.crop_masks(
                    mm, b, input_size))(m, det["boxes_xywh"])
            det["masks"] = m.astype(mask_dtype)
        else:
            det["protos"] = protos.astype(mask_dtype)
    return det


def _logit_threshold(cfg: PostprocessConfig, scores_are_logits: bool):
    if not scores_are_logits:
        return cfg.score_threshold
    t = min(max(float(cfg.score_threshold), 1e-7), 1 - 1e-7)
    return float(np.log(t / (1.0 - t)))


def postprocess_pose_batch(boxes: jax.Array, cls_scores: jax.Array,
                           kpts: jax.Array, cfg: PostprocessConfig,
                           scores_are_logits: bool = False,
                           backend: str = "auto") -> Dict[str, jax.Array]:
    """Pose task: standard (axis-aligned) NMS on boxes [B,A,4] +
    cls_scores [B,A,nc], then gather each survivor's decoded keypoints
    kpts [B,A,K,D] -> det["kpts"] [B,max_det,K,D]."""
    scores = jnp.max(cls_scores, axis=-1).astype(jnp.float32)
    labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    det = nms_ops.nms_fixed_batched(
        boxes, scores, labels, iou_threshold=cfg.iou_threshold,
        score_threshold=_logit_threshold(cfg, scores_are_logits),
        max_det=cfg.max_detections, class_aware=cfg.class_aware,
        backend=backend)
    if scores_are_logits:
        det["scores"] = jax.nn.sigmoid(det["scores"]) * det["valid"]
    k = jnp.take_along_axis(kpts, det["indices"][..., None, None], axis=1)
    det["kpts"] = k * det["valid"][..., None, None]
    return det


def postprocess_obb_batch(boxes_xywhr: jax.Array, cls_scores: jax.Array,
                          cfg: PostprocessConfig,
                          scores_are_logits: bool = False,
                          backend: str = "auto") -> Dict[str, jax.Array]:
    """OBB task: rotated (probIoU) NMS on boxes_xywhr [B,A,5]; slate key
    is "boxes_xywhr" [B,max_det,5] (cx, cy, w, h, angle_rad)."""
    scores = jnp.max(cls_scores, axis=-1).astype(jnp.float32)
    labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    if getattr(cfg, "merge", "nms") == "wbf":
        # positive probability weights (see postprocess_batch_parts)
        from xrseg_tpu.ops.wbf import wbf_rotated_fixed_batched
        if scores_are_logits:
            scores = jax.nn.sigmoid(scores)
        det = wbf_rotated_fixed_batched(
            boxes_xywhr, scores, labels,
            iou_threshold=cfg.iou_threshold,
            score_threshold=cfg.score_threshold,
            max_det=cfg.max_detections, class_aware=cfg.class_aware,
            pre_topk=cfg.pre_nms_topk)
        det["scores"] = det["scores"] * det["valid"]
        return det
    det = nms_ops.nms_fixed_rotated_batched(
        boxes_xywhr, scores, labels, iou_threshold=cfg.iou_threshold,
        score_threshold=_logit_threshold(cfg, scores_are_logits),
        max_det=cfg.max_detections, class_aware=cfg.class_aware,
        backend=backend)
    if scores_are_logits:
        det["scores"] = jax.nn.sigmoid(det["scores"]) * det["valid"]
    return det


def postprocess_single(preds: jax.Array, protos: jax.Array | None,
                       cfg: PostprocessConfig, num_classes: int = 80,
                       crop: bool = False,
                       input_size: tuple = (640, 640)) -> Dict[str, jax.Array]:
    """preds: [A, 4+nc(+nm)]; protos: [h,w,nm] or None (detect-only)."""
    coefs_all = preds[:, 4 + num_classes:] if protos is not None else None
    return postprocess_single_parts(
        preds[:, :4], preds[:, 4:4 + num_classes], coefs_all, protos, cfg,
        crop, input_size)


@partial(jax.jit, static_argnames=("num_classes", "crop", "input_size",
                                   "iou", "score", "pre_topk", "max_det",
                                   "nms_backend"))
def _postprocess_batch_impl(preds, protos, *, num_classes, crop, input_size,
                            iou, score, pre_topk, max_det,
                            nms_backend="auto"):
    cfg = PostprocessConfig(iou_threshold=iou, score_threshold=score,
                            pre_nms_topk=pre_topk, max_detections=max_det,
                            nms_backend=nms_backend)
    fn = lambda p, pr: postprocess_single(p, pr, cfg, num_classes, crop,
                                          input_size)
    if protos is None:
        return jax.vmap(lambda p: postprocess_single(
            p, None, cfg, num_classes, crop, input_size))(preds)
    return jax.vmap(fn)(preds, protos)


def postprocess(preds: jax.Array, protos: jax.Array | None,
                cfg: PostprocessConfig, num_classes: int = 80,
                crop: bool = False,
                input_size: tuple = (640, 640)) -> Dict[str, jax.Array]:
    """Batched postprocess: preds [B,A,C], protos [B,h,w,nm] -> [B,D,...]."""
    backend = cfg.nms_backend
    if backend == "auto":
        import jax as _jax
        backend = ("pallas" if preds.shape[0] == 1
                   and _jax.default_backend() == "tpu" else "scan")
    return _postprocess_batch_impl(
        preds, protos, num_classes=num_classes, crop=crop,
        input_size=tuple(input_size), iou=cfg.iou_threshold,
        score=cfg.score_threshold, pre_topk=cfg.pre_nms_topk,
        max_det=cfg.max_detections, nms_backend=backend)
