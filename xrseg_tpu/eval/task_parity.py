"""Task-family end-to-end parity: compiled pose/obb/classify pipelines
vs independent torch/numpy oracle pipelines.

The task-family analogue of eval/parity.py's 25-scene segment protocol:
the same weights run through (a) the deployed compiled pipeline
(preprocess -> forward -> task decode -> fixed-shape NMS slate) and
(b) a torch NCHW reimplementation + naive numpy postprocess
(tests/torch_ref.py), on the same images. The oracle's outputs serve as
ground truth and ours are scored with the task's native metric:

  pose     -> OKS-AP (COCO keypoint protocol) + box AP
  obb      -> rotated AP (probIoU matching) over xywhr slates
  classify -> top-1 agreement + prob max-abs-diff

ref: these pipelines feed the reference's deployed-output contract
(IEModelEditorConverter.cs:50-58); the segment half of the story is
eval/parity.py + ACCURACY.md.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from xrseg_tpu.config import ExecutorConfig, ModelConfig, PostprocessConfig
from xrseg_tpu.eval.metrics import Detection, GroundTruth, evaluate


def _torch_ref():
    """Import tests/torch_ref.py (the independent oracle) from the
    repo's tests directory, mirroring eval/parity._oracle_detections."""
    import os
    import sys

    import xrseg_tpu
    tests_dir = os.path.abspath(os.path.join(
        os.path.dirname(xrseg_tpu.__file__), "..", "tests"))
    if tests_dir not in sys.path:
        sys.path.insert(0, tests_dir)
    import torch_ref
    return torch_ref


def _our_slates(images: Sequence[np.ndarray], params, mcfg: ModelConfig,
                pcfg: PostprocessConfig) -> List[dict]:
    """Run the deployed compiled pipeline per image, return device_get
    detection dicts (the real build_pipeline surface, not a re-jit)."""
    import jax
    import jax.numpy as jnp

    from xrseg_tpu.compile import build_pipeline
    pipe = build_pipeline(ExecutorConfig(model=mcfg, post=pcfg), params,
                          batch=1)
    return [jax.device_get(pipe(jnp.asarray(img[None], jnp.uint8)))
            for img in images]


def pose_parity_report(images: Sequence[np.ndarray], params,
                       mcfg: ModelConfig, pcfg: PostprocessConfig
                       ) -> Dict[str, float]:
    """OKS-AP + box-AP of the compiled pose pipeline vs the torch oracle
    (torch forward -> numpy class-aware NMS -> keypoint gather)."""
    tr = _torch_ref()
    import jax

    from xrseg_tpu.ops.nms import nms_reference_numpy

    host_params = jax.device_get(params)
    ours, oracle = [], []
    for img, det in zip(images, _our_slates(images, params, mcfg, pcfg)):
        n = int(det["count"][0])
        dets = []
        for i in range(n):
            k = np.asarray(det["kpts"][0][i], np.float32)
            if k.shape[-1] == 2:          # vis-less skeletons score as
                k = np.concatenate([k, np.ones_like(k[..., :1])], -1)
            dets.append(Detection(np.asarray(det["boxes_xywh"][0][i]),
                                  int(det["labels"][0][i]),
                                  float(det["scores"][0][i]), kpts=k))
        ours.append(dets)

        x = tr.oracle_preprocess(img, mcfg.input_size)
        out = tr.pose_forward(host_params, x, mcfg)
        scores = out["scores"][0]                      # [A, nc]
        best = scores.max(-1)
        labels = scores.argmax(-1)
        kept = nms_reference_numpy(out["boxes_xywh"][0], best, labels,
                                   pcfg.iou_threshold,
                                   pcfg.score_threshold,
                                   class_aware=pcfg.class_aware,
                                   max_keep=pcfg.max_detections)
        gts = []
        for i in kept:
            k = np.asarray(out["kpts"][0][i], np.float32)
            if k.shape[-1] == 2:
                k = np.concatenate([k, np.ones_like(k[..., :1])], -1)
            gts.append(GroundTruth(out["boxes_xywh"][0][i],
                                   int(labels[i]), kpts=k))
        oracle.append(gts)

    pairs = list(zip(ours, oracle))
    ap_oks = evaluate(pairs, similarity="oks")
    ap_box = evaluate(pairs, similarity="box")
    return {"oks_mAP": ap_oks["mAP"], "oks_AP50": ap_oks["AP50"],
            "box_mAP": ap_box["mAP"], "box_AP50": ap_box["AP50"],
            "n_detections_ours": sum(len(d) for d in ours),
            "n_detections_oracle": sum(len(g) for g in oracle),
            "n_images": len(images)}


def obb_parity_report(images: Sequence[np.ndarray], params,
                      mcfg: ModelConfig, pcfg: PostprocessConfig
                      ) -> Dict[str, float]:
    """Rotated AP (probIoU matching) of the compiled obb pipeline vs the
    torch oracle (torch forward -> numpy rotated NMS)."""
    tr = _torch_ref()
    import jax

    from xrseg_tpu.ops.nms import nms_rotated_reference_numpy

    host_params = jax.device_get(params)
    ours, oracle = [], []
    for img, det in zip(images, _our_slates(images, params, mcfg, pcfg)):
        n = int(det["count"][0])
        dets = []
        for i in range(n):
            r = np.asarray(det["boxes_xywhr"][0][i], np.float64)
            dets.append(Detection(r[:4], int(det["labels"][0][i]),
                                  float(det["scores"][0][i]),
                                  box_xywhr=r))
        ours.append(dets)

        x = tr.oracle_preprocess(img, mcfg.input_size)
        out = tr.obb_forward(host_params, x, mcfg)
        scores = out["scores"][0]
        best = scores.max(-1)
        labels = scores.argmax(-1)
        rboxes = np.asarray(out["boxes_xywhr"][0], np.float64)
        kept = nms_rotated_reference_numpy(rboxes, best, labels,
                                           pcfg.iou_threshold,
                                           pcfg.score_threshold,
                                           class_aware=pcfg.class_aware,
                                           max_keep=pcfg.max_detections)
        oracle.append([GroundTruth(rboxes[i][:4], int(labels[i]),
                                   box_xywhr=rboxes[i]) for i in kept])

    pairs = list(zip(ours, oracle))
    ap = evaluate(pairs, similarity="rbox")
    return {"rbox_mAP": ap["mAP"], "rbox_AP50": ap["AP50"],
            "n_detections_ours": sum(len(d) for d in ours),
            "n_detections_oracle": sum(len(g) for g in oracle),
            "n_images": len(images)}


def classify_parity_report(images: Sequence[np.ndarray], params,
                           mcfg: ModelConfig, pcfg: PostprocessConfig
                           ) -> Dict[str, float]:
    """Top-1 agreement + softmax max-abs-diff of the compiled classify
    pipeline vs the torch oracle."""
    tr = _torch_ref()
    import jax

    host_params = jax.device_get(params)
    agree = 0
    max_diff = 0.0
    slates = _our_slates(images, params, mcfg, pcfg)
    for img, det in zip(images, slates):
        probs = np.asarray(det["probs"][0], np.float64)
        x = tr.oracle_preprocess(img, mcfg.input_size)
        logits = tr.classify_forward_torch(host_params, x, mcfg)[0]
        e = np.exp(logits - logits.max())
        oprobs = e / e.sum()
        agree += int(probs.argmax() == oprobs.argmax())
        max_diff = max(max_diff, float(np.abs(probs - oprobs).max()))
    return {"top1_agreement": agree / len(images),
            "prob_max_abs_diff": max_diff, "n_images": len(images)}


TASK_REPORTS = {"pose": pose_parity_report, "obb": obb_parity_report,
                "classify": classify_parity_report}


def task_parity_report(task: str, images: Sequence[np.ndarray], params,
                       mcfg: ModelConfig, pcfg: PostprocessConfig
                       ) -> Dict[str, float]:
    return TASK_REPORTS[task](images, params, mcfg, pcfg)
