"""End-to-end task-family parity pins (eval/task_parity.py): the
compiled pose/obb/classify pipelines vs the independent torch/numpy
oracle pipelines, scored with the task's native metric — the
task-family mirror of tests/test_accuracy_parity.py's segment pin.

Fixture weights (xrseg_tpu.testing.detection_params) guarantee
detections for pose/obb; the task heads (keypoints / angles) stay
random-init, so keypoint and angle agreement is a real numerics check,
not a constant. 10 scenes (2 bases x augment_images)."""
import dataclasses

import jax
import numpy as np

from xrseg_tpu.config import ModelConfig, PostprocessConfig
from xrseg_tpu.eval.parity import augment_images
from xrseg_tpu.eval.task_parity import task_parity_report
from xrseg_tpu.models import yolo11
from xrseg_tpu.testing import detection_params

PCFG = PostprocessConfig(iou_threshold=0.5, score_threshold=0.3,
                         max_detections=10)


def _images(n_base=2, hw=(64, 64)):
    rng = np.random.default_rng(7)
    base = [rng.integers(0, 255, hw + (3,), dtype=np.uint8)
            for _ in range(n_base)]
    return augment_images(base)


def _mcfg(task, **kw):
    return ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                       task=task, **kw)


def test_pose_pipeline_parity_oks():
    mcfg = _mcfg("pose", kpt_shape=(5, 3))
    params = detection_params(jax.random.key(0), mcfg)
    r = task_parity_report("pose", _images(), params, mcfg, PCFG)
    assert r["n_detections_oracle"] > 0
    assert r["n_detections_ours"] == r["n_detections_oracle"], r
    assert r["oks_mAP"] >= 0.99, r
    assert r["box_mAP"] >= 0.99, r


def test_obb_pipeline_parity_rotated_ap():
    mcfg = _mcfg("obb")
    params = detection_params(jax.random.key(1), mcfg)
    r = task_parity_report("obb", _images(), params, mcfg, PCFG)
    assert r["n_detections_oracle"] > 0
    assert r["n_detections_ours"] == r["n_detections_oracle"], r
    assert r["rbox_mAP"] >= 0.99, r


def test_classify_pipeline_parity_top1():
    mcfg = _mcfg("classify", num_classes=10)
    params = yolo11.init_params(jax.random.key(2), mcfg)
    r = task_parity_report("classify", _images(), params, mcfg, PCFG)
    assert r["top1_agreement"] == 1.0, r
    assert r["prob_max_abs_diff"] < 1e-4, r
