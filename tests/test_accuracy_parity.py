"""Quantified accuracy parity: deployed pipeline vs the independent torch
oracle on the reference's bundled COCO images with its real weights.

This is the measured half of the BASELINE north star ("mask-mAP parity"):
box-AP and mask-AP agreement between the full jitted pipeline and a
torch-forward + numpy-postprocess oracle (eval/parity.py). ACCURACY.md
records the full augmented-set numbers; this test pins the floor.
"""
import glob
import os

import numpy as np
import pytest

SENTIS = "/root/reference/Assets/Resources/Model/yolo11n-seg-sentis.sentis"
IMAGES = "/root/reference/Assets/Resources/Images"

pytestmark = pytest.mark.skipif(not os.path.exists(SENTIS),
                                reason="reference assets not available")


@pytest.fixture(scope="module")
def weights():
    from xrseg_tpu.io.sentis import load_yolo11_params
    return load_yolo11_params(SENTIS)


@pytest.fixture(scope="module")
def images():
    from PIL import Image
    paths = sorted(glob.glob(os.path.join(IMAGES, "*.jpg")))
    assert len(paths) >= 5
    return [np.asarray(Image.open(p).convert("RGB"), np.uint8)
            for p in paths]


def test_fp32_parity_vs_oracle(weights, images):
    import dataclasses

    from xrseg_tpu.config import PostprocessConfig
    from xrseg_tpu.eval.parity import parity_report

    params, mcfg = weights
    mcfg = dataclasses.replace(mcfg, dtype="float32")
    pcfg = PostprocessConfig(iou_threshold=0.43, score_threshold=0.301)
    rep = parity_report(images, params, mcfg, pcfg)
    # the VERDICT r1 acceptance bar: >=0.99 box / >=0.95 mask at fp32
    assert rep["box_mAP"] >= 0.99, rep
    assert rep["mask_mAP"] >= 0.95, rep
    assert rep["n_detections_ours"] == rep["n_detections_oracle"], rep
