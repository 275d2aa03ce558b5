"""Pseudo-labeling (train/pseudo.py): polygonization fidelity and the
teacher-detections -> COCO-JSON -> CocoDataset round trip."""
import json
import os

import numpy as np
import pytest

import jax

from xrseg_tpu.config import ExecutorConfig, ModelConfig
from xrseg_tpu.testing import detection_params
from xrseg_tpu.train.data import CocoDataset, collate, rasterize_mask
from xrseg_tpu.train.pseudo import (coco_from_samples,
                                    generate_pseudo_samples,
                                    mask_to_polygon)


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    a, b = a > 0.5, b > 0.5
    inter = float(np.logical_and(a, b).sum())
    union = float(np.logical_or(a, b).sum())
    return inter / union if union else 1.0


# ---------------------------------------------------------------------------
# mask -> polygon -> rasterize round trip
# ---------------------------------------------------------------------------

def _shapes_160():
    h = w = 160
    yy, xx = np.mgrid[0:h, 0:w]
    circle = ((xx - 80) ** 2 + (yy - 70) ** 2 < 45 ** 2)
    ellipse = (((xx - 100) / 50.0) ** 2 + ((yy - 90) / 25.0) ** 2 < 1.0)
    rect = (xx > 30) & (xx < 120) & (yy > 40) & (yy < 100)
    return {"circle": circle, "ellipse": ellipse, "rect": rect}


@pytest.mark.parametrize("name", ["circle", "ellipse", "rect"])
@pytest.mark.parametrize("step", [1, 2])
def test_mask_polygon_round_trip(name, step):
    mask = _shapes_160()[name].astype(np.float32)
    poly = mask_to_polygon(mask, step=step)
    assert poly is not None and poly.shape[1] == 2
    assert (poly >= 0).all() and (poly <= 1).all()
    back = rasterize_mask(poly, np.zeros(4), (160, 160))
    assert _iou(back, mask) > 0.93, (name, step, _iou(back, mask))


def test_mask_polygon_empty_and_single_row():
    assert mask_to_polygon(np.zeros((8, 8))) is None
    one_row = np.zeros((8, 8), np.float32)
    one_row[3, 2:6] = 1.0
    poly = mask_to_polygon(one_row)
    # degenerate (2 distinct points after the up-down walk) may be None
    # or a thin polygon; it must not crash and must stay normalized
    if poly is not None:
        assert (poly >= 0).all() and (poly <= 1).all()


# ---------------------------------------------------------------------------
# teacher detections -> samples -> COCO JSON -> CocoDataset
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pseudo_setup():
    cfg = ExecutorConfig(model=ModelConfig(scale="n", num_classes=3,
                                           input_size=(64, 64)))
    params = detection_params(jax.random.key(0), cfg.model, label=1)
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (64, 64, 3), np.uint8)
              for _ in range(3)]
    samples = generate_pseudo_samples(cfg, params, images,
                                      score_gate=0.4)
    return cfg, images, samples


def test_generate_pseudo_samples(pseudo_setup):
    _, images, samples = pseudo_setup
    assert len(samples) == 3
    for s in samples:
        assert len(s["labels"]) > 0, "fixture weights must detect"
        assert s["boxes"].shape[1] == 4
        assert (s["boxes"] >= 0).all() and (s["boxes"] <= 1).all()
        assert (s["labels"] == 1).all()
        assert any(p is not None for p in s["polys"]), "masks polygonize"


def test_coco_round_trip(pseudo_setup, tmp_path):
    from PIL import Image
    _, images, samples = pseudo_setup
    files = []
    for i, img in enumerate(images):
        fn = f"im{i}.png"
        Image.fromarray(img).save(str(tmp_path / fn))
        files.append(fn)
    coco = coco_from_samples(samples, files, ["a", "b", "c"])
    ann_path = str(tmp_path / "pseudo.json")
    with open(ann_path, "w") as f:
        json.dump(coco, f)

    ds = CocoDataset(ann_path, str(tmp_path))
    assert len(ds) == 3
    assert ds.class_names == ["a", "b", "c"]
    for i in range(3):
        got = ds[i]
        want = samples[i]
        assert len(got["labels"]) == len(want["labels"])
        np.testing.assert_allclose(got["boxes"], want["boxes"], atol=0.02)
        assert (got["labels"] == want["labels"]).all()
        # polygons survive the JSON round trip
        n_poly = sum(p is not None for p in got["polys"])
        assert n_poly == sum(p is not None for p in want["polys"])

    # and the standard collate consumes it (masks rasterized from polys)
    mcfg = ModelConfig(scale="n", task="segment", num_classes=3,
                       input_size=(64, 64))
    batch = collate([ds[i] for i in range(3)], mcfg, max_gt=8)
    assert batch["masks"].shape == (3, 8, 16, 16)
    assert batch["masks"].sum() > 0
