"""Active-learning frame selection (train/active.py)."""
import numpy as np
import pytest

import jax

from xrseg_tpu.config import ExecutorConfig, ModelConfig
from xrseg_tpu.testing import detection_params
from xrseg_tpu.train.active import (flip_disagreement, margin_uncertainty,
                                    rank_frames)


def test_margin_uncertainty_math():
    # p=0.5 is maximally uncertain (1.0), p in {0,1} contributes 0
    assert margin_uncertainty([0.5]) == pytest.approx(1.0)
    assert margin_uncertainty([1.0, 0.0]) == pytest.approx(0.0)
    assert margin_uncertainty([0.75]) == pytest.approx(0.5)
    assert margin_uncertainty([]) == 0.0
    # borderline-rich images outrank confident ones
    assert margin_uncertainty([0.45, 0.55]) > margin_uncertainty([0.95])


def _det(boxes, labels, scores, pad=8):
    n = len(boxes)
    b = np.zeros((pad, 4), np.float32)
    l = np.zeros((pad,), np.int32)
    s = np.zeros((pad,), np.float32)
    if n:
        b[:n] = boxes
        l[:n] = labels
        s[:n] = scores
    return {"boxes_xywh": b, "labels": l, "scores": s, "count": n}


def test_flip_disagreement_cases():
    W = 100.0
    # a centered box is flip-symmetric: perfect agreement
    d = _det([[50, 50, 20, 20]], [1], [0.9])
    assert flip_disagreement(d, d, W) == pytest.approx(0.0)
    # an off-center box whose flipped twin IS detected: the flipped view
    # reports it at W - cx
    a = _det([[20, 50, 16, 16]], [2], [0.8])
    b = _det([[80, 50, 16, 16]], [2], [0.8])
    assert flip_disagreement(a, b, W) == pytest.approx(0.0)
    # the flipped view missed it entirely: full disagreement
    assert flip_disagreement(a, _det([], [], []), W) == pytest.approx(1.0)
    # same place, wrong class: disagreement too
    c = _det([[80, 50, 16, 16]], [3], [0.8])
    assert flip_disagreement(a, c, W) == pytest.approx(1.0)
    # two empty views agree
    assert flip_disagreement(_det([], [], []), _det([], [], []), W) == 0.0


def test_rank_frames_end_to_end():
    cfg = ExecutorConfig(model=ModelConfig(scale="n", num_classes=3,
                                           input_size=(64, 64)))
    params = detection_params(jax.random.key(0), cfg.model)
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (64, 64, 3), np.uint8)
              for _ in range(3)]
    ranked = rank_frames(cfg, params, images, strategy="margin")
    assert sorted(i for i, _ in ranked) == [0, 1, 2]
    us = [u for _, u in ranked]
    assert us == sorted(us, reverse=True)
    assert all(u >= 0 for u in us)
    with pytest.raises(ValueError, match="strategy"):
        rank_frames(cfg, params, images, strategy="bogus")
