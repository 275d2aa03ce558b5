"""Weighted Box Fusion (ops/wbf.py): fusion arithmetic pinned by hand
cases + a loop-based numpy oracle, then the PostprocessConfig(merge=
"wbf") pipeline path incl. TTA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrseg_tpu.ops.wbf import wbf_fixed, wbf_reference_numpy


def test_wbf_fuses_overlapping_boxes():
    boxes = jnp.asarray([[10.0, 10, 8, 8],
                         [11.0, 10, 8, 8],       # IoU ~0.78 with #0
                         [50.0, 50, 8, 8]])      # separate object
    scores = jnp.asarray([0.8, 0.6, 0.7])
    labels = jnp.asarray([3, 3, 3], jnp.int32)
    d = wbf_fixed(boxes, scores, labels, iou_threshold=0.5, max_det=5)
    assert int(d["count"]) == 2
    # cluster 0: score-weighted cx = (0.8*10 + 0.6*11)/1.4
    np.testing.assert_allclose(float(d["boxes_xywh"][0, 0]),
                               (0.8 * 10 + 0.6 * 11) / 1.4, rtol=1e-6)
    # fused score = MEAN member score
    np.testing.assert_allclose(float(d["scores"][0]), 0.7, rtol=1e-6)
    np.testing.assert_allclose(float(d["scores"][1]), 0.7, rtol=1e-6)
    # indices point at each cluster's top-scoring member
    assert int(d["indices"][0]) == 0
    assert int(d["indices"][1]) == 2
    assert not bool(d["valid"][2])


def test_wbf_class_aware_and_threshold():
    boxes = jnp.asarray([[10.0, 10, 8, 8], [10.0, 10, 8, 8],
                         [10.0, 10, 8, 8]])
    scores = jnp.asarray([0.9, 0.8, 0.05])
    labels = jnp.asarray([1, 2, 1], jnp.int32)
    d = wbf_fixed(boxes, scores, labels, iou_threshold=0.5, max_det=5,
                  score_threshold=0.1)
    # same spot, different classes -> two clusters; #2 below the gate
    assert int(d["count"]) == 2
    assert sorted(np.asarray(d["labels"])[np.asarray(d["valid"])]
                  .tolist()) == [1, 2]
    d2 = wbf_fixed(boxes, scores, labels, iou_threshold=0.5, max_det=5,
                   score_threshold=0.1, class_aware=False)
    assert int(d2["count"]) == 1


def test_wbf_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    for seed in range(5):
        r = np.random.default_rng(seed)
        A = 64
        boxes = np.stack([r.uniform(10, 54, A), r.uniform(10, 54, A),
                          r.uniform(6, 16, A), r.uniform(6, 16, A)],
                         -1).astype(np.float32)
        scores = r.uniform(0, 1, A).astype(np.float32)
        labels = r.integers(0, 3, A).astype(np.int32)
        d = wbf_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                      jnp.asarray(labels), iou_threshold=0.5,
                      score_threshold=0.2, max_det=64)
        ref = wbf_reference_numpy(boxes, scores, labels,
                                  iou_threshold=0.5, score_threshold=0.2)
        n = int(d["count"])
        assert n == len(ref)
        got_scores = np.asarray(d["scores"][:n])
        want_scores = np.asarray([r_[1] for r_ in ref])
        np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)
        got_boxes = np.asarray(d["boxes_xywh"][:n])
        want_boxes = np.stack([r_[0] for r_ in ref])
        np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-4)
        assert [int(i) for i in d["indices"][:n]] == [r_[3] for r_ in ref]


def test_wbf_pipeline_and_tta():
    """merge='wbf' through build_pipeline: plain and TTA variants run,
    TTA-WBF fuses the two views' near-identical candidates instead of
    discarding one (cluster sizes ~2)."""
    from xrseg_tpu.compile import build_pipeline
    from xrseg_tpu.config import (ExecutorConfig, ModelConfig,
                                  PostprocessConfig)
    from xrseg_tpu.testing import detection_params

    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                          num_classes=2),
        post=PostprocessConfig(max_detections=8, score_threshold=0.3,
                               merge="wbf"))
    params = detection_params(jax.random.key(0), cfg.model)
    frame = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (1, 64, 64, 3)), jnp.uint8)
    d = jax.device_get(build_pipeline(cfg, params)(frame))
    assert int(d["count"][0]) > 0
    assert np.isfinite(d["slate"]).all()
    assert (np.asarray(d["scores"][0])[np.asarray(d["valid"][0])]
            > 0.3).all()
    d2 = jax.device_get(build_pipeline(cfg, params, tta=True)(frame))
    assert int(d2["count"][0]) > 0
    assert np.isfinite(d2["slate"]).all()
    # masks still synthesize (segment default task) via top-member coefs
    assert "masks" in d2


def test_ensemble_pipeline():
    """build_ensemble_pipeline: (a) an ensemble of the SAME checkpoint
    twice collapses to the single-model detections (duplicate candidates
    fuse to themselves under WBF / suppress under NMS); (b) two distinct
    checkpoints run merged with finite output; (c) member-mismatch and
    unsupported-task guards."""
    from xrseg_tpu.compile import build_ensemble_pipeline, build_pipeline
    from xrseg_tpu.config import (ExecutorConfig, ModelConfig,
                                  PostprocessConfig)
    from xrseg_tpu.testing import detection_params

    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                          num_classes=2),
        post=PostprocessConfig(max_detections=8, score_threshold=0.3,
                               merge="wbf"))
    p1 = detection_params(jax.random.key(0), cfg.model)
    p2 = detection_params(jax.random.key(1), cfg.model)
    frame = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (1, 64, 64, 3)), jnp.uint8)

    plain = jax.device_get(build_pipeline(cfg, p1)(frame))
    dup = jax.device_get(build_ensemble_pipeline(cfg, [p1, p1])(frame))
    n = int(plain["count"][0])
    assert int(dup["count"][0]) == n
    o_p = np.argsort(-np.asarray(plain["scores"][0][:n]), kind="stable")
    o_d = np.argsort(-np.asarray(dup["scores"][0][:n]), kind="stable")
    np.testing.assert_allclose(
        np.asarray(dup["scores"][0][:n])[o_d],
        np.asarray(plain["scores"][0][:n])[o_p], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dup["boxes_xywh"][0][:n])[o_d],
        np.asarray(plain["boxes_xywh"][0][:n])[o_p], atol=1e-3)
    assert "masks" in dup                      # segment tail intact

    two = jax.device_get(build_ensemble_pipeline(cfg, [p1, p2])(frame))
    assert int(two["count"][0]) > 0
    assert np.isfinite(two["slate"]).all()

    # candidate compaction (pre_nms_topk) composes with the ensemble:
    # WBF indices stay in the PRE-compaction M*A anchor space, so the
    # member mapping (indices // A) and per-member mask synthesis hold
    # (op-level exactness of the truncation is fuzz-pinned in
    # test_geometry_fuzz.py::test_wbf_pre_topk_exact_equivalence)
    import dataclasses as _dc
    cfg_k = _dc.replace(cfg, post=_dc.replace(cfg.post, pre_nms_topk=32))
    twok = jax.device_get(build_ensemble_pipeline(cfg_k, [p1, p2])(frame))
    nk = int(twok["count"][0])
    assert nk > 0 and np.isfinite(twok["slate"]).all()
    assert "masks" in twok
    a_total = 2 * sum((64 // s) * (64 // s) for s in (8, 16, 32))
    idx = np.asarray(twok["indices"][0][:nk])
    assert (idx >= 0).all() and (idx < a_total).all()

    other = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                        num_classes=3)
    with pytest.raises(ValueError, match="share task/classes"):
        build_ensemble_pipeline(cfg, [p1, p2], model_cfgs=[cfg.model,
                                                           other])
    pose_cfg = ExecutorConfig(model=ModelConfig(
        scale="n", input_size=(64, 64), dtype="float32", task="pose"))
    with pytest.raises(ValueError, match="detect/segment"):
        build_ensemble_pipeline(pose_cfg, [p1])


def test_wbf_rotated_fuses_angles_circularly():
    from xrseg_tpu.ops.wbf import wbf_rotated_fixed

    # two rotated boxes straddling the +-pi/2 wrap: naive angle mean is
    # ~0 (wrong); the doubled-angle circular mean stays at the wrap
    boxes = jnp.asarray([[20.0, 20, 16, 6, np.pi / 2 - 0.05],
                         [20.0, 20, 16, 6, -np.pi / 2 + 0.05],
                         [60.0, 60, 16, 6, 0.3]])
    scores = jnp.asarray([0.8, 0.8, 0.7])
    labels = jnp.asarray([0, 0, 0], jnp.int32)
    d = wbf_rotated_fixed(boxes, scores, labels, iou_threshold=0.4,
                          max_det=4)
    assert int(d["count"]) == 2
    ang = float(d["boxes_xywhr"][0, 4])
    # circular mean of (pi/2-0.05) and (-pi/2+0.05) over 2*theta is
    # +-pi/2 (mod pi): |ang| ~ pi/2, NOT ~0
    assert abs(abs(ang) - np.pi / 2) < 1e-5
    np.testing.assert_allclose(float(d["boxes_xywhr"][0, 0]), 20.0,
                               rtol=1e-6)
    np.testing.assert_allclose(float(d["scores"][0]), 0.8, rtol=1e-6)
    # singleton cluster keeps its angle exactly
    np.testing.assert_allclose(float(d["boxes_xywhr"][1, 4]), 0.3,
                               atol=1e-6)


def test_wbf_rotated_pipeline():
    """merge='wbf' through the OBB pipeline (incl. TTA)."""
    from xrseg_tpu.compile import build_pipeline
    from xrseg_tpu.config import (ExecutorConfig, ModelConfig,
                                  PostprocessConfig)
    from xrseg_tpu.testing import detection_params

    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                          task="obb", num_classes=2),
        post=PostprocessConfig(max_detections=8, score_threshold=0.3,
                               merge="wbf"))
    params = detection_params(jax.random.key(0), cfg.model)
    frame = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (1, 64, 64, 3)), jnp.uint8)
    d = jax.device_get(build_pipeline(cfg, params)(frame))
    assert int(d["count"][0]) > 0
    assert np.isfinite(d["slate"]).all()
    d2 = jax.device_get(build_pipeline(cfg, params, tta=True)(frame))
    assert int(d2["count"][0]) > 0 and np.isfinite(d2["slate"]).all()
