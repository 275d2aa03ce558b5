"""Knowledge distillation (train/distill.py).

The distill losses are pinned against a from-scratch numpy recompute,
and the step is driven end to end: a random-init student trained ONLY on
the teacher's responses (no labels) must converge toward the teacher on
a fixed batch — including across generations (yolo11 teacher, yolov8
student), the expected use.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.models import yolo11
from xrseg_tpu.testing import detection_params
from xrseg_tpu.train.distill import (DistillConfig, distill_loss,
                                     distill_loss_classify,
                                     make_distill_step)
from xrseg_tpu.train.train_step import init_train_state, make_optimizer


# ---------------------------------------------------------------------------
# loss arithmetic vs numpy oracle
# ---------------------------------------------------------------------------

def test_distill_loss_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    B, A, nc, R = 2, 7, 3, 4
    t_cls = rng.normal(0, 2, (B, A, nc)).astype(np.float32)
    s_cls = rng.normal(0, 2, (B, A, nc)).astype(np.float32)
    t_box = rng.normal(0, 1, (B, A, 4 * R)).astype(np.float32)
    s_box = rng.normal(0, 1, (B, A, 4 * R)).astype(np.float32)
    dcfg = DistillConfig(temperature=2.5, cls_weight=0.7, box_weight=1.3,
                         fg_power=2.0)

    loss, aux = distill_loss(
        {"cls_logits": jnp.asarray(s_cls), "box_logits": jnp.asarray(s_box)},
        {"cls_logits": jnp.asarray(t_cls), "box_logits": jnp.asarray(t_box)},
        dcfg, R)

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    T = dcfg.temperature
    p, q = sig(t_cls / T), sig(s_cls / T)
    cls_kl = ((p * np.log(p / q)
               + (1 - p) * np.log((1 - p) / (1 - q))).sum(-1) * T * T)

    def smax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    tb = (t_box / T).reshape(B, A, 4, R)
    sb = (s_box / T).reshape(B, A, 4, R)
    pt, ps = smax(tb), smax(sb)
    box_kl = (pt * (np.log(pt) - np.log(ps))).sum(-1).mean(-1) * T * T

    w = sig(t_cls).max(-1) ** dcfg.fg_power
    w = w / w.sum()
    expect = (dcfg.cls_weight * (w * cls_kl).sum()
              + dcfg.box_weight * (w * box_kl).sum())
    np.testing.assert_allclose(float(loss), expect, rtol=2e-4)
    np.testing.assert_allclose(float(aux["distill_cls"]),
                               (w * cls_kl).sum(), rtol=2e-4)
    np.testing.assert_allclose(float(aux["distill_box"]),
                               (w * box_kl).sum(), rtol=2e-4)


def test_distill_classify_loss_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    B, nc = 5, 4
    t = rng.normal(0, 2, (B, nc)).astype(np.float32)
    s = rng.normal(0, 2, (B, nc)).astype(np.float32)
    dcfg = DistillConfig(temperature=3.0)
    loss, aux = distill_loss_classify(jnp.asarray(s), jnp.asarray(t), dcfg)

    def smax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    T = dcfg.temperature
    p, q = smax(t / T), smax(s / T)
    expect = (p * (np.log(p) - np.log(q))).sum(-1).mean() * T * T
    np.testing.assert_allclose(float(loss), expect, rtol=2e-4)


# ---------------------------------------------------------------------------
# end-to-end: student converges to the teacher (cross-generation)
# ---------------------------------------------------------------------------

def test_distill_student_learns_teacher_cross_arch():
    nc = 4
    cfg_t = ModelConfig(scale="n", task="detect", num_classes=nc,
                        input_size=(32, 32))
    cfg_s = ModelConfig(arch="yolov8", scale="n", task="detect",
                        num_classes=nc, input_size=(32, 32))
    tparams = detection_params(jax.random.key(0), cfg_t, label=2)
    opt = make_optimizer(lr=2e-3, warmup_steps=5, total_steps=80)
    state = init_train_state(jax.random.key(1), cfg_s, opt)
    step = make_distill_step(cfg_s, cfg_t, opt, DistillConfig())

    batch = {"images": jax.random.uniform(jax.random.key(2),
                                          (2, 32, 32, 3))}
    history = []
    for _ in range(60):
        state, m = step(state, tparams, batch)
        history.append((float(m["loss"]), float(m["teacher_agreement"])))
    first_losses = [l for l, _ in history[:5]]
    last_losses = [l for l, _ in history[-5:]]
    assert all(np.isfinite(l) for l, _ in history)
    assert np.mean(last_losses) < 0.5 * np.mean(first_losses), history[:3]
    # the fixture teacher fires class 2 everywhere: the student should
    # come to agree on (weighted) anchor argmax
    assert history[-1][1] > history[0][1]
    assert history[-1][1] > 0.5, history[-1]


def test_distill_classify_end_to_end():
    nc = 5
    cfg = ModelConfig(scale="n", task="classify", num_classes=nc,
                      input_size=(32, 32))
    tparams = yolo11.init_params(jax.random.key(0), cfg)
    # random init gives near-uniform logits (no signal to distill):
    # sharpen the teacher head so its per-image responses are distinctive
    tparams["cls_head"]["lin_w"] = tparams["cls_head"]["lin_w"] * 30.0
    tparams["cls_head"]["lin_b"] = jax.random.normal(
        jax.random.key(7), (nc,)) * 2.0
    opt = make_optimizer(lr=2e-3, warmup_steps=5, total_steps=80)
    state = init_train_state(jax.random.key(1), cfg, opt)
    step = make_distill_step(cfg, cfg, opt, DistillConfig())
    batch = {"images": jax.random.uniform(jax.random.key(2),
                                          (4, 32, 32, 3))}
    state, m0 = step(state, tparams, batch)
    for _ in range(50):
        state, m = step(state, tparams, batch)
    assert float(m["loss"]) < 0.5 * float(m0["loss"])
    assert float(m["teacher_agreement"]) >= float(m0["teacher_agreement"])


def test_distill_with_ground_truth_mix():
    """det_weight > 0: distillation + GT detection loss in one step."""
    nc = 3
    cfg_t = ModelConfig(scale="n", task="detect", num_classes=nc,
                        input_size=(32, 32))
    cfg_s = ModelConfig(scale="n", task="detect", num_classes=nc,
                        input_size=(32, 32))
    tparams = detection_params(jax.random.key(0), cfg_t)
    opt = make_optimizer(lr=1e-3, warmup_steps=2, total_steps=20)
    state = init_train_state(jax.random.key(1), cfg_s, opt)
    step = make_distill_step(cfg_s, cfg_t, opt,
                             DistillConfig(det_weight=1.0))
    batch = {
        "images": jax.random.uniform(jax.random.key(2), (2, 32, 32, 3)),
        "boxes_xywh": jnp.asarray([[[16.0, 16.0, 12.0, 12.0]],
                                   [[8.0, 8.0, 6.0, 6.0]]]),
        "labels": jnp.asarray([[1], [2]]),
    }
    for _ in range(3):
        state, m = step(state, tparams, batch)
    assert np.isfinite(float(m["loss"]))
    assert "gt_box" in m or any(k.startswith("gt_") for k in m)


def test_distill_sharded_step_runs():
    """DP mesh: one distillation step over the 8-device CPU mesh."""
    from xrseg_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    nc = 3
    cfg = ModelConfig(scale="n", task="detect", num_classes=nc,
                      input_size=(32, 32))
    tparams = detection_params(jax.random.key(0), cfg)
    opt = make_optimizer(lr=1e-3, warmup_steps=2, total_steps=10)
    state = init_train_state(jax.random.key(1), cfg, opt)
    step = make_distill_step(cfg, cfg, opt, DistillConfig(), mesh=mesh)
    batch = {"images": jax.random.uniform(
        jax.random.key(2), (len(jax.devices()), 32, 32, 3))}
    state, m = step(state, tparams, batch)
    assert np.isfinite(float(m["loss"]))


# ---------------------------------------------------------------------------
# config validation
# ---------------------------------------------------------------------------

def test_distill_mismatch_rejected():
    opt = make_optimizer()
    a = ModelConfig(scale="n", task="detect", num_classes=3,
                    input_size=(32, 32))
    with pytest.raises(ValueError, match="class-count"):
        make_distill_step(a, ModelConfig(scale="n", task="detect",
                                         num_classes=4,
                                         input_size=(32, 32)), opt)
    import dataclasses
    with pytest.raises(ValueError, match="reg_max"):
        make_distill_step(a, dataclasses.replace(a, reg_max=8), opt)
    with pytest.raises(ValueError, match="classify"):
        make_distill_step(a, dataclasses.replace(a, task="classify"), opt)
