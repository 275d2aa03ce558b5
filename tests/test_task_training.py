"""Training paths for the extended task family (pose / obb / classify):
short optimization runs on exact-GT synthetic data must reduce the loss,
and the new loss arithmetic is pinned against independent numpy
recomputation."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.train import data as D
from xrseg_tpu.train import train_step as ts
from xrseg_tpu.train.losses import detection_loss


def _run_steps(cfg, batch, n_steps=12, lr=2e-3):
    opt = ts.make_optimizer(lr, warmup_steps=2, total_steps=n_steps)
    state = ts.init_train_state(jax.random.key(0), cfg, opt)
    step = ts.make_train_step(cfg, opt, use_remat=False)
    losses = []
    for _ in range(n_steps):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    return losses, state


def test_pose_training_reduces_loss():
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      task="pose", kpt_shape=(5, 3), num_classes=2)
    ds = D.SyntheticPoseDataset(n=4, hw=(64, 64))
    batch = D.collate_pose([ds[i] for i in range(4)], (64, 64), max_gt=4)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses, _ = _run_steps(cfg, batch)
    assert losses[-1] < losses[0] * 0.9, losses
    # the kpt terms are present and finite
    opt = ts.make_optimizer()
    state = ts.init_train_state(jax.random.key(0), cfg, opt)
    out = __import__("xrseg_tpu.models.yolo11", fromlist=["x"]).forward_train(
        state.params, batch["images"], cfg)
    _, aux = detection_loss(out, {k: batch[k] for k in
                                  ("boxes_xywh", "labels", "kpts")}, cfg)
    assert "kpt" in aux and "kobj" in aux


def test_obb_training_learns_rotated_box():
    """Single-image overfit: after training, the best-scoring predicted
    rotated box must overlap the GT (probIoU) far better than at init —
    the angle can only be learned through the differentiable probIoU
    term, so this checks the rotated regression path end to end.

    (Loss-value monotonicity is NOT the right signal here: the loss
    denominators change as TAL positives appear around step ~15, so raw
    loss first rises — measured and expected.)"""
    from xrseg_tpu.ops.nms import probiou_numpy

    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      task="obb", num_classes=2)
    ds = D.SyntheticOBBDataset(n=1, hw=(64, 64), max_objects=1, seed=5)
    batch = D.collate_obb([ds[0]], (64, 64), max_gt=4)
    gt = np.asarray(batch["boxes_xywhr"][0, 0])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    from xrseg_tpu.models import yolo11
    opt = ts.make_optimizer(2e-3, warmup_steps=2, total_steps=60)
    state = ts.init_train_state(jax.random.key(0), cfg, opt)
    step = ts.make_train_step(cfg, opt, use_remat=False)

    def best_box(params):
        out = jax.device_get(yolo11.forward(
            params, batch["images"], cfg, concat_preds=False))
        i = int(out["scores"][0].max(-1).argmax())
        return out["boxes_xywhr"][0, i]

    iou0 = probiou_numpy(best_box(state.params), gt)
    losses, box_losses = [], []
    for _ in range(60):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        box_losses.append(float(m["box"]))
    assert np.isfinite(losses).all(), losses
    iou1 = probiou_numpy(best_box(state.params), gt)
    # measured trajectory (r3, ROTATED assigner): probIoU 0.02 -> ~0.97 by
    # step 60 (0.999 by 120) once DFL bootstraps extents and probIoU pulls
    # the angle; total loss peaks ~step 20 (rotated candidacy admits TAL
    # positives, soft cls targets inflate the denominator) then falls
    assert iou1 > max(0.5, iou0 + 0.2), (iou0, iou1)
    assert losses[-1] < max(losses) * 0.85, losses
    assert box_losses[-1] < max(box_losses) * 0.3, box_losses

    # end-to-end: the trained model through the REAL compiled pipeline +
    # rotated-AP scorer (the task-family `val`). 60 steps localize well
    # (probIoU ~0.8) but leave confidence ~0.02 (TAL's IoU-normalized
    # soft targets rise slowly), so use a lower val gate — standard mAP
    # practice for uncalibrated scores.
    from xrseg_tpu.eval.dataset_eval import evaluate_task_dataset
    r = evaluate_task_dataset(cfg, state.params, ds, max_images=1,
                              batch=1, score_threshold=0.005)
    assert r["rbox_AP50"] > 0.9, r


def test_classify_training_reaches_high_accuracy():
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      task="classify", num_classes=3)
    ds = D.SyntheticClassifyDataset(n=8, hw=(64, 64))
    batch = D.collate_classify([ds[i] for i in range(8)], (64, 64))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    opt = ts.make_optimizer(5e-3, warmup_steps=2, total_steps=60)
    state = ts.init_train_state(jax.random.key(1), cfg, opt)
    step = ts.make_classify_train_step(cfg, opt)
    accs, losses = [], []
    for _ in range(60):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        accs.append(float(m["acc"]))
    assert np.isfinite(losses).all()
    # measured trajectory: memorizes the 8 exact-GT images by step ~50
    assert losses[-1] < losses[0] * 0.2, losses
    assert accs[-1] >= 0.9, accs

    from xrseg_tpu.eval.dataset_eval import evaluate_task_dataset
    r = evaluate_task_dataset(cfg, state.params, ds, batch=4)
    assert r["top1_acc"] >= 0.9, r


def test_kpt_loss_matches_numpy_recompute():
    """The OKS-style keypoint term, recomputed independently in numpy
    from the assignment the loss itself reports."""
    from xrseg_tpu.models import yolo11
    from xrseg_tpu.train.losses import _kpt_sigmas, assign_targets_tal

    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      task="pose", kpt_shape=(5, 3), num_classes=2)
    params = yolo11.init_params(jax.random.key(3), cfg)
    ds = D.SyntheticPoseDataset(n=2, hw=(64, 64))
    batch = D.collate_pose([ds[0]], (64, 64), max_gt=4)
    out = yolo11.forward_train(params, jnp.asarray(batch["images"]), cfg)
    tgt = {"boxes_xywh": jnp.asarray(batch["boxes_xywh"]),
           "labels": jnp.asarray(batch["labels"]),
           "kpts": jnp.asarray(batch["kpts"])}
    loss, aux = jax.device_get(detection_loss(out, tgt, cfg))

    a = jax.device_get(assign_targets_tal(
        out["boxes_xywh"][0], out["cls_logits"][0],
        tgt["boxes_xywh"][0], tgt["labels"][0], cfg))
    fg, gt_idx = a["fg"], a["gt_idx"]
    pred_k = np.asarray(jax.device_get(out["kpts"][0]), np.float64)
    gt_k = np.asarray(batch["kpts"][0], np.float64)[gt_idx]
    gt_b = np.asarray(batch["boxes_xywh"][0], np.float64)[gt_idx]
    sig = np.asarray(_kpt_sigmas(5), np.float64)
    d2 = ((pred_k[..., :2] - gt_k[..., :2]) ** 2).sum(-1)
    area = np.maximum(gt_b[:, 2] * gt_b[:, 3], 1.0)
    e = d2 / ((2 * sig[None]) ** 2) / (2 * area[:, None])
    kmask = (gt_k[..., 2] > 0.5) & fg[:, None]
    want = np.where(kmask, 1 - np.exp(-e), 0).sum() / max(kmask.sum(), 1)
    assert abs(float(aux["kpt"]) - want) < 1e-4
