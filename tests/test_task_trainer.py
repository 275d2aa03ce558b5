"""Trainer.fit() over the task family (pose / obb / classify): the same
high-level loop (Loader augmentation, EMA, checkpoints, deployed-pipeline
validation) the detect/segment path gets, dispatched by cfg.task.

Kept to one train-step compile + one val-pipeline compile per task.
"""
import os

import numpy as np
import pytest

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.train import data as D
from xrseg_tpu.train.trainer import TrainConfig, Trainer

NO_AUG = D.AugmentConfig(mosaic=0.0, hflip=0.0, hsv=False,
                         scale=0.0, translate=0.0)


# ---------------------------------------------------------------------------
# geometry-aware task augmentation (host-only, no jit)
# ---------------------------------------------------------------------------

def test_hflip_pose_mirrors_and_permutes():
    ds = D.SyntheticPoseDataset(n=2, hw=(64, 64), max_objects=1)
    s = ds[0]
    flip_idx = [0, 4, 3, 2, 1]       # N stays, E<->W, S stays (symmetric)
    f = D.hflip_pose_sample(s, flip_idx)
    np.testing.assert_allclose(f["boxes"][:, 0], 1.0 - s["boxes"][:, 0],
                               atol=1e-6)
    np.testing.assert_array_equal(f["image"], s["image"][:, ::-1])
    # keypoint 1 of the flipped sample is source keypoint 4, x-mirrored
    np.testing.assert_allclose(f["kpts"][0, 1, 0],
                               1.0 - s["kpts"][0, 4, 0], atol=1e-6)
    np.testing.assert_allclose(f["kpts"][0, 1, 1], s["kpts"][0, 4, 1],
                               atol=1e-6)


def test_hflip_pose_keeps_invisible_slots_zero():
    s = {"image": np.zeros((8, 8, 3), np.uint8),
         "boxes": np.asarray([[0.3, 0.5, 0.2, 0.2]], np.float32),
         "labels": np.asarray([0], np.int32),
         "kpts": np.asarray([[[0.3, 0.5, 1.0], [0.0, 0.0, 0.0]]],
                            np.float32)}
    f = D.hflip_pose_sample(s)
    np.testing.assert_allclose(f["kpts"][0, 0], [0.7, 0.5, 1.0], atol=1e-6)
    np.testing.assert_allclose(f["kpts"][0, 1], [0.0, 0.0, 0.0])


def test_hflip_obb_mirrors_angle_into_model_range():
    s = {"image": np.zeros((8, 8, 3), np.uint8),
         "boxes_xywhr": np.asarray(
             [[0.3, 0.5, 0.2, 0.1, np.deg2rad(30)],
              [0.6, 0.5, 0.2, 0.1, np.deg2rad(120)]], np.float32),
         "labels": np.asarray([0, 1], np.int32)}
    f = D.hflip_obb_sample(s)
    np.testing.assert_allclose(f["boxes_xywhr"][:, 0], [0.7, 0.4],
                               atol=1e-6)
    # a -> pi - a, folded into (-pi/4, 3pi/4): 30 -> 150 -> -30; 120 -> 60
    np.testing.assert_allclose(
        f["boxes_xywhr"][:, 4], np.deg2rad([-30, 60]), atol=1e-5)
    # w/h unchanged (they ride their edges through the mirror)
    np.testing.assert_allclose(f["boxes_xywhr"][:, 2:4],
                               s["boxes_xywhr"][:, 2:4], atol=1e-6)


def test_hflip_obb_double_flip_roundtrips():
    rng = np.random.default_rng(0)
    b = np.stack([rng.uniform(0.2, 0.8, 4).astype(np.float32).tolist()
                  + [float(rng.uniform(-np.pi / 4, 3 * np.pi / 4))]
                  for _ in range(16)]).astype(np.float32)
    s = {"image": np.zeros((8, 8, 3), np.uint8), "boxes_xywhr": b,
         "labels": np.zeros(16, np.int32)}
    ff = D.hflip_obb_sample(D.hflip_obb_sample(s))
    np.testing.assert_allclose(ff["boxes_xywhr"], b, atol=1e-5)


def test_classification_loss_masks_padding():
    import jax.numpy as jnp

    from xrseg_tpu.train.losses import classification_loss
    logits = jnp.asarray([[4.0, 0.0, 0.0], [0.0, 4.0, 0.0],
                          [9.0, 0.0, 0.0]])
    # row 2 is padding (label -1): must not contribute to CE or acc
    loss_pad, aux_pad = classification_loss(
        logits, jnp.asarray([0, 1, -1]))
    loss_real, aux_real = classification_loss(
        logits[:2], jnp.asarray([0, 1]))
    np.testing.assert_allclose(float(loss_pad), float(loss_real),
                               rtol=1e-6)
    assert float(aux_pad["acc"]) == float(aux_real["acc"]) == 1.0


# ---------------------------------------------------------------------------
# Loader dispatch (host batches only — cheap)
# ---------------------------------------------------------------------------

def test_loader_emits_pose_batches():
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      task="pose", kpt_shape=(5, 3), num_classes=2)
    ds = D.SyntheticPoseDataset(n=8, hw=(64, 64), max_objects=1)
    loader = D.Loader(ds, cfg, batch=4, max_gt=4, aug=NO_AUG)
    b = next(loader._host_batches(0))
    assert b["images"].shape == (4, 64, 64, 3)
    assert b["kpts"].shape == (4, 4, 5, 3)
    assert b["boxes_xywh"].shape == (4, 4, 4)
    # px-space boxes
    assert b["boxes_xywh"].max() > 1.5


def test_loader_emits_classify_batches_padded():
    cfg = ModelConfig(scale="n", input_size=(32, 32), dtype="float32",
                      task="classify", num_classes=3)
    ds = D.SyntheticClassifyDataset(n=6, hw=(32, 32))
    loader = D.Loader(ds, cfg, batch=4, aug=NO_AUG, drop_last=False)
    batches = list(loader._host_batches(0))
    assert len(batches) == 2
    # final partial batch padded to fixed shape with -1 labels
    assert batches[1]["images"].shape == (4, 32, 32, 3)
    assert (batches[1]["labels"] == -1).sum() == 2
    assert batches[1]["sample_weight"].tolist() == [1, 1, 0, 0]


def test_loader_obb_hflip_deterministic():
    """Same (seed, epoch) -> identical augmented batches (the Loader's
    reproducibility contract holds on the task path too)."""
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      task="obb", num_classes=2)
    ds = D.SyntheticOBBDataset(n=8, hw=(64, 64), max_objects=1)
    aug = D.AugmentConfig(mosaic=0.0, hflip=0.5, hsv=True,
                          scale=0.0, translate=0.0)
    mk = lambda: next(D.Loader(ds, cfg, batch=8, max_gt=4,
                               aug=aug)._host_batches(0))
    b1, b2 = mk(), mk()
    np.testing.assert_array_equal(b1["images"], b2["images"])
    np.testing.assert_allclose(b1["boxes_xywhr"], b2["boxes_xywhr"])


# ---------------------------------------------------------------------------
# Trainer.fit per task (one compile each)
# ---------------------------------------------------------------------------

def test_trainer_fit_pose_with_validation(tmp_path):
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      task="pose", kpt_shape=(5, 3), num_classes=2)
    ds = D.SyntheticPoseDataset(n=8, hw=(64, 64), max_objects=1)
    tcfg = TrainConfig(epochs=1, batch=4, max_gt=4, lr=1e-3,
                       warmup_steps=2, log_every=0, use_remat=False,
                       aug=NO_AUG, val_max_images=4,
                       kpt_flip_idx=(0, 4, 3, 2, 1))
    tr = Trainer(cfg, tcfg)
    hist = tr.fit(ds, val_dataset=ds, verbose=False)
    row = hist[0]
    assert np.isfinite(row["loss"]) and np.isfinite(row["grad_norm"])
    assert "kpt" in row                       # pose loss component
    assert 0.0 <= row["val_oks_mAP"] <= 1.0
    assert "val_oks_AP50" in row
    # EMA tracked for tasks too
    assert tr.ema_params is not None


def test_trainer_fit_obb(tmp_path):
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      task="obb", num_classes=2)
    ds = D.SyntheticOBBDataset(n=8, hw=(64, 64), max_objects=1)
    tcfg = TrainConfig(epochs=1, batch=4, max_gt=4, lr=1e-3,
                       warmup_steps=2, log_every=0, use_remat=False,
                       aug=NO_AUG, val_max_images=4)
    tr = Trainer(cfg, tcfg)
    hist = tr.fit(ds, val_dataset=ds, verbose=False)
    row = hist[0]
    assert np.isfinite(row["loss"])
    assert 0.0 <= row["val_rbox_mAP"] <= 1.0


def test_trainer_fit_classify_resume(tmp_path):
    cfg = ModelConfig(scale="n", input_size=(32, 32), dtype="float32",
                      task="classify", num_classes=3)
    ds = D.SyntheticClassifyDataset(n=8, hw=(32, 32))
    tcfg = TrainConfig(epochs=2, batch=4, lr=2e-3, warmup_steps=2,
                       log_every=0, use_remat=False, aug=NO_AUG,
                       ckpt_dir=str(tmp_path), val_max_images=8)
    tr = Trainer(cfg, tcfg)
    hist = tr.fit(ds, val_dataset=ds, verbose=False)
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["loss"])
    assert "acc" in hist[-1]
    assert 0.0 <= hist[-1]["val_top1_acc"] <= 1.0
    # 4 tiny warmup steps don't guarantee a loss drop (convergence is
    # pinned by test_task_training.py); here assert the step ran for real
    assert hist[-1]["loss"] != hist[0]["loss"]
    assert os.path.exists(os.path.join(tmp_path, "state"))
    # best checkpoint keyed on the task metric
    assert os.path.exists(os.path.join(tmp_path, "best"))

    # resume continues step count
    tr2 = Trainer(cfg, tcfg)
    tr2.fit(ds, resume=True, epochs=0, verbose=False)
    assert int(np.asarray(tr2.state.step)) == int(np.asarray(tr.state.step))
