"""Trainer tests: fit -> history/checkpoint -> resume -> deployed-pipeline
validation mAP. Kept to one train-step compile + one pipeline compile."""
import json
import os

import numpy as np

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.train import data as D
from xrseg_tpu.train.trainer import TrainConfig, Trainer


def test_trainer_fit_evaluate_resume(tmp_path):
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32")
    ds = D.SyntheticShapesDataset(n=8, hw=(64, 64))
    tcfg = TrainConfig(epochs=1, batch=4, max_gt=4, lr=1e-3,
                       warmup_steps=2, log_every=0,
                       ckpt_dir=str(tmp_path), use_remat=False,
                       aug=D.AugmentConfig(mosaic=0.0, hsv=False,
                                           scale=0.0, translate=0.0),
                       val_max_images=4, tb_dir="auto")
    tr = Trainer(cfg, tcfg)
    hist = tr.fit(ds, val_dataset=ds, verbose=False)
    assert len(hist) == 1

    # TensorBoard scalars written and readable (train/tb.py round trip)
    from xrseg_tpu.train import tb as tb_lib
    tb_files = os.listdir(os.path.join(tmp_path, "tb"))
    assert len(tb_files) == 1
    events = list(tb_lib.read_events(
        os.path.join(tmp_path, "tb", tb_files[0])))
    epoch_rows = [e for e in events if "epoch/loss" in e["scalars"]]
    assert len(epoch_rows) == 1
    assert np.isfinite(epoch_rows[0]["scalars"]["epoch/loss"])
    assert "epoch/val_box_mAP" in epoch_rows[0]["scalars"]
    row = hist[0]
    assert np.isfinite(row["loss"]) and np.isfinite(row["grad_norm"])
    assert {"box", "cls", "dfl", "seg"} <= set(row)
    # checkpoint artifacts written
    assert os.path.exists(os.path.join(tmp_path, "state"))
    with open(os.path.join(tmp_path, "history.json")) as f:
        assert len(json.load(f)) == 1

    # validation through the real deployed pipeline (untrained-ish model:
    # mAP is a valid number in [0,1], typically 0)
    m = tr.evaluate(ds, max_images=4, batch=2)
    assert 0.0 <= m["val_box_mAP"] <= 1.0
    assert "val_box_AP50" in m

    # EMA: tracked, differs from raw params after steps, checkpointed
    assert tr.ema_params is not None
    assert not np.array_equal(np.asarray(tr.ema_params["b0"]["w"]),
                              np.asarray(tr.state.params["b0"]["w"]))
    assert os.path.exists(os.path.join(tmp_path, "ema"))

    # resume: a fresh Trainer picks up state + history + EMA untrained
    tr2 = Trainer(cfg, tcfg)
    tr2.fit(ds, resume=True, epochs=0, verbose=False)
    assert len(tr2.history) == 1
    assert int(np.asarray(tr2.state.step)) == int(np.asarray(tr.state.step))
    got = np.asarray(tr2.state.params["b0"]["w"])
    want = np.asarray(tr.state.params["b0"]["w"])
    np.testing.assert_allclose(got, want, atol=0)
    np.testing.assert_allclose(np.asarray(tr2.ema_params["b0"]["w"]),
                               np.asarray(tr.ema_params["b0"]["w"]),
                               atol=0)


def test_trainer_saves_best_checkpoint(tmp_path):
    """fit with a val set writes ckpt_dir/best (+best.json) on the first
    validated epoch and only overwrites it on improvement."""
    cfg = ModelConfig(scale="n", input_size=(32, 32), dtype="float32",
                      num_classes=3)
    ds = D.SyntheticShapesDataset(n=8, hw=(32, 32))
    tcfg = TrainConfig(epochs=1, batch=4, max_gt=4, warmup_steps=2,
                       log_every=0, ckpt_dir=str(tmp_path),
                       use_remat=False, val_max_images=4,
                       aug=D.AugmentConfig(mosaic=0.0, hsv=False,
                                           scale=0.0, translate=0.0))
    tr = Trainer(cfg, tcfg)
    tr.fit(ds, val_dataset=ds, verbose=False)
    best = os.path.join(tmp_path, "best")
    assert os.path.exists(best)
    with open(os.path.join(tmp_path, "best.json")) as f:
        row = json.load(f)
    assert "val_box_mAP" in row

    # a second epoch with no improvement must not rewrite best.json
    mtime = os.path.getmtime(os.path.join(tmp_path, "best.json"))
    tr.fit(ds, val_dataset=ds, epochs=1, verbose=False)
    m2 = tr._best_metric(tr.history[-1])
    m1 = tr._best_metric(tr.history[0])
    if m2 is not None and m1 is not None and m2 <= m1:
        assert os.path.getmtime(
            os.path.join(tmp_path, "best.json")) == mtime


def test_resume_schedule_horizon_extends(tmp_path, monkeypatch):
    """On resume, the LR schedule horizon must cover prior epochs plus the
    new call's (the restored state.step continues from the prior run);
    without this, warmup/decay misalign and a resumed run past the
    original horizon trains at the terminal LR."""
    from xrseg_tpu.train import train_step as ts_mod
    from xrseg_tpu.train import trainer as trainer_mod

    captured = []
    real_make = ts_mod.make_optimizer

    def spy(lr=1e-3, weight_decay=5e-4, warmup_steps=100, total_steps=1000):
        captured.append(total_steps)
        return real_make(lr, weight_decay, warmup_steps, total_steps)

    monkeypatch.setattr(trainer_mod.ts, "make_optimizer", spy)

    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32")
    ds = D.SyntheticShapesDataset(n=8, hw=(64, 64))
    tcfg = TrainConfig(epochs=1, batch=4, max_gt=4, warmup_steps=1,
                       log_every=0, ckpt_dir=str(tmp_path),
                       use_remat=False, ema_decay=0.0,
                       aug=D.AugmentConfig(mosaic=0.0, hsv=False,
                                           scale=0.0, translate=0.0))
    Trainer(cfg, tcfg).fit(ds, verbose=False)          # 1 epoch, 2 steps
    assert captured[-1] == 2

    tr2 = Trainer(cfg, tcfg)
    tr2.fit(ds, resume=True, epochs=1, verbose=False)  # 1 more epoch
    # horizon = (1 prior + 1 new) epochs * 2 steps, NOT just 2
    assert captured[-1] == 4
    assert len(tr2.history) == 2


def test_close_mosaic_final_epochs(tmp_path, monkeypatch):
    """close_mosaic=N: the last N epochs train through the un-collaged
    loader — observable as zero mosaic4 invocations in the final epoch
    (mosaic probability 1.0 otherwise collages every sample)."""
    calls_by_epoch = {}
    current_epoch = [0]
    real_mosaic4 = D.mosaic4

    def counting_mosaic4(*a, **k):
        e = current_epoch[0]
        calls_by_epoch[e] = calls_by_epoch.get(e, 0) + 1
        return real_mosaic4(*a, **k)

    monkeypatch.setattr(D, "mosaic4", counting_mosaic4)

    class EpochMarkingLoader(D.Loader):
        def epoch(self, epoch=0):
            current_epoch[0] = epoch
            return super().epoch(epoch)

    monkeypatch.setattr(D, "Loader", EpochMarkingLoader)

    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32")
    ds = D.SyntheticShapesDataset(n=4, hw=(64, 64))
    tcfg = TrainConfig(epochs=2, batch=2, max_gt=4, lr=1e-3,
                       warmup_steps=1, log_every=0, use_remat=False,
                       ema_decay=0.0, close_mosaic=1,
                       aug=D.AugmentConfig(mosaic=1.0, hsv=False,
                                           scale=0.0, translate=0.0,
                                           hflip=0.0))
    tr = Trainer(cfg, tcfg)
    hist = tr.fit(ds, verbose=False)
    assert len(hist) == 2
    assert calls_by_epoch.get(0, 0) > 0        # epoch 0: mosaic active
    assert calls_by_epoch.get(1, 0) == 0       # final epoch: closed
