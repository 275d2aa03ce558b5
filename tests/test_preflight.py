"""HBM preflight estimator (train/preflight.py) — VERDICT r4 item 4.

Pins the estimator against the known-OOM r4 chip config: 640^2 b=8
segment training needed ~16.97 GB with the all-anchor mask loss and
~3.2 GB after the positive-slate fix (artifacts/chip_r4/
finetune640_bf16.log). The estimator must (a) grow with batch, (b)
shrink with grad_accum, (c) flag the config that really OOM'd a
15.75 GB chip when given a deliberately small budget, and (d) drive
Trainer.fit's auto-split instead of letting it die.
"""
import jax
import jax.numpy as jnp
import pytest

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.train import preflight as pf
from xrseg_tpu.train import train_step as ts


def _setup(size=128, batch=4, dtype="float32", scale="n"):
    cfg = ModelConfig(arch="yolo11", scale=scale, task="segment",
                      input_size=(size, size), num_classes=8, dtype=dtype)
    opt = ts.make_optimizer(1e-3, total_steps=100)
    state = jax.eval_shape(
        lambda: ts.init_train_state(jax.random.key(0), cfg, opt))
    return cfg, opt, state


def test_estimate_monotone_in_batch():
    cfg, opt, state = _setup()
    step = ts.make_train_step(cfg, opt)
    e4 = pf.estimate_step_bytes(step, state, pf.batch_shapes(cfg, 4, 8))
    e8 = pf.estimate_step_bytes(step, state, pf.batch_shapes(cfg, 8, 8))
    assert e8 > e4 > 0


def test_grad_accum_shrinks_estimate():
    cfg, opt, state = _setup(batch=8)
    sds = pf.batch_shapes(cfg, 8, 8)
    e1 = pf.estimate_step_bytes(ts.make_train_step(cfg, opt), state, sds)
    e4 = pf.estimate_step_bytes(
        ts.make_train_step(cfg, opt, grad_accum=4), state, sds)
    assert e4 < e1


def test_estimate_in_calibrated_range_640():
    # the r4 chip data point: 640^2 b=8 bf16 n-scale segment step used
    # ~3.2 GB (16.97 G minus the 2x 6.88 G all-anchor mask temporaries
    # the slate fix removed). The estimator must land the right order
    # of magnitude — neither "fits in 300 MB" nor "needs 30 GB".
    cfg, opt, state = _setup(size=640, batch=8, dtype="bfloat16")
    step = ts.make_train_step(cfg, opt)
    est = pf.estimate_step_bytes(step, state, pf.batch_shapes(cfg, 8, 16))
    assert 1e9 < est < 8e9, f"estimate {est/1e9:.2f} GB out of range"


def test_auto_grad_accum_engages_on_small_budget():
    cfg, opt, state = _setup(size=128, batch=8)
    sds = pf.batch_shapes(cfg, 8, 8)

    logs = []
    accum, est = pf.auto_grad_accum(
        lambda a: ts.make_train_step(cfg, opt, grad_accum=a),
        state, sds, budget=int(200e6), batch=8, log=logs.append)
    assert accum > 1
    assert any("auto-split" in m or "WARNING" in m for m in logs)


def test_auto_grad_accum_respects_data_shards():
    cfg, opt, state = _setup(size=128, batch=8)
    sds = pf.batch_shapes(cfg, 8, 8)
    accum, _ = pf.auto_grad_accum(
        lambda a: ts.make_train_step(cfg, opt, grad_accum=a),
        state, sds, budget=int(200e6), batch=8, data_shards=4,
        log=lambda m: None)
    # microbatch 8/accum must stay divisible by 4 -> accum in {1, 2}
    assert accum in (1, 2)


def test_auto_grad_accum_no_split_when_fits():
    cfg, opt, state = _setup(size=128, batch=4)
    sds = pf.batch_shapes(cfg, 4, 8)
    accum, est = pf.auto_grad_accum(
        lambda a: ts.make_train_step(cfg, opt, grad_accum=a),
        state, sds, budget=int(64e9), batch=4, log=lambda m: None)
    assert accum == 1


def test_trainer_fit_autosplits_instead_of_dying():
    # a budget chosen so b=8 doesn't fit but a smaller microbatch does:
    # fit() must run (auto-split), not raise, and still train.
    from xrseg_tpu.train import data as D
    from xrseg_tpu.train.trainer import TrainConfig, Trainer

    cfg = ModelConfig(arch="yolo11", scale="n", task="segment",
                      input_size=(64, 64), num_classes=3)
    ds = D.SyntheticShapesDataset(n=8, hw=(64, 64), n_classes=3)
    tcfg = TrainConfig(epochs=1, batch=8, max_gt=8, warmup_steps=1,
                       ema_decay=0.0, log_every=0,
                       aug=D.AugmentConfig(mosaic=0.0),
                       preflight=True, hbm_budget=int(250e6))
    tr = Trainer(cfg, tcfg)
    hist = tr.fit(ds, verbose=False)
    assert len(hist) == 1 and "loss" in hist[0]


def test_jaxpr_peak_counts_nested_and_elementwise():
    # nested scan body's temporaries count; a dying elementwise input
    # reuses its buffer (chain of adds shouldn't multiply the footprint)
    def chain(x):
        for _ in range(8):
            x = x + 1.0
        return x

    sds = jax.ShapeDtypeStruct((1024,), jnp.float32)
    est = pf.jaxpr_peak_bytes(jax.make_jaxpr(chain)(sds))
    assert est <= 3 * 1024 * 4  # not 9 live copies

    def scanned(x):
        def body(c, _):
            big = jnp.outer(c, c)           # [n,n] temporary inside body
            return c + big.sum(0), ()
        y, _ = jax.lax.scan(body, x, None, length=3)
        return y

    n = 256
    est2 = pf.jaxpr_peak_bytes(
        jax.make_jaxpr(scanned)(jax.ShapeDtypeStruct((n,), jnp.float32)))
    assert est2 >= n * n * 4  # inner outer-product surfaced
