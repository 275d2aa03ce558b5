"""High-level training loop: Trainer.fit() over the data pipeline.

Ties the training subsystem together (everything the inference-only
reference lacks, SURVEY §5 "checkpoint/resume: N/A"):

  data.Loader  ->  train_step.make_train_step (DP/TP-sharded)  ->
  per-epoch metrics -> optional validation mAP (eval/metrics over the
  deployed inference pipeline) -> orbax TrainState checkpoints with resume.

Design notes (TPU-shaped):
  - one compile per shape: every batch has identical shapes (data.collate
    pads), so the jitted step compiles once per fit() — or once per scale
    bucket when multi-scale training (TrainConfig.scales) is on;
  - host/device overlap: the Loader prefetches + shards the next batch on
    a background thread while the device steps;
  - validation runs through the REAL deployed pipeline (compile.
    build_pipeline: preprocess + forward + baked NMS/mask postprocess),
    not a shortcut eval head — the mAP you see is the mAP you deploy.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.train import data as data_lib
from xrseg_tpu.train import train_step as ts


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 10
    batch: int = 16
    lr: float = 1e-3
    weight_decay: float = 5e-4
    warmup_steps: int = 100
    max_gt: int = 16
    seed: int = 0
    aug: data_lib.AugmentConfig = data_lib.AugmentConfig()
    tp_min_channels: int = 100000      # TP off by default (DP-only)
    # FSDP/ZeRO-3: shard params + optimizer moments over the mesh's data
    # axis (train_step.make_train_step fsdp docs). Requires a mesh;
    # single-process only (multi-host keeps full host-local state).
    fsdp: bool = False
    # split each batch into A sequential microbatches inside the jitted
    # step (grads averaged before the one optimizer update): large
    # effective batch without the full batch's activation HBM
    grad_accum: int = 1
    # HBM preflight (train/preflight.py): estimate the step's peak HBM
    # from static shapes BEFORE compiling and auto-raise grad_accum with
    # a logged warning instead of dying in the XLA memory assigner
    # (the r4 640^2 chip-queue failure mode). Skipped on CPU unless
    # hbm_budget is set explicitly (bytes).
    preflight: bool = True
    hbm_budget: Optional[int] = None
    use_remat: bool = True
    log_every: int = 10
    ckpt_dir: Optional[str] = None     # directory for checkpoints + history
    ckpt_every_epochs: int = 1
    # TensorBoard scalars (train/tb.py, dependency-free tfevents writer):
    # per-step loss at log_every cadence + the full per-epoch history row.
    # None = off; "auto" = <ckpt_dir>/tb when ckpt_dir is set.
    tb_dir: Optional[str] = None
    # validation postprocess: low score gate + high cap, the standard mAP
    # evaluation setting (the deployed 0.301 gate would clip the PR curve)
    val_score_threshold: float = 0.05
    val_max_detections: int = 50
    val_max_images: int = 64
    # exponential moving average of params (the YOLO-family eval/deploy
    # weights); 0 disables. Validation and `best` params use the EMA.
    ema_decay: float = 0.9995
    # multi-scale training: tuple of (H,W) buckets (multiples of 32), e.g.
    # ((512,512),(576,576),(640,640),(704,704)). None = fixed cfg size.
    # Each bucket compiles its own train-step specialization once.
    scales: Optional[tuple] = None
    # keep a separate `best` checkpoint of the eval (EMA) params whenever
    # validation improves (metric: val_mask_mAP for segment when present,
    # else val_box_mAP; tasks: val_oks_mAP / val_rbox_mAP / val_top1_acc)
    save_best: bool = True
    # pose: keypoint left/right permutation applied on hflip augmentation
    # (COCO-style skeletons swap left/right joints under a mirror)
    kpt_flip_idx: Optional[tuple] = None
    # disable mosaic/mixup for the LAST N epochs (ultralytics
    # close_mosaic: the model re-adapts to un-collaged deployment
    # statistics before the run ends). 0 = off.
    close_mosaic: int = 0
    # classify-task CE label smoothing (ultralytics' label_smoothing arg
    # applies to classification; detection tasks unaffected)
    label_smoothing: float = 0.0


class Trainer:
    """fit()/evaluate() around the sharded train step.

    mesh: optional jax.sharding.Mesh — batches shard over its "data" axis
    and gradients all-reduce over ICI purely from sharding annotations.
    """

    def __init__(self, cfg: ModelConfig, tcfg: TrainConfig = TrainConfig(),
                 mesh=None, params=None):
        import jax

        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = mesh
        self._jax = jax
        self.optimizer = None          # built in fit (needs total_steps)
        self.state: Optional[ts.TrainState] = None
        self._init_params = params
        self.history: List[Dict] = []
        self.ema_params = None         # EMA pytree (tracks state.params)
        self._ema_update = None        # jitted EMA step
        self._val_pipe = None          # cached validation pipeline

    # -- state ----------------------------------------------------------

    def _ckpt_path(self) -> Optional[str]:
        if self.tcfg.ckpt_dir is None:
            return None
        return os.path.join(self.tcfg.ckpt_dir, "state")

    def _load_history(self) -> None:
        if self.tcfg.ckpt_dir is None or self.history:
            return
        hist = os.path.join(self.tcfg.ckpt_dir, "history.json")
        if os.path.exists(hist):
            with open(hist) as f:
                self.history = json.load(f)

    def _init_state(self, total_steps: int, resume: bool) -> None:
        jax = self._jax
        t = self.tcfg
        self.optimizer = ts.make_optimizer(
            t.lr, t.weight_decay, t.warmup_steps,
            total_steps=max(total_steps, t.warmup_steps + 1))
        state = ts.init_train_state(jax.random.key(t.seed), self.cfg,
                                    self.optimizer)
        if self._init_params is not None:
            # transfer-grafted trees can differ in hidden widths (e.g. the
            # rescued cls stack keeps the donor's c3), so the optimizer
            # state must be built FROM the injected params, not the fresh
            # init tree
            state = ts.TrainState(params=self._init_params,
                                  opt_state=self.optimizer.init(
                                      self._init_params),
                                  step=state.step)
        path = self._ckpt_path()
        if resume and path and os.path.exists(path):
            state = ts.load_train_state(path, state)
            self._load_history()
        if self.mesh is not None:
            state = ts.shard_train_state(state, self.mesh,
                                         t.tp_min_channels, fsdp=t.fsdp)
        self.state = state
        if t.ema_decay > 0:
            jax = self._jax
            ema_path = (os.path.join(t.ckpt_dir, "ema")
                        if t.ckpt_dir else None)
            if resume and ema_path and os.path.exists(ema_path):
                from xrseg_tpu.io.weights import load_orbax
                self.ema_params = load_orbax(
                    ema_path, like=jax.device_get(state.params))
            else:
                # real copies: the EMA buffers are donated on update, so
                # they must not alias state.params
                self.ema_params = jax.tree.map(lambda x: x.copy(),
                                               state.params)
            d = t.ema_decay
            # ultralytics-style ramp: effective decay grows with step so
            # early EMA tracks fast-moving fresh weights
            def ema_step(ema, params, step):
                import jax.numpy as jnp
                dd = d * (1.0 - jnp.exp(-(step.astype(jnp.float32) + 1.0)
                                        / 2000.0))
                return jax.tree.map(lambda e, p: e * dd + p * (1.0 - dd),
                                    ema, params)
            self._ema_update = jax.jit(ema_step, donate_argnums=(0,))

    def save(self) -> Optional[str]:
        path = self._ckpt_path()
        if path is None or self.state is None:
            return None
        os.makedirs(self.tcfg.ckpt_dir, exist_ok=True)
        ts.save_train_state(path, self.state)
        if self.ema_params is not None:
            from xrseg_tpu.io.weights import save_orbax
            jax = self._jax
            save_orbax(os.path.join(self.tcfg.ckpt_dir, "ema"),
                       jax.device_get(self.ema_params))
        with open(os.path.join(self.tcfg.ckpt_dir, "history.json"),
                  "w") as f:
            json.dump(self.history, f, indent=1)
        return path

    @property
    def params(self):
        assert self.state is not None, "fit() or _init_state() first"
        return self.state.params

    @property
    def eval_params(self):
        """What you validate/deploy: the EMA weights when enabled."""
        return self.ema_params if self.ema_params is not None else self.params

    # -- training -------------------------------------------------------

    def fit(self, dataset, val_dataset=None, resume: bool = False,
            epochs: Optional[int] = None, verbose: bool = True
            ) -> List[Dict]:
        """Train for `epochs` over `dataset`; returns per-epoch history
        [{epoch, loss, box, cls, dfl, seg?, grad_norm, sec,
          val_box_mAP?, val_mask_mAP?}, ...]."""
        jax = self._jax
        t = self.tcfg
        epochs = t.epochs if epochs is None else epochs
        loader = data_lib.Loader(dataset, self.cfg, t.batch,
                                 max_gt=t.max_gt, aug=t.aug, seed=t.seed,
                                 mesh=self.mesh, scales=t.scales,
                                 kpt_flip_idx=t.kpt_flip_idx)
        closed_loader = None
        if t.close_mosaic > 0 and (t.aug.mosaic > 0 or t.aug.mixup > 0):
            # ultralytics' close_mosaic: the final N epochs train on
            # un-collaged images so the model re-adapts to deployment
            # statistics. Same seed => identical shuffle order; only the
            # augmentation recipe differs.
            closed_aug = dataclasses.replace(t.aug, mosaic=0.0, mixup=0.0)
            closed_loader = data_lib.Loader(
                dataset, self.cfg, t.batch, max_gt=t.max_gt,
                aug=closed_aug, seed=t.seed, mesh=self.mesh,
                scales=t.scales, kpt_flip_idx=t.kpt_flip_idx)
        steps_per_epoch = loader.steps_per_epoch()
        if self.state is None:
            # On resume the restored state.step continues from the prior
            # run, so the LR schedule horizon must cover epochs already
            # trained PLUS this call's — otherwise warmup/decay misalign
            # and a run past the horizon trains at the terminal LR.
            if resume:
                self._load_history()
            self._init_state(steps_per_epoch * (len(self.history) + epochs),
                             resume)
        def build_step(accum: int):
            return ts.make_train_step(self.cfg, self.optimizer,
                                      mesh=self.mesh,
                                      tp_min_channels=t.tp_min_channels,
                                      use_remat=t.use_remat, fsdp=t.fsdp,
                                      grad_accum=accum,
                                      label_smoothing=t.label_smoothing)

        grad_accum = t.grad_accum
        if t.preflight:
            try:
                from xrseg_tpu.train import preflight as pf
                budget = t.hbm_budget or pf.hbm_budget_bytes()
                if budget:
                    shards = self.mesh.shape["data"] if self.mesh else 1
                    # estimate at the LARGEST configured shape (multi-
                    # scale: the biggest bucket dominates the peak)
                    hw = max(t.scales) if t.scales else self.cfg.input_size
                    sds = pf.batch_shapes(self.cfg, t.batch, t.max_gt,
                                          input_hw=hw)
                    grad_accum, est = pf.auto_grad_accum(
                        build_step, self.state, sds, budget, t.batch,
                        start=t.grad_accum, data_shards=shards)
                    if verbose:
                        print(f"preflight: estimated step peak "
                              f"{est/1e9:.2f} GB (budget "
                              f"{budget/1e9:.2f} GB, "
                              f"grad_accum={grad_accum})", flush=True)
            except Exception as e:  # estimator must never kill a run
                print(f"preflight: skipped ({type(e).__name__}: {e})",
                      flush=True)
                grad_accum = t.grad_accum
        step_fn = build_step(grad_accum)
        tb = None
        tb_dir = t.tb_dir
        if tb_dir == "auto":
            tb_dir = os.path.join(t.ckpt_dir, "tb") if t.ckpt_dir else None
        if tb_dir:
            from xrseg_tpu.train.tb import TBWriter
            tb = TBWriter(tb_dir)
        start_epoch = len(self.history)
        end_epoch = start_epoch + epochs
        for e in range(start_epoch, end_epoch):
            t0 = time.perf_counter()
            sums: Dict[str, float] = {}
            n = 0
            use_loader = (closed_loader if closed_loader is not None
                          and e >= end_epoch - t.close_mosaic else loader)
            for batch in use_loader.epoch(e):
                self.state, metrics = step_fn(self.state, batch)
                if self._ema_update is not None:
                    self.ema_params = self._ema_update(
                        self.ema_params, self.state.params,
                        self.state.step)
                m = jax.device_get(metrics)
                for k, v in m.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                n += 1
                if t.log_every and n % t.log_every == 0:
                    if verbose:
                        print(f"epoch {e} step {n}/{steps_per_epoch} "
                              f"loss={float(m['loss']):.4f}", flush=True)
                    if tb is not None:
                        tb.add_scalars(
                            {f"train/{k}": v for k, v in m.items()},
                            step=e * steps_per_epoch + n)
            row = {"epoch": e,
                   **{k: v / max(n, 1) for k, v in sums.items()},
                   "sec": time.perf_counter() - t0}
            if val_dataset is not None:
                row.update(self.evaluate(val_dataset,
                                         max_images=t.val_max_images))
                self._maybe_save_best(row)
            self.history.append(row)
            if tb is not None:
                tb.add_scalars({f"epoch/{k}": v for k, v in row.items()
                                if k != "epoch"}, step=e)
            if verbose:
                extras = "".join(f" {k}={row[k]:.4f}"
                                 for k in ("val_box_mAP", "val_mask_mAP",
                                           "val_oks_mAP", "val_rbox_mAP",
                                           "val_top1_acc")
                                 if k in row)
                print(f"epoch {e}: loss={row.get('loss', float('nan')):.4f}"
                      f" ({row['sec']:.1f}s){extras}", flush=True)
            if t.ckpt_dir and (e + 1) % t.ckpt_every_epochs == 0:
                self.save()
        if tb is not None:
            tb.close()
        return self.history

    def _best_metric(self, row: Dict) -> Optional[float]:
        for k in ("val_mask_mAP", "val_box_mAP", "val_oks_mAP",
                  "val_rbox_mAP", "val_top1_acc"):
            if k in row:
                return float(row[k])
        return None

    def _maybe_save_best(self, row: Dict) -> None:
        """Write ckpt_dir/best (eval/EMA params) when validation improves."""
        t = self.tcfg
        if not (t.save_best and t.ckpt_dir):
            return
        m = self._best_metric(row)
        if m is None:
            return
        prev = [self._best_metric(r) for r in self.history]
        prev = [p for p in prev if p is not None]
        if prev and m <= max(prev):
            return
        import jax

        from xrseg_tpu.io.weights import save_orbax
        os.makedirs(t.ckpt_dir, exist_ok=True)
        save_orbax(os.path.join(t.ckpt_dir, "best"),
                   jax.device_get(self.eval_params))
        with open(os.path.join(t.ckpt_dir, "best.json"), "w") as f:
            json.dump(row, f, indent=1)

    # -- validation -----------------------------------------------------

    def evaluate(self, dataset, max_images: Optional[int] = None,
                 batch: int = 8) -> Dict[str, float]:
        """Validation of the CURRENT (EMA) params through the deployed
        pipeline against the dataset's GT. detect/segment return
        {val_box_mAP, val_box_AP50, val_mask_mAP?}; tasks return their
        family metric (pose {val_oks_mAP, val_oks_AP50}, obb
        {val_rbox_mAP, val_rbox_AP50}, classify {val_top1_acc}).

        The validation pipeline compiles ONCE per Trainer: params are a
        jit argument (not baked), so later epochs swap in fresh (EMA)
        params via dataclasses.replace without retracing."""
        import dataclasses as _dc

        import jax

        from xrseg_tpu.config import ExecutorConfig, PostprocessConfig
        from xrseg_tpu.compile import build_pipeline
        from xrseg_tpu.eval.dataset_eval import (evaluate_dataset,
                                                 evaluate_task_dataset)

        t = self.tcfg
        is_task = self.cfg.task in ("pose", "obb", "classify")
        params = jax.device_get(self.eval_params)
        if (self._val_pipe is not None
                and self._val_pipe.input_shape[0] != batch):
            self._val_pipe = None           # batch changed: rebuild
        if self._val_pipe is None:
            ex_cfg = ExecutorConfig(
                model=self.cfg,
                post=PostprocessConfig(
                    score_threshold=t.val_score_threshold,
                    max_detections=t.val_max_detections))
            self._val_pipe = build_pipeline(ex_cfg, params,
                                            crop_masks=not is_task,
                                            frame_hw=self.cfg.input_size,
                                            batch=batch)
        else:
            self._val_pipe = _dc.replace(self._val_pipe, params=params)
        if is_task:
            m = evaluate_task_dataset(self.cfg, params, dataset,
                                      score_threshold=t.val_score_threshold,
                                      max_detections=t.val_max_detections,
                                      max_images=max_images, batch=batch,
                                      pipe=self._val_pipe)
            return {f"val_{k}": float(v) for k, v in m.items()
                    if k not in ("n_images", "n_gt")}
        m = evaluate_dataset(self.cfg, params, dataset,
                             score_threshold=t.val_score_threshold,
                             max_detections=t.val_max_detections,
                             max_images=max_images, batch=batch,
                             pipe=self._val_pipe)
        out = {"val_box_mAP": m["box_mAP"], "val_box_AP50": m["box_AP50"]}
        if "mask_mAP" in m:
            out["val_mask_mAP"] = m["mask_mAP"]
        return out
