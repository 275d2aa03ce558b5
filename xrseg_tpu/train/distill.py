"""Knowledge distillation: train a small student from a larger teacher.

Beyond-reference training capability (the reference consumes a fixed
deployed model — IEModelEditorConverter.cs:34): distill the deployed /
fine-tuned teacher into a smaller or different-generation student
(e.g. yolo11s -> yolo11n, or yolo11n -> yolov8n), including on
UNLABELED frames — the teacher's responses are the supervision, which
fits the XR capture setting where raw camera frames are plentiful and
boxes are not.

TPU-first design: teacher and student forwards run inside ONE jitted
step — XLA schedules the (gradient-free) teacher forward alongside the
student's forward/backward, and both batch onto the MXU. Teacher params
are an explicit step argument (NOT a closure capture: large arrays
closed into a jitted function bake into the HLO as constants, which
bloats compiles and breaks the tunneled-compile size limit — see
docs/ROADMAP.md profiling notes).

Losses (detect-family tasks):
  - class response KL: per-class binary KL between teacher and student
    sigmoid scores at temperature T (YOLO heads are per-class sigmoid,
    not softmax), scaled by T^2 (Hinton et al. 2015 convention).
  - box distribution KL: KL between the teacher's and student's DFL
    softmax distributions over the reg_max bins, per box side
    (localization distillation, Zheng et al. CVPR 2022).
  - anchors are weighted by the teacher's max class probability
    (foreground focus, ^fg_power), normalized over the batch.
Classify task: plain softmax KL at temperature T.

Mask/proto branches are NOT distilled: mask coefficients are only
defined relative to a model's own prototype basis, so they don't
transfer across models — segment students get masks from ground truth
via det_weight (mixed mode) or keep their mask branches frozen-random
for pure-distill pretraining.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.models import yolo11
from xrseg_tpu.train.train_step import TrainState
from xrseg_tpu.train.losses import detection_loss


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    temperature: float = 2.0   # KL temperature (cls + box), loss x T^2
    cls_weight: float = 1.0    # class-response KL weight
    box_weight: float = 1.0    # DFL-distribution KL weight
    fg_power: float = 1.0      # anchor weight = (teacher max prob)^p
    det_weight: float = 0.0    # ground-truth detection-loss mix
                               # (0 = pure distillation, unlabeled data)


def _log_sigmoid(x):
    return -jax.nn.softplus(-x)


def _binary_kl(t_logits, s_logits, T: float):
    """Per-element KL( sigmoid(t/T) || sigmoid(s/T) ) * T^2, stable in
    logit space: KL = p(log p - log q) + (1-p)(log(1-p) - log(1-q))."""
    t, s = t_logits / T, s_logits / T
    p = jax.nn.sigmoid(t)
    log_p, log_1p = _log_sigmoid(t), _log_sigmoid(-t)
    log_q, log_1q = _log_sigmoid(s), _log_sigmoid(-s)
    return (p * (log_p - log_q) + (1.0 - p) * (log_1p - log_1q)) * T * T


def _dfl_kl(t_box, s_box, reg_max: int, T: float):
    """KL between DFL bin distributions, per anchor (mean over the 4 box
    sides): inputs [B,A,4*reg_max] raw logits."""
    B, A, _ = t_box.shape
    t = t_box.reshape(B, A, 4, reg_max) / T
    s = s_box.reshape(B, A, 4, reg_max) / T
    p = jax.nn.softmax(t, axis=-1)
    kl = jnp.sum(p * (jax.nn.log_softmax(t, -1) - jax.nn.log_softmax(s, -1)),
                 axis=-1)
    return kl.mean(axis=-1) * T * T                      # [B, A]


def distill_loss(student_out: Dict[str, jax.Array],
                 teacher_out: Dict[str, jax.Array],
                 dcfg: DistillConfig, reg_max: int
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Detect-family response distillation. Inputs are forward_train
    outputs (raw logits); teacher_out must already be stop_gradient'ed."""
    t_cls = teacher_out["cls_logits"].astype(jnp.float32)
    s_cls = student_out["cls_logits"].astype(jnp.float32)
    t_box = teacher_out["box_logits"].astype(jnp.float32)
    s_box = student_out["box_logits"].astype(jnp.float32)

    # foreground focus: anchors the teacher believes in dominate the loss
    t_prob = jax.nn.sigmoid(t_cls)
    w = jnp.max(t_prob, axis=-1) ** dcfg.fg_power        # [B, A]
    w = w / (jnp.sum(w) + 1e-9)

    cls_kl = jnp.sum(_binary_kl(t_cls, s_cls, dcfg.temperature), axis=-1)
    box_kl = _dfl_kl(t_box, s_box, reg_max, dcfg.temperature)
    l_cls = jnp.sum(w * cls_kl)
    l_box = jnp.sum(w * box_kl)
    loss = dcfg.cls_weight * l_cls + dcfg.box_weight * l_box

    agree = jnp.sum(w * (jnp.argmax(s_cls, -1) == jnp.argmax(t_cls, -1)))
    return loss, {"distill_cls": l_cls, "distill_box": l_box,
                  "teacher_agreement": agree}


def distill_loss_classify(student_logits: jax.Array,
                          teacher_logits: jax.Array, dcfg: DistillConfig
                          ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Softmax KL at temperature T (the classic Hinton formulation)."""
    T = dcfg.temperature
    t = teacher_logits.astype(jnp.float32) / T
    s = student_logits.astype(jnp.float32) / T
    p = jax.nn.softmax(t, axis=-1)
    kl = jnp.sum(p * (jax.nn.log_softmax(t, -1) - jax.nn.log_softmax(s, -1)),
                 axis=-1)
    loss = dcfg.cls_weight * kl.mean() * T * T
    agree = jnp.mean((jnp.argmax(s, -1) == jnp.argmax(t, -1)
                      ).astype(jnp.float32))
    return loss, {"distill_cls": loss, "teacher_agreement": agree}


def make_distill_step(student_cfg: ModelConfig, teacher_cfg: ModelConfig,
                      optimizer: optax.GradientTransformation,
                      dcfg: DistillConfig = DistillConfig(),
                      mesh: Optional[Mesh] = None,
                      use_remat: bool = True):
    """Build the jitted distillation step.

    step(state, teacher_params, batch) -> (state, metrics). batch needs
    "images" (f32 [B,H,W,3] in [0,1]); ground-truth keys are only needed
    when dcfg.det_weight > 0. Teacher and student must agree on
    input geometry + num_classes (+ reg_max for detect-family); arch and
    scale are free — cross-generation distillation (v11 teacher, v8
    student) is the expected use.
    """
    if teacher_cfg.num_classes != student_cfg.num_classes:
        raise ValueError(
            f"teacher/student class-count mismatch: "
            f"{teacher_cfg.num_classes} vs {student_cfg.num_classes}")
    if (student_cfg.task == "classify") != (teacher_cfg.task == "classify"):
        raise ValueError("classify students need classify teachers")
    classify = student_cfg.task == "classify"
    if not classify and teacher_cfg.reg_max != student_cfg.reg_max:
        raise ValueError(
            f"teacher/student reg_max mismatch: {teacher_cfg.reg_max} vs "
            f"{student_cfg.reg_max} (the DFL KL needs matching bins)")
    if dcfg.det_weight < 0:
        raise ValueError("det_weight must be >= 0")

    if classify:
        s_fwd = yolo11.classify_forward
        t_fwd = yolo11.classify_forward
    else:
        s_fwd = yolo11.forward_train
        t_fwd = yolo11.forward_train
    if use_remat:
        s_fwd = jax.checkpoint(s_fwd, static_argnums=(2,))

    def loss_fn(params, batch, t_out):
        if classify:
            out = s_fwd(params, batch["images"], student_cfg)
            loss, aux = distill_loss_classify(out["logits"],
                                              t_out["logits"], dcfg)
            if dcfg.det_weight > 0.0:
                from xrseg_tpu.train.losses import classification_loss
                ce, ce_aux = classification_loss(out["logits"],
                                                 batch["labels"])
                loss = loss + dcfg.det_weight * ce
                aux = {**aux, **{f"gt_{k}": v for k, v in ce_aux.items()}}
            return loss, aux
        out = s_fwd(params, batch["images"], student_cfg)
        loss, aux = distill_loss(out, t_out, dcfg, student_cfg.reg_max)
        if dcfg.det_weight > 0.0:
            tgt = {k: batch[k] for k in ("boxes_xywh", "boxes_xywhr",
                                         "kpts", "labels", "sample_weight")
                   if k in batch}
            if "masks" in batch and student_cfg.task == "segment":
                tgt["masks"] = batch["masks"]
            det, det_aux = detection_loss(
                out, tgt, student_cfg,
                input_hw=tuple(batch["images"].shape[1:3]))
            loss = loss + dcfg.det_weight * det
            aux = {**aux, **{f"gt_{k}": v for k, v in det_aux.items()}}
        return loss, aux

    vg = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, teacher_params, batch
             ) -> Tuple[TrainState, Dict]:
        t_out = t_fwd(teacher_params, batch["images"], teacher_cfg)
        t_out = jax.lax.stop_gradient(t_out)
        (loss, aux), grads = vg(state.params, batch, t_out)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, {"loss": loss, **aux,
                           "grad_norm": optax.global_norm(grads)}

    if mesh is None:
        return jax.jit(step)
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    # teacher params replicate; student state follows its placement
    return jax.jit(step, in_shardings=(None, repl, data_sh),
                   out_shardings=(None, repl))
