"""Sharded training step: DP over the data axis, optional TP over model.

One jitted step over a `jax.sharding.Mesh`: XLA inserts the gradient
all-reduces on ICI from the sharding annotations — no hand-written
collectives (scaling-book recipe).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.models import yolo11
from xrseg_tpu.parallel import mesh as mesh_lib
from xrseg_tpu.train.losses import detection_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float = 1e-3, weight_decay: float = 5e-4,
                   warmup_steps: int = 100, total_steps: int = 10_000
                   ) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1))
    return optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def init_train_state(key, cfg: ModelConfig,
                     optimizer: optax.GradientTransformation) -> TrainState:
    params = yolo11.init_params(key, cfg)
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(cfg: ModelConfig, optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    tp_min_channels: int = 100000,
                    use_remat: bool = True,
                    fsdp: bool = False,
                    fsdp_min_size: int = 65536,
                    grad_accum: int = 1,
                    label_smoothing: float = 0.0):
    """Build the jitted train step for ANY task.

    label_smoothing: classify-task CE target smoothing (ultralytics
    scope for its arg of the same name); no effect on detection tasks.

    grad_accum=A splits each batch into A sequential microbatches inside
    the one jitted step (lax.scan), averaging their grads before the
    single optimizer update: the large-effective-batch lever when
    activations for the full batch don't fit HBM. Composes with remat
    and fsdp.

    fsdp=True (requires mesh): params + optimizer moments shard over the
    data axis (ZeRO-3 / FSDP — parallel/mesh.fsdp_param_shardings). XLA
    all-gathers each layer's weights before use and reduce-scatters its
    grads, purely from the in/out sharding annotations; the step function
    itself is IDENTICAL to the DP one. Cuts per-device training-state HBM
    by ~the mesh size for the large leaves — the lever that lets x-scale
    models train on small-HBM chips. Pair with
    shard_train_state(..., fsdp=True) so initial placement matches.

    detect/segment/pose/obb batch: {"images": [B,H,W,3] f32 in [0,1],
        "boxes_xywh": [B,G,4], "labels": [B,G] (-1 pad),
        "masks": [B,G,mh,mw] (segment), "boxes_xywhr"/"kpts" (obb/pose)}
    classify batch: {"images": [B,H,W,3] f32, "labels": [B] (-1 pad)}
    """
    if cfg.task == "classify":
        from xrseg_tpu.train.losses import classification_loss
        cfwd = yolo11.classify_forward
        if use_remat:
            cfwd = jax.checkpoint(cfwd, static_argnums=(2,))

        def loss_fn(params, batch):
            out = cfwd(params, batch["images"], cfg)
            return classification_loss(out["logits"], batch["labels"],
                                       label_smoothing=label_smoothing)
    else:
        fwd = yolo11.forward_train
        if use_remat:
            # rematerialize the backbone activations: trades FLOPs for
            # HBM — the standard TPU memory lever for training.
            fwd = jax.checkpoint(fwd, static_argnums=(2,))

        def loss_fn(params, batch):
            out = fwd(params, batch["images"], cfg)
            tgt = {k: batch[k] for k in ("boxes_xywh", "boxes_xywhr",
                                         "kpts", "labels", "sample_weight")
                   if k in batch}
            if "masks" in batch and cfg.task == "segment":
                tgt["masks"] = batch["masks"]
            # anchors follow the batch's actual (H,W): multi-scale batches
            # each trace their own specialization (bounded by the scale
            # bucket list)
            hw = tuple(batch["images"].shape[1:3])
            loss, aux = detection_loss(out, tgt, cfg, input_hw=hw)
            if "o2o_cls_logits" in out:
                # NMS-free dual head (cfg.o2o): the one-to-one branch
                # trains with TAL topk=1 on boxes/cls only — masks train
                # through the one-to-many loss above (shared coef head)
                o2o_out = {"box_logits": out["o2o_box_logits"],
                           "cls_logits": out["o2o_cls_logits"],
                           "boxes_xywh": out["o2o_boxes_xywh"]}
                o2o_tgt = {k: tgt[k] for k in ("boxes_xywh", "labels",
                                               "sample_weight")
                           if k in tgt}
                o2o_cfg = dataclasses.replace(cfg, task="detect")
                l2, a2 = detection_loss(o2o_out, o2o_tgt, o2o_cfg,
                                        input_hw=hw, assigner_topk=1)
                loss = loss + l2
                aux = {**aux, **{f"o2o_{k}": v for k, v in a2.items()}}
            return loss, aux

    vg = jax.value_and_grad(loss_fn, has_aux=True)

    def compute_grads(params, batch):
        if grad_accum <= 1:
            return vg(params, batch)
        # split [B, ...] -> [A, B/A, ...] and lax.scan the microbatches:
        # activation peak drops to one microbatch's worth (the remat
        # companion lever — together they bound training HBM by
        # microbatch size + sharded state, independent of global batch).
        # Each microbatch normalizes its own loss (TAL's target-score
        # denominator), matching the ultralytics accumulate semantics.
        B = jax.tree.leaves(batch)[0].shape[0]
        if B % grad_accum:
            raise ValueError(f"batch {B} not divisible by "
                             f"grad_accum {grad_accum}")

        if mesh is not None and (B // grad_accum) % mesh.shape["data"]:
            raise ValueError(
                f"microbatch {B // grad_accum} (batch {B} / grad_accum "
                f"{grad_accum}) must stay divisible by the data axis "
                f"{mesh.shape['data']} — a smaller microbatch would "
                "silently replicate (SPMD full-remat) instead of shard")

        def split(x):
            return x.reshape((grad_accum, B // grad_accum) + x.shape[1:])
        mbs = jax.tree.map(split, batch)
        if mesh is not None:
            msh = NamedSharding(mesh, P(None, "data"))
            mbs = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, msh), mbs)

        def body(gsum, mb):
            (l, a), g = vg(params, mb)
            return jax.tree.map(jnp.add, gsum, g), (l, a)

        zeros = jax.tree.map(jnp.zeros_like, params)
        gsum, (ls, auxs) = jax.lax.scan(body, zeros, mbs)
        grads = jax.tree.map(lambda g: g / grad_accum, gsum)
        return (ls.mean(), jax.tree.map(lambda x: x.mean(), auxs)), grads

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (loss, aux), grads = compute_grads(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        metrics = {"loss": loss, **aux,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    if mesh is None:
        if fsdp:
            raise ValueError("fsdp=True requires a mesh")
        return jax.jit(step)

    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    if fsdp:
        state_sh = train_state_shardings(cfg, optimizer, mesh,
                                         fsdp_min_size=fsdp_min_size)
        return jax.jit(step, in_shardings=(state_sh, data_sh),
                       out_shardings=(state_sh, repl))

    # params/opt_state shardings need the real pytree structure; jit with
    # only batch sharding constrained and let params follow their placement.
    return jax.jit(step, in_shardings=(None, data_sh),
                   out_shardings=(None, repl))


def train_state_shardings(cfg: ModelConfig,
                          optimizer: optax.GradientTransformation,
                          mesh: Mesh, fsdp_min_size: int = 65536
                          ) -> TrainState:
    """FSDP sharding pytree for a TrainState, derived abstractly (no
    device work): eval_shape the param init and optimizer.init, then map
    the fsdp rule over both — optimizer moments mirror param shapes, so
    mu/nu land on exactly their param's shards."""
    p_shapes = jax.eval_shape(
        lambda k: yolo11.init_params(k, cfg), jax.random.key(0))
    o_shapes = jax.eval_shape(optimizer.init, p_shapes)
    return TrainState(
        params=mesh_lib.fsdp_param_shardings(p_shapes, mesh,
                                             min_size=fsdp_min_size),
        opt_state=mesh_lib.fsdp_param_shardings(o_shapes, mesh,
                                                min_size=fsdp_min_size),
        step=NamedSharding(mesh, P()))


def save_train_state(path: str, state: TrainState) -> None:
    """Checkpoint the FULL training state (params + optimizer moments +
    step) for resume — the framework's training-side elastic-recovery story
    (the reference has nothing to checkpoint; SURVEY §5)."""
    from xrseg_tpu.io.weights import save_orbax
    save_orbax(path, {"params": jax.device_get(state.params),
                      "opt_state": jax.device_get(state.opt_state),
                      "step": jax.device_get(state.step)})


def load_train_state(path: str, like: TrainState) -> TrainState:
    from xrseg_tpu.io.weights import load_orbax
    restored = load_orbax(path, like={"params": like.params,
                                      "opt_state": like.opt_state,
                                      "step": like.step})
    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=restored["step"])


def shard_train_state(state: TrainState, mesh: Mesh,
                      tp_min_channels: int = 100000,
                      fsdp: bool = False,
                      fsdp_min_size: int = 65536) -> TrainState:
    if fsdp:
        if jax.process_count() > 1:
            raise ValueError(
                "fsdp across processes is unsupported: each host holds "
                "full host-local state (parallel/multihost.py); use DP")
        psh = mesh_lib.fsdp_param_shardings(state.params, mesh,
                                            min_size=fsdp_min_size)
        osh = mesh_lib.fsdp_param_shardings(state.opt_state, mesh,
                                            min_size=fsdp_min_size)
        repl = NamedSharding(mesh, P())
        return TrainState(
            params=jax.tree.map(jax.device_put, state.params, psh),
            opt_state=jax.tree.map(
                lambda x, s: jax.device_put(x, s) if hasattr(x, "shape")
                else x, state.opt_state, osh),
            step=jax.device_put(state.step, repl))
    params = mesh_lib.shard_params(state.params, mesh, tp_min_channels)
    repl = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        # multi-host: device_put cannot target non-addressable devices;
        # lift identical host-local values to GLOBAL replicated arrays
        from jax.experimental import multihost_utils

        def lift(x):
            if not hasattr(x, "shape"):
                return x
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P())
        opt_state = jax.tree.map(lift, state.opt_state)
        return TrainState(params=params, opt_state=opt_state,
                          step=lift(state.step))
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x,
        state.opt_state)
    return TrainState(params=params, opt_state=opt_state,
                      step=jax.device_put(state.step, repl))


def make_classify_train_step(cfg: ModelConfig,
                             optimizer: optax.GradientTransformation):
    """Back-compat alias: classify now routes through make_train_step
    (same mesh/remat machinery as every other task)."""
    return make_train_step(cfg, optimizer, use_remat=False)
