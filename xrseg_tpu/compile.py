"""Pipeline compiler: preprocess + network + baked postprocess as ONE jitted fn.

This is the TPU-native analogue of the reference's offline model-compile step
(Assets/Scripts/InferenceEngine/Editor/IEModelEditorConverter.cs:31-106):
where Unity bakes decode+NMS+mask-matmul into a .sentis graph that the
runtime schedules, we close the same stages over jit so XLA compiles the
entire frame->detections pipeline into a single device program — no host
round-trip anywhere between pixels and masks (the "no readback until the
final slate" property the reference approximates with 4-way async readback,
IEExecutor.cs:419-456).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from xrseg_tpu.config import ExecutorConfig, ModelConfig, PostprocessConfig
from xrseg_tpu.models import yolo11
from xrseg_tpu.ops import preprocess as pre_ops
from xrseg_tpu.ops.postprocess import postprocess_batch_parts


@dataclasses.dataclass
class CompiledPipeline:
    """A compiled frame->detections program + its metadata."""
    cfg: ExecutorConfig
    params: Any
    fn: Callable                      # (params, frames_uint8) -> dict
    input_shape: Tuple[int, ...]
    input_format: str = "rgb"

    def __call__(self, frames) -> Dict[str, jax.Array]:
        return self.fn(self.params, frames)

    def _dummy_input(self):
        if self.input_format == "yuv420":
            B, H, W, _ = self.input_shape
            return (jnp.zeros((B, H, W), jnp.uint8),
                    jnp.zeros((B, H // 2, W // 2), jnp.uint8),
                    jnp.zeros((B, H // 2, W // 2), jnp.uint8))
        return jnp.zeros(self.input_shape, jnp.uint8)

    def warmup(self) -> "CompiledPipeline":
        """Compile + allocate before first real frame (the reference warms its
        Worker with a dummy schedule at load, IEExecutor.cs:384-385).

        Also performs one host readback: on tunneled/remote PJRT platforms
        the first D2H transfer pays a large one-time channel-setup cost that
        must not land on the first real frame.
        """
        import numpy as np
        out = self.fn(self.params, self._dummy_input())
        jax.block_until_ready(out)
        np.asarray(out["slate"])     # absorb first-transfer setup cost
        return self


def build_pipeline(cfg: ExecutorConfig, params: Any, *,
                   frame_hw: Optional[Tuple[int, int]] = None,
                   batch: Optional[int] = None,
                   resize_mode: str = "stretch",
                   crop_masks: bool = False,
                   mask_dtype: str = "float32",
                   input_format: str = "rgb",
                   donate_frames: bool = False,
                   params_dtype: Optional[str] = None,
                   emit_masks: str = "all",
                   mask_display_hw: Optional[Tuple[int, int]] = None,
                   tta: bool = False,
                   tta_kpt_flip_idx: Optional[Sequence[int]] = None,
                   tta_views: Optional[Sequence[Tuple[float, bool]]] = None
                   ) -> CompiledPipeline:
    """Compile the full pipeline for a fixed frame geometry.

    frames: [B, frame_h, frame_w, 3] uint8 -> padded detection slate
    (boxes_xywh in model 640-space, labels, scores, coefs, masks, valid,
    count) — the same logical contract as the reference's 4 baked outputs.

    input_format="yuv420" takes planar camera frames instead: a tuple
    (y [B,H,W]u8, u [B,H/2,W/2]u8, v [B,H/2,W/2]u8); the YUV->RGB
    conversion fuses into the device program (the reference's camera
    surface is YUV_420_888, converted on-GPU before ToTensor).

    params_dtype="bfloat16" casts the weights ONCE at build time instead
    of per-step inside the program — halves weight HBM reads; measured
    ~7% faster at batch=1, neutral at large batch (see io/weights.
    cast_params).

    emit_masks: "all" (default — the reference's 4-output contract,
    IEExecutor.cs:446-449: every survivor's [h,w] mask materialized) or
    "none" (coefs-only: the [B,D,h,w] slate is never written; the program
    emits gathered coefs + prototypes and consumers synthesize single
    masks on demand — ops/masks.synthesize_one_mask — which is what the
    interactive executor does for the one tracked target).

    mask_display_hw: with emit_masks="all", additionally bilinear-upsample
    the masks to this (H, W) INSIDE the device program, so consumers get
    frame/display-resolution masks with no host-side resampling (the
    reference upsamples on the GPU at render time via a bilinear-filtered
    texture, IEMasker.cs:316-323).

    tta=True: 2-view test-time augmentation (identity + horizontal flip,
    the accuracy-mode analogue of ultralytics `augment=True`, which is
    detect-only upstream — here segment and obb work too). Both views run
    as ONE [2B,...] forward (MXU-efficient: a doubled batch, not a second
    program), flipped-view boxes are mirrored back (obb: angle negated)
    and candidates merged pre-NMS (A -> 2A). Segment masks stay EXACT:
    each survivor's coefficients multiply the protos of its own view
    (flipped-view protos are flipped back — sigmoid(c @ flip(P)) ==
    flip(sigmoid(c @ P))). ~2x device cost; for offline eval/serving
    accuracy, not the interactive executor. Pose works too, given
    tta_kpt_flip_idx (the skeleton's left/right joint permutation under
    a mirror — COCO-17: the same tuple as TrainConfig.kpt_flip_idx).

    tta_views: optional (scale, flip) view list replacing the default
    ((1.0, False), (1.0, True)). ULTRALYTICS_TTA_VIEWS reproduces
    upstream augment=True's 3 views (1 / 0.83-flipped / 0.67) — scaled
    content is letterboxed top-left into the SAME canvas (gray fill) so
    all views still ride one static-shape forward. Scaled views are
    detect/obb-only (segment protos and pose keypoints don't unscale
    exactly).
    """
    if emit_masks not in ("all", "none"):
        raise ValueError(f"emit_masks {emit_masks!r}: expected 'all'|'none'")
    if mask_display_hw is not None and emit_masks != "all":
        raise ValueError("mask_display_hw requires emit_masks='all'")
    if tta:
        if cfg.model.task == "classify":
            raise ValueError("tta unsupported for task 'classify'"
                             " (nothing to merge pre-NMS)")
        if getattr(cfg.model, "o2o", False):
            raise ValueError(
                "tta is incompatible with o2o (NMS-free) serving: "
                "multi-view candidates NEED a merge step (NMS/WBF). "
                "Serve the same checkpoint's classic path instead: "
                "replace(cfg.model, o2o=False)")
        if cfg.model.task == "pose" and tta_kpt_flip_idx is None:
            raise ValueError("pose tta needs tta_kpt_flip_idx: the"
                             " skeleton's left/right joint permutation"
                             " under a mirror is model-specific (COCO-17:"
                             " TrainConfig's kpt_flip_idx values)")
        if tta_kpt_flip_idx is not None and \
                sorted(tta_kpt_flip_idx) != list(
                    range(cfg.model.kpt_shape[0])):
            raise ValueError("tta_kpt_flip_idx must be a permutation of"
                             f" range({cfg.model.kpt_shape[0]})")
        if cfg.model.task == "segment" and emit_masks != "all":
            raise ValueError("tta segment requires emit_masks='all' (the"
                             " coefs-only contract has one protos tensor;"
                             " TTA candidates pair with per-view protos)")
        if tta_views is not None:
            if not tta_views or any(not (0.0 < s <= 1.0)
                                    for s, _ in tta_views):
                raise ValueError("tta_views scales must lie in (0, 1]")
            if cfg.model.task in ("segment", "pose") and any(
                    s != 1.0 for s, _ in tta_views):
                raise ValueError(f"scaled tta views are detect/obb-only"
                                 f" ({cfg.model.task} protos/keypoints"
                                 " don't unscale exactly)")
    mcfg = cfg.model
    pcfg = cfg.post
    if params_dtype is not None:
        from xrseg_tpu.io.weights import cast_params
        params = cast_params(params, params_dtype)
    B = batch or cfg.batch_size
    fh, fw = frame_hw or mcfg.input_size
    in_shape = (B, fh, fw, 3)

    mdt = jnp.dtype(mask_dtype)

    def _to_rgb(frames):
        if input_format == "rgb":
            return frames
        if input_format == "yuv420":
            from xrseg_tpu.ops.yuv import yuv420_to_rgb
            y, u, v = frames
            return yuv420_to_rgb(y, u, v)
        raise ValueError(f"unknown input_format {input_format!r}")

    from xrseg_tpu.precision import precision_scope

    def _run(params, frames):
        # trace-time scope: covers preprocess resize matmuls, the network
        # (also self-scoped in yolo11.forward) and the mask-synthesis
        # matmul — the whole program honors cfg.model.matmul_precision
        with precision_scope(mcfg.matmul_precision):
            x = pre_ops.preprocess(_to_rgb(frames), mcfg.input_size,
                                   mode=resize_mode,
                                   dtype=jnp.dtype(mcfg.dtype))
            if tta:
                return _decode_tta(params, x, mcfg, pcfg,
                                   crop_masks=crop_masks, mask_dtype=mdt,
                                   mask_display_hw=mask_display_hw,
                                   kpt_flip_idx=tta_kpt_flip_idx,
                                   views=(tuple(tta_views) if tta_views
                                          else DEFAULT_TTA_VIEWS))
            out = yolo11.forward(params, x, mcfg, concat_preds=False)
            return decode_task_outputs(
                out, mcfg, pcfg, crop_masks=crop_masks, mask_dtype=mdt,
                emit_masks=emit_masks, mask_display_hw=mask_display_hw)

    donate = (1,) if donate_frames else ()
    fn = jax.jit(_run, donate_argnums=donate)
    return CompiledPipeline(cfg=cfg, params=params, fn=fn,
                            input_shape=in_shape, input_format=input_format)


DEFAULT_TTA_VIEWS: Tuple[Tuple[float, bool], ...] = ((1.0, False),
                                                     (1.0, True))
# ultralytics augment=True runs scales (1, 0.83-flipped, 0.67); detect
# and obb accept these via tta_views (scale-in-canvas keeps shapes
# static: one batched forward, content anchored top-left, gray fill)
ULTRALYTICS_TTA_VIEWS: Tuple[Tuple[float, bool], ...] = (
    (1.0, False), (0.83, True), (0.67, False))


def _decode_tta(params, x, mcfg, pcfg, *, crop_masks: bool,
                mask_dtype, mask_display_hw, kpt_flip_idx=None,
                views: Tuple[Tuple[float, bool], ...] = DEFAULT_TTA_VIEWS):
    """Multi-view TTA forward + merge + decode (see build_pipeline).

    x: preprocessed [B,S,S,3]. Every (scale, flip) view rides ONE
    [VB,...] forward (scaled content letterboxed top-left into the same
    canvas, gray fill — static shapes); per-view candidates are mapped
    back to original geometry (unflip, then /scale) and concatenated
    along the anchor axis (A -> VA) before the standard NMS. Segment
    survivors synthesize masks against the protos of their OWN view
    (flipped protos flipped back, exact by linearity; scaled views are
    rejected for segment/pose at build time)."""
    from xrseg_tpu.models import yolo11
    from xrseg_tpu.ops import masks as mask_ops
    from xrseg_tpu.ops.postprocess import (postprocess_batch_parts,
                                           postprocess_obb_batch,
                                           postprocess_pose_batch)

    H, W = mcfg.input_size
    B, _, _, C = x.shape

    def make_view(scale, flip):
        xv = x
        if scale != 1.0:
            sh, sw = int(round(H * scale)), int(round(W * scale))
            xs = jax.image.resize(x, (B, sh, sw, C), method="bilinear")
            xv = jnp.full((B, H, W, C), jnp.asarray(114.0 / 255.0,
                                                    x.dtype))
            xv = xv.at[:, :sh, :sw].set(xs.astype(x.dtype))
        return jnp.flip(xv, 2) if flip else xv

    out = yolo11.forward(
        params, jnp.concatenate([make_view(s, f) for s, f in views], 0),
        mcfg, concat_preds=False)

    def per_view(v):
        return [v[i * B:(i + 1) * B] for i in range(len(views))]

    cls_parts = per_view(out["cls_logits"])
    cls_logits = jnp.concatenate(cls_parts, axis=1)        # [B,VA,nc]
    A = cls_parts[0].shape[1]

    if mcfg.task == "pose":
        bs, ks = [], []
        for (scale, flip), b, k in zip(views,
                                       per_view(out["boxes_xywh"]),
                                       per_view(out["kpts"])):
            if flip:
                b = jnp.concatenate([W - b[..., 0:1], b[..., 1:]], -1)
                k = jnp.concatenate([W - k[..., 0:1], k[..., 1:]], -1)
                k = k[:, :, jnp.asarray(list(kpt_flip_idx), jnp.int32)]
            bs.append(b / scale)
            ks.append(jnp.concatenate([k[..., :2] / scale, k[..., 2:]],
                                      -1))
        det = postprocess_pose_batch(
            jnp.concatenate(bs, axis=1), cls_logits,
            jnp.concatenate(ks, axis=1), pcfg, scores_are_logits=True)
        det["slate"] = pack_slate(det, pcfg.max_detections)
        return det

    if mcfg.task == "obb":
        bs = []
        for (scale, flip), b in zip(views, per_view(out["boxes_xywhr"])):
            if flip:
                b = jnp.concatenate([W - b[..., 0:1], b[..., 1:4],
                                     -b[..., 4:5]], -1)
            bs.append(jnp.concatenate([b[..., :4] / scale, b[..., 4:]],
                                      -1))
        det = postprocess_obb_batch(jnp.concatenate(bs, axis=1),
                                    cls_logits, pcfg,
                                    scores_are_logits=True)
        det["slate"] = pack_slate(det, pcfg.max_detections)
        return det

    bs = []
    for (scale, flip), b in zip(views, per_view(out["boxes_xywh"])):
        if flip:
            b = jnp.concatenate([W - b[..., 0:1], b[..., 1:]], -1)
        bs.append(b / scale)
    boxes = jnp.concatenate(bs, axis=1)                    # [B,VA,4]
    coefs_all = view_protos = None
    if mcfg.task == "segment":
        coefs_all = jnp.concatenate(per_view(out["mask_coefs"]), axis=1)
        view_protos = [jnp.flip(p, 2) if flip else p
                       for (scale, flip), p in
                       zip(views, per_view(out["protos"]))]
    det = postprocess_batch_parts(
        boxes, cls_logits, coefs_all,
        view_protos[0] if view_protos else None, pcfg,
        False, mcfg.input_size, mask_dtype=mask_dtype,
        scores_are_logits=True, with_masks=False)
    if view_protos is not None:
        det.pop("protos", None)
        coefs = det["coefs"].astype(mask_dtype)

        def synth(c, p):
            return mask_ops.synthesize_masks(c, p.astype(mask_dtype))

        view_idx = det["indices"] // A                     # [B,D]
        m = jax.vmap(synth)(coefs, view_protos[0])
        for vi in range(1, len(views)):
            mv = jax.vmap(synth)(coefs, view_protos[vi])
            m = jnp.where((view_idx == vi)[..., None, None], mv, m)
        if crop_masks:
            m = jax.vmap(lambda mm, b: mask_ops.crop_masks(
                mm, b, mcfg.input_size))(m, det["boxes_xywh"])
        if mask_display_hw is not None:
            m = jax.vmap(lambda mm: mask_ops.upsample_masks(
                mm, tuple(mask_display_hw)))(m)
        det["masks"] = m.astype(mask_dtype)
    det["slate"] = pack_slate(det, pcfg.max_detections)
    return det


def build_ensemble_pipeline(cfg: ExecutorConfig, params_list,
                            model_cfgs=None, *,
                            frame_hw: Optional[Tuple[int, int]] = None,
                            batch: Optional[int] = None,
                            resize_mode: str = "stretch",
                            crop_masks: bool = False,
                            mask_dtype: str = "float32"
                            ) -> CompiledPipeline:
    """Model ensemble in ONE device program: every checkpoint's forward
    runs on the same preprocessed frames, candidates concatenate along
    the anchor axis (A -> M*A) and merge through the configured
    PostprocessConfig (merge="wbf" is the natural choice — fuse what the
    models agree on; "nms" keeps the best single candidate). The
    canonical Weighted-Box-Fusion use case, ultralytics-ensemble
    equivalent, but compiled: no per-model host round trips.

    model_cfgs: per-checkpoint ModelConfigs when the members differ in
    scale (n+s+..., same task/classes/input size — validated). Segment
    masks stay exact per member: each survivor synthesizes against its
    OWN model's protos (same per-view selection as TTA).
    """
    mcfg = cfg.model
    pcfg = cfg.post
    model_cfgs = list(model_cfgs or [mcfg] * len(params_list))
    if len(model_cfgs) != len(params_list) or not params_list:
        raise ValueError("params_list and model_cfgs must be equal-length"
                         " and non-empty")
    for mc in model_cfgs:
        if (mc.task, mc.num_classes, mc.input_size) != \
                (mcfg.task, mcfg.num_classes, mcfg.input_size):
            raise ValueError("ensemble members must share task/classes/"
                             f"input_size; got {mc.task}/{mc.num_classes}"
                             f"/{mc.input_size} vs {mcfg.task}/"
                             f"{mcfg.num_classes}/{mcfg.input_size}")
    if mcfg.task not in ("detect", "segment"):
        raise ValueError("ensemble pipeline supports detect/segment"
                         f" (got {mcfg.task!r})")
    B = batch or cfg.batch_size
    fh, fw = frame_hw or mcfg.input_size
    mdt = jnp.dtype(mask_dtype)

    from xrseg_tpu.ops import masks as mask_ops
    from xrseg_tpu.precision import precision_scope

    def _run(params_tuple, frames):
        with precision_scope(mcfg.matmul_precision):
            x = pre_ops.preprocess(frames, mcfg.input_size,
                                   mode=resize_mode,
                                   dtype=jnp.dtype(mcfg.dtype))
            outs = [yolo11.forward(p, x, mc, concat_preds=False)
                    for p, mc in zip(params_tuple, model_cfgs)]
            boxes = jnp.concatenate([o["boxes_xywh"] for o in outs], 1)
            cls = jnp.concatenate([o["cls_logits"] for o in outs], 1)
            A = outs[0]["cls_logits"].shape[1]
            coefs_all = protos_list = None
            if mcfg.task == "segment":
                coefs_all = jnp.concatenate(
                    [o["mask_coefs"] for o in outs], 1)
                protos_list = [o["protos"] for o in outs]
            det = postprocess_batch_parts(
                boxes, cls, coefs_all,
                protos_list[0] if protos_list else None, pcfg,
                False, mcfg.input_size, mask_dtype=mdt,
                scores_are_logits=True, with_masks=False)
            if protos_list is not None:
                det.pop("protos", None)
                coefs = det["coefs"].astype(mdt)

                def synth(c, p):
                    return mask_ops.synthesize_masks(c, p.astype(mdt))

                member = det["indices"] // A
                m = jax.vmap(synth)(coefs, protos_list[0])
                for vi in range(1, len(outs)):
                    mv = jax.vmap(synth)(coefs, protos_list[vi])
                    m = jnp.where((member == vi)[..., None, None], mv, m)
                if crop_masks:
                    m = jax.vmap(lambda mm, b: mask_ops.crop_masks(
                        mm, b, mcfg.input_size))(m, det["boxes_xywh"])
                det["masks"] = m.astype(mdt)
            det["slate"] = pack_slate(det, pcfg.max_detections)
            return det

    return CompiledPipeline(cfg=cfg, params=tuple(params_list),
                            fn=jax.jit(_run),
                            input_shape=(B, fh, fw, 3))


def decode_task_outputs(out, mcfg, pcfg, *, crop_masks: bool = False,
                        mask_dtype=jnp.float32, emit_masks: str = "all",
                        mask_display_hw: Optional[Tuple[int, int]] = None):
    """Raw forward outputs (concat_preds=False) -> the task-shaped
    detection dict incl. the packed slate. The ONE decode tail shared by
    build_pipeline and the sharded serving builders (parallel/batch.py),
    so every surface — single-chip, mesh, multi-stream — speaks the whole
    task family with identical numerics."""
    if mcfg.task == "classify":
        # classification slate IS the prob row (one tiny DMA)
        return {"logits": out["logits"], "probs": out["probs"],
                "slate": out["probs"]}
    if mcfg.task == "pose":
        from xrseg_tpu.ops.postprocess import postprocess_pose_batch
        det = postprocess_pose_batch(
            out["boxes_xywh"], out["cls_logits"], out["kpts"],
            pcfg, scores_are_logits=True)
    elif mcfg.task == "obb":
        from xrseg_tpu.ops.postprocess import postprocess_obb_batch
        det = postprocess_obb_batch(
            out["boxes_xywhr"], out["cls_logits"], pcfg,
            scores_are_logits=True)
    else:
        protos = out.get("protos")
        if "o2o_boxes_xywh" in out:
            # NMS-free serving (ModelConfig.o2o): select from the
            # one-to-one head — no greedy suppression in the program
            from xrseg_tpu.ops.postprocess import postprocess_o2o_batch
            det = postprocess_o2o_batch(
                out["o2o_boxes_xywh"], out["o2o_cls_logits"],
                out.get("mask_coefs"), protos, pcfg, crop_masks,
                mcfg.input_size, mask_dtype=mask_dtype,
                scores_are_logits=True,
                with_masks=(emit_masks == "all"))
        else:
            det = postprocess_batch_parts(
                out["boxes_xywh"], out["cls_logits"],
                out.get("mask_coefs"), protos, pcfg, crop_masks,
                mcfg.input_size, mask_dtype=mask_dtype,
                scores_are_logits=True,
                with_masks=(emit_masks == "all"))
    if mask_display_hw is not None and "masks" in det:
        from xrseg_tpu.ops import masks as mask_ops
        det["masks"] = jax.vmap(
            lambda m: mask_ops.upsample_masks(
                m, tuple(mask_display_hw)))(det["masks"]).astype(mask_dtype)
    # Pack the small per-frame outputs into ONE flat f32 array so the
    # host readback is a single DMA (boxes | scores | labels | valid |
    # count), instead of five round-trips. Masks/coefs stay on device;
    # the executor gathers only the tracked target's mask row.
    det["slate"] = pack_slate(det, pcfg.max_detections)
    return det


def export_compiled(pipe: CompiledPipeline, path: str) -> None:
    """Serialize the frame->detections pipeline (weights baked in) to a
    single artifact — the TPU-native equivalent of the reference's compiled
    .sentis model (IEModelEditorConverter.cs:100-102 compiles+saves;
    ModelLoader.Load reads it back at IEExecutor.cs:382).

    The artifact is StableHLO (portable across compatible jax/XLA versions
    and devices); weights are embedded as constants.
    """
    import os

    import jax.export

    params = pipe.params
    fn = pipe.fn

    def closed(frames):
        return fn(params, frames)

    if pipe.input_format == "yuv420":
        B, H, W, _ = pipe.input_shape
        spec = (jax.ShapeDtypeStruct((B, H, W), jnp.uint8),
                jax.ShapeDtypeStruct((B, H // 2, W // 2), jnp.uint8),
                jax.ShapeDtypeStruct((B, H // 2, W // 2), jnp.uint8))
    else:
        spec = jax.ShapeDtypeStruct(pipe.input_shape, jnp.uint8)
    exp = jax.export.export(jax.jit(closed))(spec)
    blob = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)


def load_compiled(path: str):
    """Load an exported pipeline artifact. Returns fn(frames)->det dict."""
    import jax.export

    with open(path, "rb") as f:
        exp = jax.export.deserialize(f.read())
    return lambda frames: exp.call(frames)


def pack_slate(det: Dict[str, jax.Array], max_det: int) -> jax.Array:
    """Batched small outputs -> ONE flat [B, D*(bd+3)+1] f32 array
    (boxes | scores | labels | valid | count): a single D2H DMA per frame
    instead of five (the reference pays 4 readbacks, IEExecutor.cs:446-449).
    bd = 4 for axis-aligned tasks, 5 for obb (cx, cy, w, h, angle)."""
    D = max_det
    boxes = det.get("boxes_xywhr", det.get("boxes_xywh"))
    bd = boxes.shape[-1]
    return jnp.concatenate([
        boxes.reshape(-1, D * bd),
        det["scores"],
        det["labels"].astype(jnp.float32),
        det["valid"].astype(jnp.float32),
        det["count"].astype(jnp.float32)[:, None],
    ], axis=-1)


def unpack_slate(slate_row, max_det: int, box_dim: int = 4
                 ) -> Dict[str, Any]:
    """Host-side inverse of the on-device slate packing (one image's row).
    box_dim=5 decodes an obb slate (key "boxes_xywhr")."""
    import numpy as np
    s = np.asarray(slate_row)
    D = max_det
    bd = box_dim
    box_key = "boxes_xywhr" if bd == 5 else "boxes_xywh"
    return {
        box_key: s[:D * bd].reshape(D, bd),
        "scores": s[D * bd:D * (bd + 1)],
        "labels": s[D * (bd + 1):D * (bd + 2)].astype(np.int32),
        "valid": s[D * (bd + 2):D * (bd + 3)] > 0.5,
        "count": int(s[D * (bd + 3)]),
    }


@dataclasses.dataclass
class XRTickPipeline:
    """The reference's WHOLE tracked-frame workload as ONE compiled
    program + ONE packed readback (ExecutorConfig.fused_tick).

    Per tracked frame the reference (and our classic executor path) pays
    three serialized device round-trips: detection readback, target-mask
    copy, depth-fusion result (IEExecutor.cs:446-449, 615-621, 653-682
    — measured at ~90 of ~156 ms/frame over the tunneled chip,
    artifacts/chip_r4/xr_probe_chip.json). Here the re-lock match
    (ops/relock.py), the matched target's mask synthesis and the RGBD
    fusion all run INSIDE the frame program — the previous target box is
    a jit input — and the frame emits

      [ slate | matched, index | target mask? | fused points ]

    as one flat f32 array: a single D2H DMA. Mask/points rows are zeroed
    when unmatched, so consumers read validity from the packed flags.
    """
    cfg: ExecutorConfig
    params: Any
    fn: Callable           # (params, frames u8, depth u16, aux f32[19])
    input_shape: Tuple[int, ...]
    depth_hw: Tuple[int, int]
    slate_len: int
    mask_hw: Optional[Tuple[int, int]]   # None = mask not emitted
    n_points: int
    input_format: str = "rgb"

    # aux layout: focal 2 | principal 2 | sensor 2 | cam_pos 3 |
    #             cam_quat 4 | prev(cx,cy,label,valid) 4 | screen_scale 2
    AUX_LEN = 19

    def __call__(self, frames, depth_fp16, aux) -> Dict[str, jax.Array]:
        return self.fn(self.params, frames, depth_fp16, aux)

    def warmup(self) -> "XRTickPipeline":
        import numpy as np
        dh, dw = self.depth_hw
        out = self.fn(self.params, jnp.zeros(self.input_shape, jnp.uint8),
                      jnp.zeros((dh, dw), jnp.uint16),
                      jnp.zeros((self.AUX_LEN,), jnp.float32))
        jax.block_until_ready(out)
        np.asarray(out["packed"])    # absorb first-transfer channel setup
        return self

    @staticmethod
    def pack_aux(focal, principal, sensor, cam_pos, cam_quat, prev,
                 screen_scale):
        import numpy as np
        return np.concatenate([
            np.asarray(focal, np.float32).ravel(),
            np.asarray(principal, np.float32).ravel(),
            np.asarray(sensor, np.float32).ravel(),
            np.asarray(cam_pos, np.float32).ravel(),
            np.asarray(cam_quat, np.float32).ravel(),
            np.asarray(prev, np.float32).ravel(),
            np.asarray(screen_scale, np.float32).ravel(),
        ]).astype(np.float32)

    def unpack(self, packed) -> Dict[str, Any]:
        """Host-side split of the one readback into the executor's
        contract: unpack_slate keys + matched / matched_index /
        target_mask? / points_packed [N,5]."""
        import numpy as np
        s = np.asarray(packed)
        h = unpack_slate(s[:self.slate_len], self.cfg.post.max_detections)
        off = self.slate_len
        h["matched"] = s[off] > 0.5
        h["matched_index"] = int(s[off + 1])
        off += 2
        if self.mask_hw is not None:
            mh, mw = self.mask_hw
            h["target_mask"] = s[off:off + mh * mw].reshape(mh, mw)
            off += mh * mw
        h["points_packed"] = s[off:off + self.n_points * 5].reshape(
            self.n_points, 5)
        return h


def build_xr_tick_pipeline(cfg: ExecutorConfig, params: Any, *,
                           frame_hw: Optional[Tuple[int, int]] = None,
                           depth_hw: Tuple[int, int] = (128, 128),
                           emit_target_mask: bool = True,
                           params_dtype: Optional[str] = None
                           ) -> XRTickPipeline:
    """Compile the fused XR tick for fixed frame + depth geometry.

    See XRTickPipeline. Segment task only (the XR product task — the
    tick's mask/point stages are mask-defined). emit_target_mask adds
    the matched target's [mh,mw] sigmoid mask to the packed readback
    (~100 KB) for UI rendering; headless consumers skip it.
    """
    mcfg = cfg.model
    pcfg = cfg.post
    if mcfg.task != "segment":
        raise ValueError(f"fused_tick requires task='segment', "
                         f"got {mcfg.task!r}")
    if params_dtype is not None:
        from xrseg_tpu.io.weights import cast_params
        params = cast_params(params, params_dtype)
    fh, fw = frame_hw or mcfg.input_size
    in_shape = (1, fh, fw, 3)
    D = pcfg.max_detections
    slate_len = D * 7 + 1                      # boxes4|scores|labels|valid|count
    mh4, mw4 = mcfg.mask_size
    dcfg = cfg.depth
    step = dcfg.sampling_step
    n_points = (mh4 // step) * (mw4 // step)

    from xrseg_tpu.ops import depth_fusion as df
    from xrseg_tpu.ops.masks import synthesize_one_mask
    from xrseg_tpu.ops.relock import relock_match
    from xrseg_tpu.precision import precision_scope

    def _run(params, frames, depth_fp16, aux):
        with precision_scope(mcfg.matmul_precision):
            x = pre_ops.preprocess(frames, mcfg.input_size,
                                   dtype=jnp.dtype(mcfg.dtype))
            out = yolo11.forward(params, x, mcfg, concat_preds=False)
            det = decode_task_outputs(out, mcfg, pcfg, emit_masks="none")
            boxes = det["boxes_xywh"][0]
            prev = aux[13:17]
            matched, idx = relock_match(
                boxes, det["labels"][0], det["valid"][0], prev,
                aux[17:19], gate_px=cfg.tracking_gate_px)
            mask = synthesize_one_mask(det["coefs"][0], det["protos"][0],
                                       idx)
            pts = df.extract_points(
                depth_fp16, mask, boxes[idx],
                aux[0:2], aux[2:4], aux[4:6], aux[6:9], aux[9:13],
                confidence_threshold=dcfg.confidence_threshold,
                min_depth=dcfg.min_depth_m, max_depth=dcfg.max_depth_m,
                sampling_step=step, mask_hw=(mh4, mw4))["packed"]
            m = matched.astype(jnp.float32)
            parts = [det["slate"][0],
                     jnp.stack([m, idx.astype(jnp.float32)])]
            if emit_target_mask:
                parts.append(mask.reshape(-1).astype(jnp.float32) * m)
            parts.append((pts * m).reshape(-1))
            packed = jnp.concatenate(parts)
            # coefs/protos stay device-resident for re-ID embeddings and
            # between-frame laser extraction; never part of the DMA
            return {"packed": packed, "coefs": det["coefs"],
                    "protos": det["protos"]}

    fn = jax.jit(_run)
    return XRTickPipeline(cfg=cfg, params=params, fn=fn,
                          input_shape=in_shape, depth_hw=tuple(depth_hw),
                          slate_len=slate_len,
                          mask_hw=(mh4, mw4) if emit_target_mask else None,
                          n_points=n_points)


def load_model(cfg: ExecutorConfig, params=None, seed: int = 0,
               **kw) -> CompiledPipeline:
    """LoadModel equivalent (IEExecutor.cs:380-387): build, then warm up."""
    if params is None:
        params = yolo11.init_params(jax.random.key(seed), cfg.model)
    return build_pipeline(cfg, params, **kw).warmup()


def _main() -> int:
    """Offline model converter CLI — the reference's editor-button pipeline
    ("Generate YOLOv11 Sentis model with NMS layer",
    IEModelEditorConverter.cs:24) as a command:

      python -m xrseg_tpu.compile weights.{sentis|onnx|npz} \\
          --out model.xrseg [--scale n] [--iou 0.6] [--score 0.23] \\
          [--frame-hw 480 640] [--batch 1]

    Loads weights, bakes preprocess+network+decode+NMS+masks into one
    program, and saves the AOT StableHLO artifact. With an .onnx --out it
    instead exports an ultralytics-contract ONNX file (io/onnx_export) —
    the format the reference's Unity converter consumes, closing the
    TPU-finetune -> Unity-deploy loop.
    """
    import argparse

    ap = argparse.ArgumentParser(description=_main.__doc__)
    ap.add_argument("weights")
    ap.add_argument("--out", required=True)
    ap.add_argument("--scale", default="n")
    ap.add_argument("--arch", default="yolo11",
                    choices=["yolo11", "yolov8"])
    ap.add_argument("--task", default="segment",
                    choices=["segment", "detect"])
    ap.add_argument("--classes", type=int, default=80,
                    help="num classes (npz/orbax checkpoints carry no "
                         "metadata; .sentis/.onnx infer it)")
    ap.add_argument("--size", type=int, default=640,
                    help="input size (multiple of 32)")
    ap.add_argument("--iou", type=float, default=0.6)
    ap.add_argument("--score", type=float, default=0.23)
    ap.add_argument("--frame-hw", type=int, nargs=2, default=None)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    if args.out.endswith(".onnx"):
        # pure host-side export: keep params off the accelerator (pulling
        # ~300 leaves back over a tunneled PJRT takes minutes)
        jax.config.update("jax_platforms", "cpu")

    from xrseg_tpu.io.weights import load_params_auto
    params, mcfg = load_params_auto(
        args.weights, ModelConfig(arch=args.arch, scale=args.scale,
                                  task=args.task,
                                  num_classes=args.classes,
                                  input_size=(args.size, args.size)))
    if args.out.endswith(".onnx"):
        import os

        from xrseg_tpu.io.onnx_export import export_onnx
        export_onnx(jax.device_get(params), mcfg, args.out)
        print(f"exported {args.weights} -> {args.out} "
              f"({os.path.getsize(args.out) / 1e6:.1f} MB, ONNX opset 13)")
        return 0
    cfg = ExecutorConfig(model=mcfg, post=PostprocessConfig(
        iou_threshold=args.iou, score_threshold=args.score))
    pipe = build_pipeline(cfg, params,
                          frame_hw=tuple(args.frame_hw) if args.frame_hw
                          else None, batch=args.batch)
    export_compiled(pipe, args.out)
    import os
    print(f"compiled {args.weights} -> {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
