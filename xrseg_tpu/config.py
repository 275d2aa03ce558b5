"""Configuration dataclasses — the framework's single config surface.

The reference scatters its knobs across C# [SerializeField] defaults and
per-scene YAML overrides (ref: Assets/Scripts/InferenceEngine/IEExecutor.cs:28-44,
IEModelConverter.cs:7-8, XRScene.unity:1221-1259, TestScene.unity:747-750).
Here every knob lives in typed, frozen dataclasses; "scenes" become named
presets (TEST_PRESET / XR_PRESET).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """YOLO11 family model configuration.

    ref contract: 640x640 input, 80 COCO classes, 32 mask prototypes at
    160x160 (IEModelEditorConverter.cs:50-58).
    """
    scale: str = "n"                 # one of n / s / m / l / x
    # Architecture generation: "yolo11" (the reference's deployed family)
    # or "yolov8" (the ultralytics generation most third-party checkpoints
    # target: C2f blocks, no C2PSA, plain-conv cls head). Same tasks,
    # losses, pipelines and export contract for both.
    arch: str = "yolo11"
    num_classes: int = 80
    num_masks: int = 32              # mask coefficients (segmentation only)
    reg_max: int = 16                # DFL bins per box side
    input_size: Tuple[int, int] = (640, 640)   # (H, W)
    # The full YOLO11 task family (the reference deploys "segment";
    # detect/pose/obb/classify are capability extensions of the same
    # backbone): "segment" | "detect" | "pose" (keypoints) | "obb"
    # (rotated boxes, probiou NMS) | "classify" (backbone + linear head)
    task: str = "segment"
    kpt_shape: Tuple[int, int] = (17, 3)   # pose: (num_kpts, dims)
    # NMS-free serving (YOLOv10-style consistent dual assignment): adds a
    # second detect head trained with one-to-one assignment (TAL topk=1)
    # alongside the standard one-to-many head. Deploy then selects top-K
    # by score from the o2o head — NO NMS in the compiled pipeline (the
    # greedy-NMS kernel leaves the hot path entirely; sequential
    # dependence is the one part of postprocess XLA can't parallelize).
    # detect/segment tasks only; mask coefs stay shared, so segmentation
    # works unchanged. Existing checkpoints graft via transfer_params
    # (the o2o branch reinitializes, everything else copies bit-exact).
    o2o: bool = False
    dtype: str = "bfloat16"          # compute dtype on TPU
    param_dtype: str = "float32"
    # MXU matmul precision for f32 ops: "default" (bf16 passes, fastest) |
    # "high" | "highest" (fp32-equivalent — the exact-parity mode that
    # recovers CPU-identical detections on TPU; see xrseg_tpu/precision.py
    # and ACCURACY.md for the measured accuracy/cost tradeoff).
    matmul_precision: str = "default"

    @property
    def mask_size(self) -> Tuple[int, int]:
        # prototypes are produced at input/4 (ref: 160x160 for 640 input,
        # IEMasker.cs:11-12)
        return (self.input_size[0] // 4, self.input_size[1] // 4)

    @property
    def num_anchors(self) -> int:
        h, w = self.input_size
        return (h // 8) * (w // 8) + (h // 16) * (w // 16) + (h // 32) * (w // 32)


@dataclasses.dataclass(frozen=True)
class PostprocessConfig:
    """Baked postprocess graph knobs.

    ref: NMS iou/score from IEModelConverter (code default 0.6/0.23,
    TestScene same; XRScene deploys 0.43/0.301 — XRScene.unity:1173-1174).
    max_detections mirrors the 50-box parse cap (IEExecutor.cs:534).
    TPU note: everything is fixed-shape; NMS returns a padded top
    `max_detections` slate + a valid count instead of a dynamic N.
    """
    iou_threshold: float = 0.6
    score_threshold: float = 0.23
    max_detections: int = 50
    # Static cap on NMS candidates (threshold-compaction, ops/nms.py).
    # 0 (default) = no cap: NMS considers EVERY anchor, giving exact parity
    # with the reference's unbounded Functional.NMS
    # (IEModelEditorConverter.cs:76) at any scene density — and on TPU the
    # full-width selection loop measured FASTER than any capped variant
    # (top_k's sort and scatter-compaction both cost more than the wide
    # vector ops they save). >0 caps candidates for tiny-model tests.
    # merge="wbf" honors the same cap with the OPPOSITE cost profile:
    # the WBF scan runs one sequential step per candidate (A steps at
    # full width, M*A for ensembles), so capping shortens the dependency
    # chain itself — same exactness contract (exact while <= pre_nms_topk
    # anchors clear the score gate).
    pre_nms_topk: int = 0
    # NMS execution backend: "scan" = lax.scan select-and-suppress loop
    # (portable); "pallas" = the same loop as one on-core Pallas kernel
    # (ops/pallas_kernels.nms_select_pallas); "auto" = pallas on TPU,
    # scan elsewhere. Both are exact greedy NMS — identical results.
    nms_backend: str = "auto"
    class_aware: bool = True
    # Candidate merge: "nms" (greedy suppression, the reference's
    # semantics) or "wbf" (Weighted Box Fusion, ops/wbf.py — fuses
    # overlapping candidates score-weighted; the better merge for
    # TTA/ensemble candidate streams). detect/segment use axis-aligned
    # WBF; obb uses the rotated variant (probIoU matching, doubled-angle
    # circular-mean angle fusion). pose always uses NMS (keypoint fusion
    # has no standard semantics).
    merge: str = "nms"


@dataclasses.dataclass(frozen=True)
class DepthConfig:
    """RGBD point-cloud extraction knobs (ref: IEExecutor.cs:39-44,131-132,223).
    """
    max_points: int = 8000
    sampling_step: int = 4           # XRScene deploys 5 (XRScene.unity:1259)
    confidence_threshold: float = 0.5
    min_depth_m: float = 0.1
    max_depth_m: float = 3.0
    latency_seconds: float = 0.033   # depth sensor latency compensation


@dataclasses.dataclass(frozen=True)
class ExecutorConfig:
    """Inference runtime knobs (ref: IEExecutor.cs:28-44).

    `layers_per_frame` made the Quest GPU time-slice the graph across display
    frames; on TPU the analogue is async dispatch + double-buffered streaming,
    but we keep a `max_inflight` budget that bounds queued work the same way.
    """
    model: ModelConfig = ModelConfig()
    post: PostprocessConfig = PostprocessConfig()
    depth: DepthConfig = DepthConfig()
    confidence_threshold: float = 0.5      # mask/vis/depth gate (IEExecutor.cs:32)
    max_inflight: int = 2                  # double buffering depth
    enable_ui_rendering: bool = True       # ref EnableUIRendering (IEExecutor.cs:37)
    tracking_gate_px: float = 300.0        # same-class nearest-center gate (IEExecutor.cs:509)
    select_margin_px: float = 50.0         # touch margin (IEExecutor.cs:739,783)
    batch_size: int = 1
    # capability extensions beyond the reference's single-target lock:
    # maintain ids for ALL detections (FrameResult.tracks), optionally with
    # the SORT-style Kalman motion model (predicted-box matching + coasting)
    multi_tracking: bool = False
    motion_model: bool = False
    # appearance re-ID for lost tracks using the mask-coefficient rows as
    # free instance descriptors (cosine gate; 0 = off). Costs one extra
    # small D2H per frame (the [D,32] coef block), segment task only.
    reid_threshold: float = 0.0
    # ByteTrack two-stage association (0 = off): set the pipeline's
    # post.score_threshold LOW (e.g. 0.1) and this HIGH gate (e.g. 0.25);
    # confident detections associate first, unmatched tracks then recover
    # through the low-score leftovers, and low-score detections never
    # spawn identities (perception/tracking.MultiTargetTracker docstring)
    track_high_score: float = 0.0
    # mask slate policy for the compiled pipeline: "all" materializes every
    # survivor's mask on device (reference 4-output contract,
    # IEExecutor.cs:446-449); "none" is the coefs-only mode — the executor
    # synthesizes just the tracked target's mask on demand
    # (ops/masks.synthesize_one_mask), skipping the [B,50,h,w] HBM write.
    emit_masks: str = "all"
    # transport-minimal XR tick (segment task): compile the per-frame
    # re-lock match (IEExecutor.cs:485-526, ops/relock.py), target-mask
    # synthesis AND depth fusion INTO the frame program, so a tracked
    # frame is ONE dispatch + ONE packed readback instead of three
    # serialized D2H round-trips (slate, mask gather, point fusion).
    # Requires frames that carry depth_fp16 + pose + intrinsics; frames
    # without them fall back to the classic pipeline.
    fused_tick: bool = False


# "Scene" presets — the reference's two scenes as configs.
# Both deploy STRETCH resize (the reference's ToTensor semantics,
# IEExecutor.cs:370) — measured as the right default at BOTH scales:
# the stretch-trained checkpoint wins mask mAP by 0.05-0.10 over
# letterbox-trained in every deploy geometry (128² CPU and 640² chip
# A/Bs, TRAINING.md "letterbox vs stretch";
# artifacts/chip_r5/ab_letterbox_640.json).
# TestScene: headset-free harness, code-default NMS thresholds (TestScene.unity:700-701,747).
TEST_PRESET = ExecutorConfig(
    post=PostprocessConfig(iou_threshold=0.6, score_threshold=0.23),
    enable_ui_rendering=True,
)
# XRScene: deployed on-device config (XRScene.unity:1173-1174,1221-1259).
XR_PRESET = ExecutorConfig(
    post=PostprocessConfig(iou_threshold=0.43, score_threshold=0.301),
    depth=DepthConfig(sampling_step=5),
    enable_ui_rendering=False,
)
