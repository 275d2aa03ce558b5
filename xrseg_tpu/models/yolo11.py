"""YOLO11 detect/segment model family (n/s/m/l/x) in functional JAX.

Rebuilds the network whose compiled form the reference executes
(Assets/Resources/Model/yolo11n-seg-sentis.sentis; raw-head contract
documented at Assets/Scripts/InferenceEngine/Editor/IEModelEditorConverter.cs:48-60):

  output0: [B, 4 + nc + nm, A]  (xywh in input pixels, sigmoid class scores,
                                 mask coefficients), A = 8400 for 640x640
  output1: [B, nm, H/4, W/4]    (mask prototypes, 32 x 160 x 160)

Internally everything is NHWC / [B, A, C]; `raw_outputs_onnx_layout` emits the
exact ONNX/Sentis layout for golden tests.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.models import layers as L

Params = Dict[str, Any]

# scale: (depth_mult, width_mult, max_channels) — the standard YOLO11 ladder.
YOLO11_SCALES: Dict[str, Tuple[float, float, int]] = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}

# The published YOLOv8 ladder (cfg.arch == "yolov8"): the ultralytics
# generation most third-party checkpoints target. Same tasks/heads/export
# contract; C2f blocks (inner Bottleneck e=1.0), no C2PSA, 3/6/6/3
# backbone repeats, plain-conv cls head, shortcut-free neck blocks.
YOLOV8_SCALES: Dict[str, Tuple[float, float, int]] = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(x + divisor / 2) // divisor * divisor)


class Spec:
    """Resolved channel/repeat plan for one scale."""

    def __init__(self, cfg: ModelConfig):
        arch = getattr(cfg, "arch", "yolo11")
        if arch not in ("yolo11", "yolov8"):
            raise ValueError(
                f"Unknown arch {arch!r}; expected 'yolo11' or 'yolov8'")
        table = YOLO11_SCALES if arch == "yolo11" else YOLOV8_SCALES
        if cfg.scale not in table:
            raise ValueError(
                f"Unknown {arch} scale {cfg.scale!r}; expected one of "
                f"{sorted(table)}")
        if cfg.input_size[0] % 32 or cfg.input_size[1] % 32:
            raise ValueError(
                f"input_size {cfg.input_size} must be a multiple of 32 "
                "(the P5 stride)")
        depth, width, max_ch = table[cfg.scale]
        self.cfg = cfg
        self.arch = arch
        self.depth, self.width, self.max_ch = depth, width, max_ch
        # c3k flag is forced on for the wide scales (ultralytics scale
        # rule; YOLO11-only — v8 has no C3k blocks).
        self.force_c3k = arch == "yolo11" and cfg.scale in ("m", "l", "x")

        def ch(c: int) -> int:
            return make_divisible(min(c, max_ch) * width, 8)

        def rep(n: int) -> int:
            return max(round(n * depth), 1)

        self.ch, self.rep = ch, rep
        # backbone/head channel plan (base, pre-scale):
        self.c64, self.c128, self.c256 = ch(64), ch(128), ch(256)
        self.c512, self.c1024 = ch(512), ch(1024)
        self.n2 = rep(2)
        self.n3, self.n6 = rep(3), rep(6)      # v8 backbone/head repeats
        # detect head widths
        nc, reg_max = cfg.num_classes, cfg.reg_max
        self.head_ch = (self.c256, self.c512, self.c1024)   # P3, P4, P5
        self.c2 = max(16, self.head_ch[0] // 4, reg_max * 4)
        self.c3 = max(self.head_ch[0], min(nc, 100))
        self.c4 = max(self.head_ch[0] // 4, cfg.num_masks)
        self.proto_c = ch(256)                              # npr scaled
        self.strides = (8, 16, 32)
        # pose / obb extra-branch widths (ultralytics head conventions)
        self.nk = cfg.kpt_shape[0] * cfg.kpt_shape[1]
        self.c4_pose = max(self.head_ch[0] // 4, self.nk)
        self.c4_obb = max(self.head_ch[0] // 4, 1)
        self.cls_hidden = 1280                              # classify head


def _c3k(spec: Spec, flag: bool) -> bool:
    return True if spec.force_c3k else flag


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_backbone(kg: L.KeyGen, s: Spec, pd, p: Params) -> None:
    p["b0"] = L.conv_init(kg, 3, s.c64, 3, param_dtype=pd)
    p["b1"] = L.conv_init(kg, s.c64, s.c128, 3, param_dtype=pd)
    p["b2"] = L.c3k2_init(kg, s.c128, s.c256, s.n2, _c3k(s, False), 0.25, pd)
    p["b3"] = L.conv_init(kg, s.c256, s.c256, 3, param_dtype=pd)
    p["b4"] = L.c3k2_init(kg, s.c256, s.c512, s.n2, _c3k(s, False), 0.25, pd)
    p["b5"] = L.conv_init(kg, s.c512, s.c512, 3, param_dtype=pd)
    p["b6"] = L.c3k2_init(kg, s.c512, s.c512, s.n2, True, 0.5, pd)
    p["b7"] = L.conv_init(kg, s.c512, s.c1024, 3, param_dtype=pd)
    p["b8"] = L.c3k2_init(kg, s.c1024, s.c1024, s.n2, True, 0.5, pd)
    p["b9"] = L.sppf_init(kg, s.c1024, s.c1024, pd)
    p["b10"] = L.c2psa_init(kg, s.c1024, s.n2, 0.5, pd)


def _init_backbone_v8(kg: L.KeyGen, s: Spec, pd, p: Params,
                      with_sppf: bool = True) -> None:
    """YOLOv8 backbone (ultralytics yolov8.yaml layers 0-9): C2f blocks
    with 3/6/6/3 repeats, channel-preserving (the downsample convs carry
    the widening), SPPF last — no C2PSA. The classify task drops SPPF
    (yolov8-cls.yaml ends at the C2f(1024))."""
    p["b0"] = L.conv_init(kg, 3, s.c64, 3, param_dtype=pd)
    p["b1"] = L.conv_init(kg, s.c64, s.c128, 3, param_dtype=pd)
    p["b2"] = L.c2f_init(kg, s.c128, s.c128, s.n3, param_dtype=pd)
    p["b3"] = L.conv_init(kg, s.c128, s.c256, 3, param_dtype=pd)
    p["b4"] = L.c2f_init(kg, s.c256, s.c256, s.n6, param_dtype=pd)
    p["b5"] = L.conv_init(kg, s.c256, s.c512, 3, param_dtype=pd)
    p["b6"] = L.c2f_init(kg, s.c512, s.c512, s.n6, param_dtype=pd)
    p["b7"] = L.conv_init(kg, s.c512, s.c1024, 3, param_dtype=pd)
    p["b8"] = L.c2f_init(kg, s.c1024, s.c1024, s.n3, param_dtype=pd)
    if with_sppf:
        p["b9"] = L.sppf_init(kg, s.c1024, s.c1024, pd)


def _init_branch3(kg: L.KeyGen, s: Spec, pd, c_hidden: int,
                  c_out: int) -> list:
    """A per-level (conv3x3, conv3x3, 1x1-out) head branch — the shape
    shared by the seg-coef, pose-keypoint and obb-angle heads."""
    return [{
        "conv0": L.conv_init(kg, ci, c_hidden, 3, param_dtype=pd),
        "conv1": L.conv_init(kg, c_hidden, c_hidden, 3, param_dtype=pd),
        "out": L.head_conv_init(kg, c_hidden, c_out, 1, pd),
    } for ci in s.head_ch]


def _init_detect_head(kg: L.KeyGen, s: Spec, cfg: ModelConfig, pd) -> Params:
    """One detect head (box cv2 + cls cv3 per level). Built twice when
    cfg.o2o: the standard one-to-many head and the NMS-free one-to-one
    head share this structure (YOLOv10 dual-head pattern)."""
    import math as _math
    nc, reg_max = cfg.num_classes, cfg.reg_max
    head: Params = {"cv2": [], "cv3": []}
    for i, ci in enumerate(s.head_ch):
        head["cv2"].append({
            "conv0": L.conv_init(kg, ci, s.c2, 3, param_dtype=pd),
            "conv1": L.conv_init(kg, s.c2, s.c2, 3, param_dtype=pd),
            "out": L.head_conv_init(kg, s.c2, 4 * reg_max, 1, pd),
        })
        if s.arch == "yolov8":
            # v8 ("legacy") cls branch: two plain 3x3 convs — no
            # depthwise separation (that's the v11 head refinement)
            head["cv3"].append({
                "conv0": L.conv_init(kg, ci, s.c3, 3, param_dtype=pd),
                "conv1": L.conv_init(kg, s.c3, s.c3, 3, param_dtype=pd),
                "out": L.head_conv_init(kg, s.c3, nc, 1, pd),
            })
        else:
            head["cv3"].append({
                "dw0": L.dwconv_init(kg, ci, 3, pd),
                "pw0": L.conv_init(kg, ci, s.c3, 1, param_dtype=pd),
                "dw1": L.dwconv_init(kg, s.c3, 3, pd),
                "pw1": L.conv_init(kg, s.c3, s.c3, 1, param_dtype=pd),
                "out": L.head_conv_init(kg, s.c3, nc, 1, pd),
            })
        # bias init for stable random-weight behavior (standard YOLO recipe)
        stride = s.strides[i]
        head["cv2"][i]["out"]["b"] = jnp.full((4 * reg_max,), 1.0, pd)
        cls_bias = _math.log(5 / nc / (640 / stride) ** 2)
        head["cv3"][i]["out"]["b"] = jnp.full((nc,), cls_bias, pd)
    return head


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    kg = L.KeyGen(key)
    s = Spec(cfg)   # validates scale/input_size
    pd = jnp.dtype(cfg.param_dtype)
    p: Params = {}

    if cfg.task == "classify":
        # backbone-only topology + Conv(1280) + pooled linear head
        # (ultralytics Classify: Conv(c1, 1280, 1) -> AdaptiveAvgPool ->
        # Linear(1280, nc)). v8-cls ends at the C2f(1024) — no SPPF
        # (yolov8-cls.yaml), unlike v11-cls which keeps SPPF+C2PSA.
        if s.arch == "yolov8":
            _init_backbone_v8(kg, s, pd, p, with_sppf=False)
        else:
            _init_backbone(kg, s, pd, p)
        fan = s.cls_hidden
        p["cls_head"] = {
            "conv": L.conv_init(kg, s.c1024, s.cls_hidden, 1,
                                param_dtype=pd),
            "lin_w": jax.random.uniform(
                kg(), (s.cls_hidden, cfg.num_classes), pd,
                -math.sqrt(3.0 / fan), math.sqrt(3.0 / fan)),
            "lin_b": jnp.zeros((cfg.num_classes,), pd),
        }
        return p

    # --- backbone ---
    if s.arch == "yolov8":
        _init_backbone_v8(kg, s, pd, p)
        # v8 neck: C2f blocks (shortcut-free at apply time), skips at
        # c256 (x4) / c512 (x6) / c1024 (sppf)
        p["h13"] = L.c2f_init(kg, s.c1024 + s.c512, s.c512, s.n3,
                              param_dtype=pd)
        p["h16"] = L.c2f_init(kg, s.c512 + s.c256, s.c256, s.n3,
                              param_dtype=pd)
        p["h17"] = L.conv_init(kg, s.c256, s.c256, 3, param_dtype=pd)
        p["h19"] = L.c2f_init(kg, s.c256 + s.c512, s.c512, s.n3,
                              param_dtype=pd)
        p["h20"] = L.conv_init(kg, s.c512, s.c512, 3, param_dtype=pd)
        p["h22"] = L.c2f_init(kg, s.c512 + s.c1024, s.c1024, s.n3,
                              param_dtype=pd)
    else:
        _init_backbone(kg, s, pd, p)

        # --- FPN/PAN head ---
        p["h13"] = L.c3k2_init(kg, s.c1024 + s.c512, s.c512, s.n2, _c3k(s, False), 0.5, pd)
        p["h16"] = L.c3k2_init(kg, s.c512 + s.c512, s.c256, s.n2, _c3k(s, False), 0.5, pd)
        p["h17"] = L.conv_init(kg, s.c256, s.c256, 3, param_dtype=pd)
        p["h19"] = L.c3k2_init(kg, s.c256 + s.c512, s.c512, s.n2, _c3k(s, False), 0.5, pd)
        p["h20"] = L.conv_init(kg, s.c512, s.c512, 3, param_dtype=pd)
        p["h22"] = L.c3k2_init(kg, s.c512 + s.c1024, s.c1024, s.n2, True, 0.5, pd)

    # --- detect head (box reg + cls), one branch pair per pyramid level ---
    nc, reg_max = cfg.num_classes, cfg.reg_max
    if getattr(cfg, "o2o", False):
        if cfg.task not in ("detect", "segment"):
            raise ValueError(
                f"o2o (NMS-free) supports detect/segment, not {cfg.task}")
        p["det_o2o"] = _init_detect_head(kg, s, cfg, pd)
    p["det"] = _init_detect_head(kg, s, cfg, pd)

    # --- task extras ---
    if cfg.task == "segment":
        p["proto"] = L.proto_init(kg, s.head_ch[0], s.proto_c, cfg.num_masks, pd)
        p["seg_cv4"] = _init_branch3(kg, s, pd, s.c4, cfg.num_masks)
    elif cfg.task == "pose":
        p["pose_cv4"] = _init_branch3(kg, s, pd, s.c4_pose, s.nk)
    elif cfg.task == "obb":
        p["obb_cv4"] = _init_branch3(kg, s, pd, s.c4_obb, 1)
    return p


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def backbone(p: Params, x: jax.Array, cfg: ModelConfig, dt
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Backbone: x [B,H,W,3] -> (x4, x6, x10) skip features.

    NOTE: C3k2's shortcut defaults to True in YOLO11 — for ALL blocks,
    including the FPN/PAN head ones (unlike v8's C2f head blocks). The
    inner Bottlenecks are c->c so the residual is always active.
    Verified against the reference's real weights: head confidences
    collapse if these are run shortcut-less.
    """
    # NOTE: an exact space-to-depth stem (L.conv0_s2d_apply) was measured
    # and is 3% SLOWER end-to-end on v5e — XLA already handles the
    # low-channel stem well and the explicit s2d transpose is HBM-bound.
    if getattr(cfg, "arch", "yolo11") == "yolov8":
        # v8: same wiring, C2f blocks, SPPF last (no C2PSA). The classify
        # variant carries no SPPF (static structure check, jit-safe).
        x = L.conv_apply(p["b0"], x, stride=2, dtype=dt)
        x = L.conv_apply(p["b1"], x, stride=2, dtype=dt)
        x = L.c3k2_apply(p["b2"], x, shortcut=True, dtype=dt)
        x = L.conv_apply(p["b3"], x, stride=2, dtype=dt)
        x4 = L.c3k2_apply(p["b4"], x, shortcut=True, dtype=dt)
        x = L.conv_apply(p["b5"], x4, stride=2, dtype=dt)
        x6 = L.c3k2_apply(p["b6"], x, shortcut=True, dtype=dt)
        x = L.conv_apply(p["b7"], x6, stride=2, dtype=dt)
        x = L.c3k2_apply(p["b8"], x, shortcut=True, dtype=dt)
        if "b9" in p:
            x = L.sppf_apply(p["b9"], x, dtype=dt)
        return x4, x6, x
    x = L.conv_apply(p["b0"], x, stride=2, dtype=dt)
    x = L.conv_apply(p["b1"], x, stride=2, dtype=dt)
    x = L.c3k2_apply(p["b2"], x, shortcut=True, dtype=dt)
    x = L.conv_apply(p["b3"], x, stride=2, dtype=dt)
    x4 = L.c3k2_apply(p["b4"], x, shortcut=True, dtype=dt)
    x = L.conv_apply(p["b5"], x4, stride=2, dtype=dt)
    x6 = L.c3k2_apply(p["b6"], x, shortcut=True, dtype=dt)
    x = L.conv_apply(p["b7"], x6, stride=2, dtype=dt)
    x = L.c3k2_apply(p["b8"], x, shortcut=True, dtype=dt)
    x = L.sppf_apply(p["b9"], x, dtype=dt)
    x10 = L.c2psa_apply(p["b10"], x, dtype=dt)
    return x4, x6, x10


def neck(p: Params, feats: Tuple[jax.Array, jax.Array, jax.Array],
         cfg: ModelConfig, dt) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """FPN/PAN neck: (x4, x6, x10) -> (P3, P4, P5).

    YOLO11 runs its neck C3k2 blocks WITH the residual shortcut (see
    backbone() note); v8's neck C2f blocks are shortcut-free (ultralytics
    yolov8.yaml head: C2f(..., False))."""
    x4, x6, x10 = feats
    sc = getattr(cfg, "arch", "yolo11") != "yolov8"
    u = L.upsample2x_nearest(x10)
    x13 = L.c3k2_apply(p["h13"], jnp.concatenate([u, x6], -1), shortcut=sc, dtype=dt)
    u = L.upsample2x_nearest(x13)
    x16 = L.c3k2_apply(p["h16"], jnp.concatenate([u, x4], -1), shortcut=sc, dtype=dt)
    d = L.conv_apply(p["h17"], x16, stride=2, dtype=dt)
    x19 = L.c3k2_apply(p["h19"], jnp.concatenate([d, x13], -1), shortcut=sc, dtype=dt)
    d = L.conv_apply(p["h20"], x19, stride=2, dtype=dt)
    x22 = L.c3k2_apply(p["h22"], jnp.concatenate([d, x10], -1), shortcut=sc, dtype=dt)
    return x16, x19, x22


def _backbone_neck(p: Params, x: jax.Array, cfg: ModelConfig, dt):
    return neck(p, backbone(p, x, cfg, dt), cfg, dt)


def _detect_branches(p: Params, feats, cfg: ModelConfig, dt,
                     head: str = "det"):
    """Per-level raw head maps: box logits [B,H,W,4*reg_max], cls logits
    [B,H,W,nc]. head="det_o2o" runs the NMS-free one-to-one head."""
    boxes, clss = [], []
    for i, f in enumerate(feats):
        d2 = p[head]["cv2"][i]
        b = L.conv_apply(d2["conv0"], f, dtype=dt)
        b = L.conv_apply(d2["conv1"], b, dtype=dt)
        boxes.append(L.head_conv_apply(d2["out"], b, dtype=dt))
        d3 = p[head]["cv3"][i]
        if "dw0" in d3:          # v11 head: depthwise-separable cls branch
            c = L.dwconv_apply(d3["dw0"], f, dtype=dt)
            c = L.conv_apply(d3["pw0"], c, dtype=dt)
            c = L.dwconv_apply(d3["dw1"], c, dtype=dt)
            c = L.conv_apply(d3["pw1"], c, dtype=dt)
        else:                    # v8 ("legacy") head: two plain 3x3 convs
            c = L.conv_apply(d3["conv0"], f, dtype=dt)
            c = L.conv_apply(d3["conv1"], c, dtype=dt)
        clss.append(L.head_conv_apply(d3["out"], c, dtype=dt))
    return boxes, clss


def make_anchors(input_size: Tuple[int, int], strides=(8, 16, 32)) -> Tuple[np.ndarray, np.ndarray]:
    """Anchor cell centers (in per-level grid units) + per-anchor stride.

    Level order P3,P4,P5, row-major within a level — matching the reference
    graph's 8400-anchor axis.
    """
    pts, strs = [], []
    H, W = input_size
    for s in strides:
        h, w = H // s, W // s
        ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
        pts.append(np.stack([xs.reshape(-1), ys.reshape(-1)], -1))
        strs.append(np.full((h * w, 1), s, np.float32))
    return (np.concatenate(pts).astype(np.float32), np.concatenate(strs))


def dfl_decode(box_logits: jax.Array, reg_max: int) -> jax.Array:
    """Distribution Focal Loss decode: [B,A,4*reg_max] -> [B,A,4] ltrb distances."""
    B, A, _ = box_logits.shape
    x = box_logits.reshape(B, A, 4, reg_max).astype(jnp.float32)
    probs = jax.nn.softmax(x, axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.einsum("bafr,r->baf", probs, bins)


def head_outputs(params: Params, feats, cfg: ModelConfig,
                 concat_preds: bool = True) -> Dict[str, jax.Array]:
    """Detect/segment heads + DFL decode from (P3, P4, P5) features.

    Returns dict:
      boxes_xywh [B,A,4], scores [B,A,nc], mask_coefs [B,A,nm],
      protos [B,H/4,W/4,nm], and (when concat_preds) the ONNX-contract
      concat preds [B, A, 4+nc+nm] float32. The hot serving path passes
      concat_preds=False — the concat would materialize a huge [B,A,116]
      intermediate that postprocess immediately re-slices.
    """
    dt = jnp.dtype(cfg.dtype)
    boxes, clss = _detect_branches(params, feats, cfg, dt)

    B = feats[0].shape[0]
    box_flat = jnp.concatenate(
        [b.reshape(B, -1, 4 * cfg.reg_max) for b in boxes], axis=1)
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, cfg.num_classes) for c in clss], axis=1)

    anchors_np, strides_np = make_anchors(cfg.input_size)
    anchors = jnp.asarray(anchors_np)
    strides = jnp.asarray(strides_np)

    ltrb = dfl_decode(box_flat, cfg.reg_max)            # [B,A,4]
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    cxy = (x1y1 + x2y2) * 0.5 * strides[None]
    wh = (x2y2 - x1y1) * strides[None]
    xywh = jnp.concatenate([cxy, wh], axis=-1)          # input-pixel space
    scores = jax.nn.sigmoid(cls_flat.astype(jnp.float32))

    # raw logits for the hot serving path: sigmoid is monotonic, so ranking/
    # NMS can run on (bf16) logits and apply sigmoid only to the selected
    # top-K — skipping an [B,A,nc] f32 materialization (~344 MB at b=128).
    out = {"boxes_xywh": xywh, "scores": scores,
           "cls_logits": cls_flat}
    if getattr(cfg, "o2o", False) and "det_o2o" in params:
        # NMS-free one-to-one head: same decode, own branches. Gated on
        # cfg.o2o (not just param presence) so one trained dual-head
        # checkpoint deploys EITHER way — replace(cfg, o2o=False) serves
        # the classic NMS path without computing the o2o branches.
        ob, oc = _detect_branches(params, feats, cfg, dt, head="det_o2o")
        obox = jnp.concatenate(
            [b.reshape(B, -1, 4 * cfg.reg_max) for b in ob], axis=1)
        ocls = jnp.concatenate(
            [c.reshape(B, -1, cfg.num_classes) for c in oc], axis=1)
        oltrb = dfl_decode(obox, cfg.reg_max)
        ox1y1 = anchors[None] - oltrb[..., :2]
        ox2y2 = anchors[None] + oltrb[..., 2:]
        out["o2o_boxes_xywh"] = jnp.concatenate(
            [(ox1y1 + ox2y2) * 0.5 * strides[None],
             (ox2y2 - ox1y1) * strides[None]], axis=-1)
        out["o2o_cls_logits"] = ocls
    if cfg.task == "segment":
        protos = L.proto_apply(params["proto"], feats[0], dtype=dt)
        mc_flat = _branch3_forward(params["seg_cv4"], feats, dt,
                                   cfg.num_masks)
        out["mask_coefs"] = mc_flat.astype(jnp.float32)
        out["protos"] = protos.astype(jnp.float32)
        if concat_preds:
            out["preds"] = jnp.concatenate(
                [xywh, scores, out["mask_coefs"]], axis=-1)
    elif cfg.task == "pose":
        nk = cfg.kpt_shape[0] * cfg.kpt_shape[1]
        kf = _branch3_forward(params["pose_cv4"], feats, dt, nk)
        out["kpts"] = decode_kpts(kf.astype(jnp.float32), anchors,
                                  strides, cfg.kpt_shape)
        if concat_preds:
            out["preds"] = jnp.concatenate(
                [xywh, scores, out["kpts"].reshape(B, -1, nk)], axis=-1)
    elif cfg.task == "obb":
        af = _branch3_forward(params["obb_cv4"], feats, dt, 1)
        # ultralytics OBB: angle = (sigmoid(raw) - 0.25) * pi, decoded
        # BEFORE the box (the ltrb offsets rotate by it)
        angle = (jax.nn.sigmoid(af[..., 0].astype(jnp.float32)) - 0.25) \
            * jnp.pi
        out["boxes_xywhr"] = decode_rbox(ltrb, angle, anchors, strides)
        out["angle"] = angle
        if concat_preds:
            out["preds"] = jnp.concatenate(
                [out["boxes_xywhr"][..., :4], scores, angle[..., None]],
                axis=-1)
    elif concat_preds:
        out["preds"] = jnp.concatenate([xywh, scores], axis=-1)
    return out


def _branch3_forward(branch, feats, dt, c_out: int) -> jax.Array:
    """Apply a per-level (conv, conv, out) branch and flatten to
    [B, A, c_out] in anchor order (shared by seg/pose/obb heads)."""
    B = feats[0].shape[0]
    outs = []
    for i, f in enumerate(feats):
        c4 = branch[i]
        m = L.conv_apply(c4["conv0"], f, dtype=dt)
        m = L.conv_apply(c4["conv1"], m, dtype=dt)
        outs.append(L.head_conv_apply(c4["out"], m, dtype=dt))
    return jnp.concatenate([m.reshape(B, -1, c_out) for m in outs], axis=1)


def decode_kpts(kpt_flat: jax.Array, anchors: jax.Array,
                strides: jax.Array, kpt_shape) -> jax.Array:
    """Raw keypoint maps [B,A,K*D] -> decoded [B,A,K,D]: per keypoint
    xy = (raw*2 + anchor - 0.5) * stride (input pixels), visibility =
    sigmoid(raw) when D==3 (ultralytics Pose.kpts_decode semantics)."""
    B, A, _ = kpt_flat.shape
    K, D = kpt_shape
    y = kpt_flat.reshape(B, A, K, D)
    xy = (y[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) \
        * strides[None, :, None, :]
    if D == 3:
        return jnp.concatenate(
            [xy, jax.nn.sigmoid(y[..., 2:3])], axis=-1)
    return xy


def decode_rbox(ltrb: jax.Array, angle: jax.Array, anchors: jax.Array,
                strides: jax.Array) -> jax.Array:
    """DFL ltrb distances + angle -> rotated boxes [B,A,5] (cx, cy, w, h
    in input pixels, angle in radians) — ultralytics dist2rbox: the
    center offset rotates by the angle; w/h stay axis-local."""
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    c, s = jnp.cos(angle), jnp.sin(angle)
    off = (rb - lt) * 0.5
    xf, yf = off[..., 0], off[..., 1]
    x = xf * c - yf * s
    y = xf * s + yf * c
    xy = (jnp.stack([x, y], -1) + anchors[None]) * strides[None]
    wh = (lt + rb) * strides[None]
    return jnp.concatenate([xy, wh, angle[..., None]], axis=-1)


def forward(params: Params, x: jax.Array, cfg: ModelConfig,
            concat_preds: bool = True) -> Dict[str, jax.Array]:
    """Full raw-head forward: backbone -> neck -> heads (see head_outputs)."""
    if tuple(x.shape[1:3]) != tuple(cfg.input_size):
        raise ValueError(
            f"input {x.shape} does not match cfg.input_size {cfg.input_size} "
            "(NHWC expected)")
    dt = jnp.dtype(cfg.dtype)
    from xrseg_tpu.precision import precision_scope
    with precision_scope(cfg.matmul_precision):
        if cfg.task == "classify":
            return classify_forward(params, x, cfg)
        feats = _backbone_neck(params, x, cfg, dt)
        return head_outputs(params, feats, cfg, concat_preds=concat_preds)


def classify_forward(params: Params, x: jax.Array, cfg: ModelConfig
                     ) -> Dict[str, jax.Array]:
    """Classification task: backbone -> Conv(1280) -> global average pool
    -> linear (ultralytics Classify head). Returns logits [B,nc] and
    probs (softmax, matching the deployed classify graph)."""
    dt = jnp.dtype(cfg.dtype)
    _, _, x10 = backbone(params, x, cfg, dt)
    h = params["cls_head"]
    y = L.conv_apply(h["conv"], x10, dtype=dt)      # [B,h,w,1280]
    y = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    logits = y @ h["lin_w"].astype(jnp.float32) \
        + h["lin_b"].astype(jnp.float32)
    return {"logits": logits, "probs": jax.nn.softmax(logits, axis=-1)}


def forward_train(params: Params, x: jax.Array, cfg: ModelConfig
                  ) -> Dict[str, jax.Array]:
    """Training forward: raw logits + decoded boxes (no sigmoid/concat).

    Returns: box_logits [B,A,4*reg_max], cls_logits [B,A,nc],
    boxes_xywh [B,A,4] (decoded, input pixels), and for segment task
    mask_coefs [B,A,nm] + protos [B,h,w,nm].

    Anchors are derived from x's actual spatial shape (not cfg.input_size)
    so multi-scale training works: each distinct (H,W) traces its own
    specialization with matching anchor grids.
    """
    dt = jnp.dtype(cfg.dtype)
    from xrseg_tpu.precision import precision_scope
    with precision_scope(cfg.matmul_precision):
        feats = _backbone_neck(params, x, cfg, dt)
        boxes, clss = _detect_branches(params, feats, cfg, dt)
        B = x.shape[0]
        box_flat = jnp.concatenate(
            [b.reshape(B, -1, 4 * cfg.reg_max) for b in boxes], axis=1
        ).astype(jnp.float32)
        cls_flat = jnp.concatenate(
            [c.reshape(B, -1, cfg.num_classes) for c in clss], axis=1
        ).astype(jnp.float32)

        anchors_np, strides_np = make_anchors(tuple(x.shape[1:3]))
        anchors = jnp.asarray(anchors_np)
        strides = jnp.asarray(strides_np)
        ltrb = dfl_decode(box_flat, cfg.reg_max)
        x1y1 = anchors[None] - ltrb[..., :2]
        x2y2 = anchors[None] + ltrb[..., 2:]
        xywh = jnp.concatenate([(x1y1 + x2y2) * 0.5 * strides[None],
                                (x2y2 - x1y1) * strides[None]], axis=-1)
        out = {"box_logits": box_flat, "cls_logits": cls_flat,
               "boxes_xywh": xywh}
        if getattr(cfg, "o2o", False) and "det_o2o" in params:
            ob, oc = _detect_branches(params, feats, cfg, dt,
                                      head="det_o2o")
            obox = jnp.concatenate(
                [b.reshape(B, -1, 4 * cfg.reg_max) for b in ob], axis=1
            ).astype(jnp.float32)
            ocls = jnp.concatenate(
                [c.reshape(B, -1, cfg.num_classes) for c in oc], axis=1
            ).astype(jnp.float32)
            oltrb = dfl_decode(obox, cfg.reg_max)
            ox1y1 = anchors[None] - oltrb[..., :2]
            ox2y2 = anchors[None] + oltrb[..., 2:]
            out["o2o_box_logits"] = obox
            out["o2o_cls_logits"] = ocls
            out["o2o_boxes_xywh"] = jnp.concatenate(
                [(ox1y1 + ox2y2) * 0.5 * strides[None],
                 (ox2y2 - ox1y1) * strides[None]], axis=-1)
        if cfg.task == "segment":
            out["protos"] = L.proto_apply(params["proto"], feats[0],
                                          dtype=dt).astype(jnp.float32)
            out["mask_coefs"] = _branch3_forward(
                params["seg_cv4"], feats, dt, cfg.num_masks
            ).astype(jnp.float32)
        elif cfg.task == "pose":
            nk = cfg.kpt_shape[0] * cfg.kpt_shape[1]
            kf = _branch3_forward(params["pose_cv4"], feats, dt, nk)
            out["kpts"] = decode_kpts(kf.astype(jnp.float32), anchors,
                                      strides, cfg.kpt_shape)
        elif cfg.task == "obb":
            af = _branch3_forward(params["obb_cv4"], feats, dt, 1)
            angle = (jax.nn.sigmoid(af[..., 0].astype(jnp.float32))
                     - 0.25) * jnp.pi
            out["boxes_xywhr"] = decode_rbox(ltrb, angle, anchors, strides)
    return out


def raw_outputs_onnx_layout(out: Dict[str, jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """Exact reference-ONNX layout: ([B,116,A], [B,nm,H,W]).

    ref contract: IEModelEditorConverter.cs:50-58.
    """
    o0 = jnp.swapaxes(out["preds"], 1, 2)
    o1 = jnp.transpose(out["protos"], (0, 3, 1, 2))
    return o0, o1


def ordered_param_slots(cfg: ModelConfig):
    """Conv-like param paths in the reference graph's execution/topo order.

    This is the order weighted ops appear in the exported ONNX / compiled
    .sentis chain list (verified against the reference artifact): backbone
    sequentially, FPN level blocks each followed immediately by that level's
    detect branches, the DFL conv, then segment cv4 heads and Proto.

    Yields (path, kind) with path a tuple of keys into the param pytree and
    kind in {"conv", "convtranspose", "dfl"} ("dfl" consumes the fixed
    arange conv; it has no learnable params in our decode).
    """
    s = Spec(cfg)
    slots = []

    def conv(*path):
        slots.append((tuple(path), "conv"))

    def bottleneck(*p):
        conv(*p, "cv1")
        conv(*p, "cv2")

    def c3k(*p):
        conv(*p, "cv1")
        for i in range(2):
            bottleneck(*p, "m", i)
        conv(*p, "cv2")
        conv(*p, "cv3")

    def c3k2(name, is_c3k):
        conv(name, "cv1")
        for i in range(s.n2):
            if is_c3k:
                c3k(name, "m", i)
            else:
                bottleneck(name, "m", i)
        conv(name, "cv2")

    def branch3(name):
        for i in range(3):
            conv(name, i, "conv0")
            conv(name, i, "conv1")
            conv(name, i, "out")

    def task_tail():
        if cfg.task == "segment":
            branch3("seg_cv4")
            conv("proto", "cv1")
            slots.append((("proto",), "convtranspose"))
            conv("proto", "cv2")
            conv("proto", "cv3")
        elif cfg.task == "pose":
            branch3("pose_cv4")
        elif cfg.task == "obb":
            branch3("obb_cv4")

    if s.arch == "yolov8":
        def c2f(name, n):
            conv(name, "cv1")
            for i in range(n):
                bottleneck(name, "m", i)
            conv(name, "cv2")

        def detect_level_v8(i):
            conv("det", "cv2", i, "conv0")
            conv("det", "cv2", i, "conv1")
            conv("det", "cv2", i, "out")
            conv("det", "cv3", i, "conv0")
            conv("det", "cv3", i, "conv1")
            conv("det", "cv3", i, "out")

        conv("b0"); conv("b1")
        c2f("b2", s.n3); conv("b3")
        c2f("b4", s.n6); conv("b5")
        c2f("b6", s.n6); conv("b7")
        c2f("b8", s.n3)
        if cfg.task == "classify":   # v8-cls: no SPPF
            conv("cls_head", "conv")
            slots.append((("cls_head",), "gemm"))
            return slots
        conv("b9", "cv1"); conv("b9", "cv2")
        c2f("h13", s.n3)
        c2f("h16", s.n3)
        detect_level_v8(0)
        conv("h17")
        c2f("h19", s.n3)
        detect_level_v8(1)
        conv("h20")
        c2f("h22", s.n3)
        detect_level_v8(2)
        slots.append(((), "dfl"))
        task_tail()
        return slots

    fc3k = s.force_c3k
    conv("b0"); conv("b1")
    c3k2("b2", fc3k or False); conv("b3")
    c3k2("b4", fc3k or False); conv("b5")
    c3k2("b6", True); conv("b7")
    c3k2("b8", True)
    conv("b9", "cv1"); conv("b9", "cv2")
    conv("b10", "cv1")
    for i in range(s.n2):
        conv("b10", "m", i, "attn", "qkv")
        conv("b10", "m", i, "attn", "pe")
        conv("b10", "m", i, "attn", "proj")
        conv("b10", "m", i, "ffn1")
        conv("b10", "m", i, "ffn2")
    conv("b10", "cv2")

    if cfg.task == "classify":
        # backbone-only topology: Conv(1280) then the pooled linear head
        # (exported as a Gemm; the Gemm slot carries (lin_w, lin_b))
        conv("cls_head", "conv")
        slots.append((("cls_head",), "gemm"))
        return slots

    c3k2("h13", fc3k or False)
    c3k2("h16", fc3k or False)

    def detect_level(i):
        conv("det", "cv2", i, "conv0")
        conv("det", "cv2", i, "conv1")
        conv("det", "cv2", i, "out")
        conv("det", "cv3", i, "dw0")
        conv("det", "cv3", i, "pw0")
        conv("det", "cv3", i, "dw1")
        conv("det", "cv3", i, "pw1")
        conv("det", "cv3", i, "out")

    detect_level(0)
    conv("h17")
    c3k2("h19", fc3k or False)
    detect_level(1)
    conv("h20")
    c3k2("h22", True)
    detect_level(2)
    slots.append(((), "dfl"))

    task_tail()                   # seg cv4+proto / pose / obb after DFL
    return slots


def model_info(cfg: ModelConfig, params: Params | None = None) -> Dict[str, Any]:
    """Model summary (the ultralytics `model.info()` equivalent): parameter
    count and compiled-FLOPs estimate from XLA's cost analysis."""
    if params is None:
        params = init_params(jax.random.key(0), cfg)
    n_params = count_params(params)
    info: Dict[str, Any] = {
        "scale": cfg.scale, "task": cfg.task,
        "input_size": tuple(cfg.input_size),
        "params": n_params, "params_m": round(n_params / 1e6, 3),
        "anchors": cfg.num_anchors,
    }
    try:
        x = jax.ShapeDtypeStruct((1,) + tuple(cfg.input_size) + (3,),
                                 jnp.float32)
        compiled = jax.jit(lambda p, xx: forward(p, xx, cfg)).lower(
            params, x).compile()
        cost = compiled.cost_analysis()
        if cost and "flops" in cost:
            info["gflops"] = round(float(cost["flops"]) / 1e9, 2)
    except Exception:
        pass
    return info


def count_params(params: Params) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params)
               if hasattr(a, "shape"))
