"""Independent torch re-implementation of the YOLO11 blocks, used as a
numerical oracle for the JAX model (tests only; never on the TPU path).

Takes the *same* parameter pytree the JAX model uses (folded-BN {w, b} with
HWIO weights) and runs the equivalent torch math in NCHW/OIHW. Any layout,
padding, or wiring mistake in the JAX code shows up as a mismatch here.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _t(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, np.float32))


def _w(p) -> torch.Tensor:
    # HWIO -> OIHW
    return _t(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))


def to_nchw(x: np.ndarray) -> torch.Tensor:
    return _t(np.transpose(x, (0, 3, 1, 2)))


def to_nhwc(x: torch.Tensor) -> np.ndarray:
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


def conv(p, x: torch.Tensor, stride=1, groups=1, act=True) -> torch.Tensor:
    w = _w(p)
    k = w.shape[-1]
    y = F.conv2d(x, w, _t(p["b"]), stride=stride, padding=k // 2, groups=groups)
    return F.silu(y) if act else y


def dwconv(p, x, stride=1, act=True):
    return conv(p, x, stride=stride, groups=x.shape[1], act=act)


def bottleneck(p, x, shortcut):
    y = conv(p["cv2"], conv(p["cv1"], x))
    return x + y if (shortcut and x.shape[1] == y.shape[1]) else y


def c3k(p, x, shortcut=True):
    y1 = conv(p["cv1"], x)
    for bp in p["m"]:
        y1 = bottleneck(bp, y1, shortcut)
    y2 = conv(p["cv2"], x)
    return conv(p["cv3"], torch.cat([y1, y2], 1))


def c3k2(p, x, shortcut=True):
    is_c3k = "cv3" in p["m"][0]
    y = conv(p["cv1"], x)
    a, b = torch.chunk(y, 2, 1)
    outs = [a, b]
    cur = b
    for bp in p["m"]:
        cur = c3k(bp, cur, shortcut) if is_c3k else bottleneck(bp, cur, shortcut)
        outs.append(cur)
    return conv(p["cv2"], torch.cat(outs, 1))


def sppf(p, x, k=5):
    y = conv(p["cv1"], x)
    y1 = F.max_pool2d(y, k, 1, k // 2)
    y2 = F.max_pool2d(y1, k, 1, k // 2)
    y3 = F.max_pool2d(y2, k, 1, k // 2)
    return conv(p["cv2"], torch.cat([y, y1, y2, y3], 1))


def attention(p, x, num_heads):
    B, C, H, W = x.shape
    nh = num_heads
    hd = C // nh
    kd = (p["qkv"]["w"].shape[-1] - C) // (2 * nh)
    N = H * W
    qkv = conv(p["qkv"], x, act=False)
    # match the JAX reshape: NHWC [B,N,nh,kd*2+hd]
    qkv_nhwc = qkv.permute(0, 2, 3, 1).reshape(B, N, nh, kd * 2 + hd)
    q, k, v = torch.split(qkv_nhwc, [kd, kd, hd], dim=-1)
    attn = torch.einsum("bqhd,bkhd->bhqk", q, k) * (kd ** -0.5)
    attn = torch.softmax(attn, dim=-1)
    o = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, H, W, C)
    o = o.permute(0, 3, 1, 2).contiguous()
    vmap = v.reshape(B, H, W, nh * hd).permute(0, 3, 1, 2).contiguous()
    o = o + dwconv(p["pe"], vmap, act=False)
    return conv(p["proj"], o, act=False)


def psablock(p, x):
    x = x + attention(p["attn"], x, max(1, x.shape[1] // 64))
    y = conv(p["ffn2"], conv(p["ffn1"], x), act=False)
    return x + y


def c2psa(p, x):
    y = conv(p["cv1"], x)
    c = p["cv1"]["w"].shape[-1] // 2
    a, b = torch.split(y, [c, y.shape[1] - c], 1)
    for bp in p["m"]:
        b = psablock(bp, b)
    return conv(p["cv2"], torch.cat([a, b], 1))


def proto(p, x):
    y = conv(p["cv1"], x)
    w = _t(np.transpose(np.asarray(p["up_w"]), (2, 3, 0, 1)))  # HWIO->IOHW
    y = F.conv_transpose2d(y, w, _t(p["up_b"]), stride=2)
    y = conv(p["cv2"], y)
    return conv(p["cv3"], y)


def upsample2x(x):
    return F.interpolate(x, scale_factor=2, mode="nearest")


def backbone_neck(p, x):
    # Structure-driven arch dispatch (mirrors yolo11.backbone/neck):
    # v8 params carry no C2PSA ("b10") and run the neck blocks
    # shortcut-free; the layer SEQUENCE is otherwise identical.
    v8 = "b10" not in p
    sc = not v8
    x = conv(p["b0"], x, 2)
    x = conv(p["b1"], x, 2)
    x = c3k2(p["b2"], x, shortcut=True)
    x = conv(p["b3"], x, 2)
    x4 = c3k2(p["b4"], x, shortcut=True)
    x = conv(p["b5"], x4, 2)
    x6 = c3k2(p["b6"], x, shortcut=True)
    x = conv(p["b7"], x6, 2)
    x = c3k2(p["b8"], x, shortcut=True)
    x = sppf(p["b9"], x)
    x10 = x if v8 else c2psa(p["b10"], x)

    u = upsample2x(x10)
    x13 = c3k2(p["h13"], torch.cat([u, x6], 1), shortcut=sc)
    u = upsample2x(x13)
    x16 = c3k2(p["h16"], torch.cat([u, x4], 1), shortcut=sc)
    d = conv(p["h17"], x16, 2)
    x19 = c3k2(p["h19"], torch.cat([d, x13], 1), shortcut=sc)
    d = conv(p["h20"], x19, 2)
    x22 = c3k2(p["h22"], torch.cat([d, x10], 1), shortcut=sc)
    return x16, x19, x22


def detect_heads(p, feats):
    boxes, clss = [], []
    for i, f in enumerate(feats):
        d2 = p["det"]["cv2"][i]
        b = conv(d2["conv1"], conv(d2["conv0"], f))
        boxes.append(conv(d2["out"], b, act=False))
        d3 = p["det"]["cv3"][i]
        if "dw0" in d3:      # v11 depthwise-separable cls branch
            c = conv(d3["pw0"], dwconv(d3["dw0"], f))
            c = conv(d3["pw1"], dwconv(d3["dw1"], c))
        else:                # v8 legacy: two plain 3x3 convs
            c = conv(d3["conv1"], conv(d3["conv0"], f))
        clss.append(conv(d3["out"], c, act=False))
    return boxes, clss


def seg_heads(p, feats):
    mcs = []
    for i, f in enumerate(feats):
        c4 = p["seg_cv4"][i]
        m = conv(c4["conv1"], conv(c4["conv0"], f))
        mcs.append(conv(c4["out"], m, act=False))
    return mcs


def full_forward(p, x_nhwc: np.ndarray, cfg):
    """Torch mirror of yolo11.forward up to raw flattened heads + numpy decode."""
    x = to_nchw(x_nhwc)
    feats = backbone_neck(p, x)
    boxes, clss = detect_heads(p, feats)
    B = x.shape[0]

    def flat(maps, c):
        # NCHW -> NHWC -> [B, A, c]; matches the JAX reshape order
        return np.concatenate([to_nhwc(m).reshape(B, -1, c) for m in maps], 1)

    box_flat = flat(boxes, 4 * cfg.reg_max)
    cls_flat = flat(clss, cfg.num_classes)

    from xrseg_tpu.models.yolo11 import make_anchors
    anchors, strides = make_anchors(cfg.input_size)
    x4 = box_flat.reshape(B, -1, 4, cfg.reg_max)
    probs = np.exp(x4 - x4.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ltrb = (probs * np.arange(cfg.reg_max)).sum(-1)
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    cxy = (x1y1 + x2y2) * 0.5 * strides[None]
    wh = (x2y2 - x1y1) * strides[None]
    xywh = np.concatenate([cxy, wh], -1)
    scores = 1.0 / (1.0 + np.exp(-cls_flat))

    out = {"boxes_xywh": xywh, "scores": scores}
    if cfg.task == "segment":
        out["protos"] = to_nhwc(proto(p["proto"], feats[0]))
        out["mask_coefs"] = flat(seg_heads(p, feats), cfg.num_masks)
        out["preds"] = np.concatenate([xywh, scores, out["mask_coefs"]], -1)
    else:
        out["preds"] = np.concatenate([xywh, scores], -1)
    return out


# ---------------------------------------------------------------------------
# full-pipeline oracle: preprocess + forward + ultralytics-style postprocess
# (threshold -> class-aware NMS -> mask synthesis), all torch/numpy.
# Used to measure end-to-end accuracy parity (ACCURACY.md); mirrors the
# reference's baked graph contract (IEModelEditorConverter.cs:31-106).
# ---------------------------------------------------------------------------

def oracle_preprocess(img_uint8: np.ndarray, out_hw=(640, 640)) -> np.ndarray:
    """uint8 [H,W,3] -> float [1,oh,ow,3] in [0,1]; 2-tap bilinear stretch
    (TextureConverter.ToTensor semantics) via torch interpolate."""
    x = _t(img_uint8[None]).permute(0, 3, 1, 2) / 255.0
    x = F.interpolate(x, size=tuple(out_hw), mode="bilinear",
                      align_corners=False, antialias=False)
    return to_nhwc(x)


def oracle_detections(out: dict, iou_threshold: float, score_threshold: float,
                      max_det: int = 50) -> list:
    """full_forward() outputs -> final detections, via numpy threshold +
    class-aware greedy NMS + per-instance mask synthesis (sigmoid 160x160,
    uncropped — cropping is display-layer semantics, IEMasker.cs:232-247).

    Returns a list of dicts {box_xywh, label, score, mask|None}.
    """
    from xrseg_tpu.ops.nms import nms_reference_numpy
    boxes = np.asarray(out["boxes_xywh"][0], np.float32)
    scores_all = np.asarray(out["scores"][0], np.float32)
    scores = scores_all.max(-1)
    labels = scores_all.argmax(-1)
    keep = nms_reference_numpy(boxes, scores, labels, iou_threshold,
                               score_threshold)[:max_det]
    protos = out.get("protos")
    coefs = out.get("mask_coefs")
    dets = []
    for i in keep:
        m = None
        if protos is not None:
            logit = np.einsum("c,hwc->hw", np.asarray(coefs[0][i], np.float32),
                              np.asarray(protos[0], np.float32))
            m = 1.0 / (1.0 + np.exp(-logit))
        dets.append({"box_xywh": boxes[i], "label": int(labels[i]),
                     "score": float(scores[i]), "mask": m})
    return dets


# ---------------------------------------------------------------------------
# task-family heads (pose / obb / classify) — independent torch/numpy math
# ---------------------------------------------------------------------------

def branch3_heads(branch, feats):
    """Generic (conv, conv, out) per-level branch (seg/pose/obb heads)."""
    outs = []
    for i, f in enumerate(feats):
        c4 = branch[i]
        m = conv(c4["conv1"], conv(c4["conv0"], f))
        outs.append(conv(c4["out"], m, act=False))
    return outs


def pose_forward(p, x_nhwc: np.ndarray, cfg):
    """Torch mirror of the pose task: boxes (xywh), scores, decoded kpts
    [B, A, K, D] with xy=(raw*2 + anchor - 0.5)*stride, vis=sigmoid."""
    base = full_forward_detect_base(p, x_nhwc, cfg)
    feats, B = base["feats"], base["B"]
    K, D = cfg.kpt_shape
    nk = K * D
    kf = np.concatenate([to_nhwc(m).reshape(B, -1, nk)
                         for m in branch3_heads(p["pose_cv4"], feats)], 1)
    from xrseg_tpu.models.yolo11 import make_anchors
    anchors, strides = make_anchors(cfg.input_size)
    y = kf.reshape(B, -1, K, D).astype(np.float64)
    xy = (y[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) \
        * strides[None, :, None, :]
    if D == 3:
        vis = 1.0 / (1.0 + np.exp(-y[..., 2:3]))
        kpts = np.concatenate([xy, vis], -1)
    else:
        kpts = xy
    return {"boxes_xywh": base["boxes_xywh"], "scores": base["scores"],
            "kpts": kpts.astype(np.float32)}


def obb_forward(p, x_nhwc: np.ndarray, cfg):
    """Torch mirror of the obb task: xywhr boxes via dist2rbox."""
    base = full_forward_detect_base(p, x_nhwc, cfg)
    feats, B = base["feats"], base["B"]
    af = np.concatenate([to_nhwc(m).reshape(B, -1, 1)
                         for m in branch3_heads(p["obb_cv4"], feats)], 1)
    angle = (1.0 / (1.0 + np.exp(-af[..., 0].astype(np.float64))) - 0.25) \
        * np.pi
    from xrseg_tpu.models.yolo11 import make_anchors
    anchors, strides = make_anchors(cfg.input_size)
    ltrb = base["ltrb"]
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    c, s = np.cos(angle), np.sin(angle)
    off = (rb - lt) * 0.5
    x_, y_ = off[..., 0] * c - off[..., 1] * s, \
        off[..., 0] * s + off[..., 1] * c
    xy = (np.stack([x_, y_], -1) + anchors[None]) * strides[None]
    wh = (lt + rb) * strides[None]
    return {"boxes_xywhr": np.concatenate(
        [xy, wh, angle[..., None]], -1).astype(np.float32),
        "scores": base["scores"]}


def full_forward_detect_base(p, x_nhwc: np.ndarray, cfg):
    """Shared detect-base forward: feats + decoded ltrb/xywh + scores."""
    x = to_nchw(x_nhwc)
    feats = backbone_neck(p, x)
    boxes, clss = detect_heads(p, feats)
    B = x.shape[0]
    box_flat = np.concatenate(
        [to_nhwc(m).reshape(B, -1, 4 * cfg.reg_max) for m in boxes], 1)
    cls_flat = np.concatenate(
        [to_nhwc(m).reshape(B, -1, cfg.num_classes) for m in clss], 1)
    from xrseg_tpu.models.yolo11 import make_anchors
    anchors, strides = make_anchors(cfg.input_size)
    x4 = box_flat.reshape(B, -1, 4, cfg.reg_max)
    probs = np.exp(x4 - x4.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ltrb = (probs * np.arange(cfg.reg_max)).sum(-1)
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    xywh = np.concatenate([(x1y1 + x2y2) * 0.5 * strides[None],
                           (x2y2 - x1y1) * strides[None]], -1)
    return {"feats": feats, "B": B, "ltrb": ltrb, "boxes_xywh": xywh,
            "scores": 1.0 / (1.0 + np.exp(-cls_flat))}


def classify_forward_torch(p, x_nhwc: np.ndarray, cfg):
    """Torch mirror of the classify task: backbone -> Conv(1280) ->
    global mean pool -> linear."""
    x = to_nchw(x_nhwc)
    x = conv(p["b0"], x, 2)
    x = conv(p["b1"], x, 2)
    x = c3k2(p["b2"], x, shortcut=True)
    x = conv(p["b3"], x, 2)
    x = c3k2(p["b4"], x, shortcut=True)
    x = conv(p["b5"], x, 2)
    x = c3k2(p["b6"], x, shortcut=True)
    x = conv(p["b7"], x, 2)
    x = c3k2(p["b8"], x, shortcut=True)
    if "b9" in p:            # v8-cls carries no SPPF
        x = sppf(p["b9"], x)
    if "b10" in p:           # ... and no C2PSA
        x = c2psa(p["b10"], x)
    h = p["cls_head"]
    y = conv(h["conv"], x)                       # [B,1280,h,w]
    y = y.mean(dim=(2, 3)).numpy().astype(np.float64)
    return y @ np.asarray(h["lin_w"], np.float64) \
        + np.asarray(h["lin_b"], np.float64)
