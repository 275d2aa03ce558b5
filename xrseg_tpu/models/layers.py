"""YOLO11 building blocks in functional JAX (NHWC, MXU-friendly).

These reimplement the *architecture* that the reference's ONNX graph encodes
(Conv+BN+SiLU, C3k2, SPPF, C2PSA attention, DFL detect / segment heads),
executed by Sentis in the reference (ref: Packages/manifest.json:4). We are
the engine here, so the modules are written TPU-first:

  - NHWC activations / HWIO weights (XLA's preferred TPU conv layout).
  - BatchNorm folded into conv weights at init/load time: inference params
    are always {w, b}. (The reference likewise ships a baked inference
    graph — Assets/.../IEModelEditorConverter.cs:100-102.)
  - bfloat16 compute with float32 MXU accumulation.
  - No dynamic shapes, no data-dependent control flow: jit-safe throughout.

Param trees are plain nested dicts so they shard/serialize trivially.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]


class KeyGen:
    """Sequential PRNG key splitter for deterministic init."""

    def __init__(self, key: jax.Array):
        self._key = key

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub


def autopad(k: int) -> int:
    """'same' padding for odd kernels, matching torch Conv2d(padding=k//2)."""
    return k // 2


# ---------------------------------------------------------------------------
# Conv (+ folded BN + SiLU)
# ---------------------------------------------------------------------------

def conv_init(kg: KeyGen, c1: int, c2: int, k: int = 1, groups: int = 1,
              param_dtype=jnp.float32) -> Params:
    """Kaiming-uniform init, bias zero (BN fold of a fresh BN is identity)."""
    fan_in = c1 // groups * k * k
    bound = math.sqrt(1.0 / fan_in) if fan_in > 0 else 1.0
    w = jax.random.uniform(kg(), (k, k, c1 // groups, c2), param_dtype,
                           -bound * math.sqrt(3.0), bound * math.sqrt(3.0))
    b = jnp.zeros((c2,), param_dtype)
    return {"w": w, "b": b}


def _conv2d_f32acc_primal(x, w, strides, padding, groups):
    return lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv2d_f32acc(x, w, strides, padding, groups):
    """Low-precision conv with f32 accumulation (preferred_element_type),
    made reverse-differentiable.

    JAX cannot transpose a conv whose output dtype differs from its
    operands (the f32 cotangent meets bf16 weights in the transposed
    conv), so bf16 TRAINING through the stock call dies with a dtype
    error. The custom VJP keeps the exact f32-accumulating forward (same
    HLO — inference is untouched) and routes gradients through the
    same-dtype conv with the cotangent cast to the operand dtype: the
    standard mixed-precision recipe (bf16 grads, f32 master weights
    upstream in the optimizer)."""
    return _conv2d_f32acc_primal(x, w, strides, padding, groups)


def _conv2d_f32acc_fwd(x, w, strides, padding, groups):
    return _conv2d_f32acc_primal(x, w, strides, padding, groups), (x, w)


def _conv2d_f32acc_bwd(strides, padding, groups, res, g):
    x, w = res
    _, vjp = jax.vjp(
        lambda a, b: lax.conv_general_dilated(
            a, b, window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups), x, w)
    return vjp(g.astype(x.dtype))


conv2d_f32acc.defvjp(_conv2d_f32acc_fwd, _conv2d_f32acc_bwd)


def conv_apply(p: Params, x: jax.Array, *, stride: int = 1, groups: int = 1,
               act: bool = True, dtype=jnp.bfloat16) -> jax.Array:
    """Conv2d + (folded-BN) bias + SiLU. x: [B,H,W,C]. w: [k,k,Cin/g,Cout]."""
    k = p["w"].shape[0]
    pad = autopad(k)
    y = conv2d_f32acc(x.astype(dtype), p["w"].astype(dtype),
                      (stride, stride), ((pad, pad), (pad, pad)), groups)
    y = y + p["b"].astype(jnp.float32)
    if act:
        y = jax.nn.silu(y)
    return y.astype(dtype)


def conv0_s2d_apply(p: Params, x: jax.Array, *, act: bool = True,
                    dtype=jnp.bfloat16) -> jax.Array:
    """Stem conv (k=3, s=2) via space-to-depth — exact same math, 4x the
    input channels on the MXU lanes.

    A 3-channel 640px stride-2 conv runs at ~2% MXU utilization (lanes are
    128-wide; 3 input channels starve them). Rearranging the input as
    [B,H/2,W/2,4C] (space-to-depth 2x2) turns the k=3 s=2 conv into an
    equivalent k=2 s=1 conv over 12 channels with weights scattered from
    the original kernel:

      out[y,x] = sum_{o in -1..1} in[2y+o] W[o+1]  ==
      sum_{KY in 0..1, py in 0..1} X[y-1+KY, (py,c)] W'[KY,(py,c)]
      with ky = 2*KY + py - 1 (ky=-1 slot zero), pad top/left 1.

    Measured END-TO-END on v5e this is ~3% slower than the plain conv (the
    s2d transpose is HBM-bound and XLA already specializes low-channel
    stems); kept as an option for platforms where it wins.
    """
    w = p["w"]                                  # [3,3,C,O]
    k, _, C, O = w.shape
    assert k == 3, "space-to-depth stem expects k=3"
    B, H, W_, _ = x.shape
    # X: [B, H/2, W/2, (py,px,c)] with channel index (py*2+px)*C + c
    xs = x.reshape(B, H // 2, 2, W_ // 2, 2, C)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
        B, H // 2, W_ // 2, 4 * C)
    # W': [2,2,4C,O]
    wp = jnp.zeros((2, 2, 2, 2, C, O), w.dtype)
    for KY in (0, 1):
        for KX in (0, 1):
            for py in (0, 1):
                for px in (0, 1):
                    ky, kx = 2 * KY + py - 1, 2 * KX + px - 1
                    if 0 <= ky < 3 and 0 <= kx < 3:
                        wp = wp.at[KY, KX, py, px].set(w[ky, kx])
    wp = wp.reshape(2, 2, 4 * C, O)
    y = conv2d_f32acc(xs.astype(dtype), wp.astype(dtype),
                      (1, 1), ((1, 0), (1, 0)), 1)
    y = y + p["b"].astype(jnp.float32)
    if act:
        y = jax.nn.silu(y)
    return y.astype(dtype)


def dwconv_init(kg: KeyGen, c: int, k: int = 3, param_dtype=jnp.float32) -> Params:
    """Depthwise conv (groups == channels), used by the v11 Detect cls branch."""
    return conv_init(kg, c, c, k, groups=c, param_dtype=param_dtype)


def dwconv_apply(p: Params, x: jax.Array, *, stride: int = 1, act: bool = True,
                 dtype=jnp.bfloat16) -> jax.Array:
    c = x.shape[-1]
    return conv_apply(p, x, stride=stride, groups=c, act=act, dtype=dtype)


# ---------------------------------------------------------------------------
# Bottleneck / C3k / C3k2 (CSP blocks)
# ---------------------------------------------------------------------------

def bottleneck_init(kg: KeyGen, c1: int, c2: int, k: Tuple[int, int] = (3, 3),
                    e: float = 0.5, param_dtype=jnp.float32) -> Params:
    c_ = int(c2 * e)
    return {
        "cv1": conv_init(kg, c1, c_, k[0], param_dtype=param_dtype),
        "cv2": conv_init(kg, c_, c2, k[1], param_dtype=param_dtype),
    }


def bottleneck_apply(p: Params, x: jax.Array, *, shortcut: bool,
                     dtype=jnp.bfloat16) -> jax.Array:
    y = conv_apply(p["cv2"], conv_apply(p["cv1"], x, dtype=dtype), dtype=dtype)
    if shortcut and x.shape[-1] == y.shape[-1]:
        y = x + y
    return y


def c3k_init(kg: KeyGen, c1: int, c2: int, n: int = 1, e: float = 0.5,
             k: int = 3, param_dtype=jnp.float32) -> Params:
    c_ = int(c2 * e)
    return {
        "cv1": conv_init(kg, c1, c_, 1, param_dtype=param_dtype),
        "cv2": conv_init(kg, c1, c_, 1, param_dtype=param_dtype),
        "cv3": conv_init(kg, 2 * c_, c2, 1, param_dtype=param_dtype),
        "m": [bottleneck_init(kg, c_, c_, (k, k), 1.0, param_dtype) for _ in range(n)],
    }


def c3k_apply(p: Params, x: jax.Array, *, shortcut: bool = True,
              dtype=jnp.bfloat16) -> jax.Array:
    y1 = conv_apply(p["cv1"], x, dtype=dtype)
    for bp in p["m"]:
        y1 = bottleneck_apply(bp, y1, shortcut=shortcut, dtype=dtype)
    y2 = conv_apply(p["cv2"], x, dtype=dtype)
    return conv_apply(p["cv3"], jnp.concatenate([y1, y2], axis=-1), dtype=dtype)


def c3k2_init(kg: KeyGen, c1: int, c2: int, n: int = 1, c3k: bool = False,
              e: float = 0.5, param_dtype=jnp.float32) -> Params:
    """C3k2 = C2f whose inner blocks are C3k (if c3k) else Bottleneck.

    NOTE: the c3k flag is *not* stored in the params (pytree leaves get traced
    under jit); apply infers it statically from the param structure.
    """
    c = int(c2 * e)
    p: Params = {
        "cv1": conv_init(kg, c1, 2 * c, 1, param_dtype=param_dtype),
        "cv2": conv_init(kg, (2 + n) * c, c2, 1, param_dtype=param_dtype),
    }
    if c3k:
        p["m"] = [c3k_init(kg, c, c, 2, param_dtype=param_dtype) for _ in range(n)]
    else:
        # NOTE: C3k2's plain Bottleneck keeps the default e=0.5 (hidden dim
        # c/2) — unlike C2f's e=1.0. Verified against the reference's real
        # weight shapes (yolo11n-seg-sentis.sentis: bottleneck convs are
        # (8,16,3,3)/(16,8,3,3) for c=16).
        p["m"] = [bottleneck_init(kg, c, c, (3, 3), 0.5, param_dtype) for _ in range(n)]
    return p


def c2f_init(kg: KeyGen, c1: int, c2: int, n: int = 1, e: float = 0.5,
             param_dtype=jnp.float32) -> Params:
    """YOLOv8 C2f block params. Identical split/append/concat topology to
    C3k2 (c3k2_apply runs it unchanged — the m-entries are Bottlenecks),
    but the inner Bottleneck uses e=1.0 (hidden dim c, NOT c/2 — the v8
    convention; YOLO11's C3k2 Bottleneck keeps e=0.5, see c3k2_init)."""
    c = int(c2 * e)
    return {
        "cv1": conv_init(kg, c1, 2 * c, 1, param_dtype=param_dtype),
        "cv2": conv_init(kg, (2 + n) * c, c2, 1, param_dtype=param_dtype),
        "m": [bottleneck_init(kg, c, c, (3, 3), 1.0, param_dtype)
              for _ in range(n)],
    }


def c3k2_apply(p: Params, x: jax.Array, *, shortcut: bool = True,
               dtype=jnp.bfloat16) -> jax.Array:
    is_c3k = "cv3" in p["m"][0]     # static structure check, jit-safe
    y = conv_apply(p["cv1"], x, dtype=dtype)
    a, b = jnp.split(y, 2, axis=-1)
    outs = [a, b]
    cur = b
    for bp in p["m"]:
        if is_c3k:
            cur = c3k_apply(bp, cur, shortcut=shortcut, dtype=dtype)
        else:
            cur = bottleneck_apply(bp, cur, shortcut=shortcut, dtype=dtype)
        outs.append(cur)
    return conv_apply(p["cv2"], jnp.concatenate(outs, axis=-1), dtype=dtype)


# ---------------------------------------------------------------------------
# SPPF
# ---------------------------------------------------------------------------

def sppf_init(kg: KeyGen, c1: int, c2: int, param_dtype=jnp.float32) -> Params:
    c_ = c1 // 2
    return {
        "cv1": conv_init(kg, c1, c_, 1, param_dtype=param_dtype),
        "cv2": conv_init(kg, c_ * 4, c2, 1, param_dtype=param_dtype),
    }


def _maxpool_same(x: jax.Array, k: int) -> jax.Array:
    pad = k // 2
    # init must be -inf (representable in bf16 too): a finite min keeps
    # the window max from matching JAX's differentiable-maxpool rule, and
    # bf16 TRAINING then dies in linearization (fallback rule can't
    # reverse-differentiate reduce_window)
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, 1, 1, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def sppf_apply(p: Params, x: jax.Array, *, k: int = 5, dtype=jnp.bfloat16) -> jax.Array:
    y = conv_apply(p["cv1"], x, dtype=dtype)
    y1 = _maxpool_same(y, k)
    y2 = _maxpool_same(y1, k)
    y3 = _maxpool_same(y2, k)
    return conv_apply(p["cv2"], jnp.concatenate([y, y1, y2, y3], axis=-1), dtype=dtype)


# ---------------------------------------------------------------------------
# C2PSA (position-sensitive attention) — the only attention in YOLO11.
# Runs at input/32 resolution (20x20 for 640), single-chip sized.
# ---------------------------------------------------------------------------

def attention_init(kg: KeyGen, dim: int, num_heads: int, attn_ratio: float = 0.5,
                   param_dtype=jnp.float32) -> Params:
    head_dim = dim // num_heads
    key_dim = int(head_dim * attn_ratio)
    nh_kd = key_dim * num_heads
    h = dim + nh_kd * 2
    return {
        "qkv": conv_init(kg, dim, h, 1, param_dtype=param_dtype),
        "proj": conv_init(kg, dim, dim, 1, param_dtype=param_dtype),
        "pe": conv_init(kg, dim, dim, 3, groups=dim, param_dtype=param_dtype),
    }


def attention_apply(p: Params, x: jax.Array, *, num_heads: int,
                    dtype=jnp.bfloat16) -> jax.Array:
    """Multi-head spatial attention over the HxW grid. x: [B,H,W,C].

    num_heads is static (passed by the caller); key/head dims are inferred
    from the qkv weight shape so no ints live in the pytree.
    """
    B, H, W, C = x.shape
    nh = num_heads
    hd = C // nh
    h_total = p["qkv"]["w"].shape[-1]
    kd = (h_total - C) // (2 * nh)
    N = H * W
    qkv = conv_apply(p["qkv"], x, act=False, dtype=dtype)          # [B,H,W,h]
    qkv = qkv.reshape(B, N, nh, kd * 2 + hd)
    q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)                 # [B,N,nh,*]
    scale = kd ** -0.5
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                   preferred_element_type=jnp.float32).astype(dtype)
    o = o.reshape(B, H, W, C)
    vmap = v.reshape(B, H, W, nh * hd)
    o = o + dwconv_apply(p["pe"], vmap, act=False, dtype=dtype)
    return conv_apply(p["proj"], o, act=False, dtype=dtype)


def psablock_init(kg: KeyGen, c: int, param_dtype=jnp.float32) -> Params:
    return {
        "attn": attention_init(kg, c, num_heads=max(1, c // 64),
                               param_dtype=param_dtype),
        "ffn1": conv_init(kg, c, c * 2, 1, param_dtype=param_dtype),
        "ffn2": conv_init(kg, c * 2, c, 1, param_dtype=param_dtype),
    }


def psablock_apply(p: Params, x: jax.Array, *, dtype=jnp.bfloat16) -> jax.Array:
    c = x.shape[-1]
    x = x + attention_apply(p["attn"], x, num_heads=max(1, c // 64), dtype=dtype)
    y = conv_apply(p["ffn1"], x, dtype=dtype)
    y = conv_apply(p["ffn2"], y, act=False, dtype=dtype)
    return x + y


def c2psa_init(kg: KeyGen, c1: int, n: int = 1, e: float = 0.5,
               param_dtype=jnp.float32) -> Params:
    c = int(c1 * e)
    return {
        "cv1": conv_init(kg, c1, 2 * c, 1, param_dtype=param_dtype),
        "cv2": conv_init(kg, 2 * c, c1, 1, param_dtype=param_dtype),
        "m": [psablock_init(kg, c, param_dtype) for _ in range(n)],
    }


def c2psa_apply(p: Params, x: jax.Array, *, dtype=jnp.bfloat16) -> jax.Array:
    c = p["cv1"]["w"].shape[-1] // 2        # static, from weight shape
    y = conv_apply(p["cv1"], x, dtype=dtype)
    a, b = jnp.split(y, [c], axis=-1)
    for bp in p["m"]:
        b = psablock_apply(bp, b, dtype=dtype)
    return conv_apply(p["cv2"], jnp.concatenate([a, b], axis=-1), dtype=dtype)


# ---------------------------------------------------------------------------
# Proto (mask prototype head) — emits [B, H/4, W/4, nm]
# ---------------------------------------------------------------------------

def proto_init(kg: KeyGen, c1: int, c_: int = 256, nm: int = 32,
               param_dtype=jnp.float32) -> Params:
    p = {
        "cv1": conv_init(kg, c1, c_, 3, param_dtype=param_dtype),
        "cv2": conv_init(kg, c_, c_, 3, param_dtype=param_dtype),
        "cv3": conv_init(kg, c_, nm, 1, param_dtype=param_dtype),
    }
    # ConvTranspose2d(c_, c_, 2, 2) with bias (no BN-act in torch: it *does*
    # have default act in ultralytics Proto: nn.ConvTranspose2d + no act).
    fan_in = c_ * 2 * 2
    bound = math.sqrt(1.0 / fan_in)
    p["up_w"] = jax.random.uniform(kg(), (2, 2, c_, c_), param_dtype,
                                   -bound * math.sqrt(3.0), bound * math.sqrt(3.0))
    p["up_b"] = jnp.zeros((c_,), param_dtype)
    return p


def _convT2x_primal(y, wt):
    return lax.conv_transpose(
        y, wt, strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        preferred_element_type=jnp.float32)


@jax.custom_vjp
def convT2x_f32acc(y, wt):
    """k=2 s=2 transposed conv with f32 accumulation, differentiable in
    low precision (same cotangent-cast VJP as conv2d_f32acc)."""
    return _convT2x_primal(y, wt)


def _convT2x_fwd(y, wt):
    return _convT2x_primal(y, wt), (y, wt)


def _convT2x_bwd(res, g):
    y, wt = res
    _, vjp = jax.vjp(
        lambda a, b: lax.conv_transpose(
            a, b, strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True), y, wt)
    return vjp(g.astype(y.dtype))


convT2x_f32acc.defvjp(_convT2x_fwd, _convT2x_bwd)


def proto_apply(p: Params, x: jax.Array, *, dtype=jnp.bfloat16) -> jax.Array:
    y = conv_apply(p["cv1"], x, dtype=dtype)
    # Transposed conv k=2 s=2 (exact x2 upsample, each pixel -> learned 2x2).
    # up_w is [kH,kW,I,O]; transpose_kernel=True + [kH,kW,O,I] gives exact
    # torch ConvTranspose2d semantics (gradient-of-conv: flipped + IO-swapped).
    y = convT2x_f32acc(y.astype(dtype),
                       jnp.swapaxes(p["up_w"], 2, 3).astype(dtype))
    y = (y + p["up_b"].astype(jnp.float32)).astype(dtype)
    y = conv_apply(p["cv2"], y, dtype=dtype)
    return conv_apply(p["cv3"], y, dtype=dtype)


# ---------------------------------------------------------------------------
# Plain conv head leaf (no BN, no act) — final 1x1 projections in Detect.
# ---------------------------------------------------------------------------

def head_conv_init(kg: KeyGen, c1: int, c2: int, k: int = 1,
                   param_dtype=jnp.float32) -> Params:
    fan_in = c1 * k * k
    bound = math.sqrt(1.0 / fan_in)
    return {
        "w": jax.random.uniform(kg(), (k, k, c1, c2), param_dtype,
                                -bound * math.sqrt(3.0), bound * math.sqrt(3.0)),
        "b": jax.random.uniform(kg(), (c2,), param_dtype, -bound, bound),
    }


def head_conv_apply(p: Params, x: jax.Array, *, dtype=jnp.bfloat16) -> jax.Array:
    return conv_apply(p, x, act=False, dtype=dtype)


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Nearest-neighbor x2 upsample (torch nn.Upsample(scale=2) semantics)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
