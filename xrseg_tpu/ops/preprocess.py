"""Frame preprocessing: uint8 camera/file frames -> normalized model input.

TPU-native replacement for the reference's `TextureConverter.ToTensor(tex,
640, 640, 3)` (Assets/Scripts/InferenceEngine/IEExecutor.cs:370): GPU resize
to the model size + 1/255 normalization. The reference *stretches* the frame
(no aspect-preserving letterbox); we support both:

  mode="stretch"   — reference parity (ToTensor semantics)
  mode="letterbox" — aspect-preserving pad-to-square (ultralytics semantics),
                     gray(114) padding

Both are pure XLA: resize_normalize_bf16 (below) is a separable 2-tap
bilinear formulated as gathers + lerps with the uint8->dtype conversion and
1/255 normalize folded in — XLA fuses it into the stem; a hand Pallas
kernel has nothing left to win here. (It previously lived in
ops/pallas_kernels.py; moved so module names match implementations.)
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _bilinear_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] row-stochastic bilinear interpolation matrix
    (half-pixel-center convention, matching jax.image.resize/cv2)."""
    out = np.zeros((dst, src), np.float32)
    scale = src / dst
    for i in range(dst):
        s = (i + 0.5) * scale - 0.5
        s0 = int(np.floor(s))
        frac = s - s0
        a = max(0, min(src - 1, s0))
        b = max(0, min(src - 1, s0 + 1))
        out[i, a] += 1.0 - frac
        out[i, b] += frac
    return out


def _tap_indices(src: int, dst: int):
    """2-tap bilinear gather plan: (idx0, idx1, w1) per output coordinate
    (half-pixel-center convention)."""
    s = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    s0 = np.floor(s).astype(np.int64)
    frac = (s - s0).astype(np.float32)
    i0 = np.clip(s0, 0, src - 1)
    i1 = np.clip(s0 + 1, 0, src - 1)
    return i0, i1, frac


@partial(jax.jit, static_argnames=("out_hw", "dtype"))
def resize_normalize_bf16(frames: jax.Array, out_hw: Tuple[int, int],
                          dtype=jnp.bfloat16) -> jax.Array:
    """uint8 [B,H,W,3] -> dtype [B,oh,ow,3] in [0,1].

    2-tap separable bilinear as four row/col gathers + lerps (the bilinear
    matrix is 2-sparse; a dense MXU matmul wastes ~H/2 x the FLOPs). The
    uint8->dtype conversion and 1/255 fold into the first lerp. Identity
    sizes skip the resample entirely.
    """
    B, H, W, C = frames.shape
    oh, ow = out_hw
    scale = jnp.asarray(1.0 / 255.0, dtype)
    if (H, W) == (oh, ow):
        return frames.astype(dtype) * scale

    x = frames.astype(dtype) * scale
    if H != oh:
        i0, i1, f = _tap_indices(H, oh)
        f = jnp.asarray(f, dtype)[None, :, None, None]
        x = (jnp.take(x, jnp.asarray(i0), axis=1) * (1 - f)
             + jnp.take(x, jnp.asarray(i1), axis=1) * f)
    if W != ow:
        i0, i1, f = _tap_indices(W, ow)
        f = jnp.asarray(f, dtype)[None, None, :, None]
        x = (jnp.take(x, jnp.asarray(i0), axis=2) * (1 - f)
             + jnp.take(x, jnp.asarray(i1), axis=2) * f)
    return x


@partial(jax.jit, static_argnames=("out_hw", "mode", "dtype"))
def preprocess(frames: jax.Array, out_hw: Tuple[int, int] = (640, 640),
               mode: str = "stretch", dtype=jnp.float32) -> jax.Array:
    """[B,H,W,3] uint8 (or float 0..255) -> [B,out_h,out_w,3] in [0,1].

    Resize is 2-tap bilinear (GPU-texture-sampling semantics — what the
    reference's TextureConverter does; cv2.INTER_LINEAR-compatible),
    with the uint8->compute-dtype conversion and 1/255 folded in
    (resize_normalize_bf16 above).
    """
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected [B,H,W,3] frames, got {frames.shape}")
    B, H, W, _ = frames.shape
    oh, ow = out_hw

    if mode == "stretch":
        return resize_normalize_bf16(frames, (oh, ow), dtype=dtype)

    if mode == "letterbox":
        r = min(oh / H, ow / W)
        nh, nw = int(round(H * r)), int(round(W * r))
        y = resize_normalize_bf16(frames, (nh, nw), dtype=dtype)
        top = (oh - nh) // 2
        left = (ow - nw) // 2
        out = jnp.full((B, oh, ow, 3), 114.0 / 255.0, dtype)
        return jax.lax.dynamic_update_slice(out, y, (0, top, left, 0))

    raise ValueError(f"unknown preprocess mode {mode!r}")


def letterbox_params(in_hw: Tuple[int, int], out_hw: Tuple[int, int]):
    """(scale, pad_top, pad_left) used to map model-space boxes back to the
    original frame. For mode='stretch' use plain per-axis scale factors."""
    H, W = in_hw
    oh, ow = out_hw
    r = min(oh / H, ow / W)
    nh, nw = int(round(H * r)), int(round(W * r))
    return r, (oh - nh) // 2, (ow - nw) // 2


def boxes_to_frame_space(boxes_xywh, in_hw, out_hw=(640, 640),
                         mode: str = "stretch"):
    """Map model-space cxcywh boxes back to original-frame pixel coords."""
    import numpy as np
    b = np.asarray(boxes_xywh, np.float32).copy()
    H, W = in_hw
    oh, ow = out_hw
    if mode == "stretch":
        b[..., 0] *= W / ow
        b[..., 2] *= W / ow
        b[..., 1] *= H / oh
        b[..., 3] *= H / oh
        return b
    r, top, left = letterbox_params(in_hw, out_hw)
    b[..., 0] = (b[..., 0] - left) / r
    b[..., 1] = (b[..., 1] - top) / r
    b[..., 2] /= r
    b[..., 3] /= r
    return b
