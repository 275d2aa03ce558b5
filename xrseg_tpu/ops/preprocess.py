"""Frame preprocessing: uint8 camera/file frames -> normalized model input.

TPU-native replacement for the reference's `TextureConverter.ToTensor(tex,
640, 640, 3)` (Assets/Scripts/InferenceEngine/IEExecutor.cs:370): GPU resize
to the model size + 1/255 normalization. The reference *stretches* the frame
(no aspect-preserving letterbox); we support both:

  mode="stretch"   — reference parity (ToTensor semantics)
  mode="letterbox" — aspect-preserving pad-to-square (ultralytics semantics),
                     gray(114) padding

Both are pure XLA (resize lowers to gathers/matmuls that fuse well); the
fused uint8->bf16 Pallas variant lives in ops/pallas_kernels.py and is used
on the hot streaming path.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_hw", "mode", "dtype"))
def preprocess(frames: jax.Array, out_hw: Tuple[int, int] = (640, 640),
               mode: str = "stretch", dtype=jnp.float32) -> jax.Array:
    """[B,H,W,3] uint8 (or float 0..255) -> [B,out_h,out_w,3] in [0,1].

    Resize is 2-tap bilinear (GPU-texture-sampling semantics — what the
    reference's TextureConverter does; cv2.INTER_LINEAR-compatible),
    formulated as two MXU matmuls with the uint8->compute-dtype conversion
    and 1/255 folded in (see ops/pallas_kernels.resize_normalize_bf16).
    """
    from xrseg_tpu.ops.pallas_kernels import resize_normalize_bf16
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
