"""Instance-mask synthesis: coefficients x prototypes -> per-instance masks.

Rebuilds the baked tail of the reference graph — mask-coef [N,32] x
prototype [32,160*160] matmul, sigmoid, reshape [N,160,160]
(Assets/Scripts/InferenceEngine/Editor/IEModelEditorConverter.cs:87-97) —
plus the render-time crop/threshold the reference applies in IEMasker
(IEMasker.cs:167-185,232-247) and bilinear upsampling to display resolution
(IEMasker.cs:316-323 bilinear-filtered texture).

All fixed-shape; the detection slate is padded to max_det so these fuse into
the jitted pipeline with no host round-trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def synthesize_masks(coefs: jax.Array, protos: jax.Array) -> jax.Array:
    """[D,nm] x [H,W,nm] -> [D,H,W] sigmoid masks (the ref's baked matmul)."""
    H, W, nm = protos.shape
    logits = jnp.einsum("dn,hwn->dhw", coefs, protos,
                        preferred_element_type=jnp.float32)
    return jax.nn.sigmoid(logits)


def crop_masks(masks: jax.Array, boxes_xywh: jax.Array,
               input_size: tuple) -> jax.Array:
    """Zero mask pixels outside each box (IEMasker.PixelInBoundingBox semantics).

    masks: [D,H,W] in mask space (H=W=input/4); boxes in input-pixel space.
    The reference checks inclusive bounds in mask coordinates
    (IEMasker.cs:243-246); pixel centers here are integer mask coords.
    """
    D, H, W = masks.shape
    sx = W / input_size[1]
    sy = H / input_size[0]
    cx = boxes_xywh[:, 0] * sx
    cy = boxes_xywh[:, 1] * sy
    hw = boxes_xywh[:, 2] * sx * 0.5
    hh = boxes_xywh[:, 3] * sy * 0.5
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    inx = (xs >= (cx - hw)[:, None, None]) & (xs <= (cx + hw)[:, None, None])
    iny = (ys >= (cy - hh)[:, None, None]) & (ys <= (cy + hh)[:, None, None])
    return masks * (inx & iny)


def threshold_masks(masks: jax.Array, confidence: float) -> jax.Array:
    """Binary mask at the vis/depth confidence gate (IEExecutor.cs:32)."""
    return (masks > confidence)


def upsample_masks(masks: jax.Array, out_hw: tuple) -> jax.Array:
    """Bilinear upsample [D,h,w] -> [D,out_h,out_w] (display-res masks)."""
    D = masks.shape[0]
    return jax.image.resize(masks, (D, out_hw[0], out_hw[1]), method="bilinear")


@jax.jit
def synthesize_one_mask(coefs: jax.Array, protos: jax.Array,
                        index: jax.Array) -> jax.Array:
    """On-demand single-instance mask for the coefs-only pipeline mode:
    coefs [D,nm], protos [H,W,nm], index scalar -> [H,W] sigmoid mask.

    One [H*W,nm]x[nm] matvec instead of the full [D,H,W] slate — used by
    the executor's tracked-target gather (runtime/executor.py) when the
    pipeline was built with emit_masks="none". The reference always
    materializes and reads back every survivor's mask
    (IEExecutor.cs:446-449); here the untracked 49/50 rows are never
    computed at all.
    """
    c = jax.lax.dynamic_index_in_dim(coefs, index, axis=0, keepdims=False)
    logits = jnp.einsum("hwn,n->hw", protos, c,
                        preferred_element_type=jnp.float32)
    return jax.nn.sigmoid(logits)
