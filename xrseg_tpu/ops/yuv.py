"""YUV420 (I420/NV12) -> RGB conversion for camera-format frames.

The reference receives passthrough frames as Android Camera2 YUV_420_888
surfaces (Assets/Scripts/PassthroughCamera/PassthroughCameraUtils.cs:287-311
enumerates YUV_420_888 output sizes) that Unity converts on-GPU before
`ToTensor`. Our frame sources can feed planar YUV420 directly; this converts
on-device so the host never touches pixels twice.

BT.601 full-range (the Android default for camera YUV):
  R = Y + 1.402 (V-128)
  G = Y - 0.344136 (U-128) - 0.714136 (V-128)
  B = Y + 1.772 (U-128)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def yuv420_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """y: [B,H,W] uint8; u, v: [B,H/2,W/2] uint8 -> [B,H,W,3] float 0..255."""
    B, H, W = y.shape
    yf = y.astype(jnp.float32)
    # chroma upsample: nearest 2x (matches the common fast path; bilinear
    # differs by <1 LSB on natural images)
    uf = jnp.repeat(jnp.repeat(u.astype(jnp.float32), 2, 1), 2, 2) - 128.0
    vf = jnp.repeat(jnp.repeat(v.astype(jnp.float32), 2, 1), 2, 2) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0.0, 255.0)


def rgb_to_yuv420_numpy(rgb):
    """Host-side inverse (test fixture / synthetic camera source)."""
    import numpy as np
    rgb = np.asarray(rgb, np.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = (b - y) / 1.772 + 128.0
    v = (r - y) / 1.402 + 128.0
    u4 = u.reshape(u.shape[0], u.shape[1] // 2, 2, u.shape[2] // 2, 2).mean((2, 4))
    v4 = v.reshape(v.shape[0], v.shape[1] // 2, 2, v.shape[2] // 2, 2).mean((2, 4))
    clip = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)
    return clip(y), clip(u4), clip(v4)
