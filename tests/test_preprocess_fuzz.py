"""Randomized sweeps for preprocess resize/letterbox + box-space maps.

cv2.INTER_LINEAR is a truly independent oracle for the 2-tap
half-pixel-center bilinear the pipeline feeds the model
(resize_normalize_bf16 formulates it as gathers+lerps so XLA fuses it
into the stem; the reference's TextureConverter.ToTensor is the same
GPU sampling, IEExecutor.cs:370). The pre-existing pin
(test_preprocess.py::test_stretch_matches_cv2) used one image and a
2e-2 tolerance; measured agreement on the float path is ~2 ULP
(2.4e-7), so this sweep asserts 1e-6 across dozens of randomized
(src, dst) geometries — up/down/identity/extreme aspect — where
gather-index or weight-convention bugs would show as >=1-pixel-value
errors, not ULPs.

Also: letterbox content-band/padding decomposition against cv2, and a
property fuzz that boxes_to_frame_space exactly inverts the forward
frame->model geometry for both modes.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from xrseg_tpu.ops.preprocess import (boxes_to_frame_space, letterbox_params,
                                      preprocess, resize_normalize_bf16)

cv2 = pytest.importorskip("cv2")

R = np.random.default_rng(20260818)


def _rand_sizes(n, lo=1, hi=257):
    out = []
    for _ in range(n):
        h, w = int(R.integers(lo, hi)), int(R.integers(lo, hi))
        oh, ow = int(R.integers(8, 161)), int(R.integers(8, 161))
        out.append((h, w, oh, ow))
    return out


# hand-picked edges + randomized geometries
SIZES = [(1, 1, 8, 8), (1, 7, 16, 16), (7, 1, 16, 16), (2, 2, 64, 64),
         (256, 256, 8, 8), (17, 251, 96, 32), (640, 480, 640, 640),
         (480, 768, 640, 640), (100, 100, 100, 100)] + _rand_sizes(24)


def test_stretch_fuzz_matches_cv2():
    worst = 0.0
    for (h, w, oh, ow) in SIZES:
        img = R.integers(0, 256, (1, h, w, 3), np.uint8)
        out = np.asarray(preprocess(jnp.asarray(img), (oh, ow),
                                    mode="stretch", dtype=jnp.float32))[0]
        ref = cv2.resize(img[0].astype(np.float32), (ow, oh),
                         interpolation=cv2.INTER_LINEAR) / 255.0
        ref = ref.reshape(oh, ow, 3)
        d = float(np.abs(out - ref).max())
        worst = max(worst, d)
        assert d < 1e-6, f"{h}x{w}->{oh}x{ow}: maxdiff {d}"
    assert worst < 1e-6


def test_letterbox_fuzz_band_and_padding():
    for (h, w, oh, ow) in SIZES[:20]:
        img = R.integers(0, 256, (1, h, w, 3), np.uint8)
        out = np.asarray(preprocess(jnp.asarray(img), (oh, ow),
                                    mode="letterbox", dtype=jnp.float32))[0]
        r, top, left = letterbox_params((h, w), (oh, ow))
        nh, nw = int(round(h * r)), int(round(w * r))
        if nh == 0 or nw == 0:
            continue
        ref = cv2.resize(img[0].astype(np.float32), (nw, nh),
                         interpolation=cv2.INTER_LINEAR).reshape(nh, nw, 3)
        band = out[top:top + nh, left:left + nw]
        assert np.abs(band - ref / 255.0).max() < 1e-6
        pad = np.full_like(out, 114.0 / 255.0)
        pad[top:top + nh, left:left + nw] = band
        assert np.abs(out - pad).max() == 0.0    # padding exactly 114/255


def test_bf16_path_within_one_lsb():
    """The deployed dtype: bf16 resize stays within 4 bf16 LSBs of the
    f32 path (one LSB from the input quantization + one per lerp stage,
    with [0,1] LSB = 2^-8 at the top of the range; the 2-tap lerp is a
    convex combination so error cannot amplify past the taps)."""
    for (h, w, oh, ow) in SIZES[:12]:
        img = R.integers(0, 256, (1, h, w, 3), np.uint8)
        f32 = np.asarray(resize_normalize_bf16(jnp.asarray(img), (oh, ow),
                                               dtype=jnp.float32))
        bf = np.asarray(resize_normalize_bf16(jnp.asarray(img), (oh, ow),
                                              dtype=jnp.bfloat16)
                        .astype(jnp.float32))
        assert np.abs(f32 - bf).max() < 4 * 2.0 ** -8   # 4 LSBs on [0,1]


def test_boxes_to_frame_space_roundtrip_fuzz():
    """Property: mapping frame-space boxes -> model space with the
    forward geometry, then boxes_to_frame_space back, is the identity."""
    for trial in range(60):
        h, w = int(R.integers(16, 1024)), int(R.integers(16, 1024))
        oh, ow = 640, 640
        n = 17
        boxes = np.stack([R.uniform(0, w, n), R.uniform(0, h, n),
                          R.uniform(1, w, n), R.uniform(1, h, n)],
                         -1).astype(np.float64)
        mode = "stretch" if trial % 2 == 0 else "letterbox"
        fwd = boxes.copy()
        if mode == "stretch":
            fwd[:, 0] *= ow / w
            fwd[:, 2] *= ow / w
            fwd[:, 1] *= oh / h
            fwd[:, 3] *= oh / h
        else:
            r, top, left = letterbox_params((h, w), (oh, ow))
            fwd[:, 0] = fwd[:, 0] * r + left
            fwd[:, 1] = fwd[:, 1] * r + top
            fwd[:, 2] *= r
            fwd[:, 3] *= r
        back = boxes_to_frame_space(fwd.astype(np.float32), (h, w),
                                    (oh, ow), mode=mode)
        np.testing.assert_allclose(back, boxes, rtol=2e-5, atol=2e-3)
