"""Preprocess (resize/normalize/letterbox) and YUV conversion tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from xrseg_tpu.ops.preprocess import preprocess, boxes_to_frame_space, letterbox_params
from xrseg_tpu.ops.yuv import yuv420_to_rgb, rgb_to_yuv420_numpy


def _gradient_image(h, w):
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    img = np.stack([y + 0 * x, 0 * y + x, (y + x) / 2], -1)
    return np.clip(img, 0, 255).astype(np.uint8)[None]


def test_stretch_matches_cv2():
    import cv2
    img = _gradient_image(480, 768)
    out = np.asarray(preprocess(jnp.asarray(img), (640, 640), mode="stretch"))
    ref = cv2.resize(img[0].astype(np.float32), (640, 640),
                     interpolation=cv2.INTER_LINEAR) / 255.0
    assert out.shape == (1, 640, 640, 3)
    # identical half-pixel-center 2-tap convention: agreement is ~2 ULP
    # (the randomized sweep in test_preprocess_fuzz.py covers geometries)
    assert np.abs(out[0] - ref).max() < 1e-6
    assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-5  # fp rounding headroom


def test_stretch_identity_size():
    img = _gradient_image(640, 640)
    out = np.asarray(preprocess(jnp.asarray(img), (640, 640)))
    np.testing.assert_allclose(out[0], img[0] / 255.0, atol=1e-6)


def test_letterbox_geometry():
    img = np.full((1, 320, 640, 3), 255, np.uint8)
    out = np.asarray(preprocess(jnp.asarray(img), (640, 640), mode="letterbox"))
    r, top, left = letterbox_params((320, 640), (640, 640))
    assert (r, top, left) == (1.0, 160, 0)
    # content band white, padding 114/255
    assert np.allclose(out[0, 160:480], 1.0, atol=1e-6)
    assert np.allclose(out[0, :160], 114 / 255, atol=1e-6)
    assert np.allclose(out[0, 480:], 114 / 255, atol=1e-6)


def test_boxes_back_to_frame_space():
    # stretch: 1280x960 frame -> model 640
    b = np.array([[320.0, 320.0, 100.0, 50.0]])
    fb = boxes_to_frame_space(b, (960, 1280), mode="stretch")
    np.testing.assert_allclose(fb, [[640, 480, 200, 75]])
    # letterbox: 320x640 frame, pad 160 rows
    fb2 = boxes_to_frame_space(np.array([[320.0, 320.0, 100.0, 100.0]]),
                               (320, 640), mode="letterbox")
    np.testing.assert_allclose(fb2, [[320, 160, 100, 100]])


def test_preprocess_rejects_bad_shape():
    with pytest.raises(ValueError):
        preprocess(jnp.zeros((640, 640, 3), jnp.uint8))


def test_yuv_roundtrip():
    img = _gradient_image(64, 64).astype(np.float32)
    y, u, v = rgb_to_yuv420_numpy(img)
    rgb = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u),
                                   jnp.asarray(v)))
    assert rgb.shape == (1, 64, 64, 3)
    # 4:2:0 chroma subsampling loses a little on gradients
    assert np.abs(rgb - img).mean() < 3.0
