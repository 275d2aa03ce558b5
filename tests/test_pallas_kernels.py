"""Pallas kernels vs their XLA/numpy references (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrseg_tpu.ops import masks as mask_ops
from xrseg_tpu.ops import nms as nms_ops
from xrseg_tpu.ops.pallas_kernels import (mask_synth_crop_pallas,
                                          nms_greedy_pallas,
                                          resize_normalize_bf16)


@pytest.mark.parametrize("seed", [0, 1])
def test_nms_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    K = 128
    cxy = rng.uniform(50, 600, (K, 2)).astype(np.float32)
    wh = rng.uniform(10, 120, (K, 2)).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, K).astype(np.float32))[::-1].copy()
    corners = np.asarray(nms_ops.xywh_to_corners(
        jnp.asarray(np.concatenate([cxy, wh], -1))))
    alive0 = scores > 0.2

    keep_p = nms_greedy_pallas(jnp.asarray(corners), jnp.asarray(alive0),
                               0.5, interpret=True)
    iou = nms_ops.pairwise_iou(jnp.asarray(corners))
    keep_x = nms_ops._greedy_suppress(iou, jnp.asarray(alive0), 0.5)
    np.testing.assert_array_equal(np.asarray(keep_p), np.asarray(keep_x))


def test_nms_pallas_rejects_bad_k():
    with pytest.raises(ValueError):
        nms_greedy_pallas(jnp.zeros((100, 4)), jnp.ones(100, bool), 0.5,
                          interpret=True)


def test_mask_synth_crop_pallas_matches_reference():
    rng = np.random.default_rng(0)
    D, nm, h, w = 50, 32, 160, 160
    coefs = rng.standard_normal((D, nm)).astype(np.float32)
    protos = rng.standard_normal((h, w, nm)).astype(np.float32)
    boxes = np.stack([
        rng.uniform(100, 500, D), rng.uniform(100, 500, D),
        rng.uniform(50, 300, D), rng.uniform(50, 300, D)], -1).astype(np.float32)

    out = mask_synth_crop_pallas(jnp.asarray(coefs), jnp.asarray(protos),
                                 jnp.asarray(boxes), interpret=True)
    ref = mask_ops.crop_masks(
        mask_ops.synthesize_masks(jnp.asarray(coefs), jnp.asarray(protos)),
        jnp.asarray(boxes), (640, 640))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_resize_normalize_matches_cv2():
    """2-tap bilinear (GPU texture sampling / cv2.INTER_LINEAR), NOT the
    antialiased filter jax.image.resize applies on downscale."""
    import cv2
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (2, 96, 128, 3), np.uint8)
    out = np.asarray(resize_normalize_bf16(jnp.asarray(img), (64, 64),
                                           dtype=jnp.float32))
    for b in range(2):
        ref = cv2.resize(img[b].astype(np.float32) / 255.0, (64, 64),
                         interpolation=cv2.INTER_LINEAR)
        assert np.abs(out[b] - ref).max() < 1e-3
    out_bf = resize_normalize_bf16(jnp.asarray(img), (64, 64))
    assert out_bf.dtype == jnp.bfloat16
