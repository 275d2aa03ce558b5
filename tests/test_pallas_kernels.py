"""Pallas kernels vs their XLA/numpy references (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrseg_tpu.ops import masks as mask_ops
from xrseg_tpu.ops import nms as nms_ops
from xrseg_tpu.ops.pallas_kernels import (_NEG, mask_synth_crop_pallas,
                                          nms_select_pallas)
from xrseg_tpu.ops.preprocess import resize_normalize_bf16


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_select_pallas_matches_scan(seed):
    """The on-core select-and-suppress kernel is bit-identical to the
    lax.scan path (both exact greedy NMS)."""
    rng = np.random.default_rng(seed)
    K = 300                      # non-lane-aligned: exercises padding
    cxy = rng.uniform(50, 600, (K, 2)).astype(np.float32)
    wh = rng.uniform(10, 120, (K, 2)).astype(np.float32)
    boxes = np.concatenate([cxy, wh], -1)
    scores = rng.uniform(0, 1, K).astype(np.float32)
    labels = rng.integers(0, 8, K).astype(np.int32)

    out_scan = nms_ops.nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        iou_threshold=0.45, score_threshold=0.2, max_det=50,
        backend="scan")
    corners = nms_ops.xywh_to_corners(jnp.asarray(boxes))
    corners = corners + jnp.asarray(labels)[:, None].astype(jnp.float32) * 8192.0
    masked = jnp.where(jnp.asarray(scores) > 0.2, jnp.asarray(scores), _NEG)
    idx, ok = nms_select_pallas(corners, masked, 0.45, max_det=50,
                                interpret=True)
    n = int(out_scan["count"])
    assert int(np.asarray(ok).sum()) == n
    np.testing.assert_array_equal(np.asarray(idx)[:n],
                                  np.asarray(out_scan["indices"])[:n])


def test_nms_select_pallas_vmap():
    """vmap lifts the batch onto the pallas grid (interpret mode)."""
    rng = np.random.default_rng(3)
    B, K = 4, 256
    boxes = np.concatenate([rng.uniform(50, 600, (B, K, 2)),
                            rng.uniform(10, 120, (B, K, 2))], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (B, K)).astype(np.float32)
    corners = np.asarray(nms_ops.xywh_to_corners(jnp.asarray(boxes)))
    masked = np.where(scores > 0.3, scores, _NEG).astype(np.float32)
    f = jax.vmap(lambda c, s: nms_select_pallas(c, s, 0.5, max_det=20,
                                                interpret=True))
    idxs, oks = f(jnp.asarray(corners), jnp.asarray(masked))
    assert idxs.shape == (B, 20)
    for b in range(B):
        si, so = nms_select_pallas(jnp.asarray(corners[b]),
                                   jnp.asarray(masked[b]), 0.5, max_det=20,
                                   interpret=True)
        n = int(np.asarray(so).sum())
        np.testing.assert_array_equal(np.asarray(idxs[b])[:n],
                                      np.asarray(si)[:n])


def test_nms_select_pallas_empty():
    corners = jnp.zeros((128, 4), jnp.float32)
    masked = jnp.full((128,), _NEG, jnp.float32)
    idx, ok = nms_select_pallas(corners, masked, 0.5, max_det=10,
                                interpret=True)
    assert not np.asarray(ok).any()


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


def test_nms_select_batched_pallas_matches_scan():
    """Batched kernel (grid-blocked rows) equals the per-image scan path."""
    from xrseg_tpu.ops.pallas_kernels import nms_select_batched_pallas
    rng = np.random.default_rng(5)
    B, K = 5, 300                      # odd batch + non-aligned K: padding
    boxes = np.concatenate([rng.uniform(50, 600, (B, K, 2)),
                            rng.uniform(10, 120, (B, K, 2))], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (B, K)).astype(np.float32)
    labels = rng.integers(0, 8, (B, K)).astype(np.int32)
    corners = np.asarray(nms_ops.xywh_to_corners(jnp.asarray(boxes)))
    corners = corners + labels[..., None].astype(np.float32) * 8192.0
    masked = np.where(scores > 0.25, scores, _NEG).astype(np.float32)
    idx, ok = nms_select_batched_pallas(jnp.asarray(corners),
                                        jnp.asarray(masked), 0.45,
                                        max_det=30, block_b=2,
                                        interpret=True)
    for b in range(B):
        ref = nms_ops.nms_fixed(
            jnp.asarray(boxes[b]), jnp.asarray(scores[b]),
            jnp.asarray(labels[b]), iou_threshold=0.45,
            score_threshold=0.25, max_det=30, backend="scan")
        n = int(ref["count"])
        assert int(np.asarray(ok[b]).sum()) == n
        np.testing.assert_array_equal(np.asarray(idx[b])[:n],
                                      np.asarray(ref["indices"])[:n])


def test_nms_rotated_batched_pallas_matches_scan():
    """The rotated (probIoU) batched kernel equals the vmapped scan path
    (both exact greedy rotated NMS) — boxes, order, counts."""
    from xrseg_tpu.ops.nms import nms_fixed_rotated_batched

    rng = np.random.default_rng(9)
    B, K = 5, 300
    boxes = np.concatenate([
        rng.uniform(40, 600, (B, K, 2)),
        rng.uniform(10, 80, (B, K, 2)),
        rng.uniform(-np.pi / 4, 3 * np.pi / 4, (B, K, 1)),
    ], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (B, K)).astype(np.float32)
    labels = rng.integers(0, 3, (B, K)).astype(np.int32)

    kw = dict(iou_threshold=0.4, score_threshold=0.3, max_det=20)
    ref = jax.device_get(nms_fixed_rotated_batched(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        backend="scan", **kw))
    # interpret mode on CPU exercises the kernel's math end to end
    import xrseg_tpu.ops.pallas_kernels as pk
    orig = pk.nms_rotated_batched_pallas
    pk_call = lambda *a, **k: orig(*a, **dict(k, interpret=True))
    try:
        pk.nms_rotated_batched_pallas = pk_call
        got = jax.device_get(nms_fixed_rotated_batched(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
            backend="pallas", **kw))
    finally:
        pk.nms_rotated_batched_pallas = orig

    np.testing.assert_array_equal(got["count"], ref["count"])
    np.testing.assert_array_equal(got["indices"], ref["indices"])
    np.testing.assert_allclose(got["boxes_xywhr"], ref["boxes_xywhr"],
                               rtol=1e-6)
    np.testing.assert_allclose(got["scores"], ref["scores"], rtol=1e-6)
