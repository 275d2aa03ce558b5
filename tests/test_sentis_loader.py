"""Golden tests against the reference's deployed .sentis artifact.

These run the EXACT weights the reference ships (uint8-dequantized) through
our pipeline on its bundled COCO test images and assert the detections —
the TestScene-parity goldens SURVEY.md §4 calls for. Skipped when the
reference assets are not mounted.
"""
import os

import numpy as np
import pytest

SENTIS = "/root/reference/Assets/Resources/Model/yolo11n-seg-sentis.sentis"
IMAGES = "/root/reference/Assets/Resources/Images"

pytestmark = pytest.mark.skipif(not os.path.exists(SENTIS),
                                reason="reference .sentis not available")


@pytest.fixture(scope="module")
def real_params():
    from xrseg_tpu.io.sentis import load_yolo11_params
    return load_yolo11_params(SENTIS)


@pytest.fixture(scope="module")
def pipe_factory(real_params):
    import jax
    from xrseg_tpu.compile import build_pipeline
    from xrseg_tpu.config import ExecutorConfig, PostprocessConfig
    params, cfg = real_params
    cache = {}

    def get(frame_hw):
        if frame_hw not in cache:
            ecfg = ExecutorConfig(
                model=cfg,
                post=PostprocessConfig(iou_threshold=0.6,
                                       score_threshold=0.23))
            cache[frame_hw] = build_pipeline(ecfg, params,
                                             frame_hw=frame_hw, batch=1)
        return cache[frame_hw]

    return get


def _detect(pipe_factory, name):
    import jax
    from PIL import Image
    img = np.asarray(Image.open(os.path.join(IMAGES, name)).convert("RGB"),
                     np.uint8)
    det = jax.block_until_ready(pipe_factory(img.shape[:2])(img[None]))
    n = int(det["count"][0])
    from xrseg_tpu.viz.labels import COCO_LABELS
    out = []
    for i in range(n):
        out.append((COCO_LABELS[int(det["labels"][0, i])],
                    float(det["scores"][0, i]),
                    np.asarray(det["boxes_xywh"][0, i])))
    return out, det, img


def test_param_count_exact(real_params):
    from xrseg_tpu.models.yolo11 import count_params
    params, _ = real_params
    assert count_params(params) == 2_868_648   # yolo11n-seg exactly


def test_dfl_weights_are_arange(real_params):
    # validated inside the loader (raises otherwise); this documents it
    pass


def test_bus_image_detections(pipe_factory):
    dets, _, _ = _detect(pipe_factory, "000000002006.jpg")
    names = [d[0] for d in dets]
    assert names[0] == "bus" and dets[0][1] > 0.7
    assert "person" in names
    # bus box covers a plausible central region (model 640-space)
    bus = dets[0][2]
    assert 200 < bus[0] < 440 and bus[2] > 250


def test_living_room_detections(pipe_factory):
    dets, _, _ = _detect(pipe_factory, "000000000139.jpg")
    names = [d[0] for d in dets]
    assert "tvmonitor" in names and "chair" in names
    top = {n: s for n, s, _ in dets}
    assert top["tvmonitor"] > 0.8


def test_elephants(pipe_factory):
    dets, _, _ = _detect(pipe_factory, "000000007108.jpg")
    names = [d[0] for d in dets]
    assert names.count("elephant") >= 3
    assert all(s > 0.5 for n, s, _ in dets if n == "elephant")


def test_masks_concentrate_inside_boxes(pipe_factory):
    """Instance masks must light up inside their box and stay dark outside
    (mask-synthesis + coordinate-convention integrity)."""
    dets, det, img = _detect(pipe_factory, "000000002006.jpg")
    from xrseg_tpu.ops.masks import crop_masks
    import jax.numpy as jnp
    masks = np.asarray(det["masks"][0])           # [D,160,160]
    boxes = np.asarray(det["boxes_xywh"][0])
    n = int(det["count"][0])
    # top detection (bus, large) must have a well-localized mask; raw YOLO
    # masks for small objects legitimately spill outside the box — that is
    # why the reference crops at render time (IEMasker.cs:232-247).
    m0 = masks[0]
    c0 = np.asarray(crop_masks(jnp.asarray(m0[None]),
                               jnp.asarray(boxes[0][None]), (640, 640)))[0]
    assert c0.sum() / max(m0.sum(), 1e-6) > 0.7
    for i in range(n):
        if dets[i][1] > 0.5:
            cropped = np.asarray(crop_masks(jnp.asarray(masks[i][None]),
                                            jnp.asarray(boxes[i][None]),
                                            (640, 640)))[0]
            assert (cropped > 0.5).sum() > 20, dets[i][0]


def test_eval_integration_self_consistency(pipe_factory):
    """evaluate() + detections_from_slate over real pipeline outputs:
    detections evaluated against themselves as GT give mAP == 1."""
    import jax
    import numpy as np
    from PIL import Image
    from xrseg_tpu.eval.metrics import (Detection, GroundTruth,
                                        detections_from_slate, evaluate)
    per_image = []
    for name in ("000000002006.jpg", "000000000139.jpg"):
        img = np.asarray(Image.open(os.path.join(IMAGES, name)).convert("RGB"),
                         np.uint8)
        det = jax.block_until_ready(pipe_factory(img.shape[:2])(img[None]))
        dets = detections_from_slate(det, frame_hw=img.shape[:2])
        assert dets, name
        gts = [GroundTruth(d.box_xywh, d.label, d.mask) for d in dets]
        per_image.append((dets, gts))
    r_box = evaluate(per_image)
    r_mask = evaluate(per_image, use_mask=True)
    assert r_box["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert r_mask["mAP"] == pytest.approx(1.0, abs=1e-6)
    # boxes are in frame space: all within image bounds
    for dets, _ in per_image:
        for d in dets:
            assert 0 <= d.box_xywh[0] <= 640 and 0 <= d.box_xywh[1] <= 640


def test_int8_quantized_real_weights_still_detect(real_params, pipe_factory):
    """Our int8 weight quantization on the real model keeps detections."""
    import jax
    from PIL import Image
    from xrseg_tpu.compile import build_pipeline
    from xrseg_tpu.config import ExecutorConfig, PostprocessConfig
    from xrseg_tpu.io.weights import dequantize_int8, quantize_int8
    params, cfg = real_params
    qparams = dequantize_int8(quantize_int8(params))
    img = np.asarray(Image.open(os.path.join(IMAGES, "000000002006.jpg"))
                     .convert("RGB"), np.uint8)
    ecfg = ExecutorConfig(model=cfg, post=PostprocessConfig(
        iou_threshold=0.6, score_threshold=0.23))
    pipe = build_pipeline(ecfg, qparams, frame_hw=img.shape[:2], batch=1)
    det = jax.block_until_ready(pipe(img[None]))
    from xrseg_tpu.viz.labels import COCO_LABELS
    n = int(det["count"][0])
    names = [COCO_LABELS[int(det["labels"][0, i])] for i in range(n)]
    assert "bus" in names and float(det["scores"][0, 0]) > 0.6


def test_sentis_writer_roundtrip(real_params, tmp_path):
    """write_yolo11_sentis transplants weights into a copy of the deployed
    artifact: the flatbuffer program region stays byte-identical except
    the re-derived per-tensor scale/zero-point scalars, and reloading
    reproduces every leaf within the uint8 quantization step."""
    import jax

    from xrseg_tpu.io.sentis import load_yolo11_params, write_yolo11_sentis
    params, cfg = real_params
    out = str(tmp_path / "rt.sentis")
    write_yolo11_sentis(out, params, SENTIS, cfg)

    orig = open(SENTIS, "rb").read()
    new = open(out, "rb").read()
    assert len(orig) == len(new)
    fb_size = int(np.frombuffer(orig[:4], np.uint32)[0])
    prog_diff = sum(a != b for a, b in
                    zip(orig[:4 + fb_size], new[:4 + fb_size]))
    # only quantization scalars may move, and barely (same data in ->
    # same affine out up to fp rounding)
    assert prog_diff < 64, f"{prog_diff} program-region bytes changed"

    params2, _ = load_yolo11_params(out)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        a, b = np.asarray(a), np.asarray(b)
        step = (float(a.max()) - float(a.min())) / 255.0
        assert np.abs(a - b).max() <= step * 0.51 + 1e-7


def test_transfer_from_deployed_weights(real_params):
    """Head surgery on the reference's real deployed 80-class artifact:
    graft to a 3-class head, keep the pretrained stack bit-exact, and take
    one optimizer step — the user path for "retrain the deployed model on
    my classes" (the reference retrains via ultralytics + the Unity editor
    converter, IEModelEditorConverter.cs:34)."""
    import jax

    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.io import weights as W
    from xrseg_tpu.train import train_step as ts

    donor, _ = real_params
    cfg3 = ModelConfig(scale="n", input_size=(64, 64), num_classes=3,
                       dtype="float32")
    params, rep = W.transfer_params(donor, cfg3)
    # every reinitialized leaf is a final class conv; all else transferred
    assert all(k.startswith("det/cv3") and "/out/" in k
               for k in rep["reinit"]), rep["reinit"][:4]
    np.testing.assert_array_equal(np.asarray(donor["b0"]["w"]),
                                  np.asarray(params["b0"]["w"]))

    opt = ts.make_optimizer()
    state = ts.init_train_state(jax.random.key(0), cfg3, opt)
    # the rescued cls stack keeps the donor's hidden width, so the opt
    # state must be built FROM the grafted tree, not the fresh-init one
    state = ts.TrainState(params=params, opt_state=opt.init(params),
                          step=state.step)
    step = ts.make_train_step(cfg3, opt)
    rng = np.random.default_rng(0)
    batch = {
        "images": np.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), np.float32),
        "boxes_xywh": np.asarray(rng.uniform(8, 56, (2, 4, 4)), np.float32),
        "labels": np.asarray(rng.integers(0, 3, (2, 4)), np.int32),
        "masks": np.asarray(rng.uniform(0, 1, (2, 4, 16, 16)) > 0.5,
                            np.float32),
    }
    _, metrics = step(state, batch)
    assert np.isfinite(jax.device_get(metrics["loss"]))
