"""YOLOv8 (cfg.arch="yolov8") family: torch-oracle parity, param budgets,
pipeline + ONNX round-trips.

The reference deploys YOLO11 (its .sentis came from yolo11n-seg.onnx,
IEModelEditorConverter.cs:34), but the wider ultralytics ecosystem's
checkpoints are predominantly v8-generation: C2f blocks (inner
Bottleneck e=1.0), no C2PSA, plain-conv ("legacy") cls head, and a
shortcut-free neck. These tests pin our v8 graph against the same
independent torch oracle the v11 family uses (tests/torch_ref.py runs
OUR weights through torch ops), check the published parameter budgets,
and round-trip weights through the ONNX exporter/loader/interpreter.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrseg_tpu.config import ExecutorConfig, ModelConfig, PostprocessConfig
from xrseg_tpu.models import yolo11
import torch_ref as T


def _np_params(p):
    return jax.tree.map(lambda a: np.asarray(a) if hasattr(a, "shape") else a,
                        p)


def _cfg(task="segment", scale="n", hw=(64, 64)):
    return ModelConfig(arch="yolov8", scale=scale, task=task,
                       input_size=hw, dtype="float32")


def test_v8_structure():
    """v8 params: no C2PSA, SPPF last backbone block, legacy cls head,
    C2f inner bottleneck at e=1.0 (hidden dim == c, not c/2)."""
    cfg = _cfg()
    p = yolo11.init_params(jax.random.key(0), cfg)
    assert "b10" not in p and "b9" in p
    assert "conv0" in p["det"]["cv3"][0] and "dw0" not in p["det"]["cv3"][0]
    # b2 = C2f(c128 -> c128): cv1 emits 2c = c128; inner bottleneck cv1 is
    # c -> c (e=1.0). YOLO11's C3k2 would have c -> c/2 here.
    c = np.asarray(p["b2"]["cv1"]["w"]).shape[-1] // 2
    bw = np.asarray(p["b2"]["m"][0]["cv1"]["w"])
    assert bw.shape[2] == c and bw.shape[3] == c, bw.shape


@pytest.mark.parametrize("task", ["segment", "detect"])
def test_v8_forward_matches_torch(task, rng):
    cfg = _cfg(task)
    params = yolo11.init_params(jax.random.key(0), cfg)
    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    out_j = yolo11.forward(params, np.asarray(x), cfg)
    out_t = T.full_forward(_np_params(params), x, cfg)
    keys = ("preds", "protos", "mask_coefs") if task == "segment" \
        else ("preds",)
    for k in keys:
        a, b = np.asarray(out_j[k]), out_t[k]
        assert a.shape == b.shape, (k, a.shape, b.shape)
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-3)
        assert err < 5e-4, (k, err)


def test_v8_pose_obb_classify_match_torch(rng):
    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)

    cfg = _cfg("pose")
    p = yolo11.init_params(jax.random.key(1), cfg)
    out = yolo11.forward(p, np.asarray(x), cfg)
    ref = T.pose_forward(_np_params(p), x, cfg)
    np.testing.assert_allclose(np.asarray(out["kpts"]), ref["kpts"],
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["boxes_xywh"]),
                               ref["boxes_xywh"], rtol=1e-3, atol=5e-3)

    cfg = _cfg("obb")
    p = yolo11.init_params(jax.random.key(2), cfg)
    out = yolo11.forward(p, np.asarray(x), cfg)
    ref = T.obb_forward(_np_params(p), x, cfg)
    np.testing.assert_allclose(np.asarray(out["boxes_xywhr"]),
                               ref["boxes_xywhr"], rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["scores"]), ref["scores"],
                               rtol=1e-3, atol=5e-3)

    cfg = _cfg("classify")
    p = yolo11.init_params(jax.random.key(3), cfg)
    assert "b9" not in p                      # v8-cls: no SPPF
    out = yolo11.classify_forward(p, jnp.asarray(x), cfg)
    ref_logits = T.classify_forward_torch(_np_params(p), x, cfg)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref_logits,
                               rtol=1e-3, atol=5e-3)


# Published ultralytics parameter budgets (M): yolov8{n,s}-seg, yolov8n.
# classify's 2.72M is quoted at ImageNet nc=1000 (the 1280-wide linear
# head carries 1.28M of it).
V8_BUDGET_M = {("n", "segment"): 3.40, ("s", "segment"): 11.8,
               ("n", "detect"): 3.16, ("n", "pose"): 3.30,
               ("n", "classify"): 2.72, ("n", "obb"): 3.08}


@pytest.mark.parametrize("scale,task", sorted(V8_BUDGET_M))
def test_v8_param_budgets(scale, task):
    cfg = _cfg(task, scale=scale, hw=(64, 64))
    if task == "classify":
        cfg = ModelConfig(arch="yolov8", scale=scale, task=task,
                          input_size=(64, 64), dtype="float32",
                          num_classes=1000)
    n = yolo11.count_params(yolo11.init_params(jax.random.key(0), cfg))
    ref = V8_BUDGET_M[(scale, task)] * 1e6
    assert abs(n - ref) / ref < 0.05, (n, ref)


def test_v8_pipeline_detects():
    """The deployed pipeline surface (preprocess+net+decode+NMS+masks in
    one jit) runs the v8 graph with the detection-guaranteeing fixture."""
    from xrseg_tpu.compile import build_pipeline
    from xrseg_tpu.testing import detection_params

    cfg = ExecutorConfig(
        model=_cfg("segment"),
        post=PostprocessConfig(pre_nms_topk=64, max_detections=10,
                               score_threshold=0.3))
    params = detection_params(jax.random.key(0), cfg.model)
    pipe = build_pipeline(cfg, params, frame_hw=(64, 64), batch=1).warmup()
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (1, 64, 64, 3)), jnp.uint8)
    det = pipe(frames)
    assert int(det["count"][0]) > 0
    assert det["masks"].shape == (1, 10, 16, 16)   # max_det x input/4 slate


def test_v8_onnx_export_roundtrip(tmp_path, rng):
    """Export the v8 graph, execute with the numpy ONNX interpreter,
    compare to the JAX forward; reload weights through the ordered-slot
    loader bitwise."""
    from xrseg_tpu.io.onnx_exec import run_onnx
    from xrseg_tpu.io.onnx_export import export_onnx
    from xrseg_tpu.io.onnx_loader import load_yolo11_onnx

    cfg = _cfg("segment")
    params = yolo11.init_params(jax.random.key(0), cfg)
    path = str(tmp_path / "v8n_seg.onnx")
    export_onnx(jax.device_get(params), cfg, path)

    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = run_onnx(path, {"images": np.transpose(x, (0, 3, 1, 2))})
    ref = jax.device_get(yolo11.forward(params, jnp.asarray(x), cfg))
    got = np.transpose(out["output0"], (0, 2, 1))
    np.testing.assert_allclose(got[..., :4], ref["preds"][..., :4],
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(got[..., 4:], ref["preds"][..., 4:],
                               rtol=1e-4, atol=1e-4)
    protos = np.transpose(out["output1"], (0, 2, 3, 1))
    np.testing.assert_allclose(protos, ref["protos"], rtol=1e-4, atol=1e-4)

    loaded, _ = load_yolo11_onnx(path, cfg)
    fa, fb = jax.tree.leaves(params), jax.tree.leaves(loaded)
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_v8_train_step_learns(rng):
    """Single-image overfit sanity through the shared loss/assigner
    stack. Raw TAL loss legitimately GROWS from random init (the cls
    prior rises, positives activate, box terms switch on), so the
    assertions are: (a) every top-level param group receives gradient
    (the v8-specific legacy cv3 included), (b) the model actually
    learns — the positives' box (CIoU) loss term drops (the detect
    analogue of the repo's probIoU 0.02->0.8 OBB overfit pin). Starts
    from the calibrated detection fixture rather than random init: TAL
    from scratch spends ~100s of steps activating positives before box
    learning becomes visible (cold-start dynamics, not a v8 property)."""
    import optax
    from xrseg_tpu.train.losses import detection_loss
    from xrseg_tpu.testing import detection_params
    cfg = _cfg("detect", hw=(64, 64))
    params = detection_params(jax.random.key(0), cfg, label=3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    targets = {
        "boxes_xywh": jnp.asarray([[[32.0, 32.0, 24.0, 24.0]]]),
        "labels": jnp.asarray([[3]], jnp.int32),
    }
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            out = yolo11.forward_train(p, x, cfg)
            l, aux = detection_loss(out, targets, cfg)
            return l, aux
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l, aux, g

    grads = None
    box_terms = []
    for i in range(30):
        params, state, l, aux, g = step(params, state)
        assert np.isfinite(float(l)), (i, float(l))
        box_terms.append(float(aux["box"]))
        if grads is None:
            grads = g
    # gradient reaches every group, incl. the v8 legacy cls branch
    for key in ("b0", "b8", "h13", "h22", "det"):
        gn = float(optax.global_norm(grads[key]))
        assert np.isfinite(gn) and gn > 0.0, (key, gn)
    assert float(optax.global_norm(
        grads["det"]["cv3"][0]["conv0"])) > 0.0
    # measured trajectory: 0.586 -> 0.561 over 30 steps, monotone; the
    # fixture's box head starts near-zero (w*1e-3) so geometry moves
    # steadily, not in one jump
    assert box_terms[-1] < box_terms[0] - 0.015, box_terms
