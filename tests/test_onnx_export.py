"""ONNX export: write the graph, execute it with the numpy interpreter,
and compare against the JAX forward; round-trip the weights through our
own ONNX loader (which expects the ultralytics conv ordering)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.io.onnx_exec import run_onnx
from xrseg_tpu.io.onnx_export import export_onnx
from xrseg_tpu.io.onnx_loader import load_yolo11_onnx
from xrseg_tpu.models import yolo11


def _setup(task, tmp_path, scale="n", hw=(64, 64)):
    cfg = ModelConfig(scale=scale, task=task, input_size=hw,
                      dtype="float32")
    params = yolo11.init_params(jax.random.key(0), cfg)
    path = str(tmp_path / f"m_{task}_{scale}.onnx")
    export_onnx(jax.device_get(params), cfg, path)
    return cfg, params, path


@pytest.mark.parametrize("task", ["segment", "detect"])
def test_export_matches_jax_forward(task, tmp_path):
    cfg, params, path = _setup(task, tmp_path)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, *cfg.input_size, 3)).astype(np.float32)

    out = run_onnx(path, {"images": np.transpose(x, (0, 3, 1, 2))})
    ref = jax.device_get(yolo11.forward(params, jnp.asarray(x), cfg))

    # output0 [1, 4+nc(+nm), A] vs our preds [1, A, 4+nc(+nm)]
    got = np.transpose(out["output0"], (0, 2, 1))
    np.testing.assert_allclose(got[..., :4], ref["preds"][..., :4],
                               rtol=1e-4, atol=2e-3)      # boxes (px)
    np.testing.assert_allclose(got[..., 4:], ref["preds"][..., 4:],
                               rtol=1e-4, atol=1e-4)      # scores/coefs
    if task == "segment":
        protos = np.transpose(out["output1"], (0, 2, 3, 1))
        np.testing.assert_allclose(protos, ref["protos"],
                                   rtol=1e-4, atol=1e-4)


def test_export_weight_roundtrip(tmp_path):
    """Our loader consumes the export: conv ordering matches the
    ultralytics/sentis convention (ordered_param_slots)."""
    cfg, params, path = _setup("segment", tmp_path)
    loaded, _ = load_yolo11_onnx(path, cfg)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_export_wider_scale_smoke(tmp_path):
    """Scale 's' exercises different channel widths through the same graph
    builder (forward parity on a smaller input for speed)."""
    cfg, params, path = _setup("detect", tmp_path, scale="s", hw=(32, 32))
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    out = run_onnx(path, {"images": np.transpose(x, (0, 3, 1, 2))})
    ref = jax.device_get(yolo11.forward(params, jnp.asarray(x), cfg))
    got = np.transpose(out["output0"], (0, 2, 1))
    np.testing.assert_allclose(got[..., 4:], ref["preds"][..., 4:],
                               rtol=1e-4, atol=1e-4)


def test_export_pose_matches_jax_forward(tmp_path):
    """Pose export: output0 [1, 4+nc+nk, A] with in-graph kpt decode."""
    cfg = ModelConfig(scale="n", task="pose", input_size=(64, 64),
                      dtype="float32", kpt_shape=(5, 3), num_classes=4)
    params = yolo11.init_params(jax.random.key(5), cfg)
    path = str(tmp_path / "pose.onnx")
    export_onnx(jax.device_get(params), cfg, path)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = run_onnx(path, {"images": np.transpose(x, (0, 3, 1, 2))})
    ref = jax.device_get(yolo11.forward(params, jnp.asarray(x), cfg,
                                        concat_preds=False))
    got = np.transpose(out["output0"], (0, 2, 1))  # [1, A, 4+nc+nk]
    np.testing.assert_allclose(got[..., :4], ref["boxes_xywh"],
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(got[..., 4:8], ref["scores"],
                               rtol=1e-4, atol=1e-4)
    kpts = got[..., 8:].reshape(1, -1, 5, 3)
    np.testing.assert_allclose(kpts, ref["kpts"], rtol=1e-4, atol=5e-3)


def test_export_obb_matches_jax_forward(tmp_path):
    """OBB export: output0 [1, 4+nc+1, A] with in-graph dist2rbox."""
    cfg = ModelConfig(scale="n", task="obb", input_size=(64, 64),
                      dtype="float32", num_classes=4)
    params = yolo11.init_params(jax.random.key(6), cfg)
    path = str(tmp_path / "obb.onnx")
    export_onnx(jax.device_get(params), cfg, path)
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = run_onnx(path, {"images": np.transpose(x, (0, 3, 1, 2))})
    ref = jax.device_get(yolo11.forward(params, jnp.asarray(x), cfg,
                                        concat_preds=False))
    got = np.transpose(out["output0"], (0, 2, 1))  # [1, A, 4+nc+1]
    np.testing.assert_allclose(got[..., :4], ref["boxes_xywhr"][..., :4],
                               rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(got[..., -1], ref["boxes_xywhr"][..., 4],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[..., 4:-1], ref["scores"],
                               rtol=1e-4, atol=1e-4)


def test_export_classify_matches_jax_forward(tmp_path):
    """Classify export: output0 [1, nc] softmax probabilities."""
    cfg = ModelConfig(scale="n", task="classify", input_size=(64, 64),
                      dtype="float32", num_classes=6)
    params = yolo11.init_params(jax.random.key(7), cfg)
    path = str(tmp_path / "cls.onnx")
    export_onnx(jax.device_get(params), cfg, path)
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    # (graph declares batch 1 but every op broadcasts; run per image)
    ref = jax.device_get(yolo11.forward(params, jnp.asarray(x), cfg))
    for b in range(2):
        out = run_onnx(path, {"images": np.transpose(
            x[b:b + 1], (0, 3, 1, 2))})
        np.testing.assert_allclose(out["output0"][0], ref["probs"][b],
                                   rtol=1e-4, atol=1e-4)


def test_export_metadata_names_roundtrip(tmp_path):
    """metadata_props carries the ultralytics vocabulary (names/task/
    imgsz/kpt_shape); read_class_names parses the names dict back."""
    from xrseg_tpu.io.onnx_loader import parse_onnx, read_class_names

    cfg = ModelConfig(scale="n", task="segment", input_size=(64, 64),
                      dtype="float32", num_classes=80)
    params = yolo11.init_params(jax.random.key(0), cfg)
    path = str(tmp_path / "m.onnx")
    export_onnx(jax.device_get(params), cfg, path)
    meta = parse_onnx(path)["metadata"]
    assert meta["task"] == "segment"
    assert meta["imgsz"] == "[64, 64]"
    names = read_class_names(path)
    assert len(names) == 80 and names[0] == "person" and names[5] == "bus"

    # custom names + pose kpt_shape
    cfg2 = ModelConfig(scale="n", task="pose", input_size=(64, 64),
                       dtype="float32", num_classes=2, kpt_shape=(5, 3))
    p2 = yolo11.init_params(jax.random.key(1), cfg2)
    path2 = str(tmp_path / "m2.onnx")
    export_onnx(jax.device_get(p2), cfg2, path2, class_names=["cat", "dog"])
    parsed = parse_onnx(path2)
    assert read_class_names(parsed) == ["cat", "dog"]
    assert parsed["metadata"]["kpt_shape"] == "[5, 3]"
    # the default for a non-COCO class count is placeholder names
    cfg3 = ModelConfig(scale="n", task="detect", input_size=(64, 64),
                       dtype="float32", num_classes=3)
    p3 = yolo11.init_params(jax.random.key(2), cfg3)
    path3 = str(tmp_path / "m3.onnx")
    export_onnx(jax.device_get(p3), cfg3, path3)
    assert read_class_names(path3) == ["class_0", "class_1", "class_2"]
