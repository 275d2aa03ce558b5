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
