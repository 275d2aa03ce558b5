"""Full YOLO11 graph: JAX vs torch oracle, shapes, and parameter budgets."""
import jax
import numpy as np
import pytest

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.models import yolo11
import torch_ref as T


def _np_params(p):
    return jax.tree.map(lambda a: np.asarray(a) if hasattr(a, "shape") else a, p)


def test_full_forward_matches_torch(rng):
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32")
    params = yolo11.init_params(jax.random.key(0), cfg)
    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)

    out_j = yolo11.forward(params, np.asarray(x), cfg)
    out_t = T.full_forward(_np_params(params), x, cfg)

    for k in ("preds", "protos", "mask_coefs"):
        a, b = np.asarray(out_j[k]), out_t[k]
        assert a.shape == b.shape, (k, a.shape, b.shape)
        denom = max(np.abs(b).max(), 1e-3)
        err = np.abs(a - b).max() / denom
        assert err < 5e-4, (k, err)


def test_detect_task_forward(rng):
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      task="detect")
    params = yolo11.init_params(jax.random.key(1), cfg)
    x = rng.standard_normal((2, 64, 64, 3), dtype=np.float32)
    out = yolo11.forward(params, np.asarray(x), cfg)
    A = cfg.num_anchors
    assert out["preds"].shape == (2, A, 4 + 80)
    assert "protos" not in out


def test_output_contract_shapes(rng):
    """The exact reference-ONNX contract (IEModelEditorConverter.cs:50-58)."""
    cfg = ModelConfig(scale="n", input_size=(160, 160), dtype="float32")
    params = yolo11.init_params(jax.random.key(2), cfg)
    x = rng.standard_normal((1, 160, 160, 3), dtype=np.float32)
    out = yolo11.forward(params, np.asarray(x), cfg)
    o0, o1 = yolo11.raw_outputs_onnx_layout(out)
    A = cfg.num_anchors
    assert o0.shape == (1, 116, A)
    assert o1.shape == (1, 32, 40, 40)
    # boxes are xywh in input-pixel space: centers within image bounds mostly
    cx = np.asarray(o0[0, 0])
    assert cx.min() > -160 and cx.max() < 320


# Known ultralytics parameter budgets (million params) for the seg family.
PARAM_BUDGET_M = {"n": 2.87, "s": 10.1, "m": 22.4, "l": 27.6, "x": 62.1}


@pytest.mark.parametrize("scale", ["n", "s", "m", "l", "x"])
def test_param_budget(scale):
    cfg = ModelConfig(scale=scale, dtype="float32")
    params = yolo11.init_params(jax.random.key(0), cfg)
    n = yolo11.count_params(params) / 1e6
    ref = PARAM_BUDGET_M[scale]
    assert abs(n - ref) / ref < 0.15, f"{scale}: {n:.2f}M vs {ref}M"


def test_anchor_layout():
    a, s = yolo11.make_anchors((640, 640))
    assert a.shape == (8400, 2) and s.shape == (8400, 1)
    # first anchor of each level at (0.5, 0.5); strides blocked 8/16/32
    assert np.allclose(a[0], [0.5, 0.5])
    assert np.allclose(a[6400], [0.5, 0.5])
    assert np.allclose(a[8000], [0.5, 0.5])
    assert (s[:6400] == 8).all() and (s[6400:8000] == 16).all() and (s[8000:] == 32).all()
    # row-major: second anchor advances in x
    assert np.allclose(a[1], [1.5, 0.5])


@pytest.mark.parametrize("scale", ["n", "s", "m", "l", "x"])
def test_ordered_slots_consistent_with_params(scale):
    """Loader slot walk must cover every conv-like param exactly once for
    every scale (guards the sentis/onnx mapping against structure drift)."""
    cfg = ModelConfig(scale=scale, dtype="float32")
    params = yolo11.init_params(jax.random.key(0), cfg)
    slots = yolo11.ordered_param_slots(cfg)

    # count conv-like leaves in the pytree: every dict with a 4D "w" or
    # "up_w" counts once
    def count(node):
        n = 0
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 4:
                n += 1
            if "up_w" in node:
                n += 1
            for k, v in node.items():
                if k not in ("w", "up_w", "b", "up_b"):
                    n += count(v)
        elif isinstance(node, list):
            n += sum(count(v) for v in node)
        return n

    n_params = count(params)
    n_slots = len([s for s in slots if s[1] != "dfl"])
    assert n_params == n_slots, (scale, n_params, n_slots)

    # every slot path resolves to a real param node
    for pathk, kind in slots:
        if kind == "dfl":
            continue
        node = params
        for k in pathk:
            node = node[k]
        key = "up_w" if kind == "convtranspose" else "w"
        assert key in node or (kind == "convtranspose" and "up_w" in node), pathk


def test_model_info():
    from xrseg_tpu.models.yolo11 import model_info
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32")
    info = model_info(cfg)
    assert info["params"] == 2_868_648
    assert info["anchors"] == cfg.num_anchors
    if "gflops" in info:
        assert 0.01 < info["gflops"] < 5.0   # 64x64 input
