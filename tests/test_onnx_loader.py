"""ONNX loader roundtrip: write a minimal ONNX file with known conv weights
in graph order, parse it back, and verify the pytree mapping."""
import struct

import jax
import numpy as np
import pytest

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.io.onnx_loader import load_yolo11_onnx, parse_onnx
from xrseg_tpu.io.weights import flatten_params
from xrseg_tpu.models import yolo11


# --- minimal protobuf writer ---

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(fnum: int, wtype: int, payload: bytes) -> bytes:
    return _varint((fnum << 3) | wtype) + (
        _varint(len(payload)) + payload if wtype == 2 else payload)


def _tensor(name: str, arr: np.ndarray) -> bytes:
    out = b""
    for d in arr.shape:
        out += _field(1, 0, _varint(d))
    out += _field(2, 0, _varint(1))                      # float32
    out += _field(8, 2, name.encode())
    out += _field(9, 2, arr.astype(np.float32).tobytes())
    return out


def _node(op: str, inputs, outputs) -> bytes:
    out = b""
    for i in inputs:
        out += _field(1, 2, i.encode())
    for o in outputs:
        out += _field(2, 2, o.encode())
    out += _field(4, 2, op.encode())
    return out


def _write_onnx(path: str, ops):
    """ops: list of (op_type, w OIHW/IOHW, b or None)."""
    graph = b""
    inits = b""
    prev = "images"
    for i, (op, w, b) in enumerate(ops):
        wname, bname = f"w{i}", f"b{i}"
        ins = [prev, wname] + ([bname] if b is not None else [])
        out = f"t{i}"
        graph += _field(1, 2, _node(op, ins, [out]))
        inits += _field(5, 2, _tensor(wname, w))
        if b is not None:
            inits += _field(5, 2, _tensor(bname, b))
        prev = out
    g = graph + inits
    model = _field(7, 2, g)
    open(path, "wb").write(model)


def test_onnx_roundtrip_mapping(tmp_path):
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32")
    src_params = yolo11.init_params(jax.random.key(7), cfg)
    slots = yolo11.ordered_param_slots(cfg)

    # serialize src_params' conv weights (converted to ONNX layouts) in order
    ops = []
    for pathk, kind in slots:
        if kind == "dfl":
            ops.append(("Conv",
                        np.arange(16, dtype=np.float32).reshape(1, 16, 1, 1),
                        None))
            continue
        node = src_params
        for k in pathk:
            node = node[k]
        if kind == "convtranspose":
            w = np.transpose(np.asarray(node["up_w"]), (2, 3, 0, 1))
            ops.append(("ConvTranspose", w, np.asarray(node["up_b"])))
        else:
            w = np.transpose(np.asarray(node["w"]), (3, 2, 0, 1))
            ops.append(("Conv", w, np.asarray(node["b"])))

    path = str(tmp_path / "model.onnx")
    _write_onnx(path, ops)

    parsed = parse_onnx(path)
    assert len(parsed["initializers"]) > 100
    loaded, _ = load_yolo11_onnx(path, cfg)

    fa, fb = flatten_params(src_params), flatten_params(loaded)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=1e-6, err_msg=k)


def test_onnx_loader_bad_file(tmp_path):
    p = str(tmp_path / "junk.onnx")
    open(p, "wb").write(b"\x00\x01\x02")
    with pytest.raises(Exception):
        load_yolo11_onnx(p)


def test_task_family_onnx_round_trip(tmp_path):
    """Every task's export re-imports EXACTLY (ordered_param_slots covers
    the pose/obb cv4 heads and classify's Conv+Gemm head): the full
    fine-tune -> ONNX -> reload loop works beyond detect/segment."""
    import jax

    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.io.onnx_export import export_onnx
    from xrseg_tpu.io.onnx_loader import load_yolo11_onnx
    from xrseg_tpu.models import yolo11

    for task, kw in (("pose", {"kpt_shape": (5, 3)}), ("obb", {}),
                     ("classify", {"num_classes": 7})):
        cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                          task=task, **kw)
        params = yolo11.init_params(jax.random.key(1), cfg)
        path = str(tmp_path / f"rt_{task}.onnx")
        export_onnx(params, cfg, path)
        p2, _ = load_yolo11_onnx(path, cfg)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
