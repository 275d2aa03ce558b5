"""Minimal ONNX weight loader (no `onnx` package required).

The reference's source artifact is an ultralytics YOLO11 ONNX export
(Assets/Resources/Model/yolo11n-seg.onnx, consumed by the editor-time
converter IEModelEditorConverter.cs:34). This module parses the ONNX
protobuf wire format directly — just enough to pull the graph's Conv /
ConvTranspose nodes in topological order with their weight/bias
initializers — and maps them onto our param pytree with the same
ordered-slot logic the .sentis loader uses.

Covers fp32 and fp16 initializers, raw_data and typed fields.
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# protobuf wire-format reader
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, Any]]:
    """Yield (field_number, wire_type, value) for one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:        # varint
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:      # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wtype == 2:      # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wtype == 5:      # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


def _collect(buf: bytes) -> Dict[int, List[Any]]:
    out: Dict[int, List[Any]] = {}
    for fnum, _, val in _fields(buf):
        out.setdefault(fnum, []).append(val)
    return out


# ONNX TensorProto dtypes
_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
           7: np.int64, 10: np.float16, 11: np.float64}


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    """TensorProto: 1=dims(varint rep), 2=data_type, 4=float_data,
    7=int64_data, 8=name, 9=raw_data."""
    dims: List[int] = []
    dtype = np.float32
    name = ""
    raw: Optional[bytes] = None
    floats: List[bytes] = []
    int64s: List[int] = []
    for fnum, wtype, val in _fields(buf):
        if fnum == 1:
            dims.append(val)
        elif fnum == 2:
            dtype = _DTYPES.get(val, np.float32)
        elif fnum == 8:
            name = val.decode("utf8")
        elif fnum == 9:
            raw = val
        elif fnum == 4:
            floats.append(val)
        elif fnum == 7:
            if wtype == 0:
                int64s.append(val)
            else:  # packed
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    int64s.append(v)
    if raw is not None:
        arr = np.frombuffer(raw, dtype)
    elif floats:
        arr = np.frombuffer(b"".join(floats), np.float32)
    elif int64s:
        arr = np.asarray(int64s, np.int64)
    else:
        arr = np.zeros(0, dtype)
    return name, arr.reshape(dims) if dims else arr


def _parse_node(buf: bytes) -> Dict[str, Any]:
    """NodeProto: 1=input(rep str), 2=output, 3=name, 4=op_type."""
    node = {"inputs": [], "outputs": [], "name": "", "op": ""}
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            node["inputs"].append(val.decode("utf8"))
        elif fnum == 2:
            node["outputs"].append(val.decode("utf8"))
        elif fnum == 3:
            node["name"] = val.decode("utf8")
        elif fnum == 4:
            node["op"] = val.decode("utf8")
    return node


def parse_onnx(path: str) -> Dict[str, Any]:
    """Returns {"nodes": [NodeDict...] (graph order),
    "initializers": {name: array},
    "metadata": {key: value} (ModelProto.metadata_props — ultralytics
    stores `names`/`task`/`imgsz`/`kpt_shape` there)}."""
    data = open(path, "rb").read()
    model = _collect(data)
    if 7 not in model:
        raise ValueError("not an ONNX ModelProto (no graph field)")
    graph = _collect(model[7][0])
    nodes = [_parse_node(b) for b in graph.get(1, [])]
    inits = dict(_parse_tensor(b) for b in graph.get(5, []))
    meta: Dict[str, str] = {}
    for entry in model.get(14, []):
        kv = _collect(entry)
        if 1 in kv and 2 in kv:
            meta[kv[1][0].decode("utf8")] = kv[2][0].decode("utf8")
    return {"nodes": nodes, "initializers": inits, "metadata": meta}


def read_class_names(path_or_parsed) -> Optional[List[str]]:
    """The `names` metadata entry as an index-ordered list (ultralytics
    str({0: 'person', ...}) form), or None when absent/unparseable."""
    import ast
    parsed = (path_or_parsed if isinstance(path_or_parsed, dict)
              else parse_onnx(path_or_parsed))
    raw = parsed.get("metadata", {}).get("names")
    if not raw:
        return None
    try:
        d = ast.literal_eval(raw)
        return [str(d[i]) for i in sorted(d)]
    except (ValueError, SyntaxError, KeyError, TypeError):
        return None


def conv_sequence_onnx(parsed: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Weighted ops (Conv/ConvTranspose/Gemm) in graph order with their
    arrays (Gemm carries the classify head's linear layer)."""
    inits = parsed["initializers"]
    seq = []
    for node in parsed["nodes"]:
        if node["op"] not in ("Conv", "ConvTranspose", "Gemm"):
            continue
        if len(node["inputs"]) < 2 or node["inputs"][1] not in inits:
            continue
        w = np.asarray(inits[node["inputs"][1]], np.float32)
        b = None
        if len(node["inputs"]) > 2 and node["inputs"][2] in inits:
            b = np.asarray(inits[node["inputs"][2]], np.float32)
        seq.append({"op": node["op"], "w": w, "b": b, "name": node["name"]})
    return seq


def load_yolo11_onnx(path: str, cfg=None):
    """Load an ultralytics YOLO11 ONNX export into our param pytree.

    Same ordered-slot mapping as the .sentis loader (the sentis graph IS the
    imported ONNX graph, so the weighted-op order matches).
    """
    import jax
    import jax.numpy as jnp

    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.models import yolo11

    if cfg is None:
        cfg = ModelConfig(scale="n")
    parsed = parse_onnx(path)
    seq = conv_sequence_onnx(parsed)
    slots = yolo11.ordered_param_slots(cfg)
    # ONNX exports keep the DFL conv too; tolerate exact or off-by-DFL counts
    if len(seq) != len(slots):
        # maybe the export lacks the DFL conv (older exports decode in graph)
        slots_nodfl = [s for s in slots if s[1] != "dfl"]
        if len(seq) == len(slots_nodfl):
            slots = slots_nodfl
        else:
            raise ValueError(
                f"weighted-op count mismatch: onnx has {len(seq)}, model "
                f"({cfg.scale}, {cfg.task}) expects {len(slots)}")

    params = yolo11.init_params(jax.random.key(0), cfg)

    def node_at(p):
        node = params
        for k in p[:-1]:
            node = node[k]
        return node

    for (pathk, kind), op in zip(slots, seq):
        w, b = op["w"], op["b"]
        if kind == "gemm":
            # classify linear head: lin_w [hidden, nc] (transB=0 export),
            # lin_b [nc]
            node = node_at(pathk + ("lin_w",))
            if node["lin_w"].shape != w.shape:
                raise ValueError(f"gemm shape mismatch at {pathk}: model "
                                 f"{node['lin_w'].shape} vs onnx {w.shape}")
            node["lin_w"] = jnp.asarray(w)
            if b is not None:
                node["lin_b"] = jnp.asarray(b)
            continue
        if kind == "dfl":
            got = w.reshape(-1)
            if not np.allclose(got, np.arange(cfg.reg_max), atol=0.5):
                raise ValueError(f"unexpected DFL weights: {got[:8]}")
            continue
        if kind == "convtranspose":
            node = node_at(pathk + ("up_w",))
            up_w = np.transpose(w, (2, 3, 0, 1))
            assert node["up_w"].shape == up_w.shape
            node["up_w"] = jnp.asarray(up_w)
            if b is not None:
                node["up_b"] = jnp.asarray(b)
            continue
        node = node_at(pathk + ("w",))
        hwio = np.transpose(w, (2, 3, 1, 0))
        if node["w"].shape != hwio.shape:
            raise ValueError(f"shape mismatch at {pathk}: model "
                             f"{node['w'].shape} vs onnx {hwio.shape}")
        node["w"] = jnp.asarray(np.ascontiguousarray(hwio))
        if b is not None:
            node["b"] = jnp.asarray(b)
    from xrseg_tpu.io.weights import maybe_seed_o2o
    return maybe_seed_o2o(params, cfg), cfg
