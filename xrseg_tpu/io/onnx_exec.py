"""Minimal ONNX interpreter (numpy + XLA-on-CPU convs) for verifying
exports.

This environment has no onnxruntime, so io/onnx_export.py's output is
verified by actually executing the graph: the 15 ops the exporter emits
are implemented here with independent host-side semantics (numpy;
convolutions via jax.lax on CPU), and the result is compared against the
JAX forward in tests. Also useful as a debugging lens on any
ultralytics-style ONNX file.

Supported ops: Conv, ConvTranspose, MaxPool, Resize(nearest, asymmetric),
Sigmoid, Softmax, MatMul, Mul, Add, Sub, Concat, Split, Reshape,
Transpose, Identity.
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from xrseg_tpu.io.onnx_loader import (_collect, _fields, _parse_tensor,
                                      _read_varint)

# AttributeProto.type enum
_AT_FLOAT, _AT_INT, _AT_STRING, _AT_FLOATS, _AT_INTS = 1, 2, 3, 6, 7


def _parse_attr(buf: bytes) -> Any:
    name = ""
    atype = None
    i_val = None
    f_val = None
    s_val = None
    ints: List[int] = []
    floats: List[float] = []
    import struct as _struct
    for fnum, wtype, val in _fields(buf):
        if fnum == 1:
            name = val.decode("utf8")
        elif fnum == 2:
            f_val = _struct.unpack("<f", val)[0]
        elif fnum == 3:
            i_val = val
        elif fnum == 4:
            s_val = val.decode("utf8")
        elif fnum == 6:
            floats.append(_struct.unpack("<f", val)[0])
        elif fnum == 7:
            if wtype == 0:
                ints.append(val)
            else:
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    ints.append(v)
        elif fnum == 20:
            atype = val
    if atype == _AT_INT:
        return name, i_val
    if atype == _AT_FLOAT:
        return name, f_val
    if atype == _AT_STRING:
        return name, s_val
    if atype == _AT_INTS:
        return name, ints
    if atype == _AT_FLOATS:
        return name, floats
    # untyped fallback: whichever field appeared
    return name, (i_val if i_val is not None else
                  f_val if f_val is not None else
                  s_val if s_val is not None else ints or floats)


def parse_onnx_full(path: str) -> Dict[str, Any]:
    """Like onnx_loader.parse_onnx but keeps node attributes too."""
    data = open(path, "rb").read()
    model = _collect(data)
    graph = _collect(model[7][0])
    nodes = []
    for b in graph.get(1, []):
        node = {"inputs": [], "outputs": [], "name": "", "op": "",
                "attrs": {}}
        for fnum, _, val in _fields(b):
            if fnum == 1:
                node["inputs"].append(val.decode("utf8"))
            elif fnum == 2:
                node["outputs"].append(val.decode("utf8"))
            elif fnum == 3:
                node["name"] = val.decode("utf8")
            elif fnum == 4:
                node["op"] = val.decode("utf8")
            elif fnum == 5:
                k, v = _parse_attr(val)
                node["attrs"][k] = v
        nodes.append(node)
    inits = dict(_parse_tensor(b) for b in graph.get(5, []))
    # graph input names (field 11 -> ValueInfoProto name field 1)
    in_names = []
    for b in graph.get(11, []):
        for fnum, _, val in _fields(b):
            if fnum == 1:
                in_names.append(val.decode("utf8"))
                break
    out_names = []
    for b in graph.get(12, []):
        for fnum, _, val in _fields(b):
            if fnum == 1:
                out_names.append(val.decode("utf8"))
                break
    return {"nodes": nodes, "initializers": inits,
            "inputs": in_names, "outputs": out_names}


# ---------------------------------------------------------------------------
# op semantics (NCHW)
# ---------------------------------------------------------------------------


def _conv_op(x, w, b, attrs):
    import jax.numpy as jnp
    from jax import lax

    pads = attrs.get("pads", [0, 0, 0, 0])
    strides = attrs.get("strides", [1, 1])
    group = int(attrs.get("group", 1))
    y = lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32),
        window_strides=tuple(int(s) for s in strides),
        padding=((int(pads[0]), int(pads[2])), (int(pads[1]), int(pads[3]))),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=group)
    y = np.asarray(y)
    if b is not None:
        y = y + np.asarray(b, np.float32).reshape(1, -1, 1, 1)
    return y


def _convtranspose_op(x, w, b, attrs):
    import jax.numpy as jnp
    from jax import lax

    strides = attrs.get("strides", [1, 1])
    # ONNX ConvTranspose weight is [Cin, Cout/g, kH, kW]; with
    # transpose_kernel=True the spec's I/O roles are swapped, so the
    # content layout [Cin, Cout, kH, kW] is described as "OIHW"
    # (verified numerically against the forward formulation).
    y = lax.conv_transpose(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(w, jnp.float32),
        strides=tuple(int(s) for s in strides), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), transpose_kernel=True)
    y = np.asarray(y)
    if b is not None:
        y = y + np.asarray(b, np.float32).reshape(1, -1, 1, 1)
    return y


def _maxpool_op(x, attrs):
    from jax import lax
    import jax.numpy as jnp

    k = attrs["kernel_shape"]
    pads = attrs.get("pads", [0] * 4)
    strides = attrs.get("strides", [1, 1])
    y = lax.reduce_window(
        jnp.asarray(x, jnp.float32), -jnp.inf, lax.max,
        (1, 1, int(k[0]), int(k[1])),
        (1, 1, int(strides[0]), int(strides[1])),
        ((0, 0), (0, 0), (int(pads[0]), int(pads[2])),
         (int(pads[1]), int(pads[3]))))
    return np.asarray(y)


def _resize_op(x, scales, attrs):
    assert attrs.get("mode") == "nearest"
    sh, sw = int(scales[2]), int(scales[3])
    return np.repeat(np.repeat(x, sh, axis=2), sw, axis=3)


def _softmax_op(x, axis):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def run_onnx(path: str, feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Execute the graph; returns {output_name: array}."""
    parsed = parse_onnx_full(path)
    vals: Dict[str, np.ndarray] = dict(parsed["initializers"])
    vals.update({k: np.asarray(v) for k, v in feeds.items()})

    for node in parsed["nodes"]:
        op = node["op"]
        a = node["attrs"]
        ins = [vals[i] if i else None for i in node["inputs"]]
        if op == "Conv":
            out = _conv_op(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
        elif op == "ConvTranspose":
            out = _convtranspose_op(ins[0], ins[1],
                                    ins[2] if len(ins) > 2 else None, a)
        elif op == "MaxPool":
            out = _maxpool_op(ins[0], a)
        elif op == "Resize":
            out = _resize_op(ins[0], ins[2], a)
        elif op == "Sigmoid":
            x = ins[0].astype(np.float32)
            out = np.where(x >= 0, 1.0 / (1.0 + np.exp(-np.abs(x))),
                           np.exp(-np.abs(x)) / (1.0 + np.exp(-np.abs(x))))
        elif op == "Softmax":
            out = _softmax_op(ins[0].astype(np.float32), int(a["axis"]))
        elif op == "MatMul":
            out = np.matmul(ins[0].astype(np.float32),
                            ins[1].astype(np.float32))
        elif op == "Mul":
            out = ins[0] * ins[1]
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Sub":
            out = ins[0] - ins[1]
        elif op == "Concat":
            out = np.concatenate(ins, axis=int(a["axis"]))
        elif op == "Split":
            sizes = np.asarray(ins[1]).astype(np.int64).tolist()
            axis = int(a.get("axis", 0))
            outs = np.split(ins[0], np.cumsum(sizes)[:-1], axis=axis)
            for nm, o in zip(node["outputs"], outs):
                vals[nm] = o
            continue
        elif op == "Reshape":
            out = ins[0].reshape([int(d) for d in np.asarray(ins[1])])
        elif op == "Transpose":
            out = np.transpose(ins[0], [int(p) for p in a["perm"]])
        elif op == "Identity":
            out = ins[0]
        else:
            raise NotImplementedError(f"op {op}")
        vals[node["outputs"][0]] = out

    return {o: vals[o] for o in parsed["outputs"]}
