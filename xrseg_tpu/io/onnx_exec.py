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
Transpose, Identity — everything the exporter emits — plus the common
foreign-graph vocabulary third-party (e.g. raw ultralytics) exports use
around the same backbone: Slice, Gather, Shape, Unsqueeze, Squeeze, Div,
Pow, Exp, Sqrt, Neg, Constant, Cast, ReduceMax, ReduceMean, ArgMax,
Gemm, Flatten, Relu, LeakyRelu, Clip, GlobalAveragePool, Where, Equal,
Greater, Less, Expand, Range. Axes-style arguments accept both the
attribute form (opset < 13) and the input-tensor form (opset >= 13).
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from xrseg_tpu.io.onnx_loader import (_collect, _fields, _parse_tensor,
                                      _read_varint)

# AttributeProto.type enum
_AT_FLOAT, _AT_INT, _AT_STRING, _AT_TENSOR = 1, 2, 3, 4
_AT_FLOATS, _AT_INTS = 6, 7

# TensorProto.DataType code -> numpy dtype (Cast targets)
_CAST_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
                7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64}


def _parse_attr(buf: bytes) -> Any:
    name = ""
    atype = None
    i_val = None
    f_val = None
    s_val = None
    t_val = None
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
        elif fnum == 5:                       # t: embedded TensorProto
            t_val = _parse_tensor(val)[1]     # (Constant op payload)
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
    if atype == _AT_TENSOR:
        return name, t_val
    if atype == _AT_INTS:
        return name, ints
    if atype == _AT_FLOATS:
        return name, floats
    # untyped fallback: whichever field appeared
    return name, (i_val if i_val is not None else
                  f_val if f_val is not None else
                  s_val if s_val is not None else
                  t_val if t_val is not None else ints or floats)


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
        # ---- foreign-graph vocabulary (third-party exports) ----------
        elif op == "Slice":
            starts = np.asarray(ins[1]).astype(np.int64)
            ends = np.asarray(ins[2]).astype(np.int64)
            axes = (np.asarray(ins[3]).astype(np.int64)
                    if len(ins) > 3 and ins[3] is not None
                    else np.arange(len(starts)))
            steps = (np.asarray(ins[4]).astype(np.int64)
                     if len(ins) > 4 and ins[4] is not None
                     else np.ones(len(starts), np.int64))
            sl = [slice(None)] * ins[0].ndim
            for s, e, ax, st in zip(starts, ends, axes, steps):
                sl[int(ax)] = slice(int(s), int(e), int(st))
            out = ins[0][tuple(sl)]
        elif op == "Gather":
            out = np.take(ins[0], np.asarray(ins[1]).astype(np.int64),
                          axis=int(a.get("axis", 0)))
        elif op == "Shape":
            out = np.asarray(ins[0].shape, np.int64)
        elif op in ("Unsqueeze", "Squeeze"):
            axes = (np.asarray(ins[1]).astype(np.int64).tolist()
                    if len(ins) > 1 and ins[1] is not None
                    else [int(v) for v in a.get("axes", [])])
            out = ins[0]
            if op == "Unsqueeze":
                for ax in sorted(ax % (out.ndim + 1) for ax in axes):
                    out = np.expand_dims(out, ax)
            else:
                out = (np.squeeze(out, axis=tuple(ax % out.ndim
                                                  for ax in axes))
                       if axes else np.squeeze(out))
        elif op == "Div":
            out = ins[0] / ins[1]
        elif op == "Pow":
            out = np.power(ins[0].astype(np.float32), ins[1])
        elif op == "Exp":
            out = np.exp(ins[0].astype(np.float32))
        elif op == "Cos":
            out = np.cos(ins[0].astype(np.float32))
        elif op == "Sin":
            out = np.sin(ins[0].astype(np.float32))
        elif op == "Sqrt":
            out = np.sqrt(ins[0].astype(np.float32))
        elif op == "Neg":
            out = -ins[0]
        elif op == "Constant":
            out = np.asarray(a["value"])
        elif op == "Cast":
            out = ins[0].astype(_CAST_DTYPES[int(a["to"])])
        elif op in ("ReduceMax", "ReduceMean"):
            axes = (np.asarray(ins[1]).astype(np.int64).tolist()
                    if len(ins) > 1 and ins[1] is not None
                    else [int(v) for v in a.get("axes", [])])
            keep = bool(a.get("keepdims", 1))
            fn = np.max if op == "ReduceMax" else np.mean
            out = fn(ins[0], axis=tuple(axes) or None, keepdims=keep)
        elif op == "ArgMax":
            out = np.argmax(ins[0], axis=int(a.get("axis", 0))
                            ).astype(np.int64)
            if bool(a.get("keepdims", 1)):
                out = np.expand_dims(out, int(a.get("axis", 0)))
        elif op == "Gemm":
            x, w = ins[0].astype(np.float32), ins[1].astype(np.float32)
            if int(a.get("transA", 0)):
                x = x.T
            if int(a.get("transB", 0)):
                w = w.T
            out = float(a.get("alpha", 1.0)) * (x @ w)
            if len(ins) > 2 and ins[2] is not None:
                out = out + float(a.get("beta", 1.0)) * ins[2]
        elif op == "Flatten":
            ax = int(a.get("axis", 1))
            out = ins[0].reshape(int(np.prod(ins[0].shape[:ax]) or 1), -1)
        elif op == "Relu":
            out = np.maximum(ins[0], 0)
        elif op == "LeakyRelu":
            al = float(a.get("alpha", 0.01))
            out = np.where(ins[0] >= 0, ins[0], al * ins[0])
        elif op == "Clip":
            lo = ins[1] if len(ins) > 1 and ins[1] is not None \
                else a.get("min", -np.inf)
            hi = ins[2] if len(ins) > 2 and ins[2] is not None \
                else a.get("max", np.inf)
            out = np.clip(ins[0], lo, hi)
        elif op == "GlobalAveragePool":
            out = ins[0].mean(axis=(2, 3), keepdims=True)
        elif op == "Where":
            out = np.where(ins[0], ins[1], ins[2])
        elif op == "Equal":
            out = ins[0] == ins[1]
        elif op == "Greater":
            out = ins[0] > ins[1]
        elif op == "Less":
            out = ins[0] < ins[1]
        elif op == "Expand":
            out = ins[0] * np.ones([int(d) for d in np.asarray(ins[1])],
                                   ins[0].dtype)
        elif op == "Range":
            out = np.arange(np.asarray(ins[0]).item(),
                            np.asarray(ins[1]).item(),
                            np.asarray(ins[2]).item())
        else:
            raise NotImplementedError(f"op {op}")
        vals[node["outputs"][0]] = out

    return {o: vals[o] for o in parsed["outputs"]}
