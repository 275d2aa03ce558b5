"""Weight persistence, quantization, and external-format loaders.

The reference's "checkpoint" is its compiled uint8-quantized .sentis artifact
(Assets/Resources/Model/yolo11n-seg-sentis.sentis, quantized at
Assets/Scripts/InferenceEngine/Editor/IEModelEditorConverter.cs:101). Here:

  - save_npz / load_npz: flat-key npz checkpoints of the param pytree
  - quantize_int8 / dequantize_int8: per-output-channel symmetric weight-only
    quantization (the uint8-weight capability of the reference, done the
    TPU way: int8 storage, bf16 compute after dequant-on-load)
  - orbax checkpointing for sharded/multi-host use
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Any

_SEP = "/"


def flatten_params(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{path}{_SEP}{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{path}{_SEP}{i}")
        else:
            out[path] = np.asarray(node)

    rec(params, prefix)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Params:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_npz(path: str, params: Params) -> None:
    flat = flatten_params(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_npz(path: str) -> Params:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return unflatten_params(flat)


# ---------------------------------------------------------------------------
# int8 weight-only quantization (reference: uint8 ModelQuantizer)
# ---------------------------------------------------------------------------

def quantize_int8(params: Params) -> Params:
    """Per-output-channel symmetric int8 for every conv weight 'w'/'up_w'.

    Biases and small tensors stay fp32. Returns a pytree with
    {q: int8, scale: f32} nodes in place of quantized weights.
    """
    def rec(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in ("w", "up_w") and hasattr(v, "shape") and v.ndim == 4:
                    w = np.asarray(v, np.float32)
                    amax = np.abs(w).reshape(-1, w.shape[-1]).max(0)
                    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
                    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
                    out[k] = {"q": jnp.asarray(q), "scale": jnp.asarray(scale)}
                else:
                    out[k] = rec(v)
            return out
        if isinstance(node, (list, tuple)):
            return [rec(v) for v in node]
        return node

    return rec(params)


def dequantize_int8(params: Params, dtype=jnp.float32) -> Params:
    def rec(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"q", "scale"}:
                return (node["q"].astype(dtype) * node["scale"].astype(dtype))
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [rec(v) for v in node]
        return node

    return rec(params)


def cast_params(params: Params, dtype) -> Params:
    """Cast every float array to `dtype` (weight-storage precision).

    bf16 storage halves weight HBM traffic; measured on one v5e chip it's
    ~7% faster at batch=1 (2.42 -> 2.26 ms/frame, n-seg 640) and neutral
    at batch=128 where weight reads amortize. Integer arrays (int8 q,
    labels) pass through untouched.
    """
    import jax

    dt = jnp.dtype(dtype)

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dt)
        return x

    return jax.tree.map(cast, params)


def quantized_size_bytes(params: Params) -> int:
    total = 0
    for a in jax.tree.leaves(params):
        if hasattr(a, "nbytes"):
            total += int(a.nbytes)
    return total


# ---------------------------------------------------------------------------
# orbax (sharded / production checkpoints)
# ---------------------------------------------------------------------------

def save_orbax(path: str, params: Params) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    # force=True: overwrite an existing checkpoint — periodic trainer saves
    # rewrite the same path every ckpt_every_epochs
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, like: Params | None = None) -> Params:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), target=like)
    return ckptr.restore(os.path.abspath(path))


# ---------------------------------------------------------------------------
# format-dispatching loader
# ---------------------------------------------------------------------------

def load_params_auto(path: str, cfg=None):
    """Load model params from any supported artifact, by extension:
    .sentis (the reference's deployed format), .onnx (ultralytics export),
    .npz (our flat checkpoints), else an orbax checkpoint directory.
    Returns (params, cfg) — cfg is refined by loaders that carry model
    metadata (.sentis/.onnx infer the scale), passed through otherwise."""
    if path.endswith(".sentis"):
        from xrseg_tpu.io.sentis import load_yolo11_params
        return load_yolo11_params(path, cfg)
    if path.endswith(".onnx"):
        from xrseg_tpu.io.onnx_loader import load_yolo11_onnx
        return load_yolo11_onnx(path, cfg)
    if path.endswith(".npz"):
        return load_npz(path), cfg
    return load_orbax(path), cfg
