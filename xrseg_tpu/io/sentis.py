"""Loader for Unity Inference Engine (Sentis 2.x) `.sentis` model files.

The reference ships its network as a compiled, uint8-weight-quantized
`.sentis` artifact (Assets/Resources/Model/yolo11n-seg-sentis.sentis,
produced by IEModelEditorConverter.cs:100-102). This module parses that
format directly — no Unity required — so the TPU framework can run the
*exact same weights* the reference deploys.

Format (reverse-engineered; ExecuTorch-style program flatbuffer):
  [u32 size][flatbuffer Program][constant data segment]
  Program        { f0: version, f1: ExecutionPlan, f3: [DataSegment] }
  ExecutionPlan  { f0: name, f1: [EValue], f2: inputs, f4: outputs,
                   f6: [Chain], f7: [Operator] }
  EValue union   { 2: Int, 3: Float, 4: String, 6: Tensor, 8: IntList }
  Tensor         { f0: dtype(ubyte), f1: nbytes, f2: shape[i32],
                   f3: const flag, f4: segment byte offset }
  Chain          { f0: input value ids, f1: output value ids,
                   f2: [Instruction{ KernelCall{ f0: op idx, f1: arg ids }}] }

Quantized weights are DequantizeUint8 chains: w = (u8 - zero_point) * scale.
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class SentisTensor:
    dtype: int              # 0=float32, 3=uint8 (observed)
    nbytes: int
    shape: Tuple[int, ...]
    const: bool
    offset: int             # byte offset into the constant segment


@dataclasses.dataclass
class SentisChain:
    inputs: List[int]
    outputs: List[int]
    op: str
    args: List[int]


@dataclasses.dataclass
class SentisProgram:
    version: int
    values: List[Tuple[int, Any]]    # (union_type, payload)
    chains: List[SentisChain]
    operators: List[str]
    ep_inputs: List[int]
    ep_outputs: List[int]
    segment: bytes
    # absolute FILE byte offset of each value's scalar payload (Float/Int
    # unions only; None otherwise) — lets the writer patch quantization
    # scale/zero-point in place without re-serializing the flatbuffer
    value_pos: Optional[List[Optional[int]]] = None
    # absolute file offset where the constant segment begins
    segment_base: int = 0

    def tensor(self, idx: int) -> SentisTensor:
        ty, payload = self.values[idx]
        if ty != 6:
            raise TypeError(f"value {idx} is union type {ty}, not Tensor")
        return payload

    def const_data(self, idx: int) -> np.ndarray:
        t = self.tensor(idx)
        if not t.const:
            raise ValueError(f"value {idx} is not a constant tensor")
        raw = self.segment[t.offset:t.offset + t.nbytes]
        if t.dtype == 3:
            arr = np.frombuffer(raw, np.uint8)
        elif t.dtype == 0:
            arr = np.frombuffer(raw, np.float32)
        elif t.dtype == 1:
            arr = np.frombuffer(raw, np.int32)
        else:
            raise ValueError(f"unhandled dtype {t.dtype}")
        return arr.reshape(t.shape) if t.shape else arr


class _FB:
    """Minimal flatbuffers reader."""

    def __init__(self, data: bytes, base: int):
        self.d = data
        self.base = base

    def u8(self, o): return self.d[o]
    def u16(self, o): return struct.unpack_from("<H", self.d, o)[0]
    def u32(self, o): return struct.unpack_from("<I", self.d, o)[0]
    def i32(self, o): return struct.unpack_from("<i", self.d, o)[0]
    def f32(self, o): return struct.unpack_from("<f", self.d, o)[0]
    def ind(self, o): return o + self.u32(o)

    def fields(self, tpos: int) -> Dict[int, int]:
        vt = tpos - self.i32(tpos)
        n = (self.u16(vt) - 4) // 2
        out = {}
        for f in range(n):
            off = self.u16(vt + 4 + 2 * f)
            if off:
                out[f] = tpos + off
        return out

    def string(self, fpos: int) -> str:
        p = self.ind(fpos)
        n = self.u32(p)
        return self.d[p + 4:p + 4 + n].decode("utf8")

    def vec_i32(self, fpos: int) -> List[int]:
        p = self.ind(fpos)
        n = self.u32(p)
        return [self.i32(p + 4 + 4 * i) for i in range(n)]

    def vec_tables(self, fpos: int) -> List[int]:
        p = self.ind(fpos)
        n = self.u32(p)
        e0 = p + 4
        return [e0 + 4 * i + self.u32(e0 + 4 * i) for i in range(n)]


def parse_sentis(path: str) -> SentisProgram:
    data = open(path, "rb").read()
    fb = _FB(data, 4)
    fb_size = fb.u32(0)
    root = 4 + fb.u32(4)
    rf = fb.fields(root)
    version = fb.u32(rf[0]) if 0 in rf else 0

    # constant segment: everything after the (aligned) flatbuffer region.
    seg_tables = fb.vec_tables(rf[3]) if 3 in rf else []
    seg_size = None
    if seg_tables:
        sff = fb.fields(seg_tables[0])
        # DataSegment {f0: offset(u64), f1: size(u64)} — observed equal; use
        # size from the tail.
        seg_size = struct.unpack_from("<Q", data, sff[max(sff)])[0]
    if seg_size is None or seg_size > len(data):
        seg_size = len(data) - (4 + fb_size)
    segment = data[len(data) - seg_size:]

    ep = fb.ind(rf[1])
    epf = fb.fields(ep)
    operators = [fb.string(fb.fields(t)[0]) for t in fb.vec_tables(epf[7])]

    values: List[Tuple[int, Any]] = []
    value_pos: List[Optional[int]] = []
    for t in fb.vec_tables(epf[1]):
        ff = fb.fields(t)
        ty = fb.u8(ff[0]) if 0 in ff else 0
        payload: Any = None
        pos: Optional[int] = None
        if 1 in ff:
            vt = fb.ind(ff[1])
            vff = fb.fields(vt)
            if ty == 6:
                payload = SentisTensor(
                    dtype=fb.u8(vff[0]) if 0 in vff else 0,
                    nbytes=fb.u32(vff[1]) if 1 in vff else 0,
                    shape=tuple(fb.vec_i32(vff[2])) if 2 in vff else (),
                    const=bool(fb.u32(vff[3])) if 3 in vff else False,
                    offset=fb.u32(vff[4]) if 4 in vff else 0,
                )
            elif ty == 3:
                payload = fb.f32(vff[0]) if 0 in vff else 0.0
                pos = vff.get(0)
            elif ty == 2:
                payload = fb.i32(vff[0]) if 0 in vff else 0
                pos = vff.get(0)
            elif ty == 8:
                payload = fb.vec_i32(vff[0]) if 0 in vff else []
            elif ty == 4:
                payload = fb.string(vff[0]) if 0 in vff else ""
        values.append((ty, payload))
        value_pos.append(pos)

    chains: List[SentisChain] = []
    for t in fb.vec_tables(epf[6]):
        ff = fb.fields(t)
        ins = fb.vec_i32(ff[0]) if 0 in ff else []
        outs = fb.vec_i32(ff[1]) if 1 in ff else []
        op, args = operators[0], []
        if 2 in ff:
            for it in fb.vec_tables(ff[2]):
                itf = fb.fields(it)
                k = fb.ind(itf[1])
                kf = fb.fields(k)
                op_idx = fb.u32(kf[0]) if 0 in kf else 0   # default 0
                args = fb.vec_i32(kf[1]) if 1 in kf else []
                op = operators[op_idx]
        chains.append(SentisChain(ins, outs, op, args))

    return SentisProgram(
        version=version, values=values, chains=chains, operators=operators,
        ep_inputs=fb.vec_i32(epf[2]) if 2 in epf else [],
        ep_outputs=fb.vec_i32(epf[4]) if 4 in epf else [],
        segment=segment, value_pos=value_pos,
        segment_base=len(data) - len(segment),
    )


# ---------------------------------------------------------------------------
# constant extraction
# ---------------------------------------------------------------------------

def dequantized_constants(prog: SentisProgram) -> Dict[int, np.ndarray]:
    """value-id -> float32 array for every DequantizeUint8 output, plus raw
    float constants referenced by weighted ops."""
    out: Dict[int, np.ndarray] = {}
    for ch in prog.chains:
        if ch.op != "DequantizeUint8" or not ch.inputs:
            continue
        q = prog.const_data(ch.inputs[0]).astype(np.float32)
        scale = float(prog.values[ch.args[0]][1])
        zp = float(prog.values[ch.args[1]][1])
        out[ch.outputs[0]] = (q - zp) * scale
    return out


WEIGHTED_OPS = ("Conv", "ConvTranspose")


def conv_sequence(prog: SentisProgram,
                  consts: Optional[Dict[int, np.ndarray]] = None
                  ) -> List[Dict[str, Any]]:
    """Ordered list of weighted ops with their dequantized weights/biases.

    Conv inputs are (x, W[OIHW], B[O]); ConvTranspose (x, W[IOHW], B[O]).
    """
    if consts is None:
        consts = dequantized_constants(prog)

    def fetch(idx: int) -> Optional[np.ndarray]:
        if idx in consts:
            return consts[idx]
        ty, payload = prog.values[idx]
        if ty == 6 and payload.const:
            return prog.const_data(idx).astype(np.float32)
        return None

    seq = []
    for ci, ch in enumerate(prog.chains):
        if ch.op not in WEIGHTED_OPS:
            continue
        w = fetch(ch.inputs[1]) if len(ch.inputs) > 1 else None
        b = fetch(ch.inputs[2]) if len(ch.inputs) > 2 else None
        if w is None:
            continue
        wshape = prog.tensor(ch.inputs[1]).shape
        seq.append({
            "chain": ci, "op": ch.op,
            "w": w.reshape(wshape), "b": b,
            "args": [prog.values[a][1] for a in ch.args if a >= 0],
        })
    return seq


def summarize(prog: SentisProgram) -> str:
    from collections import Counter
    hist = Counter(ch.op for ch in prog.chains)
    lines = [f"sentis program v{prog.version}: {len(prog.chains)} chains, "
             f"{len(prog.values)} values, segment {len(prog.segment)} B",
             f"inputs={prog.ep_inputs} outputs={prog.ep_outputs}",
             "ops: " + ", ".join(f"{k}x{v}" for k, v in hist.most_common())]
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# YOLO11 param mapping
# ---------------------------------------------------------------------------

def load_yolo11_params(path: str, cfg=None):
    """Load the reference .sentis artifact into our YOLO11 param pytree.

    Returns (params, cfg). Weights are the dequantized uint8 values — i.e.
    numerically identical to what the reference runtime executes.
    """
    import jax
    import jax.numpy as jnp

    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.models import yolo11

    if cfg is None:
        cfg = ModelConfig(scale="n")
    prog = parse_sentis(path)
    seq = conv_sequence(prog)
    slots = yolo11.ordered_param_slots(cfg)
    if len(seq) != len(slots):
        raise ValueError(
            f"weighted-op count mismatch: file has {len(seq)}, model "
            f"({cfg.scale}, {cfg.task}) expects {len(slots)}")

    params = yolo11.init_params(jax.random.key(0), cfg)

    def node_at(path):
        node = params
        for k in path[:-1]:
            node = node[k]
        return node, path[-1]

    for (pathk, kind), op in zip(slots, seq):
        w, b = op["w"], op["b"]
        if kind == "dfl":
            # fixed arange(reg_max) conv — our decode computes it analytically
            expect = np.arange(cfg.reg_max, dtype=np.float32)
            got = w.reshape(-1)
            if not np.allclose(got, expect, atol=0.5):
                raise ValueError(f"unexpected DFL conv weights: {got[:8]}...")
            continue
        if kind == "convtranspose":
            # file weight is [I, O, kH, kW] -> ours [kH, kW, I, O]
            node, _ = node_at(pathk + ("up_w",))
            up_w = np.transpose(w, (2, 3, 0, 1))
            assert node["up_w"].shape == up_w.shape, (pathk, node["up_w"].shape, up_w.shape)
            node["up_w"] = jnp.asarray(up_w)
            node["up_b"] = jnp.asarray(b)
            continue
        # conv: OIHW -> HWIO (depthwise convs are O,1,kh,kw -> kh,kw,1,O)
        node, leaf = node_at(pathk)
        tgt = node[leaf]
        hwio = np.transpose(w, (2, 3, 1, 0))
        if tgt["w"].shape != hwio.shape:
            raise ValueError(
                f"shape mismatch at {pathk}: model {tgt['w'].shape} vs "
                f"file {hwio.shape} (op chain {op['chain']})")
        tgt["w"] = jnp.asarray(np.ascontiguousarray(hwio))
        if b is not None:
            tgt["b"] = jnp.asarray(b)
    from xrseg_tpu.io.weights import maybe_seed_o2o
    return maybe_seed_o2o(params, cfg), cfg


# ---------------------------------------------------------------------------
# Writer: weight transplant into the deployed artifact
# ---------------------------------------------------------------------------

def quantize_uint8(w: np.ndarray, method: str = "minmax"
                   ) -> Tuple[np.ndarray, float, int]:
    """Per-tensor affine uint8 quantization matching the artifact's
    DequantizeUint8 semantics (w ~ (q - zp) * scale). The range is forced
    to include 0 so the zero-point is exact and lands in [0, 255].

    method="minmax" (default): scale from the exact value range — max
    error is bounded by half a step (the writer round-trip test pins it).
    method="mse": standard PTQ range calibration — search scales in
    [0.3, 1.0] x the minmax range, keep the min-squared-error fit
    (outlier tails saturate, the bulk gets finer steps). MEASURED
    NEGATIVE on this model family (r4): the deployed + fine-tuned
    YOLO11 conv tensors are BN-folded and outlier-free, so the search
    picks ~the full range on every tensor — identical MSE, identical
    end-to-end preds delta (max|Δ| 250.7 vs 250.3 on a perturbed-weight
    A/B). Kept for weight distributions that DO have tails; minmax
    stays the default for its max-error bound.
    """
    lo = min(float(w.min()), 0.0)
    hi = max(float(w.max()), 0.0)
    if hi == lo:
        return np.zeros(w.shape, np.uint8), 1.0, 0

    def fit(lo_c: float, hi_c: float):
        scale = (hi_c - lo_c) / 255.0
        zp = max(0, min(255, int(round(-lo_c / scale))))
        q = np.clip(np.rint(w / scale) + zp, 0, 255).astype(np.uint8)
        return q, scale, zp

    if method == "minmax":
        return fit(lo, hi)
    if method != "mse":
        raise ValueError(f"unknown quantization method {method!r}")
    best = None
    best_err = np.inf
    for frac in np.linspace(0.3, 1.0, 15):
        q, scale, zp = fit(lo * frac, hi * frac)
        err = float(np.mean(
            ((q.astype(np.float32) - zp) * scale - w) ** 2))
        if err < best_err:
            best, best_err = (q, scale, zp), err
    return best


def write_yolo11_sentis(out_path: str, params, template_path: str,
                        cfg=None, quant_method: str = "minmax") -> None:
    """Write a YOLO11 param pytree back into a `.sentis` artifact by
    transplanting weights into a COPY of `template_path` (normally the
    reference's deployed model, IEModelEditorConverter.cs:100-102).

    The flatbuffer program region stays byte-identical — same graph, same
    tensor shapes/offsets, same baked postprocess — so the output is a
    drop-in replacement for the artifact the Unity runtime already loads.
    Only the constant payloads change: each conv weight/bias is
    re-quantized per-tensor to uint8 and written over the old bytes, and
    its scale / zero-point scalars are patched in place inside the
    flatbuffer (positions recorded by parse_sentis). Float constants are
    overwritten as float32.

    This closes the fine-tune -> redeploy loop without Unity's editor
    converter: .sentis in (load_yolo11_params) -> train -> .sentis out.
    Architecture CHANGES (different scale/task/channels) can't transplant
    — export ONNX (io/onnx_export.py) and re-convert in Unity instead.
    """
    import jax

    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.models import yolo11

    if cfg is None:
        cfg = ModelConfig(scale="n")
    data = bytearray(open(template_path, "rb").read())
    prog = parse_sentis(template_path)
    slots = yolo11.ordered_param_slots(cfg)
    weighted = [ch for ch in prog.chains if ch.op in WEIGHTED_OPS]
    if len(weighted) != len(slots):
        raise ValueError(
            f"template/model mismatch: template has {len(weighted)} "
            f"weighted ops, model ({cfg.scale}, {cfg.task}) expects "
            f"{len(slots)} — architecture changes need the ONNX path")

    # DequantizeUint8 output id -> (u8 tensor id, scale value id, zp id)
    dequant: Dict[int, Tuple[int, int, int]] = {}
    for ch in prog.chains:
        if ch.op == "DequantizeUint8" and ch.inputs and ch.outputs:
            dequant[ch.outputs[0]] = (ch.inputs[0], ch.args[0], ch.args[1])

    params = jax.device_get(params)

    def patch(value_id: int, arr: np.ndarray) -> None:
        """Overwrite constant `value_id` with `arr` (f32), re-quantizing
        when the template stores it as uint8."""
        arr = np.ascontiguousarray(arr, np.float32)
        if value_id in dequant:
            qid, sid, zid = dequant[value_id]
            t = prog.tensor(qid)
            spos, zpos = prog.value_pos[sid], prog.value_pos[zid]
            if spos is None:
                raise ValueError(
                    f"scale position unrecorded for value {value_id}")
            if zpos is None:
                # zero-point stored as the flatbuffer DEFAULT (0): the
                # field has no bytes to patch, so quantize with zp pinned
                # to the template's value. Fine for tensors that stay
                # one-signed (this artifact: one all-positive bias);
                # material mass outside the representable range is an
                # error, not a silent clamp.
                zp = int(prog.values[zid][1])
                lo, hi = float(arr.min()), float(arr.max())
                scale = max(hi / (255 - zp) if zp < 255 else 0.0,
                            lo / (0 - zp) if zp > 0 and lo < 0 else 0.0,
                            1e-12)
                q = np.clip(np.rint(arr / scale) + zp, 0, 255
                            ).astype(np.uint8)
                err = np.abs((q.astype(np.float32) - zp) * scale - arr)
                if err.max() > 3.0 * scale:
                    raise ValueError(
                        f"value {value_id}: new values exceed the "
                        f"template's fixed zero-point ({zp}) range "
                        f"(max clamp error {err.max():.4g} vs scale "
                        f"{scale:.4g}) — use the ONNX path")
            else:
                q, scale, zp = quantize_uint8(arr, quant_method)
                struct.pack_into("<i", data, zpos, zp)
            if q.nbytes != t.nbytes:
                raise ValueError(f"size mismatch at value {value_id}: "
                                 f"{q.nbytes} vs template {t.nbytes}")
            off = prog.segment_base + t.offset
            data[off:off + t.nbytes] = q.tobytes()
            struct.pack_into("<f", data, spos, scale)
            return
        t = prog.tensor(value_id)
        if t.dtype != 0:
            raise ValueError(f"value {value_id}: unexpected dtype {t.dtype}")
        if arr.nbytes != t.nbytes:
            raise ValueError(f"size mismatch at value {value_id}: "
                             f"{arr.nbytes} vs template {t.nbytes}")
        off = prog.segment_base + t.offset
        data[off:off + t.nbytes] = arr.tobytes()

    def node_at(path):
        node = params
        for k in path[:-1]:
            node = node[k]
        return node, path[-1]

    for (pathk, kind), ch in zip(slots, weighted):
        if kind == "dfl":
            continue                 # fixed arange conv: template keeps it
        if kind == "convtranspose":
            node, _ = node_at(pathk + ("up_w",))
            # ours [kH, kW, I, O] -> file [I, O, kH, kW]
            patch(ch.inputs[1], np.transpose(np.asarray(node["up_w"]),
                                             (2, 3, 0, 1)))
            if len(ch.inputs) > 2:
                patch(ch.inputs[2], np.asarray(node["up_b"]))
            continue
        node, leaf = node_at(pathk)
        tgt = node[leaf]
        # ours HWIO -> file OIHW
        patch(ch.inputs[1], np.transpose(np.asarray(tgt["w"]),
                                         (3, 2, 0, 1)))
        if len(ch.inputs) > 2 and "b" in tgt:
            patch(ch.inputs[2], np.asarray(tgt["b"]))

    with open(out_path, "wb") as f:
        f.write(bytes(data))


if __name__ == "__main__":
    import sys
    prog = parse_sentis(sys.argv[1])
    print(summarize(prog))
    seq = conv_sequence(prog)
    print(f"\n{len(seq)} weighted ops:")
    for i, c in enumerate(seq):
        b = "none" if c["b"] is None else c["b"].shape
        print(f"  [{i:3d}] chain {c['chain']:3d} {c['op']:14s} "
              f"w={c['w'].shape} b={b}")
