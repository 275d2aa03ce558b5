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
    for t in fb.vec_tables(epf[1]):
        ff = fb.fields(t)
        ty = fb.u8(ff[0]) if 0 in ff else 0
        payload: Any = None
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
            elif ty == 2:
                payload = fb.i32(vff[0]) if 0 in vff else 0
            elif ty == 8:
                payload = fb.vec_i32(vff[0]) if 0 in vff else []
            elif ty == 4:
                payload = fb.string(vff[0]) if 0 in vff else ""
        values.append((ty, payload))

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
        segment=segment,
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
    return params, cfg


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
