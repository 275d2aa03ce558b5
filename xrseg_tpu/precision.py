"""Matmul-precision control: the exact-parity escape hatch.

XLA's default TPU lowering executes float32 matmuls/convs as bfloat16
passes on the MXU. For YOLO11n-seg with the reference's real deployed
weights this costs ~3/109 detections, each within 0.008 of the 0.301
score gate (ACCURACY.md). The reference's contract is its deployed-weight
outputs (Assets/Scripts/InferenceEngine/Editor/IEModelEditorConverter.cs:50-58),
so exactness must be a knob, not a fate:

    ModelConfig(matmul_precision="highest")   # 3-pass bf16 ~= fp32 MXU

Values map to jax.default_matmul_precision: "default" (fastest, bf16
passes), "high" (2-pass), "highest" (3-pass / fp32-equivalent). The scope
is applied at trace time inside every jitted pipeline body, so it covers
convs, attention einsums, the DFL decode and the mask-synthesis matmul.
Measured cost on v5e: see README (perf notes) / ACCURACY.md.
"""
from __future__ import annotations

from contextlib import nullcontext

_VALID = ("default", "high", "highest", "bfloat16", "tensorfloat32",
          "float32")


def precision_scope(name: str | None):
    """Context manager setting jax.default_matmul_precision for ops traced
    inside it. name=None/"default" is a no-op (XLA's fast default)."""
    if name is None or name == "default":
        return nullcontext()
    if name not in _VALID:
        raise ValueError(f"matmul_precision {name!r}; expected one of "
                         f"{_VALID}")
    import jax
    return jax.default_matmul_precision(name)
