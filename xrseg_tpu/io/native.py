"""ctypes bindings for the C++ native runtime (native/).

Builds on demand with `make` if the shared library is missing (g++ toolchain
is a framework requirement; there is no pybind11 in this stack by design —
plain C ABI + ctypes keeps the boundary explicit and dependency-free).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libxrseg_native.so")

_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def build_native(force: bool = False) -> str:
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def load_library(auto_build: bool = True) -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not auto_build:
            raise NativeUnavailable(f"{_LIB_PATH} not built")
        try:
            build_native()
        except Exception as e:          # toolchain missing: degrade loudly
            raise NativeUnavailable(f"could not build native lib: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)

    lib.xrseg_depth_fusion.restype = ctypes.c_int
    lib.xrseg_depth_fusion.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]

    lib.xrseg_ring_create.restype = ctypes.c_void_p
    lib.xrseg_ring_create.argtypes = [ctypes.c_int32, ctypes.c_int64]
    lib.xrseg_ring_destroy.argtypes = [ctypes.c_void_p]
    for fn in ("xrseg_ring_push", "xrseg_ring_pop", "xrseg_ring_pop_latest"):
        getattr(lib, fn).restype = ctypes.c_int32
        getattr(lib, fn).argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_int64]
    lib.xrseg_ring_size.restype = ctypes.c_int64
    lib.xrseg_ring_size.argtypes = [ctypes.c_void_p]
    lib.xrseg_ring_dropped.restype = ctypes.c_int64
    lib.xrseg_ring_dropped.argtypes = [ctypes.c_void_p]

    lib.xrseg_hsv_jitter.restype = ctypes.c_int
    lib.xrseg_hsv_jitter.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int,
    ]

    lib.xrseg_resize2tap_u8.restype = ctypes.c_int
    lib.xrseg_resize2tap_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]

    _lib = lib
    return lib


def resize2tap_native(img: np.ndarray, hw, n_threads: int = 0) -> np.ndarray:
    """C++ 2-tap bilinear resize on uint8 [H,W,3] — the same half-pixel-
    center sampling as the device preprocess (ops/preprocess._tap_indices)
    and cv2.INTER_LINEAR, so host resizes match the deployed program."""
    lib = load_library()
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3] uint8, got {img.shape}")
    dh, dw = int(hw[0]), int(hw[1])
    out = np.empty((dh, dw, 3), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.xrseg_resize2tap_u8(
        img.ctypes.data_as(u8p), img.shape[0], img.shape[1],
        out.ctypes.data_as(u8p), dh, dw, int(n_threads))
    if rc != 0:
        raise RuntimeError(f"xrseg_resize2tap_u8 failed: rc={rc}")
    return out


def hsv_jitter_native(img: np.ndarray, gh: float, gs: float, gv: float,
                      n_threads: int = 0) -> np.ndarray:
    """Single-pass C++ HSV gain transform on uint8 RGB [H,W,3] — the
    training loader's hottest host op (native/src/augment.cpp; ~25x the
    numpy round-trip on this host). Same fp32 math as
    train/data._hsv_jitter_numpy (the parity oracle)."""
    lib = load_library()
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3] uint8, got {img.shape}")
    out = np.empty_like(img)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.xrseg_hsv_jitter(
        img.ctypes.data_as(u8p), out.ctypes.data_as(u8p),
        img.shape[0] * img.shape[1],
        float(gh), float(gs), float(gv), int(n_threads))
    if rc != 0:
        raise RuntimeError(f"xrseg_hsv_jitter failed: rc={rc}")
    return out


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def depth_fusion_native(depth_fp16: np.ndarray, mask: np.ndarray,
                        box_xywh_640, cam_pos, cam_quat, focal, principal,
                        sensor_res, confidence_threshold=0.5, min_depth=0.1,
                        max_depth=3.0, sampling_step=4, num_threads=0):
    """C++ DepthExtractionJob equivalent. Returns (positions, depths, valid)."""
    lib = load_library()
    depth_fp16 = np.ascontiguousarray(depth_fp16, np.uint16)
    mask = np.ascontiguousarray(mask, np.float32)
    mh, mw = mask.shape
    dh, dw = depth_fp16.shape
    n = (mh // sampling_step) * (mw // sampling_step)
    positions = np.zeros((n, 3), np.float32)
    depths = np.zeros(n, np.float32)
    valid = np.zeros(n, np.int32)
    cam_pos = np.ascontiguousarray(cam_pos, np.float32)
    cam_quat = np.ascontiguousarray(cam_quat, np.float32)
    focal = np.ascontiguousarray(focal, np.float32)
    principal = np.ascontiguousarray(principal, np.float32)
    sensor_res = np.ascontiguousarray(sensor_res, np.float32)
    bx, by, bw, bh = (float(v) for v in box_xywh_640)
    lib.xrseg_depth_fusion(
        depth_fp16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), dw, dh,
        _fptr(mask), mw, mh, sampling_step, confidence_threshold, min_depth,
        max_depth, bx, by, bw, bh, _fptr(cam_pos), _fptr(cam_quat),
        _fptr(focal), _fptr(principal), _fptr(sensor_res), _fptr(positions),
        _fptr(depths), valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads)
    return positions, depths, valid.astype(bool)


class FrameRing:
    """SPSC frame ring (native/src/frame_ring.cpp) for streaming ingestion."""

    def __init__(self, capacity: int, slot_bytes: int):
        self._lib = load_library()
        self._slot_bytes = slot_bytes
        self._ptr = self._lib.xrseg_ring_create(capacity, slot_bytes)
        if not self._ptr:
            raise NativeUnavailable("ring allocation failed")

    def push(self, frame: np.ndarray) -> None:
        buf = np.ascontiguousarray(frame).view(np.uint8).reshape(-1)
        rc = self._lib.xrseg_ring_push(
            self._ptr, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.nbytes)
        if rc != 0:
            raise ValueError("frame larger than ring slot")

    def _pop_impl(self, fn, shape, dtype):
        out = np.empty(int(np.prod(shape)) * np.dtype(dtype).itemsize,
                       np.uint8)
        rc = fn(self._ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out.nbytes)
        if rc == 1:
            return out.view(dtype).reshape(shape)
        if rc == 0:
            return None
        raise ValueError("pop size exceeds slot size")

    def pop(self, shape, dtype=np.uint8):
        return self._pop_impl(self._lib.xrseg_ring_pop, shape, dtype)

    def pop_latest(self, shape, dtype=np.uint8):
        return self._pop_impl(self._lib.xrseg_ring_pop_latest, shape, dtype)

    def __len__(self) -> int:
        return int(self._lib.xrseg_ring_size(self._ptr))

    @property
    def dropped(self) -> int:
        return int(self._lib.xrseg_ring_dropped(self._ptr))

    def close(self) -> None:
        if self._ptr:
            self._lib.xrseg_ring_destroy(self._ptr)
            self._ptr = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
