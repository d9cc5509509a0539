"""ctypes bindings for the native host-preprocessing library.

Replaces the reference's native layer (the pointnet_lib CUDA extension served
the *device* ops, which are Pallas/XLA here; the host data path's fused
decode/backproject/filter lives in C++, see pointcloud.cc). Builds on first
use with g++; every entry point has a numpy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhotrack_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["g++", "-O3", "-march=native", "-fPIC", "-shared",
                            "-std=c++17", "-o", _SO,
                            os.path.join(_DIR, "pointcloud.cc")],
                           check=True, capture_output=True)
        except Exception as e:  # no toolchain: numpy fallbacks take over
            print(f"hotrack native build unavailable ({e}); using numpy")
            return None
    lib = ctypes.CDLL(_SO)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.decode_ho3d_depth.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_float, f32p]
    lib.backproject_filter.argtypes = [
        f32p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint8,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, f32p, ctypes.c_float, ctypes.c_int,
        f32p, ctypes.c_int]
    lib.backproject_filter.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_ho3d_depth(img: np.ndarray, scale: float) -> np.ndarray:
    """(H, W, 3) uint8 BGR -> (H, W) float32 depth."""
    lib = _load()
    h, w = img.shape[:2]
    if lib is None:
        return ((img[:, :, 2].astype(np.float32)
                 + img[:, :, 1].astype(np.float32) * 256.0) * scale)
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((h, w), np.float32)
    lib.decode_ho3d_depth(img, h, w, np.float32(scale), out)
    return out


def backproject_filter(depth: np.ndarray, mask: np.ndarray | None, label: int,
                       fx: float, fy: float, cx: float, cy: float,
                       sign_y: float = 1.0, sign_z: float = 1.0,
                       center=None, radius: float = -1.0,
                       stride: int = 1, max_out: int | None = None) -> np.ndarray:
    """Fused depth -> filtered camera-frame cloud. Returns (K, 3) float32."""
    h, w = depth.shape
    lib = _load()
    if lib is None:
        return _backproject_numpy(depth, mask, label, fx, fy, cx, cy,
                                  sign_y, sign_z, center, radius, stride)
    depth = np.ascontiguousarray(depth, np.float32)
    mask_ptr = 0
    if mask is not None:
        mask = np.ascontiguousarray(mask, np.uint8)
        mask_ptr = mask.ctypes.data
    c = np.zeros(3, np.float32) if center is None else np.asarray(center, np.float32)
    cap = max_out if max_out is not None else (h * w) // (stride * stride) + 1
    out = np.empty((cap, 3), np.float32)
    n = lib.backproject_filter(depth, mask_ptr, h, w, np.uint8(label),
                               np.float32(fx), np.float32(fy), np.float32(cx),
                               np.float32(cy), np.float32(sign_y),
                               np.float32(sign_z), np.ascontiguousarray(c),
                               np.float32(radius), int(stride), out, cap)
    return out[:n].copy()


def _backproject_numpy(depth, mask, label, fx, fy, cx, cy, sign_y, sign_z,
                       center, radius, stride):
    d = depth[::stride, ::stride]
    sel = d > 1e-6
    if mask is not None:
        sel &= (mask[::stride, ::stride] == label)
    rows, cols = np.nonzero(sel)
    z = d[rows, cols].astype(np.float32)
    x = (cols * stride - cx) * z / fx
    y = (rows * stride - cy) * z / fy * sign_y
    pts = np.stack([x, y, z * sign_z], axis=1)
    if radius > 0 and center is not None:
        pts = pts[np.linalg.norm(pts - np.asarray(center)[None], axis=-1) < radius]
    return pts
