"""Native host runtime: C++ undistortion/remap, built on demand, via ctypes.

Python surface for cuahn_vio/runtime/undistort.cpp — the TPU-native
replacement of the reference's OpenCV host path (CamBase.h:165-186,
VioManager.cpp:183-188): raw fisheye/radtan frames -> clean 224x320
virtual-camera uint8 frames fed to the device.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "undistort.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libcuahn_runtime.so")

OUT_W, OUT_H = 320, 224  # CamBase.h:170: fixed virtual-camera size


def _build() -> str:
    if (
        not os.path.exists(_LIB)
        or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        subprocess.check_call(
            [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC", "-pthread", _SRC, "-o", _LIB,
            ]
        )
    return _LIB


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(_build())
    f64p = ctypes.POINTER(ctypes.c_double)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.build_undist_map_radtan.argtypes = [
        f64p, f64p, ctypes.c_int, ctypes.c_int, f32p, f32p,
    ]
    lib.build_undist_map_fisheye.argtypes = lib.build_undist_map_radtan.argtypes
    lib.remap_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ctypes.c_int, ctypes.c_int, u8p,
    ]
    lib.remap_u8_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
    ]
    return lib


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def build_undist_map(
    intrinsics, distortion, fisheye: bool, out_w: int = OUT_W, out_h: int = OUT_H
):
    """(map_x, map_y) float32 (out_h, out_w): raw-image sample coordinates
    for every virtual-camera pixel (initialize_undist_map{,_fisheye})."""
    k = np.ascontiguousarray(intrinsics, np.float64)
    d = np.ascontiguousarray(distortion, np.float64)
    assert k.size == 4 and d.size == 4
    mx = np.empty((out_h, out_w), np.float32)
    my = np.empty((out_h, out_w), np.float32)
    fn = (
        _lib().build_undist_map_fisheye if fisheye else _lib().build_undist_map_radtan
    )
    f64p = ctypes.POINTER(ctypes.c_double)
    fn(
        k.ctypes.data_as(f64p), d.ctypes.data_as(f64p),
        out_w, out_h, _f32p(mx), _f32p(my),
    )
    return mx, my


def undistort_frames(
    frames: np.ndarray, map_x: np.ndarray, map_y: np.ndarray, n_threads: int = 0
) -> np.ndarray:
    """Batched bilinear remap (undistort_and_resize_img for N frames).

    Args:
        frames: (N, H, W) uint8 raw images.
    Returns:
        (N, out_h, out_w) uint8 undistorted virtual-camera frames.
    """
    frames = np.ascontiguousarray(frames, np.uint8)
    n, src_h, src_w = frames.shape
    out_h, out_w = map_x.shape
    out = np.empty((n, out_h, out_w), np.uint8)
    _lib().remap_u8_batch(
        _u8p(frames), n, src_w, src_h,
        _f32p(np.ascontiguousarray(map_x)), _f32p(np.ascontiguousarray(map_y)),
        out_w, out_h, _u8p(out), n_threads,
    )
    return out
