"""ctypes loader for the native shapes rasterizer (with on-demand build)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "shapes_raster.cpp")
_SO = os.path.join(_DIR, "libshapes_raster.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        # retry without openmp/march (portability)
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except Exception:
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.rasterize_shapes_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # specs
            ctypes.POINTER(ctypes.c_int32),  # bg colors
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),  # mean pixel
            ctypes.POINTER(ctypes.c_float),  # images
            ctypes.POINTER(ctypes.c_float),  # masks
            ctypes.POINTER(ctypes.c_float),  # boxes
            ctypes.POINTER(ctypes.c_int32),  # classes
        ]
        lib.rasterize_shapes_batch.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def rasterize_shapes_batch(
    specs: np.ndarray,  # [B, I, 7] int32: class, cy, cx, size, r, g, b
    bg_colors: np.ndarray,  # [B, 3] int32
    height: int,
    width: int,
    mean_pixel,
):
    """Native batch rasterization. Returns (images [B,H,W,3] f32,
    masks [B,I,H,W] f32, boxes [B,I,4] f32 normalized, classes [B,I] i32).

    Raises RuntimeError when the native library is unavailable — callers
    should fall back to the Python path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native shapes rasterizer unavailable")

    specs = np.ascontiguousarray(specs, np.int32)
    bg = np.ascontiguousarray(bg_colors, np.int32)
    b, max_inst = specs.shape[0], specs.shape[1]
    mean = np.ascontiguousarray(mean_pixel, np.float32)

    images = np.zeros((b, height, width, 3), np.float32)
    masks = np.zeros((b, max_inst, height, width), np.float32)
    boxes = np.zeros((b, max_inst, 4), np.float32)
    classes = np.zeros((b, max_inst), np.int32)

    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    lib.rasterize_shapes_batch(
        p(specs, ctypes.c_int32), p(bg, ctypes.c_int32),
        b, height, width, max_inst,
        p(mean, ctypes.c_float), p(images, ctypes.c_float),
        p(masks, ctypes.c_float), p(boxes, ctypes.c_float),
        p(classes, ctypes.c_int32),
    )
    return images, masks, boxes, classes
