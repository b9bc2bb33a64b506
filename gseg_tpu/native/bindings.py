"""ctypes bindings for the native C++ helpers (libgsegnative.so).

The reference's CPU baseline and comparetool are C++ (SURVEY.md §2.1 N8,
§2.3 B1); these bindings expose the rebuilt C++ cores to Python. The library
auto-builds on first use via make (g++ available; pybind11 is not, hence the
plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libgsegnative.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.felz_segment.restype = ctypes.c_int
    lib.felz_segment.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.compare_asa_ue.restype = ctypes.c_int
    lib.compare_asa_ue.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def segment_kruskal_native(image: np.ndarray, cfg) -> np.ndarray:
    """C++ Felzenszwalb baseline; same semantics as segment_kruskal_np."""
    lib = _load()
    img = np.ascontiguousarray(image, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    labels = np.empty(h * w, dtype=np.int32)
    rc = lib.felz_segment(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, ctypes.c_float(cfg.sigma), ctypes.c_float(cfg.k),
        cfg.min_size, labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"felz_segment failed with code {rc}")
    return labels.reshape(h, w)


def asa_ue_native(seg: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """C++ ASA/UE comparetool; same result as metrics.compare.asa_ue."""
    lib = _load()
    s = np.ascontiguousarray(seg, dtype=np.int32).ravel()
    g = np.ascontiguousarray(gt, dtype=np.int32).ravel()
    if s.size != g.size:
        raise ValueError("seg and gt must have the same size")
    out = np.zeros(2, dtype=np.float64)
    rc = lib.compare_asa_ue(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        s.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"compare_asa_ue failed with code {rc}")
    return float(out[0]), float(out[1])
