"""ctypes bindings for the native host post-processing library.

The reference's runtime around the models is C++ (OpenCV post-processing,
tuatara.cpp:119-204); this framework's native equivalent lives in
native/tuatara_postproc.cpp — dependency-free union-find CC labeling,
reference-semantics box extraction and rotating-calipers minAreaRect —
compiled on first use with g++ and loaded via ctypes (no pybind11 in this
environment). It serves as an OpenCV-free host fallback and as an
independent oracle for the TPU kernels in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtuatara_postproc.so")


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    src = os.path.join(_NATIVE_DIR, "tuatara_postproc.cpp")
    if not os.path.isfile(src):
        raise NativeUnavailable(f"native source not found: {src}")
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _SO_PATH, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        raise NativeUnavailable(f"failed to build native library: {msg}") from e


def load() -> ctypes.CDLL:
    """Load (building if necessary) the native library."""
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.isfile(_SO_PATH) or (
        os.path.getmtime(_SO_PATH)
        < os.path.getmtime(os.path.join(_NATIVE_DIR, "tuatara_postproc.cpp"))
    ):
        _build()
    lib = ctypes.CDLL(_SO_PATH)
    lib.tuatara_extract_boxes.restype = ctypes.c_int
    lib.tuatara_extract_boxes.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.tuatara_label_components.restype = ctypes.c_int
    lib.tuatara_label_components.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except NativeUnavailable:
        return False


def extract_boxes(
    textmap: np.ndarray,
    linkmap: np.ndarray,
    text_threshold: float = 0.7,
    link_threshold: float = 0.4,
    low_text: float = 0.4,
    min_area: int = 10,
    niter_mode: str = "reference",
    max_boxes: int = 256,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Native host box extraction.

    Returns (boxes [N, 4] fp32 heatmap-coord AABBs, corners [N, 4, 2]
    rotated min-area rects, num_components)."""
    lib = load()
    t = np.ascontiguousarray(textmap, np.float32)
    l = np.ascontiguousarray(linkmap, np.float32)
    h, w = t.shape
    out = np.zeros((max_boxes, 12), np.float32)
    ncomp = ctypes.c_int(0)
    n = lib.tuatara_extract_boxes(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        l.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w,
        text_threshold, link_threshold, low_text,
        min_area, 0 if niter_mode == "reference" else 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_boxes,
        ctypes.byref(ncomp),
    )
    boxes = out[:n, :4].copy()
    corners = out[:n, 4:].reshape(n, 4, 2).copy()
    return boxes, corners, int(ncomp.value)


def label_components(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """Native 4-connected CC labeling -> (labels [H, W] int32, count)."""
    lib = load()
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    labels = np.zeros((h, w), np.int32)
    n = lib.tuatara_label_components(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return labels, int(n)
