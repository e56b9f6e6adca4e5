"""ctypes bindings for the C++ runtime library (native/vitseg_native.cpp).

Host-side hot ops — skeletonize, connected components + boxes, exact EDT,
LUT remap, PIL-exact nearest resize — as first-party C++ replacing the
reference's scipy/skimage calls. Each function has a pure-Python fallback
(ops/morphology.py etc.); ``available()`` says which path is active.

The library auto-builds on first import when a compiler is present
(``make -C native``); set VITSEG_NATIVE=0 to force the Python fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_LOCK = threading.Lock()

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvitseg_native.so")

_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("VITSEG_NATIVE") == "0":
            return None
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.vn_skeletonize.argtypes = [_u8, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int]
        lib.vn_skeletonize.restype = ctypes.c_int
        lib.vn_label.argtypes = [_u8, _i32, ctypes.c_int, ctypes.c_int]
        lib.vn_label.restype = ctypes.c_int
        lib.vn_bounding_boxes.argtypes = [_i32, ctypes.c_int, _i32,
                                          ctypes.c_int, ctypes.c_int]
        lib.vn_bounding_boxes.restype = None
        lib.vn_detections.argtypes = [_i32, _i32, ctypes.c_int, ctypes.c_int,
                                      _i32, ctypes.c_int]
        lib.vn_detections.restype = ctypes.c_int
        lib.vn_edt.argtypes = [_u8, _f32, ctypes.c_int, ctypes.c_int]
        lib.vn_edt.restype = None
        lib.vn_remap_u8.argtypes = [_u8, _i32, _i32, ctypes.c_long]
        lib.vn_remap_u8.restype = None
        lib.vn_resize_nearest_pil_u8.argtypes = [
            _u8, _u8, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.vn_resize_nearest_pil_u8.restype = None
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def skeletonize(mask: np.ndarray, max_iters: int = 10000) -> np.ndarray:
    """Zhang-Suen thinning; falls back to the numpy implementation."""
    lib = _load()
    img = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    if lib is None:
        from visiontransformer_tpu.ops.morphology import skeletonize_np
        return skeletonize_np(img, max_iters)
    h, w = img.shape
    lib.vn_skeletonize(img, h, w, max_iters)
    return img.astype(bool)


def label(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """4-connected labeling (scipy.ndimage.label default semantics)."""
    lib = _load()
    img = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    if lib is None:
        from visiontransformer_tpu.ops.morphology import connected_components_np
        return connected_components_np(img)
    h, w = img.shape
    labels = np.empty((h, w), np.int32)
    n = lib.vn_label(img, labels, h, w)
    return labels, n


def bounding_boxes(mask: np.ndarray) -> List[Tuple[int, int, int, int]]:
    """Per-region (y_min, x_min, y_max, x_max) boxes."""
    lib = _load()
    if lib is None:
        from visiontransformer_tpu.ops.morphology import bounding_boxes_np
        return bounding_boxes_np(mask)
    labels, n = label(mask)
    if n == 0:
        return []
    boxes = np.empty((n, 4), np.int32)
    h, w = labels.shape
    lib.vn_bounding_boxes(np.ascontiguousarray(labels), n, boxes, h, w)
    return [tuple(int(v) for v in row) for row in boxes]


def detections(class_mask: np.ndarray) -> List[Tuple[int, int, int, int, int]]:
    """(class_id, y_min, x_min, y_max, x_max) per 4-connected same-class
    region of an integer class mask (0 = background) — one image traversal
    for all classes, vs the per-class label loop (serving hot path).
    Falls back to the per-class pure-Python path when the lib is absent."""
    lib = _load()
    mask = np.ascontiguousarray(np.asarray(class_mask).astype(np.int32))
    if lib is None:
        from visiontransformer_tpu.ops.morphology import bounding_boxes_np
        out = []
        for cls in np.unique(mask):
            if cls == 0:
                continue
            for box in bounding_boxes_np(mask == cls):
                out.append((int(cls),) + tuple(int(v) for v in box))
        return sorted(out)
    h, w = mask.shape
    scratch = np.empty((h, w), np.int32)
    capacity = 4096
    while True:
        boxes = np.empty((capacity, 5), np.int32)
        n = lib.vn_detections(mask, scratch, h, w, boxes, capacity)
        if n <= capacity:
            # Deterministic, path-independent ordering (the C pass emits
            # components in scan order).
            return sorted(tuple(int(v) for v in row) for row in boxes[:n])
        capacity = n  # exact count known after first pass; one retry max


def edt(mask: np.ndarray) -> np.ndarray:
    """Exact EDT: distance of nonzero pixels to the nearest zero pixel."""
    lib = _load()
    img = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    if lib is None:
        from scipy.ndimage import distance_transform_edt
        return distance_transform_edt(img).astype(np.float32)
    h, w = img.shape
    out = np.empty((h, w), np.float32)
    lib.vn_edt(img, out, h, w)
    return out


def remap_u8(values: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """values: uint8 array; lut: 256-entry int32 -> class indices."""
    lib = _load()
    values = np.ascontiguousarray(values, np.uint8)
    lut = np.ascontiguousarray(lut, np.int32)
    if lib is None:
        return lut[values]
    out = np.empty(values.shape, np.int32)
    lib.vn_remap_u8(values.reshape(-1), lut, out.reshape(-1), values.size)
    return out


def resize_nearest_pil_u8(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """PIL-NEAREST-exact resize of a 2D uint8 image to (h, w)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    oh, ow = size
    if lib is None:
        from PIL import Image
        return np.asarray(Image.fromarray(img).resize((ow, oh), Image.NEAREST))
    ih, iw = img.shape
    out = np.empty((oh, ow), np.uint8)
    lib.vn_resize_nearest_pil_u8(img, out, ih, iw, oh, ow)
    return out
