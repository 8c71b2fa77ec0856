"""Native host-side components (C++ via ctypes).

Builds lazily into a cached shared object next to the source; falls back
gracefully (callers check `get_lib() is None`).
"""

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cocoeval.cpp")
_SO = os.path.join(_DIR, "_cocoeval.so")
_lib = None
_tried = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO) or
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.match_class.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint8)]
        lib.match_class_multi_thr.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_match_class(det_boxes, gt_boxes, iou_thr):
    """det_boxes (D,4) sorted by score desc, gt_boxes (G,4) -> tp (D,) bool,
    or None if the native lib is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    det = np.ascontiguousarray(det_boxes, np.float32)
    gt = np.ascontiguousarray(gt_boxes, np.float32)
    tp = np.zeros(len(det), np.uint8)
    lib.match_class(
        det.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(det),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(gt),
        ctypes.c_float(float(iou_thr)),
        tp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return tp.astype(bool)
