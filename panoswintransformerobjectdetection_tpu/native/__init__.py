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
        lib.match_image.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8)]
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


def native_match_image(iou_thrs, ious, gt_ignore, iscrowd):
    """COCOeval-exact matcher (crowd-aware, per threshold) for one
    (image, category).  ious (D, G) row-major, gt columns sorted
    non-ignored-first.  Returns (dtm (T, D) int64 gt index or -1,
    dt_ig (T, D) bool), or None if the native lib is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    thrs = np.ascontiguousarray(iou_thrs, np.float64)
    iou = np.ascontiguousarray(ious, np.float64)
    D, G = iou.shape
    T = len(thrs)
    gt_ig = np.ascontiguousarray(gt_ignore, np.uint8)
    crowd = np.ascontiguousarray(iscrowd, np.uint8)
    dtm = np.empty((T, D), np.int64)
    dt_ig = np.empty((T, D), np.uint8)
    lib.match_image(
        thrs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), T,
        iou.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), D, G,
        gt_ig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dtm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dt_ig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return dtm, dt_ig.astype(bool)
