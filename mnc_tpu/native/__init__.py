"""ctypes bindings for the native C++ helpers (auto-built on first import).

``available()`` reports whether the shared library could be built/loaded;
every wrapped function has a numpy fallback at its call site, so the package
works (slower) without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_DIR, "mnc_native.cpp")
_BUILD = osp.join(_DIR, "build")
_SO = osp.join(_BUILD, "libmnc_native.so")  # under build/ so pkgutil doesn't
# mistake the ctypes library for a Python extension module

_lib = None
_tried = False


def _build() -> bool:
    try:
        os.makedirs(_BUILD, exist_ok=True)
        if (not osp.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=300,
            )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    cf = ctypes.c_float

    lib.bbox_overlaps.argtypes = [f32p, c, f32p, c, f32p]
    lib.cpu_nms.argtypes = [f32p, c, cf, u8p]
    lib.cpu_nms.restype = c
    lib.mask_iou_matrix.argtypes = [u8p, c, u8p, c, c, f32p]
    lib.rle_encode.argtypes = [u8p, c, c, i32p]
    lib.rle_encode.restype = c
    lib.rle_decode.argtypes = [i32p, c, c, c, u8p]
    lib.mask_voting_cpu.argtypes = [f32p, c, f32p, c, f32p, f32p, c, cf, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    if lib is None:
        from mnc_tpu.ops.bbox import bbox_overlaps as jx

        return np.asarray(jx(boxes, query))
    out = np.empty((len(boxes), len(query)), np.float32)
    lib.bbox_overlaps(boxes, len(boxes), query, len(query), out)
    return out


def cpu_nms(sorted_boxes: np.ndarray, thresh: float) -> np.ndarray:
    """Keep mask over score-sorted boxes (reference cpu_nms semantics)."""
    lib = _load()
    sorted_boxes = np.ascontiguousarray(sorted_boxes, np.float32)
    n = len(sorted_boxes)
    if lib is None:
        keep = np.ones(n, bool)
        for i in range(n):
            if not keep[i]:
                continue
            ov = bbox_overlaps(sorted_boxes[i:i + 1], sorted_boxes[i + 1:])[0]
            keep[i + 1:] &= ~(ov > thresh)
        return keep
    keep = np.empty(n, np.uint8)
    lib.cpu_nms(sorted_boxes, n, float(thresh), keep)
    return keep.astype(bool)


def mask_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, H, W) x (M, H, W) binary masks → (N, M) IoU."""
    a = np.ascontiguousarray(a.reshape(len(a), -1) > 0.5).astype(np.uint8)
    b = np.ascontiguousarray(b.reshape(len(b), -1) > 0.5).astype(np.uint8)
    lib = _load()
    if lib is None:
        inter = (a[:, None, :] & b[None, :, :]).sum(-1).astype(np.float32)
        union = (a[:, None, :] | b[None, :, :]).sum(-1).astype(np.float32)
        return inter / np.maximum(union, 1.0)
    out = np.empty((len(a), len(b)), np.float32)
    lib.mask_iou_matrix(a, len(a), b, len(b), a.shape[1], out)
    return out


def rle_encode(mask: np.ndarray) -> dict:
    """Binary (H, W) mask → {"size": (H, W), "counts": int32 array}."""
    h, w = mask.shape
    m = np.ascontiguousarray(mask > 0.5).astype(np.uint8)
    lib = _load()
    if lib is None:
        flat = m.T.reshape(-1)  # column-major like pycocotools
        change = np.flatnonzero(np.diff(flat)) + 1
        runs = np.diff(np.concatenate([[0], change, [flat.size]]))
        if flat[0] == 1:
            runs = np.concatenate([[0], runs])
        return {"size": (h, w), "counts": runs.astype(np.int32)}
    counts = np.empty(h * w + 1, np.int32)
    n = lib.rle_encode(m, h, w, counts)
    return {"size": (h, w), "counts": counts[:n].copy()}


def rle_decode(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    counts = np.ascontiguousarray(rle["counts"], np.int32)
    lib = _load()
    if lib is None:
        flat = np.zeros(h * w, np.uint8)
        pos, v = 0, 0
        for run in counts:
            flat[pos:pos + run] = v
            pos += run
            v = 1 - v
        return flat.reshape(w, h).T
    out = np.zeros((h, w), np.uint8)
    lib.rle_decode(counts, len(counts), h, w, out)
    return out


def mask_voting_cpu(kept_boxes, cand_boxes, scores, masks, iou_thresh=0.5):
    """Host mask voting (oracle for the on-device version)."""
    lib = _load()
    kept_boxes = np.ascontiguousarray(kept_boxes, np.float32)
    cand_boxes = np.ascontiguousarray(cand_boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    masks = np.ascontiguousarray(masks, np.float32)
    ms = masks.shape[-1]
    if lib is None:
        from mnc_tpu.ops.mask_voting import mask_voting as jx

        return np.asarray(jx(kept_boxes, cand_boxes, scores, masks,
                             scores > 0, iou_thresh))
    out = np.empty((len(kept_boxes), ms, ms), np.float32)
    lib.mask_voting_cpu(kept_boxes, len(kept_boxes), cand_boxes, len(cand_boxes),
                        scores, masks, ms, float(iou_thresh), out)
    return out
