"""Native host-runtime tier: C++ compositor built on demand, ctypes-bound.

The TPU owns projection + rasterization; what remains on host for the video
path is pure byte work (copy cached base pixels, recolor painted pixels,
place into the mosaic).  That loop is fused in compositor.cpp and built here
with g++ the first time it is needed (no pybind11 in this environment —
ctypes on raw pointers).  Everything degrades gracefully: if the toolchain
or build is unavailable, callers fall back to the NumPy implementations in
cama_tpu/ops/raster.py and cama_tpu/pipeline.py.

Set CAMA_TPU_NO_NATIVE=1 to force the NumPy paths (used by the equivalence
tests, and an escape hatch for exotic hosts).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "compositor.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _build_and_load():
    """Compile compositor.cpp into a content-addressed .so and dlopen it.

    The .so lands next to the source (the stamp in the filename makes stale
    binaries impossible); if the package dir is read-only, a per-user cache
    dir is used instead.
    """
    with open(_SRC, "rb") as f:
        src = f.read()
    stamp = hashlib.sha256(src).hexdigest()[:16]
    candidates = [
        os.path.join(_DIR, f"_compositor_{stamp}.so"),
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "cama_tpu", f"_compositor_{stamp}.so"),
    ]
    for so_path in candidates:
        if os.path.exists(so_path):
            try:
                return ctypes.CDLL(so_path)
            except OSError:
                # corrupt/foreign-arch cached .so (e.g. network home dir):
                # drop it and fall through to a rebuild or the NumPy fallback
                try:
                    os.remove(so_path)
                except OSError:
                    pass
    for so_path in candidates:
        try:
            os.makedirs(os.path.dirname(so_path), exist_ok=True)
            tmp = so_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
                 "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so_path)  # atomic: concurrent builders race safely
            return ctypes.CDLL(so_path)
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    with _lock:
        if _tried:
            return _lib
        if os.environ.get("CAMA_TPU_NO_NATIVE"):
            _lib, _tried = None, True
            return None
        try:
            lib = _build_and_load()
        except Exception:  # any loader surprise degrades to the NumPy path
            lib = None
        if lib is not None:
            i64, i32, u8p, i32p = (ctypes.c_int64, ctypes.c_int32,
                                   ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.POINTER(ctypes.c_int32))
            lib.cama_composite.argtypes = [
                u8p, i64, u8p, i64, u8p, i32, i32, u8p, i64]
            lib.cama_composite_packed2.argtypes = [
                u8p, i64, u8p, i64, u8p, i32, i32, u8p, i64]
            lib.cama_paint_sparse.argtypes = [
                i32p, i64, u8p, i32, i32, u8p, i64]
            for fn in (lib.cama_composite, lib.cama_composite_packed2,
                       lib.cama_paint_sparse):
                fn.restype = None
        _lib, _tried = lib, True
        return _lib


def available():
    """True when the native compositor is built and loadable."""
    return _load() is not None


def _u8p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _check_hw3(arr, h, w, name):
    """Validate a [H, W, 3] uint8 image whose rows may be a strided view
    (mosaic slot); pixels within a row must be packed."""
    if arr.dtype != np.uint8 or arr.shape != (h, w, 3):
        raise ValueError(f"{name}: expected uint8 [{h},{w},3], got "
                         f"{arr.dtype} {arr.shape}")
    if arr.strides[1] != 3 or arr.strides[2] != 1:
        raise ValueError(f"{name}: rows must be packed (strides {arr.strides})")
    return arr.strides[0]


def _pad_table(color_table):
    """[n<=8, 3] uint8 BGR -> contiguous [8, 3] (unused rows black) so the
    kernel's (cls & 7) index is always in range."""
    t = np.ascontiguousarray(color_table, dtype=np.uint8)
    if t.ndim != 2 or t.shape[1] != 3 or t.shape[0] > 8:
        raise ValueError(f"color_table must be [<=8, 3], got {t.shape}")
    out = np.zeros((8, 3), np.uint8)
    out[: t.shape[0]] = t
    return out


def composite(base, raster, color_table, out):
    """Fused base-copy + overlay paint: out = base, then
    out[raster != 0] = color_table[raster - 1].

    base: [H, W, 3] uint8 (row-strided views ok) or None (paint onto `out`
          in place); raster: [H, W] uint8 class raster (0 = unpainted, else
          class_id + 1); out: [H, W, 3] uint8, may be a mosaic slot view.
    Returns out.  Byte-identical to the NumPy path in
    ClipPipeline.composite_frame (tests/test_native.py).
    """
    lib = _load()
    h, w = raster.shape
    out_stride = _check_hw3(out, h, w, "out")
    if raster.dtype != np.uint8 or raster.strides[1] != 1:
        # device fetches can arrive in XLA's column-major layout
        raster = np.ascontiguousarray(raster, dtype=np.uint8)
    table = _pad_table(color_table)
    if base is None:
        base_ptr, base_stride = None, 0
    else:
        base_stride = _check_hw3(base, h, w, "base")
        base_ptr = _u8p(base)
    lib.cama_composite(base_ptr, base_stride, _u8p(raster),
                       raster.strides[0], _u8p(table), h, w, _u8p(out),
                       out_stride)
    return out


def composite_packed2(base, packed2, color_table, out, width):
    """composite(), but straight from the 2-bit packed device raster
    ([H, ceil(W/4)] uint8 — ops/raster.py pack_cls_2bit): the host never
    materializes the unpacked [H, W] raster."""
    lib = _load()
    h = packed2.shape[0]
    out_stride = _check_hw3(out, h, width, "out")
    if packed2.dtype != np.uint8 or packed2.strides[1] != 1:
        # device fetches can arrive in XLA's column-major layout
        packed2 = np.ascontiguousarray(packed2, dtype=np.uint8)
    if packed2.shape[1] * 4 < width:
        raise ValueError(f"packed2 width {packed2.shape[1]}*4 < {width}")
    table = _pad_table(color_table)
    if base is None:
        base_ptr, base_stride = None, 0
    else:
        base_stride = _check_hw3(base, h, width, "base")
        base_ptr = _u8p(base)
    lib.cama_composite_packed2(base_ptr, base_stride, _u8p(packed2),
                               packed2.strides[0], _u8p(table), h, width,
                               _u8p(out), out_stride)
    return out


def paint_sparse(vals, count, color_table, width, out):
    """Order-exact cv2.circle(radius=2) paint of compacted points (the
    sparse link format, ops/raster.py compact_points) onto `out`, which
    already holds base pixels and may be a mosaic slot view.  Matches
    paint_sparse_host byte-for-byte (tests/test_native.py)."""
    lib = _load()
    n = int(count)
    if n <= 0:
        return out
    v = np.ascontiguousarray(vals[:n], dtype=np.int32)
    h = out.shape[0]
    out_stride = _check_hw3(out, h, out.shape[1], "out")
    table = _pad_table(color_table)
    lib.cama_paint_sparse(v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                          n, _u8p(table), h, width, _u8p(out), out_stride)
    return out
