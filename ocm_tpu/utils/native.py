"""ctypes loader for the native C++ data-layer core (native/ccl.cpp).

The shared library is compiled on first use with g++ -O3 into a per-user
cache directory and loaded with ctypes (no pybind11 dependency, per the
environment).  Every entry point has a pure-Python/scipy fallback, so the
compute path never hard-depends on a toolchain:

- ``mean_image(cube)``          — wavelength mean, threaded C++
- ``label(mask)``               — 8-connected components, two-pass
                                  union-find; output identical to
                                  ``scipy.ndimage.label(mask, ones((3,3)))``
- ``gather_object(cube, labels, k)`` — dense (n_pixels, L) spectra block +
                                  (y, x) coords for one object
- ``extract_objects_native(cube, thr)`` — drop-in twin of
  ocm_tpu.utils.io.extract_objects built on the native core.
- ``quantize_rows_int8(x[, center])`` — fused center+quantize+rownorm
  serving prep, bit-identical to the NumPy path (measured 3-7.7x on one
  CPU; docs/BENCHMARKS.md "Native host prep").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SOURCE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "ccl.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    path = os.path.join(base, "ocm_tpu")
    os.makedirs(path, exist_ok=True)
    return path


def _build() -> Optional[str]:
    if not os.path.exists(_SOURCE):
        return None
    so_path = os.path.join(_cache_dir(), "ocm_ccl.so")
    if (os.path.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(_SOURCE)):
        return so_path
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
           _SOURCE, "-o", so_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return so_path


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so_path = _build()
        if so_path is None:
            return None
        lib = ctypes.CDLL(so_path)
        i64, i32p, f32p, u8p = (ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_uint8))
        lib.ocm_mean_image.argtypes = [f32p, i64, i64, i64, f32p]
        lib.ocm_mean_image.restype = None
        lib.ocm_label.argtypes = [u8p, i64, i64, i32p]
        lib.ocm_label.restype = ctypes.c_int32
        lib.ocm_object_sizes.argtypes = [i32p, i64, ctypes.c_int32, i32p]
        lib.ocm_object_sizes.restype = None
        lib.ocm_gather_object.argtypes = [f32p, i32p, i64, i64, i64,
                                          ctypes.c_int32, f32p, i32p]
        lib.ocm_gather_object.restype = None
        i8p = ctypes.POINTER(ctypes.c_int8)
        lib.ocm_quantize_rows_int8.argtypes = [f32p, f32p, i64, i64,
                                               i8p, f32p, f32p]
        lib.ocm_quantize_rows_int8.restype = None
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def mean_image(cube: np.ndarray) -> np.ndarray:
    """Mean over the wavelength axis of a (H, W, L) cube."""
    lib = _load()
    cube = np.ascontiguousarray(cube, dtype=np.float32)
    if lib is None:
        return cube.mean(axis=2)
    h, w, l = cube.shape
    out = np.empty((h, w), dtype=np.float32)
    lib.ocm_mean_image(_ptr(cube, ctypes.c_float), h, w, l,
                       _ptr(out, ctypes.c_float))
    return out


def label(mask: np.ndarray):
    """8-connected component labeling; returns (labels int32, n_objects).
    Identical output to scipy.ndimage.label(mask, np.ones((3, 3)))."""
    lib = _load()
    mask = np.ascontiguousarray(mask)
    if lib is None:
        from scipy import ndimage
        labels, n = ndimage.label(mask, structure=np.ones((3, 3), int))
        return labels.astype(np.int32), int(n)
    m8 = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m8.shape
    labels = np.empty((h, w), dtype=np.int32)
    n = lib.ocm_label(_ptr(m8, ctypes.c_uint8), h, w,
                      _ptr(labels, ctypes.c_int32))
    return labels, int(n)


def object_sizes(labels: np.ndarray, n_objects: int) -> np.ndarray:
    lib = _load()
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    if lib is None:
        return np.bincount(labels.ravel(), minlength=n_objects + 1)[1:]
    sizes = np.empty(n_objects, dtype=np.int32)
    lib.ocm_object_sizes(_ptr(labels, ctypes.c_int32), labels.size,
                         n_objects, _ptr(sizes, ctypes.c_int32))
    return sizes


def gather_object(cube: np.ndarray, labels: np.ndarray, obj: int,
                  n_pixels: Optional[int] = None):
    """(spectra (n, L), coords (n, 2)) of one labeled object."""
    lib = _load()
    cube = np.ascontiguousarray(cube, dtype=np.float32)
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    if lib is None:
        mask = labels == obj
        return cube[mask], np.argwhere(mask).astype(np.int32)
    if n_pixels is None:
        n_pixels = int(np.count_nonzero(labels == obj))
    h, w, l = cube.shape
    out = np.empty((n_pixels, l), dtype=np.float32)
    coords = np.empty((n_pixels, 2), dtype=np.int32)
    lib.ocm_gather_object(_ptr(cube, ctypes.c_float),
                          _ptr(labels, ctypes.c_int32), h, w, l, obj,
                          _ptr(out, ctypes.c_float),
                          _ptr(coords, ctypes.c_int32))
    return out, coords


def extract_objects_native(cube, background_threshold: float,
                           min_pixels: int = 1):
    """Native twin of ocm_tpu.utils.io.extract_objects (nut_data.py:65-160):
    same output structure, C++ mean/label/gather underneath."""
    cube = np.ascontiguousarray(cube, dtype=np.float32)
    foreground = mean_image(cube) >= background_threshold
    labels, n_objects = label(foreground)
    sizes = object_sizes(labels, n_objects)
    objects = []
    for obj_idx in range(1, n_objects + 1):
        n_px = int(sizes[obj_idx - 1])
        if n_px < min_pixels:
            continue
        spectra, coords = gather_object(cube, labels, obj_idx, n_px)
        objects.append({
            "spectral_data": spectra,
            "mean_spectrum": spectra.mean(axis=0),
            "centroid": tuple(coords.mean(axis=0).tolist()),
            "n_pixels": n_px,
            "obj_idx": obj_idx,
        })
    return objects


def quantize_rows_int8(a: np.ndarray, center: Optional[np.ndarray] = None):
    """Threaded C++ per-row int8 quantization (optionally fused with
    centering) — the serving layer's hot host-prep.  Returns
    ``(q int8, scale f32, sumsq f32)`` BIT-IDENTICAL to the NumPy path in
    ocm_tpu.ops.linalg.quantize_rows_int8 (same f32 scale formula,
    half-to-even rounding, int32 sum-of-squares cast then left-assoc
    scaling; parity asserted in tests/test_native.py), or ``None`` when
    the toolchain/library is unavailable so callers fall back."""
    lib = _load()
    if lib is None or a.ndim != 2:
        return None
    a = np.ascontiguousarray(a, dtype=np.float32)
    n, l = a.shape
    if center is not None:
        center = np.ascontiguousarray(center, dtype=np.float32)
        if center.shape != (l,):
            raise ValueError(f"center must be shape ({l},), got "
                             f"{center.shape}")
    q = np.empty((n, l), dtype=np.int8)
    scale = np.empty(n, dtype=np.float32)
    sumsq = np.empty(n, dtype=np.float32)
    lib.ocm_quantize_rows_int8(
        _ptr(a, ctypes.c_float),
        _ptr(center, ctypes.c_float) if center is not None else None,
        n, l, _ptr(q, ctypes.c_int8), _ptr(scale, ctypes.c_float),
        _ptr(sumsq, ctypes.c_float))
    return q, scale, sumsq
