"""denseCRF: mean-field CRF refinement (native C++ via ctypes).

Parity target: the reference's PRODUCTION CRF path — the pydensecrf wrapper
wsl/modeling/seg_heads/crf.py:6-83, which is what the WSJDS segmentation
branch actually calls (seg_heads.py:13,191-199). This binding drives our own
C++ implementation (sos_wsod_tpu/native/dense_crf.cpp): the same Krähenbühl
mean-field updates with spatial-Gaussian + bilateral Potts kernels, the
high-dimensional filtering done with a splat/blur/slice bilateral grid
(pydensecrf / the vendored csrc/crf/densecrf use a permutohedral lattice —
same algorithm family, different lattice, so marginals agree closely but
not bitwise; see tests/test_reference_goldens.py).

The production flow reproduced by :func:`dense_crf`:
 - unary energies = -log(clip(p, 1e-5, 1)) — pydensecrf's
   ``unary_from_softmax`` (seg_heads/crf.py:64-65);
 - a FLOAT scale factor ``size_std / max(H, W)`` divides the spatial stds
   of both kernels (seg_heads/crf.py:50,67-73);
 - the raw inference marginals are returned, no re-clamping
   (seg_heads/crf.py:79-83).

NOT the parity target: the in-repo C++ op (wsl/layers/crf.py +
csrc/crf/crf_cpu.cpp). seg_heads.py:12 comments it out in favour of
pydensecrf, and it is broken anyway: RunOnDevice shadows its H/W/m_nlabels
members with locals (crf_cpu.cpp:355-357 — set_unary_energy reads
uninitialized fields, UB) and feeds raw probabilities where energies are
expected (unary_process, crf_cpu.cpp:74-95).

This is a host-side op (the reference's is too — CPU-only): call it outside
jit, or through ``jax.pure_callback`` with fixed shapes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "dense_crf.cpp")
_CACHE_DIR = os.environ.get(
    "SOS_WSOD_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "sos_wsod_tpu"))


def _build_library() -> str:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, "libsos_dense_crf.so")
    if (os.path.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
        return so_path
    tmp = so_path + ".tmp"
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
        check=True, capture_output=True)
    os.replace(tmp, so_path)
    return so_path


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_library())
            lib.sos_dense_crf.restype = ctypes.c_int
            lib.sos_dense_crf.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.sos_grid_filter.restype = None
            lib.sos_grid_filter.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ]
            _LIB = lib
    return _LIB


def grid_filter(features: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Gaussian filtering via the bilateral grid (sigma = 1 in the feature
    space — divide features by the desired stds). Exposed for tests."""
    features = np.ascontiguousarray(features, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    n, d = features.shape
    c = values.shape[1]
    out = np.empty((n, c), np.float32)
    _lib().sos_grid_filter(
        features.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, d, c)
    return out


def dense_crf(
    probs: np.ndarray,           # (C, H, W) class probabilities
    image: np.ndarray,           # (3, H', W') float (caffe BGR - mean) or uint8
    *,
    max_iter: int = 10,
    size_std: float = 500.0,
    pos_w: float = 3.0,
    pos_x_std: float = 3.0,
    pos_y_std: float = 3.0,
    bi_w: float = 10.0,
    bi_x_std: float = 80.0,
    bi_y_std: float = 80.0,
    bi_r_std: float = 13.0,
    bi_g_std: float = 13.0,
    bi_b_std: float = 13.0,
    pixel_means=(102.9801, 115.9465, 122.7717),
) -> np.ndarray:
    """Returns refined (C, H, W) probabilities.

    Defaults match seg_heads/crf.py:7-20; the float scale factor
    ``size_std / max(H, W)`` divides the spatial stds internally
    (seg_heads/crf.py:50,67-73)."""
    c, h, w = probs.shape
    if image.dtype == np.uint8:
        img = np.ascontiguousarray(np.moveaxis(image, 0, -1))
    else:
        im = np.moveaxis(np.asarray(image, np.float32), 0, -1)
        im = im + np.asarray(pixel_means, np.float32)
        img = np.clip(im, 0, 255).astype(np.uint8)
    if img.shape[:2] != (h, w):
        # nearest-neighbour via index maps (reference uses bilinear; the
        # guide image only gates edges, so exact filtering matters more)
        ys = np.clip((np.arange(h) * img.shape[0] / h), 0, img.shape[0] - 1).astype(int)
        xs = np.clip((np.arange(w) * img.shape[1] / w), 0, img.shape[1] - 1).astype(int)
        img = np.ascontiguousarray(img[ys][:, xs])

    # pydensecrf unary_from_softmax (seg_heads/crf.py:64-65)
    unary = -np.log(np.clip(np.asarray(probs, np.float32), 1e-5, 1.0))
    unary = np.ascontiguousarray(np.moveaxis(unary, 0, -1).reshape(-1, c))
    scale = 1.0 * size_std / max(h, w)
    out = np.empty((h * w, c), np.float32)
    ret = _lib().sos_dense_crf(
        unary.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c, int(max_iter),
        pos_w, pos_x_std / scale, pos_y_std / scale,
        bi_w, bi_x_std / scale, bi_y_std / scale,
        bi_r_std, bi_g_std, bi_b_std,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if ret != 0:
        raise RuntimeError(f"sos_dense_crf failed with code {ret}")
    return np.moveaxis(out.reshape(h, w, c), -1, 0)
