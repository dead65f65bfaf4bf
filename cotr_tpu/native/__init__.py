"""ctypes bindings for the C++ data-path library (native/cotr_native.cpp).

Builds lazily with g++ on first use; every entry point has a pure-Python
fallback so the framework works without a toolchain. Use
``cotr_tpu.native.available()`` to check which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcotr_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    _src = os.path.join(_NATIVE_DIR, "cotr_native.cpp")
    stale = (os.path.exists(_SO_PATH) and os.path.exists(_src)
             and os.path.getmtime(_SO_PATH) < os.path.getmtime(_src))
    if not os.path.exists(_SO_PATH) or stale:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-B"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_SO_PATH):
                return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    try:
        _bind(lib, i64, f32p, f64p, i64p)
    except AttributeError:
        # stale .so surviving a failed rebuild lacks newer symbols; the
        # pure-Python fallbacks take over
        return None
    _lib = lib
    return _lib


def _bind(lib, i64, f32p, f64p, i64p):
    lib.synth_corrs.restype = i64
    lib.synth_corrs.argtypes = [f32p, i64, i64, f64p, f64p, f64p, f32p,
                                i64, i64, f32p, i64]
    lib.parse_images_txt.restype = i64
    lib.parse_images_txt.argtypes = [ctypes.c_char_p, i64, i64p, i64p, f64p,
                                     ctypes.c_char_p, i64]
    lib.count_valid_depth.restype = i64
    lib.count_valid_depth.argtypes = [f32p, i64, i64]
    lib.form_squads.restype = i64
    lib.form_squads.argtypes = [f64p, f64p, f64p, f64p, f64p, f64p,
                                np.ctypeslib.ndpointer(
                                    np.uint8, flags="C_CONTIGUOUS"),
                                i64, ctypes.c_double, ctypes.c_double,
                                i64p, i64, i64, i64p, i64p]


def available() -> bool:
    return _load() is not None


def synth_corrs(from_depth: np.ndarray, inv_k_from: np.ndarray,
                c2w_from: np.ndarray, p_to: np.ndarray,
                to_depth: np.ndarray,
                max_out: Optional[int] = None) -> Optional[np.ndarray]:
    """Native correspondence synthesis; returns (N, 4) [x_f, y_f, x_t, y_t]
    or None when the library is unavailable (callers fall back to
    cotr_tpu.data.dataset.compute_corrs)."""
    lib = _load()
    if lib is None:
        return None
    from_depth = np.ascontiguousarray(from_depth, np.float32)
    to_depth = np.ascontiguousarray(to_depth, np.float32)
    h1, w1 = from_depth.shape
    h2, w2 = to_depth.shape
    if max_out is None:
        max_out = int(lib.count_valid_depth(from_depth, h1, w1))
    out = np.empty((max(max_out, 1), 4), np.float32)
    n = lib.synth_corrs(
        from_depth, h1, w1,
        np.ascontiguousarray(inv_k_from, np.float64),
        np.ascontiguousarray(c2w_from, np.float64),
        np.ascontiguousarray(p_to, np.float64),
        to_depth, h2, w2, out, max_out)
    return out[:n].copy()


def parse_images_txt(path: str, max_images: int = 100_000,
                     name_len: int = 512
                     ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray,
                                         list]]:
    """Native COLMAP images.txt parse -> (image_ids, camera_ids, qtvec,
    names) or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    image_ids = np.empty(max_images, np.int64)
    camera_ids = np.empty(max_images, np.int64)
    qtvec = np.empty((max_images, 7), np.float64)
    names_buf = ctypes.create_string_buffer(max_images * name_len)
    n = lib.parse_images_txt(path.encode(), max_images, image_ids, camera_ids,
                             qtvec, names_buf, name_len)
    if n < 0:
        return None
    names = [names_buf.raw[i * name_len:(i + 1) * name_len]
             .split(b"\0")[0].decode() for i in range(n)]
    return image_ids[:n].copy(), camera_ids[:n].copy(), qtvec[:n].copy(), names


def form_squads(loc_from: np.ndarray, loc_to: np.ndarray,
                cf_x: np.ndarray, cf_y: np.ndarray,
                ct_x: np.ndarray, ct_y: np.ndarray,
                active: np.ndarray, half_f: float, half_t: float,
                order: np.ndarray, max_load: int
                ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Grid-bucketed greedy squad formation (native twin of
    cotr_tpu.inference.grouped.form_squads's scan loop; exact same result
    for the same ``order``). Returns (squad_of, pilots) or None when the
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = len(loc_from)
    squad_of = np.empty(t, np.int64)
    pilots = np.empty(max(t, 1), np.int64)
    g = lib.form_squads(
        np.ascontiguousarray(loc_from, np.float64),
        np.ascontiguousarray(loc_to, np.float64),
        np.ascontiguousarray(cf_x, np.float64),
        np.ascontiguousarray(cf_y, np.float64),
        np.ascontiguousarray(ct_x, np.float64),
        np.ascontiguousarray(ct_y, np.float64),
        np.ascontiguousarray(active, np.uint8), t,
        float(half_f), float(half_t),
        np.ascontiguousarray(order, np.int64), len(order), int(max_load),
        squad_of, pilots)
    return squad_of, pilots[:g].copy()
