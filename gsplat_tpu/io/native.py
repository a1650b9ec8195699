"""ctypes bindings for the native C++ data-path (native/gsplat_native.cpp).

Fast gaussian-PLY parsing, importance ordering, .splat packing, and labeled
binary-PLY row writing — multithreaded C++ replacing the reference's hot JS
loops (gaussians_selection.js:464-585). Falls back transparently to the
NumPy codec when the shared library is missing; ``build()`` compiles it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
# Source checkouts build the .so under native/ via make (never committed to
# git — a binary built elsewhere is unreviewable and may SIGILL, ADVICE r2);
# installed wheels carry it inside the package (setup.py build hook).
_PKG_LIB = os.path.join(os.path.dirname(__file__), "libgsplat_native.so")
_SRC_LIB = os.path.join(_NATIVE_DIR, "libgsplat_native.so")
_IS_SRC_CHECKOUT = os.path.exists(os.path.join(_NATIVE_DIR,
                                               "gsplat_native.cpp"))
_LIB_PATH = _SRC_LIB if _IS_SRC_CHECKOUT else _PKG_LIB
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the native library (idempotent; ``make`` rebuilds when the
    source is newer than the .so). Returns the .so path."""
    if _IS_SRC_CHECKOUT and (force or not os.path.exists(_LIB_PATH)
                             or os.path.getmtime(os.path.join(
                                 _NATIVE_DIR, "gsplat_native.cpp"))
                             > os.path.getmtime(_LIB_PATH)):
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=True)
    return _LIB_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        build()
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.CalledProcessError):
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.gsplat_ply_probe.restype = ctypes.c_int
    lib.gsplat_ply_probe.argtypes = [
        u8p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_int64), i32p, i32p,
        i32p]
    lib.gsplat_ply_extract.restype = ctypes.c_int
    lib.gsplat_ply_extract.argtypes = [
        u8p, ctypes.c_size_t, f32p, f32p, f32p, f32p, f32p, ctypes.c_int32,
        i32p]
    lib.gsplat_importance_order.restype = None
    lib.gsplat_importance_order.argtypes = [f32p, f32p, ctypes.c_int64, i32p]
    lib.gsplat_pack_splat.restype = None
    lib.gsplat_pack_splat.argtypes = [f32p, f32p, f32p, f32p, f32p, i32p,
                                      ctypes.c_int64, u8p]
    lib.gsplat_write_gaussian_rows.restype = ctypes.c_int64
    lib.gsplat_write_gaussian_rows.argtypes = [
        f32p, f32p, f32p, f32p, f32p, ctypes.c_int32, i32p, ctypes.c_int64,
        ctypes.c_int32, u8p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: Optional[np.ndarray]):
    if a is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def scene_from_ply_native(path_or_bytes):
    """Parse a binary-LE gaussian PLY with the C++ codec. Returns a
    GaussianScene, or None if the native path can't handle it (ascii,
    lists, missing lib) — callers fall back to the NumPy codec."""
    lib = _load()
    if lib is None:
        return None
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            raw = f.read()
    buf = np.frombuffer(raw, dtype=np.uint8)
    data = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    n = ctypes.c_int64()
    bands = ctypes.c_int32()
    has_label = ctypes.c_int32()
    has_normals = ctypes.c_int32()
    rc = lib.gsplat_ply_probe(data, len(raw), ctypes.byref(n),
                              ctypes.byref(bands), ctypes.byref(has_label),
                              ctypes.byref(has_normals))
    if rc != 0:
        return None
    nv, k = n.value, bands.value
    means = np.zeros((nv, 3), np.float32)
    log_scales = np.zeros((nv, 3), np.float32)
    quats = np.zeros((nv, 4), np.float32)
    opac = np.zeros((nv,), np.float32)
    sh = np.zeros((nv, k, 3), np.float32)
    labels = np.zeros((nv,), np.int32) if has_label.value else None
    rc = lib.gsplat_ply_extract(
        data, len(raw), _fp(means), _fp(log_scales), _fp(quats), _fp(opac),
        _fp(sh), k, _ip(labels))
    if rc != 0:
        return None
    from gsplat_tpu.scene import GaussianScene
    return GaussianScene.create(means, log_scales, quats, opac, sh, labels)


def importance_order_native(log_scales: np.ndarray, opacities: np.ndarray
                            ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n = log_scales.shape[0]
    order = np.zeros((n,), np.int32)
    lib.gsplat_importance_order(
        _fp(np.ascontiguousarray(log_scales, np.float32)),
        _fp(np.ascontiguousarray(opacities, np.float32)), n, _ip(order))
    return order


def pack_splat_native(scene, order: Optional[np.ndarray] = None
                      ) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    s = scene.to_numpy()
    n = s.num_gaussians
    if order is None:
        order = importance_order_native(s.log_scales, s.opacities)
    out = np.zeros((n * 32,), np.uint8)
    lib.gsplat_pack_splat(
        _fp(np.ascontiguousarray(s.means, np.float32)),
        _fp(np.ascontiguousarray(s.log_scales, np.float32)),
        _fp(np.ascontiguousarray(s.quats, np.float32)),
        _fp(np.ascontiguousarray(s.opacities, np.float32)),
        _fp(np.ascontiguousarray(s.sh[:, 0, :], np.float32)),
        _ip(np.ascontiguousarray(order, np.int32)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()
