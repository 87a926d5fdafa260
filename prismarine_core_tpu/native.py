"""ctypes bindings for the native C++ runtime components.

The compute path is JAX/XLA/Pallas; the ingest/runtime pieces around it
are native C++ (native/src/*.cc), mirroring the reference's C++ host
layer.  The shared library is built on demand with g++ (no pip installs;
pybind11 is unavailable in this environment, hence the plain C ABI).
Everything degrades gracefully to the pure-Python paths when no
toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "src", "objparse.cc")
_SO = os.path.join(_ROOT, "native", "build", "libprismarine_native.so")


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
           "-o", _SO]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0
    except Exception:
        return False


def get_lib():
    """The native library handle, or None when unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p]
        lib.obj_counts.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.obj_mat_name.restype = ctypes.c_char_p
        lib.obj_mat_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.obj_mtllib.restype = ctypes.c_char_p
        lib.obj_mtllib.argtypes = [ctypes.c_void_p]
        lib.obj_fill.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_float)] * 9 + [
            ctypes.POINTER(ctypes.c_int32)]
        lib.obj_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def parse_obj_native(path: str):
    """Parse OBJ geometry natively.

    Returns dict with v0..v2, n0..n2 f32[N,3], t0..t2 f32[N,2],
    mat i32[N], mat_names list[str], mtllib str — or None if the native
    library is unavailable or parsing fails.
    """
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    h = lib.obj_parse(path.encode())
    if not h:
        return None
    try:
        n_tris = ctypes.c_int64()
        n_mats = ctypes.c_int64()
        lib.obj_counts(h, ctypes.byref(n_tris), ctypes.byref(n_mats))
        n = n_tris.value
        if n == 0:
            return None
        f3 = [np.empty((n, 3), np.float32) for _ in range(6)]
        f2 = [np.empty((n, 2), np.float32) for _ in range(3)]
        mat = np.empty((n,), np.int32)

        def fp(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

        lib.obj_fill(h, fp(f3[0]), fp(f3[1]), fp(f3[2]), fp(f3[3]),
                     fp(f3[4]), fp(f3[5]), fp(f2[0]), fp(f2[1]),
                     fp(f2[2]),
                     mat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        names = [lib.obj_mat_name(h, i).decode("utf-8", "replace")
                 for i in range(n_mats.value)]
        mtllib = lib.obj_mtllib(h).decode("utf-8", "replace")
        return {
            "v0": f3[0], "v1": f3[1], "v2": f3[2],
            "n0": f3[3], "n1": f3[4], "n2": f3[5],
            "t0": f2[0], "t1": f2[1], "t2": f2[2],
            "mat": mat, "mat_names": names, "mtllib": mtllib,
        }
    finally:
        lib.obj_free(h)
