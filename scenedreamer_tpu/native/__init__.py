"""Native (C++/OpenMP) host kernels with build-on-first-use loading.

The reference ships CUDA/C++ extensions built by setuptools
(`voxlib/setup.py`, `gridencoder/setup.py` + JIT fallback
`gridencoder/backend.py:31-38`); the TPU compute path uses Pallas/XLA
instead, and this package holds the HOST-side native kernels (terrain
PCG noise). Bindings are ctypes against a C ABI (no pybind11 in the
image); the .so is compiled with g++ on first use and cached next to
the sources. Set SCENEDREAMER_NO_NATIVE=1 to force the numpy fallbacks.
"""
import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(src, out):
    # no -ffast-math: outputs must match the numpy reference bit-near
    cmd = ['g++', '-O3', '-march=native', '-ffp-contract=off',
           '-fopenmp',
           '-shared', '-fPIC', src, '-o', out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        # retry without -march=native (portable build)
        try:
            cmd.remove('-march=native')
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
            return True
        except Exception:
            return False


def load_simplex():
    """Return the ctypes lib with fbm3_grid/fbm3_points, or None."""
    global _LIB, _TRIED
    if os.environ.get('SCENEDREAMER_NO_NATIVE'):
        return None
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_DIR, 'simplex.cpp')
        so = os.path.join(_DIR, '_simplex.so')
        if not os.path.exists(so) or \
                os.path.getmtime(so) < os.path.getmtime(src):
            if not _build(src, so):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.fbm3_grid.argtypes = [
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, i64p, f64p]
        lib.fbm3_grid.restype = None
        lib.fbm3_points.argtypes = [
            ctypes.c_int64, f64p, f64p, ctypes.c_double, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, i64p, f64p]
        lib.fbm3_points.restype = None
        _LIB = lib
        return _LIB
