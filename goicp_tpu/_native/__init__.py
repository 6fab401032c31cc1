"""ctypes bindings for the native runtime (``goicp_native.cpp``).

Builds lazily via ``make`` on first import if the shared object is missing;
falls back cleanly (``lib() is None``) so pure-Python/numpy paths keep
working.  Disable with ``GOICP_TPU_NATIVE=0``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libgoicp_native.so")
_lock = threading.Lock()
_lib = None
_tried = False

_f32p = ctypes.POINTER(ctypes.c_float)


def _bind(lib):
    lib.gn_frontier_new.restype = ctypes.c_int64
    lib.gn_frontier_new.argtypes = [ctypes.c_int64]
    lib.gn_frontier_free.argtypes = [ctypes.c_int64]
    lib.gn_frontier_size.restype = ctypes.c_int64
    lib.gn_frontier_size.argtypes = [ctypes.c_int64]
    lib.gn_frontier_push.argtypes = [
        ctypes.c_int64, ctypes.c_int64, _f32p, _f32p, _f32p,
    ]
    lib.gn_frontier_pop_best.restype = ctypes.c_int64
    lib.gn_frontier_pop_best.argtypes = [
        ctypes.c_int64, ctypes.c_int64, _f32p, _f32p, _f32p,
    ]
    lib.gn_frontier_dump.restype = ctypes.c_int64
    lib.gn_frontier_dump.argtypes = [ctypes.c_int64, _f32p, _f32p, _f32p]
    lib.gn_frontier_prune.restype = ctypes.c_int64
    lib.gn_frontier_prune.argtypes = [ctypes.c_int64, ctypes.c_float]
    lib.gn_frontier_min_lb.restype = ctypes.c_float
    lib.gn_frontier_min_lb.argtypes = [ctypes.c_int64]
    lib.gn_select_kth.restype = ctypes.c_float
    lib.gn_select_kth.argtypes = [_f32p, ctypes.c_int64, ctypes.c_int64]
    lib.gn_trimmed_sum.restype = ctypes.c_double
    lib.gn_trimmed_sum.argtypes = [_f32p, ctypes.c_int64, ctypes.c_int64]
    lib.gn_read_txt.restype = ctypes.c_int64
    lib.gn_read_txt.argtypes = [ctypes.c_char_p, _f32p, ctypes.c_int64]
    return lib


def lib():
    """The loaded native library, or None if unavailable/disabled."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GOICP_TPU_NATIVE", "1") == "0":
            return None
        try:
            src = os.path.join(_HERE, "goicp_native.cpp")
            stale = not os.path.exists(_SO) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(_SO)
            )
            if stale:
                subprocess.run(
                    ["make", "-C", _HERE, "-sB"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            _lib = _bind(ctypes.CDLL(_SO))
        except Exception:
            _lib = None
        return _lib


def as_f32p(arr):
    import numpy as np

    a = np.ascontiguousarray(arr, np.float32)
    return a, a.ctypes.data_as(_f32p)
