"""ctypes binding for the native C inference library (native/jda_native.c).

A CPU fallback / embedding surface with the reference C API
(/root/reference/c/jda.h).  Built on demand with the repo Makefile; API and
numeric behaviour are verified against both the reference library and the
TPU detector in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "jda_native.c")


class _JdaResult(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int),
        ("landmark_n", ctypes.c_int),
        ("bboxes", ctypes.POINTER(ctypes.c_int)),
        ("shapes", ctypes.POINTER(ctypes.c_float)),
        ("scores", ctypes.POINTER(ctypes.c_float)),
    ]


_lib = None


def build() -> str:
    so = os.path.join(_NATIVE_DIR, "libjda_native.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    return so


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.jdaCascadorCreateDouble.restype = ctypes.c_void_p
        lib.jdaCascadorCreateDouble.argtypes = [ctypes.c_char_p]
        lib.jdaCascadorCreateFloat.restype = ctypes.c_void_p
        lib.jdaCascadorCreateFloat.argtypes = [ctypes.c_char_p]
        lib.jdaCascadorSerializeTo.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.jdaCascadorRelease.argtypes = [ctypes.c_void_p]
        lib.jdaDetect.restype = _JdaResult
        lib.jdaDetect.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
        ]
        lib.jdaResultRelease.argtypes = [_JdaResult]
        _lib = lib
    return _lib


class NativeDetector:
    """CPU detector over the native shared library."""

    def __init__(self, model_path: str, dtype: str = "double"):
        lib = _load()
        fn = (
            lib.jdaCascadorCreateDouble
            if dtype == "double"
            else lib.jdaCascadorCreateFloat
        )
        self._c = fn(model_path.encode())
        if not self._c:
            raise IOError(f"failed to load model {model_path}")
        self._lib = lib

    def detect(
        self,
        gray: np.ndarray,
        scale: float = 1.25,
        step: float = 0.1,
        min_size: int = 24,
        max_size: int = -1,
        th: float = -0.5,
    ):
        assert gray.dtype == np.uint8 and gray.ndim == 2
        gray = np.ascontiguousarray(gray)
        h, w = gray.shape
        res = self._lib.jdaDetect(
            self._c,
            gray.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            w,
            h,
            scale,
            step,
            min_size,
            max_size,
            th,
        )
        n = res.n
        ld = 2 * res.landmark_n
        bboxes = (
            np.ctypeslib.as_array(res.bboxes, (n, 3)).copy()
            if n
            else np.zeros((0, 3), np.int32)
        )
        shapes = (
            np.ctypeslib.as_array(res.shapes, (n, ld)).copy()
            if n
            else np.zeros((0, ld), np.float32)
        )
        scores = (
            np.ctypeslib.as_array(res.scores, (n,)).copy()
            if n
            else np.zeros((0,), np.float32)
        )
        self._lib.jdaResultRelease(res)
        return bboxes, shapes, scores

    def serialize_float(self, path: str) -> None:
        self._lib.jdaCascadorSerializeTo(self._c, path.encode())

    def __del__(self):
        try:
            if getattr(self, "_c", None):
                self._lib.jdaCascadorRelease(self._c)
                self._c = None
        except Exception:
            pass
