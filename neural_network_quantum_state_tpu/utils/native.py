"""ctypes loader for the native host library (native/nqs_host.cpp).

Builds libnqs_host.so with g++ on first use (cached next to the source);
every consumer has a pure-Python fallback, so a missing toolchain degrades
gracefully. See native/nqs_host.cpp for what lives natively and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnqs_host.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "nqs_host.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    lib.nqs_parse_complex_text.restype = ctypes.c_long
    lib.nqs_parse_complex_text.argtypes = [ctypes.c_char_p, dp, dp, ctypes.c_long]
    lib.nqs_format_complex_text.restype = ctypes.c_long
    lib.nqs_format_complex_text.argtypes = [dp, dp, ctypes.c_long, ctypes.c_int, ctypes.c_char_p, ctypes.c_long]
    lib.nqs_metrics_open.restype = ctypes.c_void_p
    lib.nqs_metrics_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.nqs_metrics_write.restype = ctypes.c_int
    lib.nqs_metrics_write.argtypes = [ctypes.c_void_p, dp]
    lib.nqs_metrics_close.restype = None
    lib.nqs_metrics_close.argtypes = [ctypes.c_void_p]
    lib.nqs_metrics_read.restype = ctypes.c_long
    lib.nqs_metrics_read.argtypes = [ctypes.c_char_p, dp, ctypes.c_long, ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return _lib


# ---------------------------------------------------------------------------
def parse_complex_text(text: str, expected: Optional[int] = None) -> Optional[np.ndarray]:
    """Native parse of '(re,im)' tokens; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    cap = expected if expected is not None else max(1, text.count("("))
    re_buf = np.empty(cap, np.float64)
    im_buf = np.empty(cap, np.float64)
    n = lib.nqs_parse_complex_text(
        text.encode(),
        re_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        im_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cap,
    )
    if n < 0:
        return None
    return re_buf[:n] + 1j * im_buf[:n]


def format_complex_text(z: np.ndarray, precision: int = 15) -> Optional[str]:
    lib = load()
    if lib is None:
        return None
    z = np.ascontiguousarray(z, np.complex128).reshape(-1)
    re = np.ascontiguousarray(z.real)
    im = np.ascontiguousarray(z.imag)
    cap = len(z) * (2 * (precision + 10) + 4) + 16
    out = ctypes.create_string_buffer(cap)
    n = lib.nqs_format_complex_text(
        re.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(z),
        precision,
        out,
        cap,
    )
    if n < 0:
        return None
    return out.value.decode()


class BinaryMetricsRecorder:
    """Fixed-width f64 record stream (native fwrite path, fallback: numpy)."""

    def __init__(self, path: str, fields: list[str]):
        self.path = path
        self.fields = fields
        lib = load()
        self._lib = lib
        self._handle = None
        self._py_fh = None
        if lib is not None:
            self._handle = lib.nqs_metrics_open(path.encode(), len(fields))
        if self._handle is None:
            self._py_fh = open(path, "ab")
            if self._py_fh.tell() == 0:
                np.asarray([0x4E515331, len(fields)], np.uint32).tofile(self._py_fh)

    def write(self, *values: float) -> None:
        arr = np.asarray(values, np.float64)
        assert arr.size == len(self.fields)
        if self._handle is not None:
            self._lib.nqs_metrics_write(self._handle, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        else:
            arr.tofile(self._py_fh)
            self._py_fh.flush()

    def close(self) -> None:
        if self._handle is not None:
            self._lib.nqs_metrics_close(self._handle)
            self._handle = None
        if self._py_fh is not None:
            self._py_fh.close()
            self._py_fh = None

    @staticmethod
    def read(path: str) -> np.ndarray:
        """(n_records, n_fields) array."""
        raw = np.fromfile(path, np.uint8)
        magic, nf = np.frombuffer(raw[:8].tobytes(), np.uint32)
        assert magic == 0x4E515331, "bad metrics file"
        data = np.frombuffer(raw[8:].tobytes(), np.float64)
        return data.reshape(-1, nf)
