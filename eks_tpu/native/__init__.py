"""Native (C++) runtime components with pure-Python fallbacks.

Currently: a fast DLC-CSV reader (fast_csv.cpp) bound via ctypes. The shared
library is built on demand with g++ and cached next to the source; every
consumer must tolerate the loader being unavailable (no compiler, build
failure) and fall back to pandas — the numeric results are identical, only
the wall-clock differs.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["load_dlc_csv_fast", "native_available", "write_dlc_csv_fast"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fast_csv.cpp")
_LIB = os.path.join(_DIR, "_fast_csv.so")
_WSRC = os.path.join(_DIR, "fast_csv_write.cpp")
_WLIB = os.path.join(_DIR, "_fast_csv_write.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False
_wlib: ctypes.CDLL | None = None
_wtried = False


def _load_or_build(src: str, lib_path: str, bind) -> ctypes.CDLL | None:
    """Compile ``src`` to ``lib_path`` if stale, load it, apply the ctypes
    signature binder. None when no compiler / build or load fails — every
    consumer falls back to the pandas path."""
    try:
        stale = (not os.path.exists(lib_path)) or (
            os.path.getmtime(lib_path) < os.path.getmtime(src)
        )
        if stale:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", lib_path],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(lib_path)
        bind(lib)
        return lib
    except Exception as e:  # no compiler / sandboxed build env
        logger.debug(f"native {os.path.basename(src)} unavailable: {e}")
        return None


def _bind_reader(lib) -> None:
    lib.dlc_csv_open.restype = ctypes.c_void_p
    lib.dlc_csv_open.argtypes = [ctypes.c_char_p]
    lib.dlc_csv_rows.restype = ctypes.c_int64
    lib.dlc_csv_rows.argtypes = [ctypes.c_void_p]
    lib.dlc_csv_cols.restype = ctypes.c_int64
    lib.dlc_csv_cols.argtypes = [ctypes.c_void_p]
    lib.dlc_csv_header.restype = ctypes.c_char_p
    lib.dlc_csv_header.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.dlc_csv_data.restype = ctypes.POINTER(ctypes.c_double)
    lib.dlc_csv_data.argtypes = [ctypes.c_void_p]
    lib.dlc_csv_close.restype = None
    lib.dlc_csv_close.argtypes = [ctypes.c_void_p]


def _get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            _lib = _load_or_build(_SRC, _LIB, _bind_reader)
        return _lib


def _bind_writer(lib) -> None:
    for name, ctype in (
        ("dlc_csv_write_f32", ctypes.c_float),
        ("dlc_csv_write_f64", ctypes.c_double),
    ):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_long
        fn.argtypes = [
            ctypes.c_char_p,  # path
            ctypes.c_char_p,  # header bytes
            ctypes.c_longlong,  # header length
            ctypes.POINTER(ctype),  # data
            ctypes.c_longlong,  # rows
            ctypes.c_longlong,  # cols
            ctypes.c_longlong,  # index start
        ]


def _get_wlib() -> ctypes.CDLL | None:
    global _wlib, _wtried
    with _lock:
        if _wlib is None and not _wtried:
            _wtried = True
            _wlib = _load_or_build(_WSRC, _WLIB, _bind_writer)
        return _wlib


def write_dlc_csv_fast(df, path: str) -> bool:
    """Write a homogeneous float DataFrame with a unit-step integer index as
    CSV, byte-identical to ``df.to_csv(path)`` (pandas repr formatting, NaN
    as empty field, header rows rendered by pandas itself). Returns False —
    caller falls back to pandas — for anything the fast path does not
    cover (mixed dtypes, exotic index, no compiler)."""
    import pandas as pd

    lib = _get_wlib()
    if lib is None:
        return False
    try:
        # per-COLUMN homogeneity: a mixed f32/f64 frame upcasts in
        # to_numpy(), which would format the f32 columns with f64 repr and
        # break byte-equality with pandas — fall back instead
        if len(set(df.dtypes)) != 1:
            return False
        index = df.index
        if isinstance(index, pd.RangeIndex):
            if index.step != 1:
                return False
            start = int(index.start)
        else:
            vals = np.asarray(index)
            if vals.ndim != 1 or vals.dtype.kind != "i" or (
                len(vals) > 1 and not np.array_equal(
                    vals, np.arange(vals[0], vals[0] + len(vals))
                )
            ):
                return False
            start = int(vals[0]) if len(vals) else 0
        data = df.to_numpy()
        if data.dtype == np.float32:
            fn, ctype = lib.dlc_csv_write_f32, ctypes.c_float
        elif data.dtype == np.float64:
            fn, ctype = lib.dlc_csv_write_f64, ctypes.c_double
        else:
            return False
        header = df.head(0).to_csv().encode("utf-8")
        data = np.ascontiguousarray(data)
        rc = fn(
            os.fsencode(path), header, len(header),
            data.ctypes.data_as(ctypes.POINTER(ctype)),
            data.shape[0], data.shape[1], start,
        )
        return rc == 0
    except Exception as e:  # pragma: no cover
        logger.debug(f"native csv write failed, falling back to pandas: {e}")
        return False


def native_available() -> bool:
    return _get_lib() is not None


def load_dlc_csv_fast(path: str):
    """Parse a 3-row-header DLC CSV natively.

    Returns:
        (data (T, n_cols) float64 array, headers: list of 3 lists of cell
        strings INCLUDING the index column) or None if the native loader is
        unavailable or the file does not parse.
    """
    lib = _get_lib()
    if lib is None:
        return None
    handle = lib.dlc_csv_open(os.fsencode(path))
    if not handle:
        return None
    try:
        rows = lib.dlc_csv_rows(handle)
        cols = lib.dlc_csv_cols(handle)
        headers = [
            lib.dlc_csv_header(handle, i).decode("utf-8").split("\x1f")
            for i in range(3)
        ]
        buf = np.ctypeslib.as_array(
            lib.dlc_csv_data(handle), shape=(int(rows), int(cols))
        )
        data = np.array(buf, dtype=np.float64)  # copy out before close
    finally:
        lib.dlc_csv_close(handle)
    return data, headers
