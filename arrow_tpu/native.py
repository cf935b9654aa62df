"""ctypes bindings for the C++ native runtime (native/arrow_tpu_native.cc).

Provides: MemoryPool (64-byte aligned host staging allocations with
stats/poisoning — memory_pool.cc analog), ATB columnar spill files
(zero-copy mmap reads — the engine-internal IPC-file role), and
MorselLoader (background-thread file readahead —
dataset/scan_node.cc:86-123 analog).

The shared library builds lazily with g++ on first use and caches next to
the source; everything degrades gracefully (``available() -> False``) if
no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["available", "MemoryPool", "write_atb", "read_atb",
           "MorselLoader"]

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "arrow_tpu_native.cc")
_SO = os.path.join(os.path.dirname(_SRC), "build", "libarrow_tpu_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None

# dtype codes shared with the C++ side (opaque to it — it only moves bytes)
_DTYPES = [np.dtype(x) for x in
           ["bool", "int8", "int16", "int32", "int64", "uint8", "uint16",
            "uint32", "uint64", "float16", "float32", "float64"]]
_DTYPE_CODE = {d: i for i, d in enumerate(_DTYPES)}
_VARLEN_CODE = 100  # byte pool


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _SO]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except Exception as e:  # no compiler
        return f"{type(e).__name__}: {e}"
    if r.returncode != 0:
        return r.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC) and
                os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            _build_error = _build()
            if _build_error is not None:
                return None
        lib = ctypes.CDLL(_SO)
        c = ctypes
        lib.atp_pool_create.restype = c.c_void_p
        lib.atp_pool_create.argtypes = [c.c_int]
        lib.atp_pool_destroy.argtypes = [c.c_void_p]
        lib.atp_pool_alloc.restype = c.c_void_p
        lib.atp_pool_alloc.argtypes = [c.c_void_p, c.c_int64]
        lib.atp_pool_free.argtypes = [c.c_void_p, c.c_void_p, c.c_int64]
        for f in ["atp_pool_bytes_allocated", "atp_pool_max_memory",
                  "atp_pool_num_allocations"]:
            getattr(lib, f).restype = c.c_int64
            getattr(lib, f).argtypes = [c.c_void_p]
        lib.atb_write.restype = c.c_int
        lib.atb_open.restype = c.c_void_p
        lib.atb_open.argtypes = [c.c_char_p]
        lib.atb_close.argtypes = [c.c_void_p]
        lib.atb_nrows.restype = c.c_int64
        lib.atb_nrows.argtypes = [c.c_void_p]
        lib.atb_ncols.restype = c.c_int
        lib.atb_ncols.argtypes = [c.c_void_p]
        lib.atb_col_name.restype = c.c_char_p
        lib.atb_col_name.argtypes = [c.c_void_p, c.c_int]
        lib.atb_col_dtype.restype = c.c_int
        lib.atb_col_dtype.argtypes = [c.c_void_p, c.c_int]
        lib.atb_col_flags.restype = c.c_int
        lib.atb_col_flags.argtypes = [c.c_void_p, c.c_int]
        lib.atb_col_data.restype = c.POINTER(c.c_uint8)
        lib.atb_col_data.argtypes = [c.c_void_p, c.c_int,
                                     c.POINTER(c.c_int64)]
        lib.atb_col_validity.restype = c.POINTER(c.c_uint8)
        lib.atb_col_validity.argtypes = [c.c_void_p, c.c_int]
        lib.atb_col_offsets.restype = c.POINTER(c.c_uint8)
        lib.atb_col_offsets.argtypes = [c.c_void_p, c.c_int]
        lib.atp_loader_create.restype = c.c_void_p
        lib.atp_loader_create.argtypes = [
            c.POINTER(c.c_char_p), c.c_int, c.c_int64, c.c_int, c.c_int]
        lib.atp_loader_next.restype = c.c_int
        lib.atp_loader_next.argtypes = [
            c.c_void_p, c.POINTER(c.c_void_p), c.POINTER(c.c_int64),
            c.POINTER(c.c_int64), c.POINTER(c.c_int)]
        lib.atp_loader_destroy.argtypes = [c.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class _Allocation(np.ndarray):
    """ndarray view over a pool allocation (carries the raw pointer)."""
    _atp_ptr = 0


class MemoryPool:
    """64-byte-aligned host allocator with stats (memory_pool.cc analog).
    ``ARROW_TPU_DEBUG_MEMORY_POOL=1`` poisons alloc/free like
    ARROW_DEBUG_MEMORY_POOL."""

    def __init__(self, poison: Optional[bool] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native runtime unavailable: "
                               f"{_build_error}")
        if poison is None:
            poison = os.environ.get("ARROW_TPU_DEBUG_MEMORY_POOL") == "1"
        self._lib = lib
        self._h = lib.atp_pool_create(1 if poison else 0)

    def alloc(self, nbytes: int) -> np.ndarray:
        ptr = self._lib.atp_pool_alloc(self._h, nbytes)
        if not ptr:
            raise MemoryError(nbytes)
        buf = (ctypes.c_uint8 * nbytes).from_address(ptr)
        arr = np.frombuffer(buf, dtype=np.uint8).view(_Allocation)
        arr._atp_ptr = ptr  # keep for free()
        return arr

    def free(self, arr: np.ndarray):
        self._lib.atp_pool_free(self._h, arr._atp_ptr, arr.nbytes)

    @property
    def bytes_allocated(self) -> int:
        return self._lib.atp_pool_bytes_allocated(self._h)

    @property
    def max_memory(self) -> int:
        return self._lib.atp_pool_max_memory(self._h)

    @property
    def num_allocations(self) -> int:
        return self._lib.atp_pool_num_allocations(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.atp_pool_destroy(self._h)


class _AtbColDesc(ctypes.Structure):
    _fields_ = [("name", ctypes.c_char_p),
                ("dtype_code", ctypes.c_uint8),
                ("has_validity", ctypes.c_uint8),
                ("is_varlen", ctypes.c_uint8),
                ("validity", ctypes.POINTER(ctypes.c_uint8)),
                ("offsets", ctypes.POINTER(ctypes.c_uint8)),
                ("data", ctypes.POINTER(ctypes.c_uint8)),
                ("data_bytes", ctypes.c_int64)]


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def write_atb(path: str, columns: Dict[str, dict], nrows: int):
    """Write an ATB file. ``columns`` maps name -> {"data": np.ndarray,
    "validity": np.ndarray(bool)|None, "offsets": np.int32[nrows+1]|None}.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native runtime unavailable: {_build_error}")
    descs = (_AtbColDesc * len(columns))()
    keepalive = []
    for i, (name, col) in enumerate(columns.items()):
        data = np.ascontiguousarray(col["data"])
        validity = col.get("validity")
        offsets = col.get("offsets")
        is_varlen = offsets is not None
        d = descs[i]
        nb = name.encode()
        keepalive.extend([data, nb])
        d.name = nb
        d.dtype_code = _VARLEN_CODE if is_varlen else \
            _DTYPE_CODE[data.dtype]
        d.has_validity = 1 if validity is not None else 0
        d.is_varlen = 1 if is_varlen else 0
        if validity is not None:
            v = np.ascontiguousarray(validity.astype(np.uint8))
            keepalive.append(v)
            d.validity = _u8ptr(v)
        if is_varlen:
            o = np.ascontiguousarray(offsets.astype(np.int32))
            keepalive.append(o)
            d.offsets = _u8ptr(o.view(np.uint8))
        d.data = _u8ptr(data.view(np.uint8).reshape(-1))
        d.data_bytes = data.nbytes
    rc = lib.atb_write(path.encode(), nrows, len(columns), descs)
    if rc != 0:
        raise IOError(f"atb_write({path}) failed: {rc}")


def _read_handle(lib, h, c, nrows, copy=True):
    name = lib.atb_col_name(h, c).decode()
    code = lib.atb_col_dtype(h, c)
    flags = lib.atb_col_flags(h, c)
    nbytes = ctypes.c_int64()
    dptr = lib.atb_col_data(h, c, ctypes.byref(nbytes))
    raw = np.ctypeslib.as_array(dptr, shape=(nbytes.value,))
    col = {}
    if code == _VARLEN_CODE:
        col["data"] = raw.copy() if copy else raw
        optr = lib.atb_col_offsets(h, c)
        off = np.ctypeslib.as_array(optr, shape=((nrows + 1) * 4,))
        col["offsets"] = off.view(np.int32).copy()
    else:
        dt = _DTYPES[code]
        col["data"] = (raw.view(dt).copy() if copy else raw.view(dt))
    if flags & 1:
        vptr = lib.atb_col_validity(h, c)
        v = np.ctypeslib.as_array(vptr, shape=(nrows,))
        col["validity"] = v.astype(bool)
    return name, col


def read_atb(path: str) -> Tuple[Dict[str, dict], int]:
    """Read an ATB file -> ({name: {data, validity?, offsets?}}, nrows)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native runtime unavailable: {_build_error}")
    h = lib.atb_open(path.encode())
    if not h:
        raise IOError(f"cannot open ATB file {path}")
    try:
        nrows = lib.atb_nrows(h)
        out = {}
        for c in range(lib.atb_ncols(h)):
            name, col = _read_handle(lib, h, c, nrows)
            out[name] = col
        return out, nrows
    finally:
        lib.atb_close(h)


class MorselLoader:
    """Background-thread morsel prefetcher over ATB files.

    Iterating yields (file_index, {name: {data, validity?, offsets?}},
    nrows) morsel dicts, sliced to ``morsel_rows`` by the C++ thread pool
    ahead of consumption (the readahead role of dataset/scan_node.cc).
    """

    def __init__(self, paths: Sequence[str], morsel_rows: int = 1 << 15,
                 nthreads: int = 2, queue_depth: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native runtime unavailable: "
                               f"{_build_error}")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._h = lib.atp_loader_create(arr, len(paths), morsel_rows,
                                        nthreads, queue_depth)
        self._open = True

    def __iter__(self):
        lib = self._lib
        fh = ctypes.c_void_p()
        rb = ctypes.c_int64()
        rc_ = ctypes.c_int64()
        fi = ctypes.c_int()
        while lib.atp_loader_next(self._h, ctypes.byref(fh),
                                  ctypes.byref(rb), ctypes.byref(rc_),
                                  ctypes.byref(fi)):
            nrows_total = lib.atb_nrows(fh)
            cols = {}
            lo, n = rb.value, rc_.value
            for c in range(lib.atb_ncols(fh)):
                name, col = _read_handle(lib, fh, c, nrows_total,
                                         copy=False)
                sliced = {}
                if "offsets" in col:
                    off = col["offsets"]
                    b0, b1 = int(off[lo]), int(off[lo + n])
                    sliced["data"] = col["data"][b0:b1].copy()
                    sliced["offsets"] = (off[lo:lo + n + 1] - off[lo]).copy()
                else:
                    sliced["data"] = col["data"][lo:lo + n].copy()
                if "validity" in col:
                    sliced["validity"] = col["validity"][lo:lo + n].copy()
                cols[name] = sliced
            yield fi.value, cols, n

    def close(self):
        if self._open:
            self._lib.atp_loader_destroy(self._h)
            self._open = False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
