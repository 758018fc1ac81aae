"""ctypes bindings for the native C++ runtime (``native/native.cpp``).

The shared library is built on demand (``make -C native``) and cached;
every entry point has a pure-Python/NumPy fallback so the framework
works without a toolchain. Native components:

* :func:`parse_ratings_dat` — the 1M-row ``::`` parser (replaces
  pandas python-engine read_csv on the preprocessing hot path),
* :func:`topk_dot` — multi-threaded exact top-k dot product (the
  CPU-serving fallback in the FAISS role; the TPU path uses
  ``retrieval.scorer``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnative.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.parse_ratings_dat.restype = ctypes.c_int64
        lib.parse_ratings_dat.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.topk_dot.restype = None
        lib.topk_dot.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.gather_batch.restype = None
        lib.gather_batch.argtypes = [
            ctypes.c_int32, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_void_p), ctypes.c_int32,
        ]
        _lib = lib
        logger.debug("native library loaded from %s", _LIB_PATH)
    except Exception as e:  # toolchain absent / build failure -> fallback
        logger.info("native library unavailable (%s); using NumPy fallbacks", e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def parse_ratings_dat(path: str):
    """Parse ``user::movie::rating::timestamp`` lines.

    Returns (user_id, movie_id, rating, timestamp) numpy arrays."""
    lib = _load()
    data = open(path, "rb").read()
    max_rows = data.count(b"\n") + 1
    if lib is not None:
        u = np.empty(max_rows, np.int64)
        m = np.empty(max_rows, np.int64)
        r = np.empty(max_rows, np.float64)
        t = np.empty(max_rows, np.int64)
        n = lib.parse_ratings_dat(
            data, len(data), max_rows,
            u.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if n >= 0:
            return u[:n], m[:n], r[:n], t[:n]
        logger.warning("native parser failed; falling back to NumPy")
    # fallback: numpy split
    rows = [ln.split(b"::") for ln in data.splitlines() if ln]
    arr = np.array([[f[0], f[1], f[2], f[3]] for f in rows if len(f) == 4])
    return (
        arr[:, 0].astype(np.int64),
        arr[:, 1].astype(np.int64),
        arr[:, 2].astype(np.float64),
        arr[:, 3].astype(np.int64),
    )


def topk_dot(
    queries: np.ndarray,
    items: np.ndarray,
    k: int,
    bias: Optional[np.ndarray] = None,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k by dot product. queries [Q,d], items [N,d] float32.

    Returns (scores [Q,k], ids [Q,k]) in descending score order."""
    queries = np.ascontiguousarray(queries, np.float32)
    items = np.ascontiguousarray(items, np.float32)
    q, d = queries.shape
    n = items.shape[0]
    k = min(k, n)
    lib = _load()
    if lib is not None:
        scores = np.empty((q, k), np.float32)
        ids = np.empty((q, k), np.int32)
        bias_ptr = (
            np.ascontiguousarray(bias, np.float32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)
            )
            if bias is not None
            else ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
        )
        lib.topk_dot(
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), q,
            items.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d,
            bias_ptr, k,
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_threads,
        )
        return scores, ids
    dense = queries @ items.T
    if bias is not None:
        dense = dense + bias[None, :]
    ids = np.argpartition(-dense, k - 1, axis=1)[:, :k]
    part = np.take_along_axis(dense, ids, axis=1)
    order = np.argsort(-part, axis=1)
    ids = np.take_along_axis(ids, order, axis=1).astype(np.int32)
    return np.take_along_axis(dense, ids, axis=1).astype(np.float32), ids


def gather_batch(columns, idx: np.ndarray, n_threads: int = 0):
    """Materialize one shuffled batch from contiguous column arrays:
    ``out[c][j] = columns[c][idx[j]]`` for every column, via the
    threaded C++ gather (``native/native.cpp::gather_batch``). The
    ctypes call releases the GIL, so a Python prefetch thread overlaps
    the next batch's gather with the running device step. Falls back to
    NumPy fancy indexing when the library is unavailable.

    ``columns``: dict name -> np.ndarray (any dtype; rows = axis 0).
    Returns a dict of fresh arrays shaped ``(len(idx), *col.shape[1:])``.
    """
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is None:
        return {k: v[idx] for k, v in columns.items()}
    # the C++ gather trusts its indices (no per-row branch on the hot
    # path); validate once here so a bad caller gets a ValueError, not
    # an out-of-bounds read
    if len(idx):
        n_rows = min(len(v) for v in columns.values())
        lo, hi = int(idx.min()), int(idx.max())
        if lo < 0 or hi >= n_rows:
            raise ValueError(
                f"gather_batch indices out of range: [{lo}, {hi}] vs "
                f"{n_rows} rows")
    names = list(columns)
    srcs = [np.ascontiguousarray(columns[k]) for k in names]
    outs = [
        np.empty((len(idx),) + s.shape[1:], s.dtype) for s in srcs
    ]
    n = len(names)
    src_ptrs = (ctypes.c_void_p * n)(
        *[s.ctypes.data_as(ctypes.c_void_p).value for s in srcs]
    )
    dst_ptrs = (ctypes.c_void_p * n)(
        *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs]
    )
    row_bytes = (ctypes.c_int64 * n)(
        *[s.dtype.itemsize * int(np.prod(s.shape[1:], dtype=np.int64))
          for s in srcs]
    )
    lib.gather_batch(
        n, src_ptrs, row_bytes,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx), dst_ptrs, n_threads,
    )
    return dict(zip(names, outs))
