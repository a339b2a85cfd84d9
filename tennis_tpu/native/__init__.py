"""ctypes bindings for the native host-side batch ops (batch_ops.cpp).

The shared library is compiled on first use with the system compiler and cached
next to the source; a pure-numpy fallback keeps everything working where no
compiler exists. ``HAVE_NATIVE`` reports which path is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batch_ops.cpp")
_LIB = os.path.join(_HERE, "libbatch_ops.so")

_lib = None


def compile_shared(src: str, lib: str, link: tuple[str, ...] = ()) -> bool:
    """Build ``lib`` from ``src`` if missing or stale; True when ``lib`` is
    usable afterwards.

    Safe under concurrent first use (frame-cache ProcessPool workers, multihost
    processes on a shared FS): builders serialize on ``<lib>.lock`` and each
    compiles to a private temp file that lands via atomic ``os.replace`` — no
    process can ever dlopen a half-written library, and a killed build leaves
    only a stray temp, never a trusted-but-corrupt ``lib``."""
    import fcntl

    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return True
    try:
        lock = open(lib + ".lock", "w")
    except OSError:
        # Read-only install dir (root-owned site-packages, immutable container
        # layer) with no prebuilt .so: degrade to the numpy/cv2 fallback, the
        # same contract as a missing toolchain.
        return False
    with lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
            return True  # another process built it while we waited
        tmp = f"{lib}.tmp.{os.getpid()}"
        try:
            for cc in ("c++", "g++", "clang++"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", src, "-o", tmp, *link],
                        check=True, capture_output=True,
                    )
                    os.replace(tmp, lib)
                    return True
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
            return False
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not compile_shared(_SRC, _LIB):
        return None
    lib = ctypes.CDLL(_LIB)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.skipgram_lookup.restype = ctypes.c_int64
    lib.skipgram_lookup.argtypes = [i64p, ctypes.c_int64, i64p, i64p,
                                    ctypes.c_int64, f32p, i64p, i64p,
                                    ctypes.c_int64]
    lib.cbow_lookup.restype = ctypes.c_int64
    lib.cbow_lookup.argtypes = [i64p, i64p, ctypes.c_int64, i64p, i64p,
                                ctypes.c_int64, f32p, i64p, i64p,
                                ctypes.c_int64]
    lib.center_context_pairs.restype = ctypes.c_int64
    lib.center_context_pairs.argtypes = [i64p, i64p, ctypes.c_int64,
                                         ctypes.c_int64, ctypes.c_uint64,
                                         i64p, i64p, ctypes.c_int64]
    _lib = lib
    return lib


def _i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


HAVE_NATIVE = _load() is not None


def skipgram_lookup(indices, subwordidxs, subwordidxsptr, offset=0):
    """COO (data, row, col) of word+subword units per center row — compiled
    equivalent of reference utils/embeddings/data.py:191-240."""
    indices = _i64(indices)
    subwordidxs = _i64(subwordidxs)
    subwordidxsptr = _i64(subwordidxsptr)
    lib = _load()
    if lib is None:
        return _skipgram_lookup_np(indices, subwordidxs, subwordidxsptr, offset)
    n = lib.skipgram_lookup(
        _ptr(indices, ctypes.c_int64), len(indices),
        _ptr(subwordidxs, ctypes.c_int64), _ptr(subwordidxsptr, ctypes.c_int64),
        offset, None, None, None, 0,
    )
    data = np.empty(n, np.float32)
    row = np.empty(n, np.int64)
    col = np.empty(n, np.int64)
    lib.skipgram_lookup(
        _ptr(indices, ctypes.c_int64), len(indices),
        _ptr(subwordidxs, ctypes.c_int64), _ptr(subwordidxsptr, ctypes.c_int64),
        offset, _ptr(data, ctypes.c_float), _ptr(row, ctypes.c_int64),
        _ptr(col, ctypes.c_int64), n,
    )
    return data, row, col


def cbow_lookup(context_row, context_col, subwordidxs, subwordidxsptr, offset=0):
    """COO for CBOW context rows — compiled equivalent of reference
    utils/embeddings/data.py:243-311."""
    context_row = _i64(context_row)
    context_col = _i64(context_col)
    subwordidxs = _i64(subwordidxs)
    subwordidxsptr = _i64(subwordidxsptr)
    lib = _load()
    if lib is None:
        return _cbow_lookup_np(context_row, context_col, subwordidxs,
                               subwordidxsptr, offset)
    n = lib.cbow_lookup(
        _ptr(context_row, ctypes.c_int64), _ptr(context_col, ctypes.c_int64),
        len(context_col), _ptr(subwordidxs, ctypes.c_int64),
        _ptr(subwordidxsptr, ctypes.c_int64), offset, None, None, None, 0,
    )
    data = np.empty(n, np.float32)
    row = np.empty(n, np.int64)
    col = np.empty(n, np.int64)
    lib.cbow_lookup(
        _ptr(context_row, ctypes.c_int64), _ptr(context_col, ctypes.c_int64),
        len(context_col), _ptr(subwordidxs, ctypes.c_int64),
        _ptr(subwordidxsptr, ctypes.c_int64), offset,
        _ptr(data, ctypes.c_float), _ptr(row, ctypes.c_int64),
        _ptr(col, ctypes.c_int64), n,
    )
    return data, row, col


def center_context_pairs(sentences, window: int, seed: int = 0):
    """All (center, context) skip-gram pairs with per-position reduced windows.

    ``sentences``: list of int lists. Returns (centers, contexts) int64 arrays.
    """
    tokens = _i64(np.concatenate([np.asarray(s, np.int64) for s in sentences])
                  if sentences else np.zeros(0, np.int64))
    sent_ptr = _i64(np.concatenate([[0], np.cumsum([len(s) for s in sentences])]))
    lib = _load()
    if lib is None:
        return _center_context_pairs_np(sentences, window, seed)
    n = lib.center_context_pairs(
        _ptr(tokens, ctypes.c_int64), _ptr(sent_ptr, ctypes.c_int64),
        len(sentences), window, seed, None, None, 0,
    )
    centers = np.empty(n, np.int64)
    contexts = np.empty(n, np.int64)
    lib.center_context_pairs(
        _ptr(tokens, ctypes.c_int64), _ptr(sent_ptr, ctypes.c_int64),
        len(sentences), window, seed, _ptr(centers, ctypes.c_int64),
        _ptr(contexts, ctypes.c_int64), n,
    )
    return centers, contexts


# ------------------------------------------------------------ numpy fallbacks


def _skipgram_lookup_np(indices, subwordidxs, subwordidxsptr, offset):
    data, row, col = [], [], []
    for i, idx in enumerate(indices):
        start, end = subwordidxsptr[idx], subwordidxsptr[idx + 1]
        w = 1.0 / (1 + end - start)
        row.append(i); col.append(idx); data.append(w)
        for s in subwordidxs[start:end]:
            row.append(i); col.append(s + offset); data.append(w)
    return (np.asarray(data, np.float32), np.asarray(row, np.int64),
            np.asarray(col, np.int64))


def _cbow_lookup_np(context_row, context_col, subwordidxs, subwordidxsptr,
                    offset):
    num_rows = int(context_row.max()) + 1 if len(context_row) else 0
    row_counts = np.bincount(context_row, minlength=num_rows)
    data, row, col = [], [], []
    for r, idx in zip(context_row, context_col):
        start, end = subwordidxsptr[idx], subwordidxsptr[idx + 1]
        w = 1.0 / (1 + end - start) / row_counts[r]
        row.append(r); col.append(idx); data.append(w)
        for s in subwordidxs[start:end]:
            row.append(r); col.append(s + offset); data.append(w)
    return (np.asarray(data, np.float32), np.asarray(row, np.int64),
            np.asarray(col, np.int64))


def _center_context_pairs_np(sentences, window, seed):
    rng = np.random.default_rng(seed)
    centers, contexts = [], []
    for s in sentences:
        s = list(s)
        for t in range(len(s)):
            r = int(rng.integers(1, window + 1))
            for d in range(-r, r + 1):
                if d == 0 or not (0 <= t + d < len(s)):
                    continue
                centers.append(s[t])
                contexts.append(s[t + d])
    return np.asarray(centers, np.int64), np.asarray(contexts, np.int64)
