"""ctypes bindings for the native host tier (see neurec_native.cpp).

The shared library is built on first use with g++ (no pybind11 in this
environment; plain C ABI + ctypes keeps the binding dependency-free).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libneurec_native.so")
_lib: Optional[ctypes.CDLL] = None

METRIC_CODES = {"Precision": 1, "Recall": 2, "MAP": 3, "NDCG": 4, "MRR": 5}


def build(force: bool = False) -> str:
    src = os.path.join(_DIR, "neurec_native.cpp")
    if force or not os.path.isfile(_SO) or (
        os.path.getmtime(src) > os.path.getmtime(_SO)
    ):
        # compile to a per-process temp and rename atomically: two
        # processes building concurrently (multi-process tests, first
        # import races) must never dlopen a partially written .so
        tmp = "%s.tmp.%d" % (_SO, os.getpid())
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
                 "-shared", "-o", tmp, src],
                check=True,
                cwd=_DIR,
            )
            os.replace(tmp, _SO)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return _SO


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.eval_score_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.batch_randint_choice.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_int),
        ]
        lib.arg_topk.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    return _lib


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def eval_score_matrix(
    scores: np.ndarray,
    truth_lists: Sequence[Sequence[int]],
    metrics: Sequence[str],
    top_k: int,
    n_threads: int = 8,
) -> np.ndarray:
    """(B, n_metrics * top_k) per-user cumulative metric vectors."""
    lib = _load()
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    B, num_items = scores.shape
    flat = np.concatenate([np.asarray(t, np.int32) for t in truth_lists]) if (
        truth_lists
    ) else np.zeros(0, np.int32)
    flat = np.ascontiguousarray(flat, dtype=np.int32)
    offsets = np.zeros(B + 1, dtype=np.int32)
    np.cumsum([len(t) for t in truth_lists], out=offsets[1:])
    codes = np.asarray([METRIC_CODES[m] for m in metrics], dtype=np.int32)
    out = np.zeros((B, len(metrics) * top_k), dtype=np.float32)
    lib.eval_score_matrix(
        _fptr(scores), B, num_items, _iptr(flat), _iptr(offsets),
        _iptr(codes), len(metrics), top_k, n_threads, _fptr(out),
    )
    return out


def batch_randint_choice(
    high: int,
    counts: Sequence[int],
    exclusion: Sequence[Sequence[int]],
    seed: int = 0,
) -> List[np.ndarray]:
    """Per-user uniform draws in [0, high) excluding each exclusion set.

    Validation mirrors the reference Cython sampler
    (util/cython/random_choice.pyx:24-82): a counts/exclusion length
    mismatch otherwise reads past the offsets array in the C++, and an
    exclusion covering [0, high) spins the rejection loop forever.
    """
    lib = _load()
    if len(counts) != len(exclusion):
        raise ValueError(
            "The shape of 'exclusion' is not compatible with the shape "
            "of 'size'!"
        )
    for e in exclusion:
        if high <= len(e):  # reference's conservative raw-length check
            raise ValueError(
                "The number of 'exclusion' is greater than 'high'."
            )
    counts_a = np.ascontiguousarray(counts, dtype=np.int32)
    flat = np.concatenate([np.asarray(e, np.int32) for e in exclusion]) if (
        exclusion
    ) else np.zeros(0, np.int32)
    flat = np.ascontiguousarray(flat, dtype=np.int32)
    offsets = np.zeros(len(exclusion) + 1, dtype=np.int32)
    np.cumsum([len(e) for e in exclusion], out=offsets[1:])
    out = np.zeros(int(counts_a.sum()), dtype=np.int32)
    lib.batch_randint_choice(
        high, _iptr(counts_a), len(counts_a), _iptr(flat), _iptr(offsets),
        seed, _iptr(out),
    )
    return list(np.split(out, np.cumsum(counts_a)[:-1]))


def arg_topk(scores: np.ndarray, k: int, n_threads: int = 8) -> np.ndarray:
    """(B, k) top-k indices per row, ties broken by lower index."""
    lib = _load()
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    B, num_items = scores.shape
    out = np.zeros((B, k), dtype=np.int32)
    lib.arg_topk(_fptr(scores), B, num_items, k, n_threads, _iptr(out))
    return out
