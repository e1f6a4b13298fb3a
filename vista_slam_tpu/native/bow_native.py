"""ctypes binding for the C++ BoW kernels (native/src/bow.cpp).

Compiles the shared library on first use (g++, cached next to the source)
and exposes `descend_native(vocab, descriptors)` and
`l1_score_native(a, b)`. native/bow.py auto-selects these when available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "bow.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "src", "libvistabow.so")


def _build() -> str:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    # compile to a unique temp name + atomic rename: two processes importing
    # a fresh checkout concurrently must never dlopen a half-written .so
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _LIB)
    return _LIB


_lib = ctypes.CDLL(_build())

_lib.vb_descend.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
    ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32),
]
_lib.vb_l1_score.restype = ctypes.c_float
_lib.vb_l1_score.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
]


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def descend_native(vocab, descriptors: np.ndarray) -> np.ndarray:
    ci = np.ascontiguousarray(vocab.child_idx, np.int32)
    cd = np.ascontiguousarray(vocab.child_desc, np.uint8)
    nw = np.ascontiguousarray(vocab.node_word, np.int32)
    d = np.ascontiguousarray(descriptors, np.uint8)
    out = np.empty(len(d), np.int32)
    _lib.vb_descend(
        _ptr(ci, ctypes.c_int32), _ptr(cd, ctypes.c_uint8),
        _ptr(nw, ctypes.c_int32), ctypes.c_int32(len(nw)),
        ctypes.c_int32(vocab.k), ctypes.c_int32(vocab.levels),
        _ptr(d, ctypes.c_uint8), ctypes.c_int32(len(d)),
        _ptr(out, ctypes.c_int32))
    return out


def l1_score_native(a, b) -> float:
    return float(_lib.vb_l1_score(
        _ptr(np.ascontiguousarray(a.ids, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(a.vals, np.float32), ctypes.c_float),
        ctypes.c_int32(len(a.ids)),
        _ptr(np.ascontiguousarray(b.ids, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(b.vals, np.float32), ctypes.c_float),
        ctypes.c_int32(len(b.ids))))
