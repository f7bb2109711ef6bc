"""ctypes bindings for the native host library (csrc/gptq_host.cpp).

Builds on demand with ``make -C csrc`` (g++ + OpenMP); all entry points have
pure-numpy fallbacks in formats/gptq.py, so the package works without a
compiler. The native path makes 70B-scale checkpoint loading practical:
repacking is embarrassingly parallel bit-twiddling that numpy does
single-threaded through temporaries.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libexllama_host.so")
_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_lib: "ctypes.CDLL | None" = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_CSRC):
        try:
            subprocess.run(
                ["make", "-C", _CSRC], capture_output=True, check=True,
                timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.gptq_repack_kgroup.argtypes = [
        i32p, i32p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
    ]
    if hasattr(lib, "gptq_repack_npair"):
        lib.gptq_repack_npair.argtypes = [
            i32p, i32p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
    lib.gptq_zscale.argtypes = [
        i32p, u16p, f32p, f32p, ctypes.c_int64, ctypes.c_int64
    ]
    lib.gptq_make_x_map.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32
    ]
    lib.rep_penalty_mask_cpu.argtypes = [
        ctypes.c_int32, i64p, f32p, ctypes.c_float, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.host_lib_version.restype = ctypes.c_int32
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def repack_kgroup(qweight: np.ndarray, x_map: "np.ndarray | None",
                  k: int, n: int, groupsize: int) -> "np.ndarray | None":
    """GPTQ [K/8, N] → kgroup layout [K/8, N_pad] (+ optional row perm)."""
    lib = _load()
    if lib is None:
        return None
    n_pad = -(-n // 1024) * 1024
    out = np.empty((k // 8, n_pad), np.int32)
    qweight = np.ascontiguousarray(qweight, np.int32)
    if x_map is not None:
        x_map = np.ascontiguousarray(x_map, np.int32)
        lib.gptq_repack_kgroup(
            qweight, out, x_map.ctypes.data_as(ctypes.c_void_p), k, n,
            groupsize,
        )
    else:
        lib.gptq_repack_kgroup(qweight, out, None, k, n, groupsize)
    return out


def repack_npair(qweight: np.ndarray, x_map: "np.ndarray | None",
                 k: int, n: int) -> "np.ndarray | None":
    """GPTQ [K/8, N] → npair layout [K/4, N_pad/2] (+ optional row perm)."""
    lib = _load()
    if lib is None or not hasattr(lib, "gptq_repack_npair"):
        return None
    n_pad = -(-n // 1024) * 1024
    out = np.empty((k // 4, n_pad // 2), np.int32)
    qweight = np.ascontiguousarray(qweight, np.int32)
    if x_map is not None:
        x_map = np.ascontiguousarray(x_map, np.int32)
        lib.gptq_repack_npair(
            qweight, out, x_map.ctypes.data_as(ctypes.c_void_p), k, n
        )
    else:
        lib.gptq_repack_npair(qweight, out, None, k, n)
    return out


def zscale(qzeros: np.ndarray, scales_f16: np.ndarray, g: int, n: int):
    """→ (scales f32 [G, N_pad], zscale f32 [G, N_pad]) or None."""
    lib = _load()
    if lib is None:
        return None
    n_pad = -(-n // 1024) * 1024
    so = np.empty((g, n_pad), np.float32)
    zo = np.empty((g, n_pad), np.float32)
    lib.gptq_zscale(
        np.ascontiguousarray(qzeros, np.int32),
        np.ascontiguousarray(scales_f16.view(np.uint16)),
        so, zo, g, n,
    )
    return so, zo


def make_x_map(g_idx: np.ndarray, groups: int) -> "np.ndarray | None":
    lib = _load()
    if lib is None:
        return None
    k = g_idx.shape[0]
    out = np.empty((k,), np.int32)
    lib.gptq_make_x_map(
        np.ascontiguousarray(g_idx, np.int32), out, k, groups
    )
    return out


def rep_penalty_mask(sequence: np.ndarray, vocab: int, penalty: float,
                     sustain: int, decay: int, seq_len: int):
    lib = _load()
    if lib is None:
        return None
    mask = np.empty((vocab,), np.float32)
    lib.rep_penalty_mask_cpu(
        vocab, np.ascontiguousarray(sequence, np.int64), mask,
        penalty, sustain, decay, seq_len,
    )
    return mask
