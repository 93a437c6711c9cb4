"""ctypes loader for the C++ host runtime (native/aligner_native.cpp).

The shared library is built lazily with ``g++ -O3`` on first use and
cached next to the package (or in ``~/.cache/aligner-tpu`` when the
package directory is read-only).  Every entry point has a pure-Python
fallback (the oracle), so ``available()`` returning False only costs
speed, never correctness.

Native surface:
* ``fill_local/fill_global/fill_pwm`` — exact scalar DP (bit-identical
  to the oracle; ~1000x faster than the Python loops);
* ``traceback_batch`` — batched direction-plane walks, one C call per
  device batch;
* ``encode`` — byte→code compaction with frequencies and gap indices.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "aligner_native.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

_i64 = ctypes.c_int64
_p_i8 = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
_p_i16 = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
_p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build(so_path: str) -> bool:
    try:
        os.makedirs(os.path.dirname(so_path), exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", so_path, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _candidates():
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    yield os.path.join(pkg_dir, "_aligner_native.so")
    yield os.path.join(
        os.path.expanduser("~/.cache/aligner-tpu"), "_aligner_native.so"
    )


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("ALIGNER_NO_NATIVE"):
            return None
        for so in _candidates():
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
                if not os.path.exists(_SRC) or not _build(so):
                    continue
            try:
                lib = ctypes.CDLL(so)
                if lib.an_abi_version() != 1:
                    continue
                _bind(lib)
                _LIB = lib
                return lib
            except OSError:
                continue
        return None


def _bind(lib: ctypes.CDLL) -> None:
    lib.an_fill_local.argtypes = [
        _p_i8, _i64, _p_i8, _i64, _p_f64, _i64,
        ctypes.c_double, ctypes.c_double, _p_f64, _p_u8,
    ]
    lib.an_fill_global.argtypes = lib.an_fill_local.argtypes
    lib.an_fill_pwm.argtypes = [
        _p_i8, _i64, _p_f64, _i64,
        ctypes.c_double, ctypes.c_double, _p_f64, _p_u8,
    ]
    lib.an_argmax.argtypes = [_p_f64, _i64]
    lib.an_argmax.restype = _i64
    lib.an_traceback_batch.argtypes = [
        _p_u8, _i64, _i64, _i64, _p_i64, _p_i64,
        _p_i8, _i64, _p_i8, _i64, ctypes.c_int,
        _p_i16, _p_i16, _p_i64, _p_i64, _p_i64, _p_i64,
    ]
    lib.an_encode.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"), _i64,
        _p_i16, _i64, _p_i8, _p_i64, _p_i64, _p_i64, _p_i64, _p_i64,
    ]
    lib.an_encode.restype = _i64


def available() -> bool:
    return _load() is not None


def fill(q: np.ndarray, t: np.ndarray, matrix: np.ndarray,
         del_: float, ext: float, mode: str):
    """Exact scalar fill; returns (plane f64, dirs u8) like the oracle."""
    lib = _load()
    assert lib is not None
    q = np.ascontiguousarray(q, np.int8)
    matrix = np.ascontiguousarray(matrix, np.float64)
    if mode == "pwm":
        rows, cols = len(q), matrix.shape[1]
        plane = np.zeros((rows + 1, cols + 1), np.float64)
        dirs = np.full((rows + 1, cols + 1), 3, np.uint8)
        lib.an_fill_pwm(q, len(q), matrix, matrix.shape[1], del_, ext, plane, dirs)
        return plane, dirs
    t = np.ascontiguousarray(t, np.int8)
    rows, cols = len(t), len(q)
    plane = np.zeros((rows + 1, cols + 1), np.float64)
    dirs = np.full((rows + 1, cols + 1), 3, np.uint8)
    fn = lib.an_fill_local if mode == "local" else lib.an_fill_global
    fn(q, len(q), t, len(t), matrix, matrix.shape[1], del_, ext, plane, dirs)
    return plane, dirs


def argmax_first_rowmajor(plane: np.ndarray) -> tuple[int, int]:
    lib = _load()
    assert lib is not None
    flat = int(lib.an_argmax(np.ascontiguousarray(plane, np.float64), plane.size))
    return flat // plane.shape[1], flat % plane.shape[1]


def traceback_batch(
    dirs: np.ndarray,  # (B, rows1, cols1) uint8
    sy: np.ndarray,
    sx: np.ndarray,
    q: np.ndarray,  # (B, qmax) int8
    t: np.ndarray,  # (B, tmax) int8
    pwm_mode: bool,
):
    """Batched walks; returns (qa_list, ta_list, end_y, end_x) with each
    walk already reversed into alignment order."""
    lib = _load()
    assert lib is not None
    dirs = np.ascontiguousarray(dirs, np.uint8)
    B, rows1, cols1 = dirs.shape
    cap = rows1 + cols1 + 1
    qa_buf = np.empty(B * cap, np.int16)
    ta_buf = np.empty(B * cap, np.int16)
    offsets = np.empty(B, np.int64)
    lens = np.empty(B, np.int64)
    end_y = np.empty(B, np.int64)
    end_x = np.empty(B, np.int64)
    lib.an_traceback_batch(
        dirs, B, rows1, cols1,
        np.ascontiguousarray(sy, np.int64), np.ascontiguousarray(sx, np.int64),
        np.ascontiguousarray(q, np.int8), q.shape[1],
        np.ascontiguousarray(t, np.int8), t.shape[1],
        int(pwm_mode), qa_buf, ta_buf, offsets, lens, end_y, end_x,
    )
    qa = [qa_buf[offsets[b] : offsets[b] + lens[b]][::-1].copy() for b in range(B)]
    ta = [ta_buf[offsets[b] : offsets[b] + lens[b]][::-1].copy() for b in range(B)]
    return qa, ta, end_y, end_x


def encode(raw: bytes | np.ndarray, lut256: np.ndarray, vol: int):
    """Compacting encode; returns (codes int8, counts int64, indices
    ascending-coord list of (coord, offset, local))."""
    lib = _load()
    assert lib is not None
    raw = np.frombuffer(bytes(raw), np.uint8) if not isinstance(raw, np.ndarray) else raw
    raw = np.ascontiguousarray(raw, np.uint8)
    n = len(raw)
    out = np.empty(max(n, 1), np.int8)
    counts = np.zeros(vol, np.int64)
    idx_c = np.empty(max(n, 1), np.int64)
    idx_o = np.empty(max(n, 1), np.int64)
    idx_l = np.empty(max(n, 1), np.int64)
    n_idx = np.zeros(1, np.int64)
    kept = lib.an_encode(
        raw, n, np.ascontiguousarray(lut256, np.int16), vol,
        out, counts, idx_c, idx_o, idx_l, n_idx,
    )
    k = int(n_idx[0])
    return out[:kept].copy(), counts, list(zip(idx_c[:k], idx_o[:k], idx_l[:k]))
