"""ctypes bindings for the native CPU kernels
(sonicsim_tpu/_native_src/sonicsim_native.cpp).

Builds the shared library on first use (g++; cached next to the source, so
the package works from a git checkout or a pip install alike). All entry
points degrade gracefully: callers fall back to the pure-Python
implementations when the toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent / "_native_src"
_SO = _NATIVE_DIR / "libsonicsim_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < (
            _NATIVE_DIR / "sonicsim_native.cpp"
        ).stat().st_mtime:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
            )
        lib = ctypes.CDLL(str(_SO))
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return None

    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    up = ctypes.POINTER(ctypes.c_uint8)
    lib.image_sources.restype = ctypes.c_int
    lib.image_sources.argtypes = [
        dp, dp, dp, ctypes.c_int, ctypes.c_int, dp,
        ctypes.c_double, ctypes.c_double, dp, dp, dp, ctypes.c_int,
    ]
    fp = ctypes.POINTER(ctypes.c_float)
    lib.astar.restype = ctypes.c_int
    lib.astar.argtypes = [up] + [ctypes.c_int] * 6 + [ip, ctypes.c_int]
    lib.simplify_path.restype = ctypes.c_int
    lib.simplify_path.argtypes = [up, ctypes.c_int, ctypes.c_int, ip, ctypes.c_int]
    llp = ctypes.POINTER(ctypes.c_longlong)
    lib.wav_info.restype = ctypes.c_int
    lib.wav_info.argtypes = [ctypes.c_char_p, llp, ip, ip]
    lib.wav_read_f32.restype = ctypes.c_longlong
    lib.wav_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_int, fp, ctypes.c_longlong,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def image_sources_multiband(
    dims: np.ndarray,
    src: np.ndarray,
    recv: np.ndarray,
    max_order: int,
    beta: np.ndarray,  # (n_bands, 6) per-wall reflection coefficients
    max_delay_s: float,
    c: float = 343.0,
):
    """→ (delays (N,), amps (N, n_bands), dirs (N, 3)) or None if no native."""
    lib = _load()
    if lib is None:
        return None
    n_bands = beta.shape[0]
    cap = 8 * (2 * max_order + 1) ** 3
    delays = np.zeros(cap)
    amps = np.zeros(cap * n_bands)
    dirs = np.zeros(cap * 3)
    as_dp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    dims64 = np.ascontiguousarray(dims, np.float64)
    src64 = np.ascontiguousarray(src, np.float64)
    recv64 = np.ascontiguousarray(recv, np.float64)
    beta64 = np.ascontiguousarray(beta, np.float64)
    n = lib.image_sources(
        as_dp(dims64), as_dp(src64), as_dp(recv64), max_order, n_bands,
        as_dp(beta64), max_delay_s, c, as_dp(delays), as_dp(amps), as_dp(dirs),
        cap,
    )
    return delays[:n], amps[: n * n_bands].reshape(n, n_bands), dirs[: n * 3].reshape(n, 3)


def astar_path(occupancy: np.ndarray, start, goal, simplify: bool = True):
    """A* over a (nx, nz) bool grid → (n, 2) int cells or None (no native /
    unreachable)."""
    lib = _load()
    if lib is None:
        return None
    occ = np.ascontiguousarray(occupancy.astype(np.uint8))
    nx, nz = occ.shape
    buf = np.zeros(nx * nz * 2, np.int32)
    n = lib.astar(
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nx, nz, int(start[0]), int(start[1]), int(goal[0]), int(goal[1]),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), nx * nz,
    )
    if n < 0:
        return None
    if simplify and n > 2:
        n = lib.simplify_path(
            occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nx, nz,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n,
        )
    return buf[: 2 * n].reshape(n, 2).copy()


def read_wav(path, mono: bool = False):
    """Native WAV decode → ((C, T) float32 or (T,) if mono, sample_rate),
    or None when the library is unavailable or the format unsupported.

    ctypes releases the GIL for the whole parse+decode, so thread pools
    (dataset/loader.py) decode in parallel — the torch-DataLoader-worker
    role (SURVEY §2.8.3) without a process pool.
    """
    lib = _load()
    if lib is None:
        return None
    n_frames = ctypes.c_longlong()
    n_ch = ctypes.c_int()
    sr = ctypes.c_int()
    encoded = str(path).encode()
    if lib.wav_info(encoded, ctypes.byref(n_frames),
                    ctypes.byref(n_ch), ctypes.byref(sr)) != 0:
        return None
    frames, channels = n_frames.value, n_ch.value
    out = np.empty(frames if mono else channels * frames, np.float32)
    got = lib.wav_read_f32(
        encoded, int(mono),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frames,
    )
    if got < 0:
        return None
    out = out[: got if mono else channels * got]
    if not mono:
        out = out.reshape(channels, got)
    return out, sr.value
