"""Native (C++) runtime components, loaded via ctypes.

The library is compiled on first use with the system toolchain and cached
next to the sources (or in ~/.cache/msd_tpu when the package directory is
read-only). No pybind11 needed — plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_FAILED = False

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_PKG_DIR, "marching_tets.cpp"),
    os.path.join(_PKG_DIR, "raster.cpp"),
    os.path.join(_PKG_DIR, "codec.cpp"),
]


def _lib_path() -> str:
    from msd_tpu.utils.compile_cache import _host_fingerprint

    h = hashlib.sha256()
    for src in _SRCS:
        with open(src, "rb") as f:
            h.update(f.read())
    # -march=native output is host-specific: key the cache by the CPU
    # fingerprint too, so a re-provisioned VM rebuilds instead of
    # loading a binary compiled for another machine's ISA.
    h.update(_host_fingerprint().encode())
    digest = h.hexdigest()[:16]
    name = f"libmsd_native_{digest}.so"
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if os.access(pkg_dir, os.W_OK):
        return os.path.join(pkg_dir, name)
    cache = os.path.join(os.path.expanduser("~/.cache/msd_tpu"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, name)


def _build(out_path: str):
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        *_SRCS, "-o", out_path,
    ]
    logging.info("building native library: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)


def load_native():
    """Returns the ctypes library, or None when the toolchain is missing."""
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        try:
            path = _lib_path()
            if not os.path.isfile(path):
                _build(path)
            lib = ctypes.CDLL(path)
            lib.mt_blocks.restype = ctypes.c_int
            lib.mt_blocks.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # block_vals
                ctypes.POINTER(ctypes.c_int32),   # bases
                ctypes.c_int64,                   # num_blocks
                ctypes.c_int32,                   # b
                ctypes.c_int64,                   # N
                ctypes.POINTER(ctypes.c_uint8),   # flips
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.mt_free.restype = None
            lib.mt_free.argtypes = [ctypes.c_void_p]
            lib.mt_create.restype = ctypes.c_void_p
            lib.mt_create.argtypes = [
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
            lib.mt_add_blocks.restype = None
            lib.mt_add_blocks.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_int32,
            ]
            lib.mt_finish.restype = ctypes.c_int
            lib.mt_finish.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.mt_finish_view.restype = ctypes.c_int
            lib.mt_finish_view.argtypes = lib.mt_finish.argtypes
            lib.mt_destroy.restype = None
            lib.mt_destroy.argtypes = [ctypes.c_void_p]
            lib.mt_ply_stream_begin.restype = ctypes.c_int
            lib.mt_ply_stream_begin.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_float, ctypes.c_float,
            ]
            lib.mt_ply_stream_finish.restype = ctypes.c_int
            lib.mt_ply_stream_finish.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.msd_decode_packed.restype = ctypes.c_int64
            lib.msd_decode_packed.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # bitmaps [K,32]
                ctypes.POINTER(ctypes.c_uint8),   # mags [n_mags]
                ctypes.c_int64,                   # K
                ctypes.c_int64,                   # n_mags
                ctypes.c_int32,                   # pts
                ctypes.c_float,                   # q
                ctypes.POINTER(ctypes.c_float),   # out [K,pts]
            ]
            lib.msd_codec_simd.restype = ctypes.c_int32
            lib.msd_codec_simd.argtypes = []
            lib.rast_render.restype = None
            lib.rast_render.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_float,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.rast_visibility.restype = None
            lib.rast_visibility.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _LIB = lib
        except Exception as e:  # toolchain missing / compile error
            logging.warning("native library unavailable, using numpy path: %s", e)
            _FAILED = True
    return _LIB
