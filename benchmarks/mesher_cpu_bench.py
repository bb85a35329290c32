"""Standalone CPU microbenchmark for the native marching-tets mesher.

Times ``mt_create``/``mt_add_blocks``/``mt_finish_view`` on a synthetic
512^3-class sphere-shell active set (the same block shape the streaming
extractor feeds it), WITHOUT any TPU in the loop — isolates the mesher's
share of the single host core so hot-loop changes can be A/B'd against
wall-clock and triangle counts directly.

Usage:  python benchmarks/mesher_cpu_bench.py [--n 512] [--reps 5]
"""

from __future__ import annotations

import argparse
import ctypes
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from msd_tpu.native import load_native
from msd_tpu.ops.marching_cubes import _FLIP_TABLE


def make_shell_blocks(N: int, b: int = 4):
    """Active blocks of a radius-0.75 sphere shell on an N^3 grid in
    [-1, 1]^3 — roughly the block population of a real SDF extraction."""
    nb = (N - 1) // b
    ci = np.arange(nb, dtype=np.int64)
    bx, by, bz = np.meshgrid(ci, ci, ci, indexing="ij")
    bases = np.stack([bx, by, bz], -1).reshape(-1, 3) * b
    h = 2.0 / (N - 1)
    centers = (bases + b / 2.0) * h - 1.0
    r = np.linalg.norm(centers, axis=1)
    band = b * h * np.sqrt(3.0)
    keep = np.abs(r - 0.75) < band
    bases = bases[keep]
    lx = np.arange(b + 1, dtype=np.float64)
    off = np.stack(np.meshgrid(lx, lx, lx, indexing="ij"), -1).reshape(-1, 3)
    pts = (bases[:, None, :] + off[None, :, :]) * h - 1.0
    vals = np.linalg.norm(pts, axis=2) - 0.75
    return (
        np.ascontiguousarray(vals.reshape(-1, b + 1, b + 1, b + 1).astype(np.float32)),
        np.ascontiguousarray(bases.astype(np.int32)),
    )


def run_once(lib, vals, bases, N, b, flips, chunks: int):
    handle = lib.mt_create(
        ctypes.c_int64(N),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(vals.shape[0]),
    )
    a = vals.shape[0]
    step = -(-a // chunks)
    t0 = time.perf_counter()
    for lo in range(0, a, step):
        hi = min(a, lo + step)
        lib.mt_add_blocks(
            handle,
            vals[lo:hi].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            bases[lo:hi].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(hi - lo),
            ctypes.c_int32(b),
        )
    t_add = time.perf_counter() - t0
    ov = ctypes.POINTER(ctypes.c_float)()
    of = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    lib.mt_finish_view(handle, ctypes.byref(ov), ctypes.byref(nv), ctypes.byref(of), ctypes.byref(nf))
    out = (t_add, int(nv.value), int(nf.value))
    lib.mt_destroy(handle)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chunks", type=int, default=3, help="feed blocks in this many slabs (streaming shape)")
    args = ap.parse_args()

    lib = load_native()
    if lib is None:
        print(json.dumps({"error": "native lib unavailable"}))
        return 1
    # load_native() already declares every mt_* signature
    b = 4
    vals, bases = make_shell_blocks(args.n, b)
    flips = np.ascontiguousarray(_FLIP_TABLE.astype(np.uint8))

    times = []
    nv = nf = 0
    for _ in range(args.reps):
        t, nv, nf = run_once(lib, vals, bases, args.n, b, flips, args.chunks)
        times.append(t)
    times.sort()
    print(
        json.dumps(
            {
                "n": args.n,
                "blocks": int(vals.shape[0]),
                "verts": nv,
                "faces": nf,
                "t_add_min": round(times[0], 4),
                "t_add_median": round(times[len(times) // 2], 4),
                "blocks_per_s": round(vals.shape[0] / times[len(times) // 2]),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
