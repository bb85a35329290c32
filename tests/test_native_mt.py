"""Native C++ marching tetrahedra vs the numpy implementation."""

import numpy as np
import pytest

from msd_tpu.native import load_native
from msd_tpu.ops.marching_cubes import (
    marching_tetrahedra,
    marching_tetrahedra_blocks,
)

needs_native = pytest.mark.skipif(load_native() is None, reason="no C++ toolchain")


def _sphere_blocks(n=65, b=4, r=0.6):
    """Full tiling of the grid into blocks (so results == dense MT)."""
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    sdf = (np.sqrt(X**2 + Y**2 + Z**2) - r).astype(np.float32)
    nb = (n - 1) // b
    bases = []
    vals = []
    for i in range(nb):
        for j in range(nb):
            for k in range(nb):
                base = (i * b, j * b, k * b)
                bases.append(base)
                vals.append(sdf[base[0] : base[0] + b + 1, base[1] : base[1] + b + 1, base[2] : base[2] + b + 1])
    return sdf, np.stack(vals), np.asarray(bases, np.int64)


@needs_native
def test_native_matches_numpy_blocks():
    n, b = 65, 4
    h = 2.0 / (n - 1)
    sdf, vals, bases = _sphere_blocks(n, b)
    v_np, f_np = marching_tetrahedra_blocks(
        vals, bases, n, 0.0, (h,) * 3, (-1, -1, -1), use_native=False
    )
    v_cc, f_cc = marching_tetrahedra_blocks(
        vals, bases, n, 0.0, (h,) * 3, (-1, -1, -1), use_native=True
    )
    assert len(v_cc) == len(v_np)
    assert len(f_cc) == len(f_np)
    # same vertex set (ordering differs)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(v_np).query(v_cc)
    assert d.max() < 1e-5
    # identical topology invariants: watertight + outward orientation
    edges = np.sort(np.concatenate([f_cc[:, [0, 1]], f_cc[:, [1, 2]], f_cc[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    fn = np.cross(v_cc[f_cc[:, 1]] - v_cc[f_cc[:, 0]], v_cc[f_cc[:, 2]] - v_cc[f_cc[:, 0]])
    centroids = v_cc[f_cc].mean(axis=1)
    assert (np.einsum("ij,ij->i", fn, centroids) > 0).mean() == 1.0


@needs_native
def test_native_nonzero_level_and_radii():
    n, b = 49, 4
    h = 2.0 / (n - 1)
    for r in (0.3, 0.75):
        sdf, vals, bases = _sphere_blocks(n, b, r)
        v, f = marching_tetrahedra_blocks(vals, bases, n, 0.0, (h,) * 3, (-1, -1, -1))
        radii = np.linalg.norm(v, axis=1)
        np.testing.assert_allclose(radii.mean(), r, atol=3e-3)


@pytest.mark.slow
@needs_native
def test_native_speedup():
    import time

    n, b = 129, 4
    h = 2.0 / (n - 1)
    sdf, vals, bases = _sphere_blocks(n, b, 0.7)
    t0 = time.time()
    marching_tetrahedra_blocks(vals, bases, n, 0.0, (h,) * 3, (-1, -1, -1), use_native=False)
    t_np = time.time() - t0
    t0 = time.time()
    marching_tetrahedra_blocks(vals, bases, n, 0.0, (h,) * 3, (-1, -1, -1), use_native=True)
    t_cc = time.time() - t0
    # C++ should be solidly faster (typically ~10x; require 2x for CI noise)
    assert t_cc < t_np / 2, (t_cc, t_np)
