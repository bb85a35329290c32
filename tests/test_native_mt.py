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


@needs_native
def test_native_packed_decode_matches_numpy():
    """C++ msd_decode_packed == the numpy reference, bitwise (including
    -0.0 signs), across sign densities and edge rows.

    The v2 wire layout under test is _encode_compact_body's (mesh.py):
    16-byte SIGN bitmap per row, dense u8 magnitude stream over the row's
    NEEDED corners (incident to a sign change within the clipped 3^3
    window) in row-major order — the needed set never ships; both decoders
    re-derive it from the signs.
    """
    from msd_tpu.mesh import _decode_packed_host, _packed_needed_mask

    lib = load_native()
    if not hasattr(lib, "msd_decode_packed"):
        pytest.skip("codec.cpp not in this native build")
    rng = np.random.default_rng(7)
    pts, q = 125, 0.0123
    for K, density in [(1, 0.0), (3, 1.0), (257, 0.31), (1000, 0.93), (64, 0.02)]:
        sign = rng.random((K, pts)) < density
        needed = _packed_needed_mask(sign)
        mags = rng.integers(0, 256, (K, pts)).astype(np.uint8)[needed]

        def packbits125(bits):
            bp = np.zeros((K, 128), np.uint8)
            bp[:, :pts] = bits
            return np.packbits(bp, axis=1, bitorder="little")

        bitmaps = packbits125(sign)
        # reference decode straight from the definitions
        ref = np.full((K, pts), q * np.float32(255.0), np.float32)
        ref[needed] = mags.astype(np.float32) * q
        ref = np.where(sign, -ref, ref)

        out = _decode_packed_host(bitmaps, mags, K, q)
        assert np.array_equal(ref, out)
        assert np.array_equal(np.signbit(ref), np.signbit(out))

    # stream-consistency check: shipping too few magnitudes must raise
    with pytest.raises(ValueError):
        _decode_packed_host(bitmaps, mags[:-1], K, q)


def test_packed_needed_mask_matches_window_adjacency():
    """The numpy dilation (and thus the C++ bit dilation tested above)
    must agree with the ENCODER's clipped 3^3 window-adjacency matmul for
    every corner, including faces/edges of the lattice."""
    from msd_tpu.mesh import _packed_needed_mask

    rng = np.random.default_rng(11)
    sign = rng.random((500, 125)) < rng.uniform(0.05, 0.95, (500, 1))
    # independent oracle: the encoder's Chebyshev<=1 clipped adjacency
    # (mesh.py _window_adj) built from first principles
    coords = np.stack(
        np.meshgrid(np.arange(5), np.arange(5), np.arange(5), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    adj = (
        np.abs(coords[:, None, :] - coords[None, :, :]).max(axis=-1) <= 1
    ).astype(np.float32)
    wsize = adj.sum(axis=0)
    s = sign.astype(np.float32) @ adj
    ref = (s > 0.5) & (s < wsize - 0.5)
    np.testing.assert_array_equal(_packed_needed_mask(sign), ref)


def test_blocks_larger_than_rowmask_take_numpy_path():
    """Block sizes past the native row-mask width (b+1 > 64) must produce
    real geometry via the numpy fallback, not the silent empty mesh the
    C++ guard would return."""
    from msd_tpu.ops.marching_cubes import marching_tetrahedra_blocks

    b = 65
    n1 = b + 1
    N = n1  # one block covering the whole grid
    axis = np.linspace(-1, 1, N, dtype=np.float32)
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    sdf = np.sqrt(gx**2 + gy**2 + gz**2) - 0.6
    verts, faces = marching_tetrahedra_blocks(
        sdf[None], np.zeros((1, 3), np.int64), N,
        level=0.0, spacing=(2.0 / (N - 1),) * 3, origin=(-1.0, -1.0, -1.0),
    )
    assert len(verts) > 1000 and len(faces) > 1000
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 0.6) < 0.02
