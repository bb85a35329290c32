"""Iso-surface extraction from a dense SDF grid (host-side, vectorized).

Replaces the reference's skimage.measure.marching_cubes (lewiner) call
(ref: deep_sdf/mesh.py:119-121) with a native **marching-tetrahedra**
implementation: each active grid cell is split into 6 tetrahedra; every
tetrahedron crossing the iso-level emits 1-2 triangles with vertices
linearly interpolated along its edges. Marching tetrahedra is table-free
and unambiguous (no MC case ambiguities), produces a watertight surface on
watertight input fields, and is Chamfer-equivalent to MC at equal
resolution (validated against analytic SDFs in tests/test_mesh.py).

Only *active* cells (sign change among the 8 corners) are processed, so
cost is O(surface area), not O(N^3).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# Cube corner offsets, index = 4x + 2y + z
_CORNERS = np.array(
    [
        [0, 0, 0],  # 0
        [0, 0, 1],  # 1
        [0, 1, 0],  # 2
        [0, 1, 1],  # 3
        [1, 0, 0],  # 4
        [1, 0, 1],  # 5
        [1, 1, 0],  # 6
        [1, 1, 1],  # 7
    ],
    dtype=np.int64,
)

# 6-tetrahedra decomposition of the cube around the 0-7 diagonal.
# Each consecutive pair of tets shares a face; the set tiles the cube.
_TETS = np.array(
    [
        [0, 4, 5, 7],
        [0, 5, 1, 7],
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
    ],
    dtype=np.int64,
)


def _interp_vertices(grid_ids_a, grid_ids_b, sdf_a, sdf_b, level):
    """Parametric position t of the iso-crossing on each edge (a, b)."""
    denom = sdf_b - sdf_a
    denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    t = (level - sdf_a) / denom
    return np.clip(t, 0.0, 1.0)


def marching_tetrahedra(
    sdf_grid: np.ndarray,
    level: float = 0.0,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of ``sdf_grid`` at ``level``.

    Args:
        sdf_grid: [Nx, Ny, Nz] scalar field.
        level: iso-value.
        spacing: grid spacing per axis.
        origin: world position of grid index (0, 0, 0).

    Returns:
        (vertices [V, 3] float32, faces [F, 3] int32). Faces are oriented so
        normals point toward increasing SDF (outside).

    Raises:
        ValueError if the surface does not intersect the grid (mirrors
        skimage's behavior relied on by the reference, deep_sdf/mesh.py:118-124).
    """
    sdf = np.asarray(sdf_grid, np.float64)
    nx, ny, nz = sdf.shape
    if min(nx, ny, nz) < 2:
        raise ValueError("grid too small")
    inside = sdf < level

    # ---- active cells: any corner-sign disagreement ----
    c = inside
    cell_any = np.zeros((nx - 1, ny - 1, nz - 1), dtype=bool)
    cell_all = np.ones((nx - 1, ny - 1, nz - 1), dtype=bool)
    for dx, dy, dz in _CORNERS:
        sub = c[dx : nx - 1 + dx, dy : ny - 1 + dy, dz : nz - 1 + dz]
        cell_any |= sub
        cell_all &= sub
    active = cell_any & ~cell_all
    ai, aj, ak = np.nonzero(active)
    if ai.size == 0:
        raise ValueError("Surface level must be within volume data range.")

    # ---- gather the 8 corner ids + sdf per active cell ----
    # global grid vertex id = (i * ny + j) * nz + k
    corner_ids = np.empty((ai.size, 8), dtype=np.int64)
    corner_sdf = np.empty((ai.size, 8), dtype=np.float64)
    for ci, (dx, dy, dz) in enumerate(_CORNERS):
        ii, jj, kk = ai + dx, aj + dy, ak + dz
        corner_ids[:, ci] = (ii * ny + jj) * nz + kk
        corner_sdf[:, ci] = sdf[ii, jj, kk]

    # ---- expand to tetrahedra: [M, 6, 4] ----
    tet_ids = corner_ids[:, _TETS]  # [M, 6, 4]
    tet_sdf = corner_sdf[:, _TETS]
    tet_ids = tet_ids.reshape(-1, 4)
    tet_sdf = tet_sdf.reshape(-1, 4)
    tet_in = tet_sdf < level
    n_in = tet_in.sum(axis=1)

    tri_edge_a = []  # global vertex id of edge endpoint a
    tri_edge_b = []

    # For each configuration, find the local index/indices of inside corners.
    # Edge convention: tri_edge_a rows are INSIDE endpoints, tri_edge_b rows
    # are OUTSIDE endpoints (used below for face orientation).
    # Case: exactly one inside corner v -> one triangle on the 3 edges from v.
    for v in range(4):
        others = [o for o in range(4) if o != v]
        mask1 = (n_in == 1) & tet_in[:, v]
        if mask1.any():
            ids = tet_ids[mask1]
            a = np.stack([ids[:, v]] * 3, axis=1)
            b = np.stack([ids[:, o] for o in others], axis=1)
            tri_edge_a.append(a)
            tri_edge_b.append(b)
        # Case: exactly one OUTSIDE corner v -> one triangle (3 inside).
        mask3 = (n_in == 3) & ~tet_in[:, v]
        if mask3.any():
            ids = tet_ids[mask3]
            a = np.stack([ids[:, o] for o in others], axis=1)
            b = np.stack([ids[:, v]] * 3, axis=1)
            tri_edge_a.append(a)
            tri_edge_b.append(b)

    # Case: two inside / two outside -> quad = 2 triangles.
    import itertools

    for pair in itertools.combinations(range(4), 2):
        v0, v1 = pair
        others = [o for o in range(4) if o not in pair]
        o0, o1 = others
        mask2 = (n_in == 2) & tet_in[:, v0] & tet_in[:, v1]
        if mask2.any():
            ids = tet_ids[mask2]
            # crossing edges: (v0,o0), (v0,o1), (v1,o0), (v1,o1)
            # quad vertices in cyclic order: (v0,o0), (v0,o1), (v1,o1), (v1,o0)
            qa = [ids[:, v0], ids[:, v0], ids[:, v1], ids[:, v1]]
            qb = [ids[:, o0], ids[:, o1], ids[:, o1], ids[:, o0]]
            tri_edge_a.append(np.stack([qa[0], qa[1], qa[2]], axis=1))
            tri_edge_b.append(np.stack([qb[0], qb[1], qb[2]], axis=1))
            tri_edge_a.append(np.stack([qa[0], qa[2], qa[3]], axis=1))
            tri_edge_b.append(np.stack([qb[0], qb[2], qb[3]], axis=1))

    if not tri_edge_a:
        raise ValueError("Surface level must be within volume data range.")

    ea = np.concatenate(tri_edge_a, axis=0)  # [T, 3] inside-endpoint ids
    eb = np.concatenate(tri_edge_b, axis=0)  # [T, 3] outside-endpoint ids

    # ---- dedupe iso-vertices by undirected grid edge ----
    lo = np.minimum(ea, eb)
    hi = np.maximum(ea, eb)
    edge_key = lo.astype(np.int64) * (nx * ny * nz) + hi
    uniq_keys, faces_flat = np.unique(edge_key, return_inverse=True)
    faces = faces_flat.reshape(-1, 3).astype(np.int32)

    u_lo = (uniq_keys // (nx * ny * nz)).astype(np.int64)
    u_hi = (uniq_keys % (nx * ny * nz)).astype(np.int64)

    def id_to_xyz(vid):
        k = vid % nz
        j = (vid // nz) % ny
        i = vid // (nz * ny)
        return np.stack([i, j, k], axis=1).astype(np.float64)

    sdf_flat = sdf.reshape(-1)
    t = _interp_vertices(u_lo, u_hi, sdf_flat[u_lo], sdf_flat[u_hi], level)
    p = id_to_xyz(u_lo) + t[:, None] * (id_to_xyz(u_hi) - id_to_xyz(u_lo))
    verts = p * np.asarray(spacing, np.float64)[None, :] + np.asarray(origin, np.float64)[None, :]

    # ---- orient faces: normal should point toward positive SDF ----
    # For every triangle, each vertex interpolates between an inside (lo/hi)
    # endpoint; orient by checking against the gradient proxy: the vector
    # from the inside endpoint centroid to the outside endpoint centroid.
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    normal = np.cross(v1 - v0, v2 - v0)
    in_pts = (id_to_xyz(ea[:, 0]) + id_to_xyz(ea[:, 1]) + id_to_xyz(ea[:, 2])) / 3.0
    out_pts = (id_to_xyz(eb[:, 0]) + id_to_xyz(eb[:, 1]) + id_to_xyz(eb[:, 2])) / 3.0
    outward = (out_pts - in_pts) * np.asarray(spacing, np.float64)[None, :]
    # ea rows hold inside endpoints when emitted from inside-first cases;
    # for the generic check use sdf: inside endpoint has smaller sdf.
    flip = np.einsum("ij,ij->i", normal, outward) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]

    # drop degenerate faces (repeated vertex ids)
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[good]

    return verts.astype(np.float32), faces
