import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msd_tpu.metrics import compute_metric
from msd_tpu.metrics.chamfer import compute_chamfer, compute_mesh_chamfer
from msd_tpu.metrics.emd import compute_emd
from msd_tpu.ops.marching_cubes import marching_tetrahedra
from msd_tpu.ops.sampling import sample_mesh_surface, bounding_cube_normalization


def sphere_grid(n=64, r=0.6):
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - r


def test_marching_tetrahedra_sphere():
    n, r = 64, 0.6
    sdf = sphere_grid(n, r)
    h = 2.0 / (n - 1)
    verts, faces = marching_tetrahedra(sdf, 0.0, (h, h, h), (-1, -1, -1))
    assert len(verts) > 1000 and len(faces) > 1000
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), r, atol=2e-3)
    assert np.abs(radii - r).max() < h  # vertices within one voxel of surface
    # watertight: every edge shared by exactly 2 faces
    edges = np.sort(
        np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), axis=1
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    # outward orientation: face normal . centroid > 0 for a sphere
    fn = np.cross(
        verts[faces[:, 1]] - verts[faces[:, 0]], verts[faces[:, 2]] - verts[faces[:, 0]]
    )
    centroids = verts[faces].mean(axis=1)
    frac_outward = (np.einsum("ij,ij->i", fn, centroids) > 0).mean()
    assert frac_outward > 0.99


def test_marching_tetrahedra_no_surface():
    sdf = np.ones((8, 8, 8))
    with pytest.raises(ValueError):
        marching_tetrahedra(sdf)


def test_chamfer_identity_and_offset(rng):
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    cd, dists = compute_chamfer(pts, pts)
    assert cd == 0.0
    shifted = pts + np.array([0.05, 0, 0], np.float32)
    cd2, _ = compute_chamfer(pts, shifted)
    assert 0 < cd2 <= 2 * 0.05**2 + 1e-9


def test_mesh_chamfer_sphere_vs_extracted(sphere_mesh):
    gt_v, gt_f = sphere_mesh  # analytic UV sphere r=0.7
    sdf = sphere_grid(80, 0.7)
    h = 2.0 / 79
    mv, mf = marching_tetrahedra(sdf, 0.0, (h, h, h), (-1, -1, -1))
    # squared-distance metric; discretization error ~ (h/2)^2 = 1.6e-4
    cd, dists = compute_mesh_chamfer((gt_v, gt_f), (mv, mf))
    assert cd < 3e-4, cd
    assert dists.shape[0] == 60000
    # curvature-weighted variant also runs
    cd2, _ = compute_mesh_chamfer((gt_v, gt_f), (mv, mf), curvature_sampling=0.5)
    assert cd2 < 3e-4


def test_normal_consistency_metric(sphere_mesh):
    v, f = sphere_mesh
    nc = compute_metric(gen_mesh=(v, f), metric="normal_consistency")
    assert 0 <= nc < 0.05  # smooth sphere: neighboring normals nearly parallel


def test_emd_small(rng):
    a = rng.normal(size=(64, 3))
    assert compute_emd(a, a) == pytest.approx(0.0, abs=1e-9)
    b = a + [0.1, 0, 0]
    assert compute_emd(a, b) == pytest.approx(0.1, rel=1e-5)


def test_surface_sampling_weights(sphere_mesh, rng):
    v, f = sphere_mesh
    pts, normals, fidx = sample_mesh_surface(v, f, 5000, rng, return_normals=True)
    assert pts.shape == (5000, 3)
    radii = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.7, atol=5e-3)
    # normals are unit and roughly radial
    assert np.allclose(np.linalg.norm(normals, axis=1), 1, atol=1e-4)
    cos = np.abs(np.einsum("ij,ij->i", normals, pts / radii[:, None]))
    assert cos.mean() > 0.99


def test_bounding_cube_normalization(rng):
    v = rng.normal(size=(100, 3)).astype(np.float32) * 3 + 5
    offset, scale = bounding_cube_normalization(v)
    vn = (v + offset) * scale
    assert np.linalg.norm(vn, axis=1).max() <= 1.0 + 1e-6


def test_convert_sdf_samples_to_ply(tmp_path):
    """Public grid->ply helper (ref: deep_sdf/mesh.py:96-165)."""
    from msd_tpu.data.mesh_io import load_ply
    from msd_tpu.mesh import convert_sdf_samples_to_ply

    N = 33
    g = np.linspace(-1, 1, N)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(x**2 + y**2 + z**2) - 0.5
    out = str(tmp_path / "sphere.ply")
    ok = convert_sdf_samples_to_ply(sdf.astype(np.float32), [-1, -1, -1], 2.0 / (N - 1), out)
    assert ok and os.path.isfile(out)
    v, f = load_ply(out)
    r = np.linalg.norm(v, axis=1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.01)
    # empty surface -> False, reference behavior
    assert convert_sdf_samples_to_ply(np.ones((9, 9, 9), np.float32), [-1, -1, -1], 0.25,
                                      str(tmp_path / "none.ply")) is False


def test_find_mesh_and_surface_points(tmp_path):
    """find_mesh_in_directory + get_surface_points (ref: deep_sdf/data.py)."""
    import pytest as _pytest

    from msd_tpu.data.mesh_io import (
        MultipleMeshFileError, NoMeshFileError, find_mesh_in_directory,
        get_surface_points, save_obj,
    )

    with _pytest.raises(NoMeshFileError):
        find_mesh_in_directory(str(tmp_path))
    g = np.linspace(-1, 1, 17)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(x**2 + y**2 + z**2) - 0.6
    from msd_tpu.ops.marching_cubes import marching_tetrahedra

    v, f = marching_tetrahedra(sdf.astype(np.float32), level=0.0, spacing=(0.125,) * 3,
                               origin=(-1.0, -1.0, -1.0))
    save_obj(str(tmp_path / "a.obj"), v, f)
    assert find_mesh_in_directory(str(tmp_path)).endswith("a.obj")
    pts = get_surface_points(str(tmp_path / "a.obj"), num_points=512)
    assert pts.shape == (512, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1).mean(), 0.6, atol=0.03)
    save_obj(str(tmp_path / "b.obj"), v, f)
    with _pytest.raises(MultipleMeshFileError):
        find_mesh_in_directory(str(tmp_path))
