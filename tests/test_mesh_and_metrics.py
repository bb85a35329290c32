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
