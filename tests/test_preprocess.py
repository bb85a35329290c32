"""Preprocessing (mesh -> SDF samples) validated against analytic SDFs."""

import numpy as np
import pytest

from msd_tpu.preprocess import knn_sign_vote, preprocess_mesh
from msd_tpu.preprocess.mesh_to_sdf import sample_visible_surface
from conftest import make_sphere_mesh


def test_knn_sign_vote_sphere(rng):
    r = 0.6
    v, f = make_sphere_mesh(radius=r)
    from msd_tpu.preprocess import sample_surface_points

    surf, norms = sample_surface_points(v, f, 20000, rng)
    # queries at known signed distances
    dirs = rng.normal(size=(500, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radii = rng.uniform(0.2, 0.95, 500).astype(np.float32)
    queries = (dirs * radii[:, None]).astype(np.float32)
    true_sdf = radii - r

    sdf, keep = knn_sign_vote(queries, surf, norms, q_chunk=512, s_tile=4096)
    assert keep.mean() > 0.95  # clean sphere: almost no rejections
    got = sdf[keep]
    want = true_sdf[keep]
    assert ((got > 0) == (want > 0)).mean() > 0.99
    # magnitudes approximate |true sdf| (surface sampling resolution limits)
    np.testing.assert_allclose(got, want, atol=0.02)


def test_knn_sign_vote_single_vote(rng):
    """k=1 must work on the host KD-tree path (cKDTree.query drops the
    k axis for k=1; the device path keeps it)."""
    v, f = make_sphere_mesh(radius=0.6)
    from msd_tpu.preprocess import sample_surface_points

    surf, norms = sample_surface_points(v, f, 5000, rng)
    queries = rng.uniform(-0.9, 0.9, size=(200, 3)).astype(np.float32)
    sdf, keep = knn_sign_vote(queries, surf, norms, num_votes=1)
    assert keep.all()  # a single vote is never split
    true_sdf = np.linalg.norm(queries, axis=1) - 0.6
    assert (((sdf > 0) == (true_sdf > 0)).mean()) > 0.97


def test_preprocess_mesh_end_to_end(rng):
    r = 0.5
    v, f = make_sphere_mesh(radius=r)
    pos, neg, info = preprocess_mesh(v, f, num_samples=20000, surface_vote_points=20000, seed=1)
    assert info["rejected_fraction"] < 0.1
    total = len(pos) + len(neg)
    assert total > 15000
    # pos rows have sdf >= 0, neg < 0
    assert (pos[:, 3] >= 0).all() and (neg[:, 3] < 0).all()
    # verify signs against the analytic sphere
    for arr, sgn in ((pos, 1), (neg, -1)):
        d = np.linalg.norm(arr[:, :3], axis=1) - r
        agree = ((d > 0) == (sgn > 0)).mean()
        assert agree > 0.97, (sgn, agree)
    # near-surface concentration: most samples within 3*sqrt(variance)
    all_sdf = np.concatenate([pos[:, 3], neg[:, 3]])
    assert (np.abs(all_sdf) < 3 * np.sqrt(0.005)).mean() > 0.7


def test_preprocess_inward_winding_flipped(rng):
    """A consistently wound but INWARD mesh (negative signed volume) is
    flipped globally before the orientation-sensitive render pass, so the
    visibility stats and SDF signs match the outward-wound mesh."""
    r = 0.5
    v, f = make_sphere_mesh(radius=r)
    from msd_tpu.preprocess.mesh_to_sdf import signed_volume

    f_out = f if signed_volume(v, f) > 0 else f[:, ::-1]
    f_in = f_out[:, ::-1]
    kw = dict(num_samples=8000, surface_vote_points=8000, seed=3)
    pos_o, neg_o, info_o = preprocess_mesh(v, f_out, **kw)
    pos_i, neg_i, info_i = preprocess_mesh(v, f_in, **kw)
    assert info_i["quality"].get("global_flip") is True
    assert "global_flip" not in info_o["quality"]
    # identical RNG stream after the flip: byte-identical samples
    np.testing.assert_array_equal(pos_o, pos_i)
    np.testing.assert_array_equal(neg_o, neg_i)
    assert not info_i["rejected"]
    for arr, sgn in ((pos_i, 1), (neg_i, -1)):
        d = np.linalg.norm(arr[:, :3], axis=1) - r
        assert (((d > 0) == (sgn > 0)).mean()) > 0.97


def test_preprocess_test_mode(rng):
    v, f = make_sphere_mesh(radius=0.5)
    pos, neg, info = preprocess_mesh(
        v, f, num_samples=300000, test=True, surface_vote_points=10000, seed=2
    )
    # test mode caps at 250k queries
    assert info["num_queries"] == 250000


def test_sample_visible_surface_normalization():
    v, f = make_sphere_mesh(radius=0.5, center=(1.0, 2.0, 3.0))
    pts, offset, scale = sample_visible_surface(v, f, num_points=2000)
    # points stay in the original frame
    np.testing.assert_allclose(pts.mean(axis=0), [1, 2, 3], atol=0.05)
    # applying (p + offset) * scale maps into the unit sphere
    normalized = (pts + offset) * scale
    assert np.linalg.norm(normalized, axis=1).max() <= 1.0
    assert scale == pytest.approx(1.0 / (0.5 * 1.03), rel=1e-3)


@pytest.mark.slow
def test_trainable_from_preprocessed(tmp_path):
    """Closing the loop: preprocess -> train a few steps -> loss drops."""
    import json

    import msd_tpu.workspace as ws
    from msd_tpu.train.stage1 import Stage1Trainer

    names = []
    for i, r in enumerate([0.4, 0.6]):
        v, f = make_sphere_mesh(radius=r)
        pos, neg, _ = preprocess_mesh(v, f, num_samples=8000, surface_vote_points=8000, seed=i)
        np.savez(str(tmp_path / f"s{i}.npz"), pos=pos, neg=neg)
        names.append(f"s{i}.obj")
    split = str(tmp_path / "split.json")
    json.dump(names, open(split, "w"))
    specs = {
        "Description": "pp",
        "DataSource": str(tmp_path),
        "TrainSplit": split,
        "TestSplit": split,
        "NetworkArch": "deep_sdf_decoder",
        "NetworkSpecs": {"dims": [32, 32], "latent_in": [1], "weight_norm": True, "norm_layers": []},
        "CodeLength": 4,
        "NumEpochs": 20,
        "SnapshotFrequency": 20,
        "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 0.002, "Interval": 500, "Factor": 0.5},
            {"Type": "Step", "Initial": 0.01, "Interval": 500, "Factor": 0.5},
        ],
        "SamplesPerScene": 512,
        "ScenesPerBatch": 2,
        "ClampingDistance": 0.1,
    }
    exp = str(tmp_path / "exp")
    ws.save_experiment_specifications(exp, specs)
    tr = Stage1Trainer(exp)
    first = tr.train_epoch(1)
    for e in range(2, 25):
        last = tr.train_epoch(e)
    assert last["sdf"] < first["sdf"] * 0.7


def test_mesh_quality_and_repair(rng):
    """Broken meshes are flagged by the quality gate (ref rejection ratios,
    PreprocessMesh.cpp:496-512) and winding repair recovers correct signs."""
    from msd_tpu.preprocess.mesh_to_sdf import (
        mesh_quality,
        preprocess_mesh,
        repair_mesh_winding,
        signed_volume,
    )

    r = 0.5
    v, f = make_sphere_mesh(radius=r)
    q = mesh_quality(v, f)
    assert not q["rejected"]
    assert q["inconsistent_winding_ratio"] == 0.0
    # the UV-sphere fixture has a small unstitched seam — below threshold
    assert q["boundary_edge_ratio"] < 0.02

    # flip 20% of faces -> inconsistent winding must be flagged
    f_broken = f.copy()
    flip = rng.random(len(f)) < 0.2
    f_broken[flip] = f_broken[flip][:, ::-1]
    qb = mesh_quality(v, f_broken)
    assert qb["inconsistent_winding_ratio"] > 0.02
    assert qb["rejected"]

    # repair restores consistent outward winding
    f_fixed, n_flipped = repair_mesh_winding(v, f_broken)
    assert n_flipped > 0
    qf = mesh_quality(v, f_fixed)
    assert qf["inconsistent_winding_ratio"] == 0.0
    assert signed_volume(v, f_fixed) > 0

    # end-to-end: broken mesh is flagged AND (thanks to repair) the signs
    # are still correct against the analytic sphere
    pos, neg, info = preprocess_mesh(
        v, f_broken, num_samples=20000, surface_vote_points=20000, seed=3
    )
    assert info["rejected"] is True
    assert info["quality"]["repaired_faces"] > 0
    for arr, sgn in ((pos, 1), (neg, -1)):
        d = np.linalg.norm(arr[:, :3], axis=1) - r
        agree = ((d > 0) == (sgn > 0)).mean()
        assert agree > 0.95, (sgn, agree)


def test_mesh_quality_hole(rng):
    """A mesh with a hole (non-watertight) is reported via the
    boundary-edge ratio."""
    from msd_tpu.preprocess.mesh_to_sdf import mesh_quality

    v, f = make_sphere_mesh(radius=0.5)
    base = mesh_quality(v, f)["boundary_edge_ratio"]
    # delete 5% of faces -> boundary edges appear beyond the fixture's seam
    keep = rng.random(len(f)) > 0.05
    q = mesh_quality(v, f[keep])
    assert q["boundary_edge_ratio"] > base + 0.02
    assert q["rejected"]


def test_render_visibility_excludes_hidden_faces():
    """An occluded interior shell must not receive surface samples in
    render mode (the reference's multi-view visibility semantics,
    ref: PreprocessMesh.cpp:443-494)."""
    import pytest

    from conftest import make_sphere_mesh
    from msd_tpu.native import load_native
    from msd_tpu.preprocess.mesh_to_sdf import preprocess_mesh

    if load_native() is None:
        pytest.skip("no C++ toolchain")
    vo, fo = make_sphere_mesh(32, 64, radius=0.7)
    vi, fi = make_sphere_mesh(16, 32, radius=0.25)
    # outward winding for the vote normals (conftest spheres wind inward)
    fo, fi = fo[:, ::-1], fi[:, ::-1]
    verts = np.concatenate([vo, vi])
    faces = np.concatenate([fo, fi + len(vo)])

    pos, neg, info = preprocess_mesh(
        verts, faces, num_samples=20000, visibility="render", repair=False
    )
    assert info["quality"]["render_visible_fraction"] < 0.8  # inner shell culled
    near = np.concatenate([pos, neg])
    r = np.linalg.norm(near[:, :3], axis=1)
    # near-surface samples hug the OUTER sphere only: nothing lands in the
    # band around the hidden inner shell
    inner_band = ((r > 0.15) & (r < 0.35)).mean()
    assert inner_band < 0.01, inner_band

    # watertight mode on the same mesh does sample the inner shell
    pos_w, neg_w, _ = preprocess_mesh(
        verts, faces, num_samples=20000, visibility="watertight", repair=False
    )
    near_w = np.concatenate([pos_w, neg_w])
    r_w = np.linalg.norm(near_w[:, :3], axis=1)
    assert ((r_w > 0.15) & (r_w < 0.35)).mean() > 0.05


def test_pyrender_helper_color_depth():
    """pyrender_helper returns (color, depth) arrays with the reference's
    camera rig (ref: deep_sdf/plotting.py:127-146)."""
    import pytest

    from conftest import make_sphere_mesh
    from msd_tpu.native import load_native

    if load_native() is None:
        pytest.skip("no C++ toolchain")
    from msd_tpu.plotting import pyrender_helper

    v, f = make_sphere_mesh(32, 64, radius=0.7)
    color, depth = pyrender_helper((v, f), alpha=0.2, beta=0.3)
    assert color.shape == (1000, 1000, 3) and color.dtype == np.uint8
    assert depth.shape == (1000, 1000) and depth.dtype == np.float32
    hit = depth > 0
    assert 0.05 < hit.mean() < 0.5  # sphere silhouette, not empty or full-frame
    # camera sits 2 units out; nearest sphere point is at depth 2-0.7
    assert abs(depth[hit].min() - 1.3) < 0.02
    assert (color[hit].sum(axis=1) > 0).all()


def test_knn_sign_vote_multi_device_byte_identical(rng):
    """Query-axis sharding over the 8-device mesh must be byte-identical to
    the single-device dispatch (SURVEY §2.6 multi-chip preprocessing)."""
    import jax

    v, f = make_sphere_mesh(radius=0.6)
    from msd_tpu.preprocess import sample_surface_points

    surf, norms = sample_surface_points(v, f, 4000, rng)
    queries = rng.uniform(-0.9, 0.9, size=(3000, 3)).astype(np.float32)

    kw = dict(num_votes=11, q_chunk=256, s_tile=1024, force_device=True)
    sdf1, keep1 = knn_sign_vote(queries, surf, norms, devices=jax.devices()[:1], **kw)
    sdf8, keep8 = knn_sign_vote(queries, surf, norms, devices=jax.devices(), **kw)
    assert len(jax.devices()) == 8
    assert sdf1.tobytes() == sdf8.tobytes()
    np.testing.assert_array_equal(keep1, keep8)


@pytest.mark.slow
def test_preprocess_multi_device_npz_identical(rng):
    """preprocess_mesh fanned over all 8 virtual devices produces a
    byte-identical {pos,neg} npz payload vs one device."""
    import jax

    v, f = make_sphere_mesh(radius=0.5)
    kw = dict(num_samples=6000, surface_vote_points=6000, seed=3,
              knn_force_device=True)
    pos1, neg1, _ = preprocess_mesh(v, f, knn_devices=jax.devices()[:1], **kw)
    pos8, neg8, _ = preprocess_mesh(v, f, knn_devices=jax.devices(), **kw)
    assert pos1.tobytes() == pos8.tobytes()
    assert neg1.tobytes() == neg8.tobytes()
