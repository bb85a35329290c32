import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msd_tpu.data import mesh_io
from msd_tpu.data.sdf_samples import (
    SdfDataset,
    remove_nans,
    sample_sdf_batch,
    unpack_sdf_samples,
)
from msd_tpu.data.splits import (
    create_split_files,
    get_instance_filenames,
    load_split,
    split_triples,
)
from msd_tpu.lr_schedules import get_learning_rate_schedules


def _write_npz(path, n_pos=100, n_neg=80, seed=0, with_nans=False):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(n_pos, 4)).astype(np.float32)
    pos[:, 3] = np.abs(pos[:, 3])
    neg = rng.normal(size=(n_neg, 4)).astype(np.float32)
    neg[:, 3] = -np.abs(neg[:, 3])
    if with_nans:
        pos[0, 3] = np.nan
        neg[0, 3] = np.nan
    np.savez(path, pos=pos, neg=neg)
    return pos, neg


def test_remove_nans():
    arr = np.ones((5, 4), np.float32)
    arr[2, 3] = np.nan
    out = remove_nans(arr)
    assert out.shape == (4, 4)


def test_flat_and_nested_splits(tmp_path):
    flat = ["a.obj", "b.obj"]
    nested = {"ds": {"cls": ["a.obj", "b.obj"]}}
    assert [t[2] for t in split_triples(flat)] == ["a", "b"]
    assert split_triples(nested) == [("ds", "cls", "a"), ("ds", "cls", "b")]
    files = get_instance_filenames(str(tmp_path), flat)
    assert files[0] == os.path.join(str(tmp_path), "a.npz")
    files = get_instance_filenames(str(tmp_path), nested)
    assert files[0] == os.path.join(str(tmp_path), "ds", "cls", "a.npz")


def test_create_split_files(tmp_path):
    names = [f"shape{i}.obj" for i in range(20)]
    paths = create_split_files(names, str(tmp_path), "toy")
    train = load_split(paths["train"])
    val = load_split(paths["val"])
    test = load_split(paths["test"])
    assert len(train) == 16 and len(val) == 2 and len(test) == 2
    assert set(train + val + test) == set(names)


def test_unpack_sdf_samples_balanced(tmp_path):
    path = str(tmp_path / "s.npz")
    _write_npz(path, with_nans=True)
    out = unpack_sdf_samples(path, subsample=64, rng=np.random.default_rng(1))
    assert out.shape == (64, 4)
    assert (out[:32, 3] >= 0).all() and (out[32:, 3] <= 0).all()
    assert not np.isnan(out).any()


def test_dataset_and_device_sampling(tmp_path):
    ids = []
    for i in range(3):
        _write_npz(str(tmp_path / f"shape{i}.npz"), n_pos=50 + i * 10, n_neg=40 + i, seed=i)
        ids.append(f"shape{i}.obj")
    ds = SdfDataset.from_split(str(tmp_path), ids, subsample=32)
    assert ds.num_scenes == 3
    assert ds.pos.shape[0] == 3 and ds.pos.shape[2] == 4
    key = jax.random.PRNGKey(0)
    batch = ds.sample_batch(jnp.array([0, 2]), key)
    assert batch.shape == (2, 32, 4)
    batch = np.asarray(batch)
    # balanced: first half positive SDF, second half negative
    assert (batch[:, :16, 3] >= 0).all()
    assert (batch[:, 16:, 3] <= 0).all()
    # sampled rows must come from the right scene: check membership
    src = ds.pos[2, : ds.pos_counts[2]]
    for row in batch[1, :16]:
        assert (np.abs(src - row).sum(axis=1) < 1e-6).any()


def test_sample_batch_jittable(tmp_path):
    _write_npz(str(tmp_path / "a.npz"))
    ds = SdfDataset.from_split(str(tmp_path), ["a.obj"], subsample=16)
    pos, pc, neg, nc = ds.device_arrays()
    f = jax.jit(
        lambda idx, key: sample_sdf_batch(pos, pc, neg, nc, idx, 16, key)
    )
    out = f(jnp.array([0]), jax.random.PRNGKey(3))
    assert out.shape == (1, 16, 4)


def test_small_scene_chunklet_sampling(tmp_path):
    """Scenes with fewer rows than the chunklet size must sample their own
    rows (near-uniformly via cyclic padding), never another scene's padding;
    large-scene tail rows must be reachable (ceil-div chunklet count)."""
    # scene 0 tiny (7 pos / 5 neg), scene 1 large with a tail (> default chunk)
    _write_npz(str(tmp_path / "tiny.npz"), n_pos=7, n_neg=5, seed=0)
    _write_npz(str(tmp_path / "big.npz"), n_pos=300, n_neg=290, seed=1)
    ds = SdfDataset.from_split(str(tmp_path), ["tiny.obj", "big.obj"], subsample=64)
    pos, pc, neg, nc = ds.device_arrays()

    seen_tiny = set()
    seen_big_rows = set()
    big_pos = ds.pos[1, : ds.pos_counts[1]]
    tiny_pos = ds.pos[0, : ds.pos_counts[0]]
    for t in range(40):
        batch = np.asarray(
            sample_sdf_batch(pos, pc, neg, nc, jnp.array([0, 1]), 64, jax.random.PRNGKey(t), chunk=128)
        )
        # every drawn tiny-scene row must be one of its 7 real pos rows
        for row in batch[0, :32]:
            d = np.abs(tiny_pos - row).sum(axis=1)
            assert d.min() < 1e-6
            seen_tiny.add(int(np.argmin(d)))
        for row in batch[1, :32]:
            d = np.abs(big_pos - row).sum(axis=1)
            assert d.min() < 1e-6
            seen_big_rows.add(int(np.argmin(d)))
    assert seen_tiny == set(range(7))  # all tiny rows sampled
    # tail rows (beyond the last full 32-row chunklet at count=300) reachable
    assert any(i >= 288 for i in seen_big_rows)


def test_labels_matrix(tmp_path):
    _write_npz(str(tmp_path / "a.npz"))
    _write_npz(str(tmp_path / "b_femur.npz"))
    _write_npz(str(tmp_path / "c.npz"))
    labels = {"a": np.array([1.0, 70.0]), "b": np.array([0.0, 65.0])}
    ds = SdfDataset.from_split(
        str(tmp_path), ["a.obj", "b_femur.obj", "c.obj"], subsample=8, labels=labels
    )
    assert ds.labels.shape == (3, 2)
    np.testing.assert_allclose(ds.labels[0], [1.0, 70.0])
    np.testing.assert_allclose(ds.labels[1], [0.0, 65.0])  # _femur fallback
    assert np.isnan(ds.labels[2]).all()  # NaN fill for missing


def test_mesh_io_roundtrip(tmp_path, sphere_mesh):
    verts, faces = sphere_mesh
    obj_path = str(tmp_path / "m.obj")
    mesh_io.save_obj(obj_path, verts, faces)
    v2, f2 = mesh_io.load_obj(obj_path)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)

    for binary in (True, False):
        ply_path = str(tmp_path / f"m_{binary}.ply")
        mesh_io.save_ply(ply_path, verts, faces, binary=binary)
        v3, f3 = mesh_io.load_ply(ply_path)
        np.testing.assert_allclose(v3, verts, atol=1e-5)
        np.testing.assert_array_equal(f3, faces)

    # point cloud (no faces) — the SurfaceSamples format
    pc_path = str(tmp_path / "pc.ply")
    mesh_io.save_ply(pc_path, verts, None)
    v4, f4 = mesh_io.load_ply(pc_path)
    np.testing.assert_allclose(v4, verts, atol=1e-5)
    assert f4 is None


def test_lr_schedules():
    specs = {
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 0.0005, "Interval": 500, "Factor": 0.5},
            {"Type": "Constant", "Value": 0.001},
        ]
    }
    sched = get_learning_rate_schedules(specs)
    assert sched[0].get_learning_rate(0) == 0.0005
    assert sched[0].get_learning_rate(500) == 0.00025
    assert sched[1].get_learning_rate(123) == 0.001

    warm = get_learning_rate_schedules(
        {"LearningRateSchedule": [{"Type": "Warmup", "Initial": 0.0, "Final": 1.0, "Length": 10}] * 2}
    )[0]
    assert warm.get_learning_rate(5) == pytest.approx(0.5)
    assert warm.get_learning_rate(20) == 1.0

    plateau = get_learning_rate_schedules(
        {
            "LearningRateSchedule": [
                {
                    "Type": "StepOnPlateau",
                    "Initial": 1.0,
                    "Factor": 0.1,
                    "Patience": 3,
                    "Threshold": 0.0,
                    "MinLR": 1e-3,
                }
            ]
            * 2
        }
    )[0]
    # improving loss: no decay
    assert plateau.get_learning_rate(5, loss_log=[5, 4, 3, 2, 1]) == 1.0
    # stagnant loss: decay
    assert plateau.get_learning_rate(6, loss_log=[1, 2, 2, 2, 2]) == pytest.approx(0.1)


def test_workspace_contract(tmp_path):
    import msd_tpu.workspace as ws

    exp = str(tmp_path / "exp")
    specs = {"NumEpochs": 10}
    ws.save_experiment_specifications(exp, specs)
    assert ws.load_experiment_specifications(exp) == specs
    assert ws.get_model_params_dir(exp, True).endswith("ModelParameters")
    fn = ws.get_reconstructed_mesh_filename(exp, 100, "ds", "cls", "id1")
    assert fn.endswith(os.path.join("Reconstructions", "100", "Meshes", "ds", "cls", "id1.ply"))


def test_create_subject_split_files(tmp_path):
    """Subject-disjoint, metadata-stratified splits
    (ref: utils/create_split_json_files_ADNI_hippo.ipynb)."""
    from msd_tpu.data.splits import create_subject_split_files

    # 30 subjects x 2 scans each; diagnosis CN/AD/MCI round-robin
    names, rows = [], ["subject_id,diagnosis,age"]
    diags = ["CN", "AD", "MCI"]
    for s in range(30):
        sid = f"{s:03d}_S_{1000+s}"
        rows.append(f"{sid},{diags[s % 3]},{60+s}")
        for scan in range(2):
            names.append(f"ADNI_{sid}_MR_scan{scan}.obj")
    meta = tmp_path / "meta.csv"
    meta.write_text("\n".join(rows) + "\n")

    paths = create_subject_split_files(
        names, str(tmp_path / "splits"), "adni",
        metadata_csv=str(meta), allowed_labels=["CN", "AD"], stratify=True,
        fractions=(0.8, 0.1, 0.1), seed=42,
    )
    tr = load_split(paths["train"])
    te = load_split(paths["test"])
    va = load_split(paths["val"])
    # MCI subjects dropped: 20 subjects x 2 files remain
    assert len(tr) + len(te) + len(va) == 40
    assert paths["summary"]["subjects"] == 20

    def subjects_of(files):
        return {f.split("_MR_")[0].replace("ADNI_", "") for f in files}

    s_tr, s_te, s_va = subjects_of(tr), subjects_of(te), subjects_of(va)
    # subject-disjoint: both scans of a subject land in the same split
    assert not (s_tr & s_te) and not (s_tr & s_va) and not (s_te & s_va)
    for f in tr:
        assert f.replace("scan0", "scan1").replace("scan1", "scan1") in tr or True
    # every subject's files travel together
    for files, subs in ((tr, s_tr), (te, s_te), (va, s_va)):
        assert len(files) == 2 * len(subs)
