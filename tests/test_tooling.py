"""Tooling: plotting, plot_log, check_experiment_inputs, NIfTI grooming."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plotting_functions(tmp_path):
    from msd_tpu import plotting
    from conftest import make_sphere_mesh

    fig = plotting.plot_train_stats([[1.0, 0.5, 0.3], [0.9, 0.6]], labels=["a", "b"])
    assert fig is not None
    fig, percentiles = plotting.plot_dist_violin(np.abs(np.random.default_rng(0).normal(size=500)))
    assert set(percentiles) == {50, 75, 90, 99}
    v, f = make_sphere_mesh(16, 32)
    assert plotting.render_mesh(v, f) is not None
    pts = np.random.default_rng(0).uniform(-1, 1, (1000, 3))
    sdf = np.linalg.norm(pts, axis=1) - 0.5
    assert plotting.render_sdf(pts, sdf) is not None
    assert plotting.plot_sdf_cross_section(pts, sdf) is not None
    lat = np.random.default_rng(0).normal(size=(50, 8))
    assert plotting.plot_manifold_tsne(lat, labels=lat[:, 0] > 0) is not None


def test_plotting_round2_functions(tmp_path, monkeypatch):
    """plot_mesh_comparison / plot_reconstruction_comparison /
    render_sdf_vid / plot_binary_vs_continuous / plot_capacity_vs_chamfer
    (ref: plotting.py:148, :278, :337, :393)."""
    import msd_tpu.workspace as ws
    from msd_tpu import plotting
    from msd_tpu.data.mesh_io import save_obj, save_ply
    from conftest import make_sphere_mesh

    v, f = make_sphere_mesh(12, 24)
    fig = plotting.plot_mesh_comparison([("a", [(v, f), None]), ("b", [(v, f), (v, f)])])
    assert fig is not None

    # reconstruction comparison: fabricate GT + one experiment's recon mesh
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    save_obj(str(gt_dir / "shape0.obj"), v, f)
    exp = tmp_path / "expA"
    recon = ws.get_reconstructed_mesh_filename(str(exp), 5, "ds", "cls", "shape0")
    os.makedirs(os.path.dirname(recon), exist_ok=True)
    save_ply(recon, v * 0.98, f)
    monkeypatch.chdir(tmp_path)
    fig = plotting.plot_reconstruction_comparison(
        {"expA": str(exp)}, ["shape0"], chckpt=5, dataset_name="ds",
        class_name="cls", gt_mesh_dir=str(gt_dir), angle_num=1,
    )
    assert fig is not None
    assert os.path.isfile(tmp_path / "reconstruction_comparison.pdf")

    # sdf video (tiny: 2 frames, gif via pillow)
    pts = np.random.default_rng(0).uniform(-1, 1, (200, 3))
    sdf = np.linalg.norm(pts, axis=1) - 0.5
    anim = plotting.render_sdf_vid(pts, sdf, fps=2, n_seconds=1, save_filepath=str(tmp_path / "vid"))
    assert anim is not None
    assert os.path.isfile(tmp_path / "vid.mp4") or os.path.isfile(tmp_path / "vid.gif")

    import pandas as pd

    df = pd.DataFrame({"diag": [0, 1, 0, 1], "loss": [0.5, 0.7, 0.4, 0.9]})
    assert plotting.plot_binary_vs_continuous(df, "diag", "loss") is not None

    # capacity-vs-CD: two fabricated experiments with eval CSVs
    exp_dirs = []
    for i, width in enumerate((8, 16)):
        d = str(tmp_path / f"cap{i}")
        specs = {
            "Description": "cap", "DataSource": "x", "TrainSplit": "x",
            "NetworkArch": "deep_sdf_decoder", "CodeLength": 4,
            "NetworkSpecs": {
                "dims": [width, width], "dropout": [], "dropout_prob": 0.0,
                "norm_layers": [], "latent_in": [1], "xyz_in_all": False,
                "use_tanh": False, "latent_dropout": False, "weight_norm": True,
            },
        }
        ws.save_experiment_specifications(d, specs)
        ev_dir = ws.get_evaluation_dir(d, "5", True)
        with open(os.path.join(ev_dir, "chamfer.csv"), "w") as fh:
            fh.write("shape;chamfer_dist;90th_percentile;95th_percentile;normal_consistency\n")
            fh.write(f"s0;{0.01 / (i + 1)};0.02;0.03;0.9\n")
        exp_dirs.append(d)
    fig = plotting.plot_capacity_vs_chamfer_dist(exp_dirs_net_capacity=exp_dirs, checkpoint=5)
    assert fig is not None


@pytest.mark.slow
def test_plot_log_cli(tmp_path):
    from msd_tpu.utils.checkpoint import save_logs

    exp = str(tmp_path)
    save_logs(exp, [1.0, 0.9, 0.8, 0.7], [[1e-3, 1e-4]] * 2, [5.0, 5.1], [0.1, 0.2], {"lin0.w": [1.0, 1.1]}, 2)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "plot_log.py"), "-e", exp, "-t", "loss"],
        capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    assert os.path.isfile(os.path.join(exp, "plot_loss.png"))
    for t in ("learning_rate", "time", "lat_mag", "param_mag"):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "plot_log.py"), "-e", exp, "-t", t],
            capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, (t, r.stderr)


def test_check_experiment_inputs_cli(tmp_path):
    import torch

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    names = ["a.obj", "b.obj"]
    for n in names:
        np.savez(str(data_dir / (n[:-4] + ".npz")), pos=np.ones((4, 4), np.float32), neg=np.ones((4, 4), np.float32))
    split = tmp_path / "split.json"
    json.dump(names, open(split, "w"))
    torch.save({"a": torch.tensor([1.0, 60.0]), "b": torch.tensor([0.0, 70.0])}, str(data_dir / "labels.pt"))
    exp = tmp_path / "exp"
    exp.mkdir()
    specs = {
        "DataSource": str(data_dir),
        "TrainSplit": str(split),
        "TestSplit": str(split),
        "LabelsFile": "labels.pt",
        "CodeLength": 8,
    }
    json.dump(specs, open(exp / "specs.json", "w"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "check_experiment_inputs.py"), "-e", str(exp)],
        capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    assert "[split] train count=2" in out.stdout
    assert "[labels] LabelsFile split=train missing=0" in out.stdout
    assert "train∩test overlap=2" in out.stdout


def test_nifti_roundtrip_and_grooming(tmp_path):
    from msd_tpu.data.nifti import load_nifti, save_nifti

    # a solid ellipsoid mask
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, 40)] * 3, indexing="ij")
    mask = ((x / 0.8) ** 2 + (y / 0.6) ** 2 + (z / 0.5) ** 2 < 1).astype(np.uint8)
    path = str(tmp_path / "mask.nii.gz")
    save_nifti(path, mask, zooms=(0.7, 0.8, 0.9))
    data, zooms = load_nifti(path)
    np.testing.assert_array_equal(data > 0, mask > 0)
    assert zooms == pytest.approx((0.7, 0.8, 0.9))

    sys.path.insert(0, os.path.join(REPO, "utils"))
    try:
        import batch_process_to_ply as bp
    finally:
        sys.path.pop(0)

    verts, faces, true_vol = bp.mask_to_mesh(path)
    voxel_vol = 0.7 * 0.8 * 0.9
    assert true_vol == pytest.approx(mask.sum() * voxel_vol)
    mesh_vol = bp.mesh_volume(verts - verts.mean(0), faces)
    # marching surface volume close to the voxel volume
    assert mesh_vol == pytest.approx(true_vol, rel=0.1)

    ok, vc = bp.process_one(path, str(tmp_path / "out.ply"), global_scale=0.01)
    assert ok and 0.8 < vc < 1.2
    ok2, vc2 = bp.process_one(path, str(tmp_path / "out_s.ply"), global_scale=0.01, smooth=True)
    assert ok2
    from msd_tpu.data.mesh_io import load_ply

    v, f = load_ply(str(tmp_path / "out.ply"))
    # volume after correction * global scale matches true volume * scale^3
    got = bp.mesh_volume(v, f)
    assert got == pytest.approx(true_vol * 0.01**3, rel=0.02)


def test_create_splits_and_ply_to_obj_cli(tmp_path):
    from conftest import make_sphere_mesh
    from msd_tpu.data.mesh_io import save_ply

    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    v, f = make_sphere_mesh(12, 24)
    for i in range(10):
        save_ply(str(mesh_dir / f"m{i}.ply"), v, f)
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "utils", "ply_to_obj.py"),
         "-i", str(mesh_dir), "-o", str(tmp_path / "objs")],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr
    assert len(os.listdir(tmp_path / "objs")) == 10
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "utils", "create_split_json_files.py"),
         "-m", str(tmp_path / "objs"), "-o", str(tmp_path / "splits"), "-p", "toy"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr
    train = json.load(open(tmp_path / "splits" / "toy_train_split.json"))
    assert len(train) == 8


def test_mesh_scaling_cli(tmp_path):
    """utils/mesh_scaling.py: group-uniform rescale + watertight audit
    (ref: sdf_utils/mesh_scaling.ipynb)."""
    import numpy as np

    from msd_tpu.data.mesh_io import load_mesh, save_obj

    verts = np.array(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.float32
    )
    faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int32,
    )
    src = tmp_path / "in"
    src.mkdir()
    save_obj(str(src / "a.obj"), verts * 10.0, faces)
    save_obj(str(src / "b.obj"), verts * 25.0 + 5.0, faces)
    save_obj(str(src / "open.obj"), verts * 10.0, faces[:-1])  # not watertight
    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "utils", "mesh_scaling.py"),
         "-i", str(src), "-o", str(out)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    assert "Watertight meshes: 2/3" in res.stdout
    assert "NOT watertight: open.obj" in res.stdout
    import json as _json

    info = _json.loads((out / "scale_info.json").read_text())
    assert info["global_min"] == 0.0 and info["global_max"] == 30.0
    allv = np.concatenate([load_mesh(str(out / f))[0] for f in ("a.obj", "b.obj")])
    assert np.isclose(allv.min(), -0.9) and np.isclose(allv.max(), 0.9)


@pytest.mark.slow
def test_latent_manifold_cli(tmp_path):
    """latent_manifold.py: HLLE/ICA/PCA embeddings of trained latents."""
    import json as _json

    import numpy as np

    from msd_tpu.data.labels import save_labels
    from msd_tpu.utils.checkpoint import save_latent_vectors

    exp = tmp_path / "exp"
    exp.mkdir()
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, 40)
    lat = np.outer(t, rng.normal(size=16)) + 0.05 * rng.normal(size=(40, 16))
    save_latent_vectors(str(exp), "latest.pth", lat.astype(np.float32), epoch=7)
    ids = [f"shape_{i:03d}" for i in range(40)]
    _json.dump({"ds": {"grp": ids}}, open(tmp_path / "split.json", "w"))
    _json.dump(
        {"Description": "m", "DataSource": str(tmp_path),
         "TrainSplit": str(tmp_path / "split.json"), "NetworkArch": "deep_sdf_decoder",
         "NetworkSpecs": {}, "CodeLength": 16, "NumEpochs": 1, "SnapshotFrequency": 1,
         "LearningRateSchedule": [{"Type": "Constant", "Value": 1e-3}] * 2,
         "SamplesPerScene": 1, "ScenesPerBatch": 1, "ClampingDistance": 0.1},
        open(exp / "specs.json", "w"),
    )
    save_labels(str(tmp_path / "labels.json"), {i: [float(k % 3)] for k, i in enumerate(ids)})
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "latent_manifold.py"),
         "-e", str(exp), "--methods", "hlle", "ica", "pca",
         "--labels_path", str(tmp_path / "labels.json")],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    out_dir = exp / "Evaluation" / "Manifold"
    for m in ("hlle", "ica", "pca"):
        assert (out_dir / f"latent_{m}.png").exists(), m
        emb = np.load(out_dir / f"latent_{m}.npy")
        assert emb.shape == (40, 2) and np.isfinite(emb).all()
