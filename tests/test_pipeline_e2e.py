"""One-command end-to-end pipeline smoke through the actual CLIs.

Chains the reference README workflow (ref: README.md:67-99) over one
synthetic dataset: synthetic OBJs -> preprocess_data.py (SDF + surface
sampling) -> train_deep_sdf.py -> reconstruct.py -> evaluate.py ->
train_MLP_VAE_deep_sdf.py, asserting the reference directory contract at
every boundary (ref: deep_sdf/workspace.py:8-24).

Subprocesses run plain CPU JAX: PYTHONPATH is reset to the repo root so the
axon TPU sitecustomize never loads.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import make_sphere_mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_obj(path, verts, faces):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in faces + 1:  # OBJ is 1-indexed
            f.write(f"f {a} {b} {c}\n")


def _run_cli(script, *args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # no axon sitecustomize -> CPU backend
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single CPU device is enough (and faster)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *map(str, args)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert res.returncode == 0, (
        f"{script} failed (rc={res.returncode})\n"
        f"stdout tail: {res.stdout[-1500:]}\nstderr tail: {res.stderr[-2500:]}"
    )
    return res


@pytest.mark.e2e
def test_full_pipeline_through_clis(tmp_path):
    # ---- synthetic source meshes + split ----------------------------------
    source_dir = tmp_path / "meshes"
    source_dir.mkdir()
    radii = [0.45, 0.55, 0.65, 0.75]
    names = []
    for i, r in enumerate(radii):
        v, f = make_sphere_mesh(n_theta=24, n_phi=48, radius=r)
        name = f"shape_{i}"
        _write_obj(source_dir / (name + ".obj"), v, f)
        names.append(name + ".obj")
    split_path = tmp_path / "smoke_split.json"  # no "train" in the name:
    # reconstruct/evaluate append "_on_train_set" for train splits
    split_path.write_text(json.dumps(names))
    data_dir = tmp_path / "data"

    # ---- 1. preprocess: SDF samples ---------------------------------------
    _run_cli(
        "preprocess_data.py", "-d", data_dir, "-s", source_dir, "--name", "spheres",
        "--split", split_path, "--samples", 6000,
    )
    sdf_dir = data_dir / "SdfSamples" / "spheres"
    assert (data_dir / ".datasources.json").is_file()
    for name in names:
        npz = sdf_dir / (os.path.splitext(name)[0] + ".npz")
        assert npz.is_file(), npz
        with np.load(npz) as d:
            assert d["pos"].dtype == np.float32 and d["pos"].shape[1] == 4
            assert d["neg"].dtype == np.float32 and d["neg"].shape[1] == 4
            assert len(d["pos"]) > 500 and len(d["neg"]) > 500

    # ---- 2. preprocess: surface samples + normalization params ------------
    _run_cli(
        "preprocess_data.py", "-d", data_dir, "-s", source_dir, "--name", "spheres",
        "--split", split_path, "--surface",
    )
    for name in names:
        base = os.path.splitext(name)[0]
        assert (data_dir / "SurfaceSamples" / "spheres" / (base + ".ply")).is_file()
        norm = data_dir / "NormalizationParameters" / "spheres" / (base + ".npz")
        assert norm.is_file()
        with np.load(norm) as d:
            assert d["offset"].shape == (3,) and d["scale"].size == 1

    # ---- 3. Stage-1 training ----------------------------------------------
    exp_dir = tmp_path / "exp"
    exp_dir.mkdir()
    specs = {
        "Description": "e2e smoke",
        "DataSource": str(sdf_dir),
        "TrainSplit": str(split_path),
        "TestSplit": str(split_path),
        "NetworkArch": "deep_sdf_decoder",
        "NetworkSpecs": {
            "dims": [48, 48, 48],
            "dropout": [], "dropout_prob": 0.0, "norm_layers": [],
            "latent_in": [2], "xyz_in_all": False, "use_tanh": False,
            "latent_dropout": False, "weight_norm": True,
        },
        "CodeLength": 8,
        "NumEpochs": 4,
        "SnapshotFrequency": 2,
        "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 0.002, "Interval": 500, "Factor": 0.5},
            {"Type": "Step", "Initial": 0.01, "Interval": 500, "Factor": 0.5},
        ],
        "SamplesPerScene": 512,
        "ScenesPerBatch": 4,
        "ClampingDistance": 0.1,
        "CodeRegularization": True,
        "CodeRegularizationLambda": 1e-4,
        "CodeBound": 1.0,
        "LogFrequency": 2,
        "EvalTrainFrequency": 0,
        "EvalTestFrequency": 0,
    }
    (exp_dir / "specs.json").write_text(json.dumps(specs, indent=1))
    _run_cli("train_deep_sdf.py", "-e", exp_dir)
    # reference checkpoint-family contract
    for fam in ("ModelParameters", "OptimizerParameters", "LatentCodes"):
        for name in ("2.pth", "4.pth", "latest.pth"):
            assert (exp_dir / fam / name).is_file(), (fam, name)
    assert (exp_dir / "Logs.pth").is_file()
    assert (exp_dir / "TensorBoard").is_dir()

    # ---- 4. reconstruction -------------------------------------------------
    _run_cli(
        "reconstruct.py", "-e", exp_dir, "-c", 4, "-d", sdf_dir, "-s", split_path,
        "--iters", 40, "--mesh_resolution", 64,
    )
    recon_dir = exp_dir / "Reconstructions" / "4"
    for name in names:
        base = os.path.splitext(name)[0]
        assert (recon_dir / "Meshes" / (base + ".ply")).is_file()
        assert (recon_dir / "Codes" / (base + ".pth")).is_file()

    # ---- 5. evaluation ------------------------------------------------------
    _run_cli("evaluate.py", "-e", exp_dir, "-c", 4, "-d", data_dir, "-s", split_path)
    csv_path = exp_dir / "Evaluation" / "4" / "chamfer.csv"
    assert csv_path.is_file()
    rows = [l for l in csv_path.read_text().strip().splitlines() if l]
    assert len(rows) == 1 + len(names), rows  # header + one row per shape
    assert ";" in rows[0]  # the reference's semicolon CSV format

    # ---- 6. Stage-2 VAE training -------------------------------------------
    exp2_dir = tmp_path / "exp2"
    exp2_dir.mkdir()
    specs2 = dict(
        specs,
        Description="e2e smoke stage2",
        NumEpochs=2,
        SnapshotFrequency=2,
        PretrainedLatentPath=str(exp_dir / "LatentCodes" / "4.pth"),
        PretrainedSDFDecoderPath=str(exp_dir / "ModelParameters" / "4.pth"),
        VAELatentDim=4,
        VAEEncoderHiddenDims=[32, 16],
        VAEDecoderHiddenDims=[16, 32],
        EvalTrainFrequency=0,
    )
    (exp2_dir / "specs.json").write_text(json.dumps(specs2, indent=1))
    _run_cli("train_MLP_VAE_deep_sdf.py", "-e", exp2_dir)
    import torch

    m2 = torch.load(exp2_dir / "ModelParameters" / "latest.pth",
                    map_location="cpu", weights_only=False)
    assert "vae_state_dict" in m2 and "sdf_decoder_state_dict" in m2
    lat2 = torch.load(exp2_dir / "LatentCodes" / "latest.pth",
                      map_location="cpu", weights_only=False)
    # Stage-2 exports the recomputed VAE mu's (dim = VAELatentDim), wrapped
    # in the Embedding state-dict format (ref: train_MLP_VAE_deep_sdf.py:129-137)
    assert lat2["latent_codes"]["weight"].shape == (len(names), specs2["VAELatentDim"])
