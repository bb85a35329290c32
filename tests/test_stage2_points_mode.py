"""Stage-2 with point-cloud encoders (surface-point inputs, BN threading)."""

import json
import os

import numpy as np
import pytest

import msd_tpu.workspace as ws
from msd_tpu.data.mesh_io import save_obj
from msd_tpu.train.stage2 import Stage2Trainer
from conftest import make_sphere_mesh
from test_stage2_trainer import _setup


@pytest.mark.slow
@pytest.mark.parametrize("enc", ["resnet_pointnet", "pointnet_encoder"])
def test_points_mode_training(tmp_path, enc):
    exp_dir, specs, teacher = _setup(tmp_path, num_scenes=8)
    # mesh files for surface sampling
    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    for i in range(8):
        v, f = make_sphere_mesh(12, 24, radius=0.4 + 0.04 * i)
        save_obj(str(mesh_dir / f"sphere_{i}.obj"), v, f)
    specs.update(
        EncoderType=enc,
        DataSourceMesh=str(mesh_dir),
        SurfacePointCount=128,
        NumEpochs=2,
    )
    ws.save_experiment_specifications(exp_dir, specs)
    tr = Stage2Trainer(exp_dir)
    assert tr.vae_input_mode == "points"
    assert tr.dataset.surface_points.shape == (8, 128, 3)
    if enc == "pointnet_encoder":
        bn_before = np.asarray(tr.state["vae"]["encoder"]["bns"][0]["mean"]).copy()
    m = tr.train_epoch(1)
    assert np.isfinite(m["total"]) and np.isfinite(m["vae_recon"])
    if enc == "pointnet_encoder":
        bn_after = np.asarray(tr.state["vae"]["encoder"]["bns"][0]["mean"])
        assert not np.allclose(bn_before, bn_after)  # running stats updated
    # latent export path uses surface points
    mu = tr.compute_vae_latents()
    assert mu.shape == (8, tr.vae_latent_dim)
    m2 = tr.train_epoch(2)
    assert np.isfinite(m2["total"])


@pytest.mark.slow
def test_points_mode_run_eval(tmp_path):
    """run_eval in points mode: VAE inputs are surface clouds; with teacher
    latents present the recon/KL terms compute, and the SDF-consistency
    loss always does (ref run_eval points branch, :1708-1719)."""
    from msd_tpu.train import stage2_eval as ev

    exp_dir, specs, teacher = _setup(tmp_path, num_scenes=8)
    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    for i in range(8):
        v, f = make_sphere_mesh(12, 24, radius=0.4 + 0.04 * i)
        save_obj(str(mesh_dir / f"sphere_{i}.obj"), v, f)
    specs.update(
        EncoderType="resnet_pointnet",
        DataSourceMesh=str(mesh_dir),
        SurfacePointCount=128,
        NumEpochs=1,
    )
    ws.save_experiment_specifications(exp_dir, specs)
    tr = Stage2Trainer(exp_dir)
    tr.train_epoch(1)
    em = ev.run_eval(tr, 1, "eval_train", kl_weight=1.0, code_reg_weight=1.0)
    assert np.isfinite(em["eval_loss"]) and np.isfinite(em["eval_sdf_loss"])
    assert np.isfinite(em["eval_vae_recon"])  # teacher latents exist


def test_points_mode_requires_meshes(tmp_path):
    exp_dir, specs, teacher = _setup(tmp_path, num_scenes=8)
    specs.update(EncoderType="pointnet2")
    ws.save_experiment_specifications(exp_dir, specs)
    with pytest.raises(RuntimeError):
        Stage2Trainer(exp_dir)
