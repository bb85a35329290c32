"""End-to-end Stage-2 VAE training over synthetic Stage-1 latents."""

import json
import os

import jax
import numpy as np
import pytest

import msd_tpu.workspace as ws
from msd_tpu.train.stage2 import Stage2Trainer, load_teacher_latents
from test_stage1_trainer import make_sphere_dataset


def _setup(tmp_path, num_scenes=16, latent_size=8, **overrides):
    data_dir = str(tmp_path / "data")
    rng = np.random.default_rng(0)
    radii = rng.uniform(0.3, 0.8, num_scenes)
    names = make_sphere_dataset(data_dir, radii, n_pos=800, n_neg=800)
    split_path = str(tmp_path / "split.json")
    with open(split_path, "w") as f:
        json.dump(names, f)

    # synthetic teacher latents correlated with radius + noise
    teacher = rng.normal(size=(num_scenes, latent_size)).astype(np.float32) * 0.05
    teacher[:, 0] = radii - 0.5
    teacher_path = str(tmp_path / "teacher.pth")
    import torch

    torch.save({"epoch": 1, "latent_codes": {"weight": torch.from_numpy(teacher)}}, teacher_path)

    # labels: diagnosis (binary by radius), age (radius itself), one NaN
    labels = {}
    for i, name in enumerate(names):
        iid = os.path.splitext(name)[0]
        labels[iid] = np.array([float(radii[i] > 0.55), radii[i]], np.float32)
    labels_path = os.path.join(data_dir, "labels.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in labels.items()}, labels_path)

    specs = {
        "Description": "stage2 test",
        "DataSource": data_dir,
        "TrainSplit": split_path,
        "NetworkArch": "deep_sdf_decoder",
        "NetworkSpecs": {
            "dims": [32, 32, 32],
            "dropout": [],
            "dropout_prob": 0.0,
            "norm_layers": [],
            "latent_in": [2],
            "xyz_in_all": False,
            "use_tanh": False,
            "latent_dropout": False,
            "weight_norm": True,
        },
        "CodeLength": latent_size,
        "NumEpochs": 6,
        "SnapshotFrequency": 3,
        "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 0.001, "Interval": 500, "Factor": 0.5},
            {"Type": "Step", "Initial": 0.0005, "Interval": 500, "Factor": 0.5},
        ],
        "SamplesPerScene": 256,
        "ScenesPerBatch": 8,
        "ClampingDistance": 0.1,
        "PretrainedLatentPath": teacher_path,
        "VAELatentDim": 4,
        "VAEEncoderHiddenDims": [32, 16],
        "VAEDecoderHiddenDims": [16, 32],
        "GradientClipNorm": 1.0,
        "LogFrequency": 3,
    }
    specs.update(overrides)
    exp_dir = str(tmp_path / "exp2")
    ws.save_experiment_specifications(exp_dir, specs)
    return exp_dir, specs, teacher


@pytest.mark.slow
def test_basic_vae_training_reduces_recon(tmp_path):
    exp_dir, specs, teacher = _setup(tmp_path)
    tr = Stage2Trainer(exp_dir)
    first = tr.train_epoch(1)
    for e in range(2, 30):
        last = tr.train_epoch(e)
    assert last["vae_recon"] < first["vae_recon"] * 0.7
    assert np.isfinite(last["total"]) and np.isfinite(last["sdf"])


@pytest.mark.slow
def test_all_disentanglement_losses_active(tmp_path):
    exp_dir, specs, teacher = _setup(
        tmp_path,
        GuidedContrastiveLoss=True,
        LabelTaskType="classification",
        AttributeLoss=True,
        CorrLeakageLoss=True,
        CrossCovLoss=True,
        RankLoss=True,
        MatchStdLoss=True,
        SensitivityLoss=True,
        CovarianceLoss=True,
        AgeSNNLRegLoss=True,
        AgeCorrLeakageLoss=True,
        AgeSNNLRegLabelIndex=1,
        VAEObjective="beta_tcvae",
    )
    tr = Stage2Trainer(exp_dir)
    m = tr.train_epoch(1)
    for k in ("snnl", "attr", "corr_leak", "cross_cov", "rank", "matchstd",
              "sens", "cov", "snnl_age", "age_corr_leak"):
        assert k in m and np.isfinite(m[k]), (k, m)
    m2 = tr.train_epoch(2)
    assert np.isfinite(m2["total"])


@pytest.mark.slow
def test_dip_objective_and_trainable_sdf(tmp_path):
    exp_dir, specs, teacher = _setup(tmp_path, VAEObjective="dip_vae_ii", TrainSDFDecoder=True)
    tr = Stage2Trainer(exp_dir)
    assert tr.train_sdf_decoder
    before = np.asarray(jax.tree.leaves(tr.state["sdf"])[0]).copy()
    m = tr.train_epoch(1)
    assert np.isfinite(m["dip"]) and m["dip"] != 0.0
    after = np.asarray(jax.tree.leaves(tr.state["sdf"])[0])
    assert not np.allclose(before, after)  # SDF decoder actually trains


@pytest.mark.slow
def test_checkpoint_format_and_resume(tmp_path):
    exp_dir, specs, teacher = _setup(tmp_path)
    tr = Stage2Trainer(exp_dir)
    tr.train(num_epochs=3)
    import torch

    data = torch.load(os.path.join(exp_dir, ws.model_params_subdir, "3.pth"), weights_only=False)
    assert "vae_state_dict" in data and "sdf_decoder_state_dict" in data
    assert "encoder.mu_head.weight" in data["vae_state_dict"]
    lat = torch.load(os.path.join(exp_dir, ws.latent_codes_subdir, "3.pth"), weights_only=False)
    assert lat["latent_codes"]["weight"].shape == (16, 4)  # VAE mu export

    tr2 = Stage2Trainer(exp_dir)
    start = tr2.resume("3")
    assert start == 4
    m = tr2.train_epoch(4)
    assert np.isfinite(m["total"])


@pytest.mark.slow
def test_holdout_split(tmp_path):
    exp_dir, specs, teacher = _setup(tmp_path, TrainLatentHoldoutFraction=0.25)
    tr = Stage2Trainer(exp_dir)
    assert len(tr.holdout_indices) == 4
    assert len(tr.train_indices) == 12
    assert set(tr.holdout_indices).isdisjoint(set(tr.train_indices))
    m = tr.train_epoch(1)
    assert np.isfinite(m["total"])


@pytest.mark.slow
def test_label_mixing(tmp_path):
    # pseudo labels file = inverse of real labels
    exp_dir, specs, teacher = _setup(
        tmp_path,
        GuidedContrastiveLoss=True,
        LabelTaskType="classification",
        LabelMixing=True,
        LabelMixPseudoRatioStart=0.5,
        LabelMixUnlabeledRatioStart=0.25,
    )
    import torch

    data_dir = specs["DataSource"]
    real = torch.load(os.path.join(data_dir, "labels.pt"), weights_only=False)
    pseudo = {k: 1.0 - v for k, v in real.items()}
    torch.save(pseudo, os.path.join(data_dir, "pseudo_label.pt"))
    tr = Stage2Trainer(exp_dir)
    m = tr.train_epoch(1)
    assert "snnl" in m and np.isfinite(m["snnl"])


@pytest.mark.slow
def test_stage2_multichip_mesh(tmp_path):
    """Stage-2 over a virtual 8-device mesh: batch-sharded scenes,
    replicated VAE+SDF params, loss parity with single-device training
    (SURVEY §2.6 DataParallel contract)."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # ScenesPerBatch=8 divides the 8-device mesh
    exp_dir, specs, teacher = _setup(
        tmp_path, GuidedContrastiveLoss=True, LabelTaskType="classification"
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    tr_mesh = Stage2Trainer(exp_dir, mesh=mesh)
    tr_single = Stage2Trainer(exp_dir)
    # multi-step trajectory parity over 5 epochs (loss curves track, not
    # just one step)
    curve_mesh, curve_single, snnl_mesh, snnl_single = [], [], [], []
    for e in range(1, 6):
        mm = tr_mesh.train_epoch(e, rng=np.random.default_rng(e))
        ms = tr_single.train_epoch(e, rng=np.random.default_rng(e))
        curve_mesh.append(mm["total"])
        curve_single.append(ms["total"])
        snnl_mesh.append(mm["snnl"])
        snnl_single.append(ms["snnl"])
    assert np.all(np.isfinite(curve_mesh))
    np.testing.assert_allclose(curve_mesh, curve_single, rtol=2e-3)
    np.testing.assert_allclose(snnl_mesh, snnl_single, rtol=5e-3, atol=1e-6)


@pytest.mark.slow
def test_stage2_multichip_fused_sdf_matches_xla(tmp_path, monkeypatch):
    """The shard_mapped fused SDF-consistency kernel (frozen decoder, via
    the Pallas interpreter on the CPU mesh) must track the XLA mesh path
    on the same specs/seed."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    net = {
        "dims": [32] * 5, "dropout": [], "dropout_prob": 0.0,
        "norm_layers": [], "latent_in": [2], "xyz_in_all": False,
        "use_tanh": False, "latent_dropout": False, "weight_norm": True,
    }
    exp_dir, specs, teacher = _setup(tmp_path, NetworkSpecs=net)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    tr_xla = Stage2Trainer(exp_dir, mesh=mesh)
    mx = tr_xla.train_epoch(1, rng=np.random.default_rng(1))
    assert not tr_xla._fused_sdf_active

    monkeypatch.setenv("MSD_FUSED_FORCE", "interpret")
    tr_f = Stage2Trainer(exp_dir, mesh=mesh)
    mf = tr_f.train_epoch(1, rng=np.random.default_rng(1))
    assert tr_f._fused_sdf_active
    for k in ("total", "sdf", "vae_recon"):
        assert mf[k] == pytest.approx(mx[k], rel=5e-4, abs=1e-7), (k, mf[k], mx[k])


@pytest.mark.slow
def test_stage2_multichip_odd_batch_point_sharding(tmp_path):
    """Scene batches that do NOT divide the mesh still scale: the SDF
    consistency term (the step's dominant FLOPs) shards over the point
    axis via a sharding constraint, batch-statistic losses replicate, and
    the loss matches single-device exactly (VERDICT r2 weak-item 3)."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # 13 scenes, batch 13 — prime, never divisible by 8
    exp_dir, specs, teacher = _setup(
        tmp_path, num_scenes=13, ScenesPerBatch=13,
        GuidedContrastiveLoss=True, LabelTaskType="classification",
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    tr_mesh = Stage2Trainer(exp_dir, mesh=mesh)
    # the point-axis constraint is active (13*256 % 8 == 0)
    assert (13 * specs["SamplesPerScene"]) % 8 == 0
    tr_single = Stage2Trainer(exp_dir)
    for e in range(1, 3):
        mm = tr_mesh.train_epoch(e, rng=np.random.default_rng(e))
        ms = tr_single.train_epoch(e, rng=np.random.default_rng(e))
    assert np.isfinite(mm["total"])
    assert ms["total"] == pytest.approx(mm["total"], rel=1e-4)
    assert ms["sdf"] == pytest.approx(mm["sdf"], rel=1e-4, abs=1e-7)


@pytest.mark.slow
def test_stage2_logs_pth(tmp_path):
    """Stage-2 writes a reference-format Logs.pth and restores it on resume
    (ref: train_MLP_VAE_deep_sdf.py:140-288)."""
    import torch

    exp_dir, specs, teacher = _setup(tmp_path, NumEpochs=3, LogFrequency=1)
    tr = Stage2Trainer(exp_dir)
    tr.train(num_epochs=3)
    logs_path = os.path.join(exp_dir, "Logs.pth")
    assert os.path.isfile(logs_path)
    data = torch.load(logs_path, weights_only=False)
    assert data["epoch"] == 3
    for k in ("loss", "loss_epoch", "sdf_loss_epoch", "vae_recon_epoch",
              "vae_kl_epoch", "vae_latent_magnitude", "learning_rate", "timing"):
        assert k in data, k
    assert len(data["loss_epoch"]) == 3 and len(data["timing"]) == 3

    tr2 = Stage2Trainer(exp_dir)
    start = tr2.resume("3")
    assert start == 4
    assert len(tr2.loss_log_epoch) == 3


@pytest.mark.slow
def test_batch_split_parity(tmp_path):
    """batch_split=2 chunks the SDF-consistency term with scan+remat; the
    loss and resulting params must match batch_split=1 up to float reorder
    (ref: train_MLP_VAE_deep_sdf.py:3104-3138 gradient accumulation)."""
    exp_dir, specs, teacher = _setup(tmp_path)
    tr1 = Stage2Trainer(exp_dir)
    tr2 = Stage2Trainer(exp_dir)
    # identical init (same seed) — verify before training
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(tr1.state)[0]), np.asarray(jax.tree.leaves(tr2.state)[0])
    )
    for e in range(1, 4):
        m1 = tr1.train_epoch(e, batch_split=1, rng=np.random.default_rng(e))
        m2 = tr2.train_epoch(e, batch_split=2, rng=np.random.default_rng(e))
    assert np.isclose(m1["total"], m2["total"], rtol=1e-4), (m1["total"], m2["total"])
    assert np.isclose(m1["sdf"], m2["sdf"], rtol=1e-4)
    for a, b in zip(jax.tree.leaves(tr1.state), jax.tree.leaves(tr2.state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6)


def test_batch_split_must_divide(tmp_path):
    exp_dir, specs, teacher = _setup(tmp_path)
    tr = Stage2Trainer(exp_dir)
    with pytest.raises(ValueError):
        tr.train_epoch(1, batch_split=3)  # 8*256 % 3 != 0


def test_teacher_latent_loader_formats(tmp_path):
    import torch

    arr = np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32)
    p1 = str(tmp_path / "emb.pth")
    torch.save({"epoch": 0, "latent_codes": {"weight": torch.from_numpy(arr)}}, p1)
    np.testing.assert_allclose(load_teacher_latents(p1), arr)
    p2 = str(tmp_path / "legacy.pth")
    torch.save({"epoch": 0, "latent_codes": torch.from_numpy(arr[:, None, :])}, p2)
    np.testing.assert_allclose(load_teacher_latents(p2), arr)
    p3 = str(tmp_path / "raw.pth")
    torch.save(torch.from_numpy(arr), p3)
    np.testing.assert_allclose(load_teacher_latents(p3), arr)
