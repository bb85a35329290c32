"""End-to-end Stage-1 training on a synthetic analytic-SDF dataset
(spheres of varying radius) — the SURVEY §7 'minimum slice' validation."""

import json
import os

import jax
import numpy as np
import pytest

import msd_tpu.workspace as ws
from msd_tpu.train.stage1 import Stage1Trainer


def make_sphere_dataset(data_dir, radii, n_pos=2000, n_neg=2000, seed=0):
    """Analytic sphere SDF samples in the reference .npz layout."""
    rng = np.random.default_rng(seed)
    names = []
    os.makedirs(data_dir, exist_ok=True)
    for i, r in enumerate(radii):
        pts = rng.uniform(-1, 1, size=(n_pos * 8, 3)).astype(np.float32)
        sdf = np.linalg.norm(pts, axis=1) - r
        pos_mask = sdf >= 0
        pos = np.concatenate([pts[pos_mask][:n_pos], sdf[pos_mask][:n_pos, None]], axis=1)
        neg = np.concatenate([pts[~pos_mask][:n_neg], sdf[~pos_mask][:n_neg, None]], axis=1)
        name = f"sphere_{i}"
        np.savez(os.path.join(data_dir, name + ".npz"), pos=pos.astype(np.float32), neg=neg.astype(np.float32))
        names.append(name + ".obj")
    return names


BASE_SPECS = {
    "Description": "test",
    "DataSource": None,  # filled per test
    "TrainSplit": None,
    "TestSplit": None,
    "NetworkArch": "deep_sdf_decoder",
    "NetworkSpecs": {
        "dims": [64, 64, 64],
        "dropout": [],
        "dropout_prob": 0.0,
        "norm_layers": [0, 1, 2],
        "latent_in": [2],
        "xyz_in_all": False,
        "use_tanh": False,
        "latent_dropout": False,
        "weight_norm": True,
    },
    "CodeLength": 8,
    "NumEpochs": 8,
    "SnapshotFrequency": 4,
    "AdditionalSnapshots": [2],
    "LearningRateSchedule": [
        {"Type": "Step", "Initial": 0.001, "Interval": 500, "Factor": 0.5},
        {"Type": "Step", "Initial": 0.005, "Interval": 500, "Factor": 0.5},
    ],
    "SamplesPerScene": 512,
    "ScenesPerBatch": 4,
    "DataLoaderThreads": 1,
    "ClampingDistance": 0.1,
    "CodeRegularization": True,
    "CodeRegularizationLambda": 1e-4,
    "CodeBound": 1.0,
    "GradientClipNorm": 1.0,
    "LogFrequency": 4,
}


def _specs(tmp_path, **overrides):
    data_dir = str(tmp_path / "data")
    names = make_sphere_dataset(data_dir, [0.3, 0.4, 0.5, 0.6, 0.7, 0.8])
    split_path = str(tmp_path / "train_split.json")
    with open(split_path, "w") as f:
        json.dump(names, f)
    specs = dict(BASE_SPECS)
    specs["DataSource"] = data_dir
    specs["TrainSplit"] = split_path
    specs["TestSplit"] = split_path
    specs.update(overrides)
    exp_dir = str(tmp_path / "exp")
    ws.save_experiment_specifications(exp_dir, specs)
    return exp_dir, specs


def test_training_reduces_loss(tmp_path):
    exp_dir, specs = _specs(tmp_path)
    trainer = Stage1Trainer(exp_dir)
    first = trainer.train_epoch(1)
    for e in range(2, 41):
        last = trainer.train_epoch(e)
    assert last["total"] < first["total"] * 0.6, (first, last)
    # latents actually moved
    assert float(np.abs(np.asarray(trainer.state["lat"])).max()) > 0


@pytest.mark.slow
def test_full_train_checkpoints_and_resume(tmp_path):
    exp_dir, specs = _specs(tmp_path)
    trainer = Stage1Trainer(exp_dir)
    trainer.train(eval_hooks=False)
    # checkpoint families exist (reference layout)
    for sub in (ws.model_params_subdir, ws.optimizer_params_subdir, ws.latent_codes_subdir):
        for name in ("2.pth", "4.pth", "8.pth", "latest.pth"):
            assert os.path.isfile(os.path.join(exp_dir, sub, name)), (sub, name)
    assert os.path.isfile(os.path.join(exp_dir, ws.logs_filename))
    assert os.path.isdir(os.path.join(exp_dir, ws.tb_logs_dir))

    # resume from epoch 4 and continue
    trainer2 = Stage1Trainer(exp_dir)
    start = trainer2.resume("4")
    assert start == 5
    np.testing.assert_allclose(
        np.asarray(trainer2.state["lat"]).shape, (6, 8)
    )
    m = trainer2.train_epoch(start)
    assert np.isfinite(m["total"])


def test_checkpoint_torch_roundtrip(tmp_path):
    """Our .pth checkpoints load back through torch with reference naming."""
    import torch

    exp_dir, specs = _specs(tmp_path)
    trainer = Stage1Trainer(exp_dir)
    trainer.train_epoch(1)
    trainer.epoch = 1
    trainer.save_checkpoint("1")
    data = torch.load(
        os.path.join(exp_dir, ws.model_params_subdir, "1.pth"), weights_only=False
    )
    assert data["epoch"] == 1
    sd = data["model_state_dict"]
    assert "lin0.weight_g" in sd and "lin0.bias" in sd
    lat = torch.load(
        os.path.join(exp_dir, ws.latent_codes_subdir, "1.pth"), weights_only=False
    )
    assert lat["latent_codes"]["weight"].shape == (6, 8)


@pytest.mark.slow
def test_regularizer_variants_run(tmp_path):
    exp_dir, specs = _specs(
        tmp_path,
        UseEikonal=True,
        UseCovarianceLoss=True,
        UseGMMPriorLoss=True,
        GMMK=2,
        UseIsometryLoss=True,
        IsometryNumPoints=32,
        UseGradMetricIsotropyLoss=True,
        NumEpochs=2,
    )
    trainer = Stage1Trainer(exp_dir)
    m = trainer.train_epoch(1)
    for k in ("eikonal", "covariance", "gmm", "iso", "grad_metric_iso"):
        assert k in m and np.isfinite(m[k]), (k, m)
    m2 = trainer.train_epoch(2)
    assert np.isfinite(m2["total"])


@pytest.mark.slow
def test_eikonal_num_points_subsample(tmp_path):
    """EikonalNumPoints (XLA path): subsampled eikonal trains, produces a
    finite aux, and actually changes the eikonal value vs the full term."""
    exp_dir_a, _ = _specs(tmp_path / "a", UseEikonal=True, EikonalNumPoints=16)
    ta = Stage1Trainer(exp_dir_a)
    assert ta.eikonal_num_points == 16
    ma = Stage1Trainer(exp_dir_a).train_epoch(1)
    assert np.isfinite(ma["eikonal"]) and ma["eikonal"] != 0.0

    exp_dir_b, _ = _specs(tmp_path / "b", UseEikonal=True)
    mb = Stage1Trainer(exp_dir_b).train_epoch(1)
    assert np.isfinite(mb["eikonal"])
    assert ma["eikonal"] != mb["eikonal"]


def test_batch_split_gradient_accumulation(tmp_path):
    exp_dir, specs = _specs(tmp_path)
    t1 = Stage1Trainer(exp_dir)
    m1 = t1.train_epoch(1, batch_split=2)
    assert np.isfinite(m1["total"])


def test_code_bound_projection(tmp_path):
    exp_dir, specs = _specs(tmp_path, CodeBound=0.05, CodeInitStdDev=10.0)
    trainer = Stage1Trainer(exp_dir)
    trainer.train_epoch(1)
    norms = np.linalg.norm(np.asarray(trainer.state["lat"]), axis=1)
    # all touched rows were projected to <= bound (+ small optimizer drift)
    assert np.median(norms) < 0.2


@pytest.mark.slow
def test_pretrained_decoder_warm_start(tmp_path):
    """UsePretrainedSDFDecoder/PretrainedSDFDecoderDir warm start
    (ref: train_deep_sdf.py:115-132, :355-374)."""
    exp_dir, specs = _specs(tmp_path)
    donor = Stage1Trainer(exp_dir)
    donor.train_epoch(1)
    donor.epoch = 1
    donor.save_checkpoint("latest")

    exp2 = str(tmp_path / "exp_warm")
    specs2 = dict(specs, UsePretrainedSDFDecoder=True, PretrainedSDFDecoderDir=exp_dir)
    ws.save_experiment_specifications(exp2, specs2)
    warm = Stage1Trainer(exp2)
    # decoder weights match the donor checkpoint; latents are fresh
    for a, b in zip(
        jax.tree.leaves(warm.state["net"]), jax.tree.leaves(donor.state["net"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    m = warm.train_epoch(1)
    assert np.isfinite(m["total"])

    # missing dir must raise (ref: :365-368)
    exp3 = str(tmp_path / "exp_bad")
    ws.save_experiment_specifications(exp3, dict(specs, UsePretrainedSDFDecoder=True))
    with pytest.raises(RuntimeError):
        Stage1Trainer(exp3)


@pytest.mark.slow
def test_multichip_mesh_training_8dev(tmp_path):
    """Full 8-virtual-device mesh: scene-sharded latent table and
    8-device vs 1-device loss parity under the same seed."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    data_dir = str(tmp_path / "data8")
    names = make_sphere_dataset(data_dir, list(np.linspace(0.3, 0.8, 8)))
    split_path = str(tmp_path / "split8.json")
    with open(split_path, "w") as f:
        json.dump(names, f)
    specs = dict(BASE_SPECS, DataSource=data_dir, TrainSplit=split_path,
                 TestSplit=split_path, ScenesPerBatch=8, NumEpochs=2)
    exp_dir = str(tmp_path / "exp8")
    ws.save_experiment_specifications(exp_dir, specs)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    trainer = Stage1Trainer(exp_dir, mesh=mesh)
    t_single = Stage1Trainer(exp_dir)
    # multi-step trajectory parity: the 8-device loss CURVE tracks the
    # single-device one across 5 epochs, not just a single step
    curve_mesh, curve_single = [], []
    for e in range(1, 6):
        curve_mesh.append(trainer.train_epoch(e)["total"])
        curve_single.append(t_single.train_epoch(e)["total"])
    assert np.all(np.isfinite(curve_mesh))
    assert "data" in str(trainer.state["lat"].sharding.spec)
    np.testing.assert_allclose(curve_mesh, curve_single, rtol=2e-3)
    # final latent tables agree too (the trajectories did not drift apart)
    np.testing.assert_allclose(
        trainer.latent_codes(), np.asarray(t_single.state["lat"]), rtol=2e-2, atol=1e-5
    )


@pytest.mark.slow
def test_multichip_mesh_training(tmp_path):
    """Training over a virtual 8-device mesh: sharded batch + scene-sharded
    latent table, loss finite, shardings preserved across steps."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    exp_dir, specs = _specs(tmp_path, ScenesPerBatch=4, NumEpochs=2)
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))  # 6 scenes % 2 == 0
    trainer = Stage1Trainer(exp_dir, mesh=mesh)
    m1 = trainer.train_epoch(1)
    m2 = trainer.train_epoch(2)
    assert np.isfinite(m1["total"]) and np.isfinite(m2["total"])
    assert "data" in str(trainer.state["lat"].sharding.spec)

    # parity with single-device training given the same seed/config
    t_single = Stage1Trainer(exp_dir)
    s1 = t_single.train_epoch(1)
    assert s1["total"] == pytest.approx(m1["total"], rel=1e-4)


@pytest.mark.slow
def test_multichip_fused_kernel_matches_xla(tmp_path, monkeypatch):
    """The shard_mapped fused train kernel (forced through the Pallas
    interpreter on the CPU mesh — f32, exact math) must track the XLA mesh
    path on the same specs/seed, INCLUDING a padded batch (6 scenes on a
    4-device mesh -> pad 8, masked via the kernel's per-scene weight row),
    with eikonal + code regularization on."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    net = {
        "dims": [64] * 5, "dropout": [], "dropout_prob": 0.0,
        "norm_layers": [0, 1, 2, 3, 4], "latent_in": [2], "xyz_in_all": False,
        "use_tanh": False, "latent_dropout": False, "weight_norm": True,
    }
    exp_dir, _ = _specs(
        tmp_path, ScenesPerBatch=6, NumEpochs=2, UseEikonal=True,
        NetworkSpecs=net,
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    t_xla = Stage1Trainer(exp_dir, mesh=mesh)
    mx = t_xla.train_epoch(1)
    assert not t_xla._fused_active

    monkeypatch.setenv("MSD_FUSED_FORCE", "interpret")
    t_f = Stage1Trainer(exp_dir, mesh=mesh)
    mf = t_f.train_epoch(1)
    assert t_f._fused_active
    for k in ("total", "sdf", "eikonal", "reg"):
        assert mf[k] == pytest.approx(mx[k], rel=5e-4, abs=1e-7), (k, mf[k], mx[k])
    np.testing.assert_allclose(
        t_f.latent_codes(), t_xla.latent_codes(), rtol=1e-3, atol=1e-6
    )


@pytest.mark.slow
def test_multichip_padded_batch_77_scenes(tmp_path):
    """Non-divisible scene counts must still SHARD (pad-and-mask), not
    replicate: 77 scenes / batch 77 on 8 devices pads to 80 with masked
    losses, and the loss matches the single-device run exactly
    (VERDICT r2 weak-item 3)."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    data_dir = str(tmp_path / "data77")
    names = make_sphere_dataset(
        data_dir, list(np.linspace(0.3, 0.8, 77)), n_pos=300, n_neg=300
    )
    split_path = str(tmp_path / "split77.json")
    with open(split_path, "w") as f:
        json.dump(names, f)
    specs = dict(BASE_SPECS, DataSource=data_dir, TrainSplit=split_path,
                 TestSplit=split_path, ScenesPerBatch=77, SamplesPerScene=128,
                 NumEpochs=2, UseEikonal=True, UseCovarianceLoss=True)
    exp_dir = str(tmp_path / "exp77")
    ws.save_experiment_specifications(exp_dir, specs)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    trainer = Stage1Trainer(exp_dir, mesh=mesh)
    # latent table padded to the next mesh multiple and sharded (not
    # replicated), real rows untouched
    assert trainer.num_scenes == 77 and trainer.num_scenes_padded == 80
    assert "data" in str(trainer.state["lat"].sharding.spec)
    m1 = trainer.train_epoch(1)
    # the padded batch must actually shard over the mesh
    assert trainer._batch_pad == 80
    assert "data" in str(trainer._batch_sharding.spec)

    t_single = Stage1Trainer(exp_dir)
    s1 = t_single.train_epoch(1)
    for k in ("total", "sdf", "eikonal", "reg", "covariance"):
        assert s1[k] == pytest.approx(m1[k], rel=1e-4, abs=1e-7), (k, s1[k], m1[k])

    # second epochs also track, and the updated real latents agree
    m2 = trainer.train_epoch(2)
    s2 = t_single.train_epoch(2)
    assert s2["total"] == pytest.approx(m2["total"], rel=1e-4)
    np.testing.assert_allclose(
        trainer.latent_codes(), np.asarray(t_single.state["lat"]), rtol=1e-3, atol=1e-6
    )

    # checkpoints strip the padding: resumable by a single-device trainer
    trainer.epoch = 2
    trainer.save_checkpoint("2")
    resumed = Stage1Trainer(exp_dir)
    start = resumed.resume("2")
    assert start == 3
    np.testing.assert_allclose(
        np.asarray(resumed.state["lat"]), trainer.latent_codes(), rtol=1e-6
    )
    # ...and by a fresh mesh trainer (re-padded + sharded)
    resumed_mesh = Stage1Trainer(exp_dir, mesh=mesh)
    resumed_mesh.resume("2")
    assert resumed_mesh.state["lat"].shape[0] == 80
    assert "data" in str(resumed_mesh.state["lat"].sharding.spec)
    m3 = resumed_mesh.train_epoch(3)
    assert np.isfinite(m3["total"])


def test_isometry_scenes_per_batch_cap(tmp_path):
    """IsometryScenesPerBatch subsamples the scenes the isometry family
    sees per step (ref: train_deep_sdf.py:629-638)."""
    exp_dir, specs = _specs(
        tmp_path,
        UseIsometryLoss=True,
        IsometryNumPoints=16,
        IsometryScenesPerBatch=2,
        NumEpochs=1,
    )
    trainer = Stage1Trainer(exp_dir)
    assert trainer.iso_scenes_per_batch == 2
    m = trainer.train_epoch(1)
    assert np.isfinite(m["iso"]) and np.isfinite(m["total"])
