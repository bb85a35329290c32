"""Stage-2 evaluation blocks: SAP, correlation, age tables, mesh eval."""

import os

import numpy as np
import pytest

from msd_tpu.train import stage2_eval as ev
from msd_tpu.train.stage2 import Stage2Trainer
from test_stage2_trainer import _setup


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("s2eval")
    exp_dir, specs, teacher = _setup(
        tmp,
        num_scenes=24,
        ComputeSAP=True,
        ComputeSAPAge=True,
        LabelTaskType="classification",
        GuidedContrastiveLoss=True,
        TrainLatentHoldoutFraction=0.25,
        EvalTrainFrequency=2,
    )
    tr = Stage2Trainer(exp_dir)
    for e in range(1, 10):
        tr.train_epoch(e)
    tr.epoch = 9
    return tr


def test_disentanglement_metrics(trained):
    out = ev.compute_disentanglement_metrics(trained, 9, "train", trained.train_indices)
    assert out["sap"] is not None and 0 <= out["sap"] <= 1
    # classification task with discrete factors -> locatello computed
    assert out["sap_locatello"] is not None
    assert out["sap_age"] is not None


def test_correlation_and_tables(trained):
    corr = ev.compute_latent_label_correlation(trained, 9, "train", trained.train_indices)
    assert corr is None or np.isfinite(corr) or np.isnan(corr)
    rows = ev.latent_label_table(trained, 9, "train", 1, trained.train_indices)
    assert len(rows) == trained.vae_latent_dim
    path = ev.write_age_table(trained, 9, "train", trained.train_indices)
    assert path and os.path.isfile(path)
    header = open(path).readline().strip()
    assert header == "dim,corr,sap_r2,pred_mean,pred_std"
    lines = open(path).readlines()
    assert len(lines) == 1 + trained.vae_latent_dim


def test_eval_mu_cached_once_per_epoch(trained, monkeypatch):
    """All eval blocks share one full-split encoder pass per (epoch,
    inputs): the mu matrix is computed once and reused by SAP,
    correlation, diagnosis and age tables (the reference re-encodes per
    block, train_MLP_VAE_deep_sdf.py:1911-2581 — ~5 identical passes)."""
    calls = {"n": 0}
    orig = trained.compute_vae_latents

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(trained, "compute_vae_latents", counting)
    old_epoch = trained.epoch
    try:
        trained.epoch = 10  # fresh epoch -> cache starts cold
        ev.compute_disentanglement_metrics(trained, 10, "train", trained.train_indices)
        ev.compute_latent_label_correlation(trained, 10, "train", trained.train_indices)
        ev.write_diagnosis_table(trained, 10, "train", trained.train_indices)
        ev.write_age_table(trained, 10, "train", trained.train_indices)
        ev.compute_disentanglement_metrics(trained, 10, "train_holdout", trained.holdout_indices)
        assert calls["n"] == 1, f"expected 1 encoder pass, saw {calls['n']}"
        # a new epoch invalidates the cache (weights may have moved)
        trained.epoch = 11
        ev.compute_latent_label_correlation(trained, 11, "train", trained.train_indices)
        assert calls["n"] == 2
    finally:
        trained.epoch = old_epoch


def test_mesh_eval_runs(trained, tmp_path):
    # the Stage-2 SDF decoder here is untrained, so extraction may find no
    # surface — the eval must warn-and-continue (reference behavior,
    # deep_sdf/mesh.py:118-124), not crash
    cds = ev.generate_eval_meshes(trained, 9, "train", trained.train_indices[:2], resolution=49)
    assert isinstance(cds, list)
    recon_dir = os.path.join(trained.experiment_directory, "TensorBoard", "ReconstructionsTrain")
    assert os.path.isdir(recon_dir)


def test_run_eval_losses(trained):
    """run_eval computes per-split VAE+SDF losses and logs the reference's
    scalar families (ref: train_MLP_VAE_deep_sdf.py:1684-1847)."""
    em = ev.run_eval(
        trained, 9, "eval_train", scene_indices=trained.train_indices,
        kl_weight=1.0, code_reg_weight=1.0,
    )
    for k in ("eval_loss", "eval_sdf_loss", "eval_sdf_reg", "eval_vae_recon",
              "eval_vae_kl", "eval_vae_lat_mag"):
        assert k in em and np.isfinite(em[k]), (k, em)
    # holdout split: fewer scenes, still finite
    em_h = ev.run_eval(
        trained, 9, "eval_train_holdout", scene_indices=trained.holdout_indices,
        kl_weight=1.0, code_reg_weight=1.0,
    )
    assert np.isfinite(em_h["eval_loss"])
    # eval is deterministic: same epoch -> same numbers
    em2 = ev.run_eval(
        trained, 9, "eval_train", scene_indices=trained.train_indices,
        kl_weight=1.0, code_reg_weight=1.0,
    )
    assert em2["eval_loss"] == em["eval_loss"]


def test_run_eval_external_dataset(trained):
    """val/test path: a separate dataset + reconstructed latents."""
    ds = trained.dataset  # reuse the arrays as a stand-in "val" dataset
    lat = trained.teacher_latents + 0.01
    em = ev.run_eval(
        trained, 9, "eval_val", dataset=ds, eval_latents=lat,
        scene_indices=np.arange(4), kl_weight=0.5, code_reg_weight=1.0,
    )
    assert np.isfinite(em["eval_loss"])
    corr = ev.compute_latent_label_correlation(
        trained, 9, "val", np.arange(ds.num_scenes), dataset=ds, eval_latents=lat
    )
    assert corr is None or isinstance(corr, float)


def test_diagnosis_table(trained):
    """Classification labels -> tables A/B with SAP/Locatello columns
    (ref: :2171-2434)."""
    rows = ev.write_diagnosis_table(trained, 9, "train", trained.train_indices)
    assert len(rows) == trained.vae_latent_dim
    dims, corrs, sap_accs = zip(*[(r[0], r[1], r[2]) for r in rows])
    assert list(dims) == list(range(trained.vae_latent_dim))
    finite_sap = [s for s in sap_accs if np.isfinite(s)]
    assert finite_sap and all(0 <= s <= 1 for s in finite_sap)


@pytest.mark.slow
def test_diagnosis_table_regression(tmp_path):
    exp_dir, specs, teacher = _setup(
        tmp_path, num_scenes=16, ComputeSAP=True, LabelTaskType="regression",
        LabelIndex=1,
    )
    tr = Stage2Trainer(exp_dir)
    tr.train_epoch(1)
    rows = ev.write_diagnosis_table(tr, 1, "train", tr.train_indices)
    assert len(rows) == tr.vae_latent_dim
    assert all(len(r) == 3 for r in rows)  # dim | corr | sap_r2


def test_chamfer_for_scenes_requires_gt(trained):
    # no EvalGTMeshDir -> None, no crash
    cd = ev.compute_chamfer_for_scenes(trained, 9, "train", trained.train_indices[:1])
    assert cd is None


@pytest.mark.slow
def test_eval_integrated_in_train(tmp_path):
    exp_dir, specs, teacher = _setup(
        tmp_path,
        num_scenes=16,
        ComputeSAP=True,
        LabelTaskType="classification",
        EvalTrainFrequency=2,
        NumEpochs=2,
    )
    tr = Stage2Trainer(exp_dir)
    tr.train(num_epochs=2)  # must not crash with evals enabled


@pytest.mark.slow
def test_sap_corr_extra_frequency_and_debug_predictions(tmp_path, caplog):
    """SAPCORRExtraFrequency runs the lightweight train_extra SAP/eval pass
    between full evals (ref: train_MLP_VAE_deep_sdf.py:3499-3560);
    SAPDebugPredictions adds prediction-count tables to the diagnosis logs
    (ref: :2392-2434)."""
    import logging as _logging

    exp_dir, specs, teacher = _setup(
        tmp_path,
        num_scenes=16,
        ComputeSAP=True,
        LabelTaskType="classification",
        EvalTrainFrequency=4,
        SAPCORRExtraFrequency=1,
        SAPDebugPredictions=True,
        SAPDebugPredSamples=2,
        SAPKumarHoldout=True,
    )
    tr = Stage2Trainer(exp_dir)
    tr.train_epoch(1)
    with caplog.at_level(_logging.INFO):
        tr._run_evals(1)  # extra-only epoch (1 % 4 != 0)
    text = caplog.text
    assert "extra summary" in text
    assert "train_extra" in text
    caplog.clear()
    for e in range(2, 5):
        tr.train_epoch(e)
    with caplog.at_level(_logging.INFO):
        tr._run_evals(4)  # full eval epoch: diagnosis tables + debug preds
    text = caplog.text
    assert "sap_pred_counts" in text
    assert "extra summary" in text


@pytest.mark.slow
def test_sap_corr_labels_file(tmp_path):
    """SAP/corr metrics read SAPCORRLabelsFile (and SAP-age its own
    SAPAgeCORRLabelsFile), which may differ from the training LabelsFile
    (ref: train_MLP_VAE_deep_sdf.py:857-866, :1204-1217)."""
    import torch

    exp_dir, specs, teacher = _setup(
        tmp_path,
        num_scenes=16,
        ComputeSAP=True,
        ComputeSAPAge=True,
        LabelTaskType="classification",
        SAPCORRLabelsFile="metric_labels.pt",
        SAPAgeCORRLabelsFile="age_labels.pt",
    )
    data_dir = specs["DataSource"]
    base = torch.load(os.path.join(data_dir, "labels.pt"), weights_only=False)
    flipped = {k: torch.tensor([1.0 - float(v[0]), float(v[1])]) for k, v in base.items()}
    torch.save(flipped, os.path.join(data_dir, "metric_labels.pt"))
    shifted = {k: torch.tensor([float(v[0]), float(v[1]) + 10.0]) for k, v in base.items()}
    torch.save(shifted, os.path.join(data_dir, "age_labels.pt"))

    tr = Stage2Trainer(exp_dir)
    m = tr.metric_label_matrix()
    base_mat = tr.dataset.labels
    assert np.allclose(m[:, 0], 1.0 - base_mat[:, 0])
    ma = tr.metric_label_matrix(age=True)
    assert np.allclose(ma[:, 1], base_mat[:, 1] + 10.0)
    # the metrics actually consume them: SAP on flipped diagnosis labels is
    # identical to SAP on the originals (label swap is symmetric), and the
    # pipeline runs end-to-end without touching dataset labels
    tr.train_epoch(1)
    out = ev.compute_disentanglement_metrics(tr, 1, "train", None)
    assert out["sap"] is not None and out["sap_age"] is not None
    # training-side labels (losses) still come from LabelsFile
    assert np.allclose(tr.dataset.labels[:, 0], base_mat[:, 0])


@pytest.mark.slow
def test_sap_corr_labels_file_none_skips(tmp_path, caplog):
    """Explicit SAPCORRLabelsFile=None skips metrics with the reference's
    warning (ref: :1854-1856)."""
    import logging as _logging

    exp_dir, specs, teacher = _setup(
        tmp_path, num_scenes=8, ComputeSAP=True,
        LabelTaskType="classification", SAPCORRLabelsFile=None,
    )
    tr = Stage2Trainer(exp_dir)
    tr.train_epoch(1)
    with caplog.at_level(_logging.WARNING):
        out = ev.compute_disentanglement_metrics(tr, 1, "train", None)
    assert out == {}
    assert "SAPCORRLabelsFile is missing" in caplog.text
