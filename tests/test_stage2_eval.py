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


def test_mesh_eval_runs(trained, tmp_path):
    # the Stage-2 SDF decoder here is untrained, so extraction may find no
    # surface — the eval must warn-and-continue (reference behavior,
    # deep_sdf/mesh.py:118-124), not crash
    cds = ev.generate_eval_meshes(trained, 9, "train", trained.train_indices[:2], resolution=49)
    assert isinstance(cds, list)
    recon_dir = os.path.join(trained.experiment_directory, "TensorBoard", "ReconstructionsTrain")
    assert os.path.isdir(recon_dir)


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
