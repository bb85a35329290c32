"""Stage-1 test-split eval hook and Stage-2 val/test reconstruction eval."""

import json
import os

import numpy as np
import pytest

import msd_tpu.workspace as ws
from msd_tpu.train.stage1 import Stage1Trainer
from msd_tpu.train.stage2 import Stage2Trainer
from test_stage1_trainer import _specs, make_sphere_dataset
from test_stage2_trainer import _setup


@pytest.mark.slow
def test_stage1_eval_test_hook(tmp_path):
    exp_dir, specs = _specs(tmp_path, EvalTestSceneNumber=2, EvalTestOptimizationSteps=20, EvalGridResolution=33)
    trainer = Stage1Trainer(exp_dir)
    for e in range(1, 4):
        trainer.train_epoch(e)
    trainer.epoch = 3
    trainer._eval_test(3)  # must run end-to-end without error
    recon_dir = os.path.join(exp_dir, ws.tb_logs_dir, ws.tb_logs_test_reconstructions)
    assert os.path.isdir(recon_dir)
    assert len(os.listdir(recon_dir)) == 2


@pytest.mark.slow
def test_stage2_val_split_eval(tmp_path):
    exp_dir, specs, teacher = _setup(
        tmp_path,
        num_scenes=12,
        LabelTaskType="classification",
        ComputeSAP=True,
    )
    # use the train split as a "val" split (same data layout)
    specs["ValSplit"] = specs["TrainSplit"]
    specs["EvalValReconstructLatents"] = True
    specs["EvalValFrequency"] = 1
    specs["EvalTestOptimizationSteps"] = 15
    specs["EvalTestNumSamples"] = 128
    ws.save_experiment_specifications(exp_dir, specs)
    tr = Stage2Trainer(exp_dir)
    tr.train_epoch(1)
    tr.epoch = 1

    ds = tr.get_eval_dataset("val")
    assert ds is not None and ds.num_scenes == 12
    lat = tr.reconstruct_latents_for_dataset(ds, num_iterations=10, num_samples=64)
    assert lat.shape == (12, tr.latent_size)
    assert np.isfinite(lat).all()
    results = tr.eval_split(1, "val", lat, ds)
    assert "sap" in results or "corr" in results
    # the orchestration path also runs
    tr._run_evals(1)


def test_stage2_missing_split_graceful(tmp_path):
    exp_dir, specs, teacher = _setup(tmp_path, num_scenes=8)
    tr = Stage2Trainer(exp_dir)
    assert tr.get_eval_dataset("test") is None  # TestSplit not set
    tr._run_evals(1)  # no-op, no crash
