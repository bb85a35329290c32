"""Native hyperparameter search driver."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import hparams_optuna_vae_sdf as hpo
from test_stage2_trainer import _setup

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sample_params_space():
    rng = np.random.default_rng(0)
    p = hpo.sample_params(rng, [])
    assert 1e-3 <= p["VAEReconWeight"] <= 5e-1
    assert 0 <= p["KLWarmupEpochs"] <= 150
    assert p["AgeSNNLRegThreshold"] in (0.15, 0.2)
    # guided sampling kicks in with history
    history = [
        {"params": hpo.sample_params(rng, []), "value": float(v)}
        for v in np.linspace(0, 1, 10)
    ]
    p2 = hpo.sample_params(rng, history)
    assert set(p2) == set(p)


def test_tpe_converges_on_toy_objective():
    """The native TPE sampler must concentrate samples near a toy optimum:
    after the random-startup phase the sampled objective should beat the
    startup mean by a clear margin (pure random would stay flat)."""

    def objective(p):
        # optimum at VAEReconWeight=0.05 (log-space), SNNLWeight=0.6,
        # KLWarmupEpochs=40, AgeSNNLRegThreshold=0.2
        return (
            -((np.log(p["VAEReconWeight"]) - np.log(0.05)) ** 2)
            - 8.0 * (p["SNNLWeight"] - 0.6) ** 2
            - (p["KLWarmupEpochs"] - 40.0) ** 2 / 900.0
            + (0.5 if p["AgeSNNLRegThreshold"] == 0.2 else 0.0)
        )

    rng = np.random.default_rng(7)
    history = []
    for i in range(60):
        params = hpo.sample_params(rng, history)
        history.append({"trial": i, "params": params, "value": objective(params)})
    startup = [t["value"] for t in history[: hpo.N_STARTUP]]
    tail = [t["value"] for t in history[-15:]]
    assert np.mean(tail) > np.mean(startup) + 1.0
    # the tail should also concentrate the log-space parameter near 0.05
    tail_recon = [np.log(t["params"]["VAEReconWeight"]) for t in history[-15:]]
    assert abs(np.median(tail_recon) - np.log(0.05)) < 1.0


def test_tpe_handles_failed_trials():
    """Trials with value=None (failed) must be ignored by the sampler, and
    sampling must stay in-domain for every parameter kind."""
    rng = np.random.default_rng(3)
    history = []
    for i in range(30):
        params = hpo.sample_params(rng, history)
        value = None if i % 3 == 0 else float(np.sin(i))
        history.append({"trial": i, "params": params, "value": value})
    p = hpo.sample_params(rng, history)
    for name, kind, args in hpo.SEARCH_SPACE:
        if kind == "categorical":
            assert p[name] in args[0]
        else:
            lo, hi = args
            assert lo <= p[name] <= hi
        if kind == "int":
            assert isinstance(p[name], int)


def test_build_trial_specs():
    base = {
        "NumEpochs": 999,
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 1.0, "Interval": 1, "Factor": 0.5},
            {"Type": "Step", "Initial": 1.0, "Interval": 1, "Factor": 0.5},
        ],
    }
    rng = np.random.default_rng(1)
    params = hpo.sample_params(rng, [])
    specs = hpo.build_trial_specs(base, params, 500)
    assert specs["NumEpochs"] == 500
    assert specs["VAELatentDim"] == 8
    assert specs["AgeCorrLeakageLoss"] is False
    assert specs["LearningRateSchedule"][0]["Initial"] == params["LrInitial"]
    assert specs["LearningRateSchedule"][1]["Initial"] == pytest.approx(
        params["LrInitial"] * params["Lr2Ratio"]
    )
    assert base["NumEpochs"] == 999  # base not mutated


@pytest.mark.slow
def test_run_trial_end_to_end(tmp_path):
    exp_dir, specs, teacher = _setup(
        tmp_path,
        num_scenes=16,
        ComputeSAP=True,
        LabelTaskType="classification",
        GuidedContrastiveLoss=True,
        TrainLatentHoldoutFraction=0.25,
        NumEpochs=2,
        SnapshotFrequency=2,
    )
    value, detail = hpo.run_trial(str(tmp_path / "trial_0"), specs, train_epochs=2)
    assert np.isfinite(value)
    assert set(detail) == {"sap", "corr", "recon"}


@pytest.mark.slow
def test_non_finite_holdout_recon_fails_trial(tmp_path, monkeypatch):
    """A NaN holdout recon must FAIL the trial (value=None in trials.json),
    not silently substitute the train loss (which would reward overfitting
    in exactly the failed-eval case)."""
    exp_dir, specs, teacher = _setup(
        tmp_path,
        num_scenes=16,
        TrainLatentHoldoutFraction=0.25,
        NumEpochs=1,
        SnapshotFrequency=1,
    )
    from msd_tpu.train import stage2_eval as ev

    monkeypatch.setattr(
        ev, "run_eval",
        lambda *a, **k: {"eval_vae_recon": float("nan"), "eval_total": float("nan")},
    )
    with pytest.raises(RuntimeError, match="non-finite"):
        hpo.run_trial(str(tmp_path / "trial_nan"), specs, train_epochs=1)
