"""Stage-2 evaluation blocks: SAP metrics, latent-label correlation,
diagnosis/age tables (CSV), and per-split mesh + Chamfer evaluation.

Behavioral ports of train_MLP_VAE_deep_sdf.py:1911-1995
(compute_disentanglement_metrics), :2114-2434 (correlation + diagnosis
table), :2436-2581 (age table + AgeTables CSVs), :1997-2112 (mesh +
chamfer eval).
"""

from __future__ import annotations

import hashlib
import logging
import os

import numpy as np

import msd_tpu.workspace as ws
from msd_tpu.metrics import sap as sap_metric


def _valid_mask(labels_np):
    return np.isfinite(labels_np) & (labels_np != -1)


def _eval_inputs(trainer, dataset=None, eval_latents=None):
    """The VAE input array for a split: surface points in points mode,
    else the split's (teacher/reconstructed) latents. None when unavailable
    (ref _select_vae_inputs, train_MLP_VAE_deep_sdf.py:1554-1580)."""
    if dataset is None or dataset is trainer.dataset:
        if trainer.vae_input_mode == "points":
            return trainer.dataset.surface_points
        return eval_latents if eval_latents is not None else trainer.teacher_latents
    if trainer.vae_input_mode == "points":
        return dataset.surface_points
    return eval_latents


def _cached_mu(trainer, inputs):
    """Full-split VAE mu matrix, computed at most once per (epoch, split
    inputs). Every eval block (run_eval aside, which needs per-batch
    sampling anyway) used to call ``compute_vae_latents`` independently —
    five identical full-dataset encoder passes per eval epoch (the
    reference recomputes too, train_MLP_VAE_deep_sdf.py:1911-2581; we
    dedupe). The cache is invalidated whenever ``trainer.epoch`` moves, so
    post-update weights can never serve stale codes. Entries hold a strong
    reference to the inputs array so an ``id()`` can't be recycled while
    its entry is alive."""
    epoch = int(getattr(trainer, "epoch", -1))
    cache = getattr(trainer, "_eval_mu_cache", None)
    if cache is None or cache["epoch"] != epoch:
        cache = trainer._eval_mu_cache = {"epoch": epoch, "entries": {}}
    entry = cache["entries"].get(id(inputs))
    if entry is not None and entry[0] is inputs:
        return entry[1]
    mu = trainer.compute_vae_latents(inputs=inputs)
    cache["entries"][id(inputs)] = (inputs, mu)
    return mu


def _codes_for(trainer, dataset=None, eval_latents=None, scene_indices=None):
    """VAE mu's for a split, optionally restricted to scene_indices."""
    inputs = _eval_inputs(trainer, dataset, eval_latents)
    if inputs is None:
        return None
    mu = _cached_mu(trainer, inputs)
    if scene_indices is not None:
        mu = mu[np.asarray(scene_indices)]
    return mu


def _labels_for(trainer, dataset, label_index, scene_indices=None, age=False):
    """Metric-label column for a split — reads the SAPCORRLabelsFile map via
    the trainer when configured (ref: train_MLP_VAE_deep_sdf.py:1204-1217),
    else the dataset-attached labels."""
    ds = dataset if dataset is not None else trainer.dataset
    labels = trainer.metric_label_matrix(ds, age=age)
    if labels is None:
        return None
    labels_np = labels[:, int(label_index)].astype(float)
    if scene_indices is not None:
        labels_np = labels_np[np.asarray(scene_indices)]
    return labels_np


def run_eval(
    trainer, epoch: int, split_label: str, dataset=None, eval_latents=None,
    scene_indices=None, kl_weight: float = 0.0, code_reg_weight: float = 0.0,
    writer=None,
):
    """Per-split VAE+SDF loss evaluation (ref: train_MLP_VAE_deep_sdf.py
    :1684-1847). Computes the plain VAE objective (recon+KL — the reference
    always uses vae_loss here, regardless of the training objective) plus
    the SDF-consistency loss on the split's sample points, averaged per
    batch, and logs the reference's scalar families. Returns the
    eval_metrics dict or None."""
    import jax
    import jax.numpy as jnp

    from msd_tpu.data.sdf_samples import sample_sdf_batch
    from msd_tpu.losses import vae as vl
    from msd_tpu.losses.sdf import deep_sdf_loss
    from msd_tpu.models.residual_mlp_vae import expand_latent_to_points

    ds = dataset if dataset is not None else trainer.dataset
    if ds is None:
        return None
    inputs = _eval_inputs(trainer, dataset, eval_latents)
    points_mode = trainer.vae_input_mode == "points"
    teacher = None
    if not points_mode:
        teacher = inputs
        if teacher is None:
            raise RuntimeError("Latent inputs required for latent encoder.")
    else:
        teacher = eval_latents if dataset is not None and dataset is not trainer.dataset else trainer.teacher_latents
    if inputs is None:
        return None
    has_teacher = teacher is not None

    if scene_indices is None:
        scene_indices = np.arange(ds.num_scenes)
    scene_indices = np.asarray(scene_indices)
    if len(scene_indices) == 0:
        return None

    cache = getattr(trainer, "_run_eval_fns", None)
    if cache is None:
        cache = trainer._run_eval_fns = {}
    if has_teacher not in cache:
        vae = trainer.vae
        sdf_decoder = trainer.sdf_decoder
        P = trainer.num_samp_per_scene
        clamp = trainer.clamp_dist
        _ht = has_teacher

        def eval_batch(vae_params, sdf_params, vae_in_b, teacher_b, pos, pc, neg, nc, idx, key, klw, crw):
            batch = sample_sdf_batch(pos, pc, neg, nc, idx, P, key)
            xyz = batch[..., :3]
            gt = jnp.clip(batch[..., 3:4], -clamp, clamp).reshape(-1, 1)
            vae_out = vae.apply(vae_params, vae_in_b, rng=key, train=False)
            mu, logvar, z_hat = vae_out["mu"], vae_out["logvar"], vae_out["z_hat"]
            if _ht:
                vae_total, recon, kl = vl.vae_loss(
                    z_hat, teacher_b, mu, logvar,
                    recon_weight=trainer.vae_recon_weight, kl_weight=klw,
                    recon_loss=trainer.recon_loss_type,
                )
            else:
                vae_total = jnp.float32(0.0)
                recon = kl = jnp.float32(jnp.nan)
            lat_pts, xyz_flat = expand_latent_to_points(z_hat, xyz)
            pred = sdf_decoder.apply(sdf_params, jnp.concatenate([lat_pts, xyz_flat], axis=1))
            pred = jnp.clip(pred, -clamp, clamp)
            _, sdf_l, sdf_reg = deep_sdf_loss(
                pred, gt, lat_pts,
                code_reg_lambda=trainer.code_reg_lambda, code_reg_weight=crw,
            )
            total = trainer.sdf_loss_weight * (sdf_l + sdf_reg) + vae_total
            lat_mag = jnp.mean(jnp.linalg.norm(mu, axis=1))
            return total, sdf_l, sdf_reg, recon, kl, lat_mag

        cache[has_teacher] = jax.jit(eval_batch)
    eval_batch = cache[has_teacher]

    pos, pc, neg, nc = ds.device_arrays()
    inputs_dev = jnp.asarray(inputs, jnp.float32)
    teacher_dev = jnp.asarray(teacher, jnp.float32) if has_teacher else jnp.zeros((1, 1))
    vae_params = trainer.state["vae"]
    sdf_params = trainer.sdf_params()

    B = min(trainer.scene_per_batch, len(scene_indices))
    rows = []
    # chained fold_ins (salt, split, epoch, batch) cannot collide the way a
    # linear 777000+epoch*1000+start formula does across epochs (start is a
    # scene offset that can exceed 1000) or across same-epoch splits
    split_key = jax.random.fold_in(
        jax.random.fold_in(trainer.base_key, 777),
        int(hashlib.sha256(split_label.encode()).hexdigest()[:8], 16),
    )
    epoch_key = jax.random.fold_in(split_key, epoch)
    for bi, start in enumerate(range(0, len(scene_indices), B)):
        sel = scene_indices[start : start + B]
        key = jax.random.fold_in(epoch_key, bi)
        out = eval_batch(
            vae_params, sdf_params, inputs_dev[sel],
            teacher_dev[sel] if has_teacher else teacher_dev,
            pos, pc, neg, nc, jnp.asarray(sel), key,
            jnp.float32(kl_weight), jnp.float32(code_reg_weight),
        )
        rows.append([float(x) for x in jax.device_get(out)])
    m = np.asarray(rows)  # per-batch means, averaged equally like the ref
    eval_metrics = {
        "eval_loss": float(np.mean(m[:, 0])),
        "eval_sdf_loss": float(np.mean(m[:, 1])),
        "eval_sdf_reg": float(np.mean(m[:, 2])),
        "eval_vae_recon": float(np.mean(m[:, 3])),
        "eval_vae_kl": float(np.mean(m[:, 4])),
        "eval_vae_lat_mag": float(np.mean(m[:, 5])),
    }
    logging.info(
        "%s eval loss: %.6f | sdf: %.6f | sdf_reg: %.6f | vae_recon: %.6f | vae_kl: %.6f",
        split_label, eval_metrics["eval_loss"], eval_metrics["eval_sdf_loss"],
        eval_metrics["eval_sdf_reg"], eval_metrics["eval_vae_recon"],
        eval_metrics["eval_vae_kl"],
    )
    w = writer if writer is not None else trainer.writer
    w.add_scalar(f"Loss/{split_label}", eval_metrics["eval_loss"], epoch)
    w.add_scalar(f"Loss/{split_label}_sdf", eval_metrics["eval_sdf_loss"], epoch)
    w.add_scalar(f"Loss/{split_label}_reg", eval_metrics["eval_sdf_reg"], epoch)
    w.add_scalar(f"Loss/{split_label}_vae_recon", eval_metrics["eval_vae_recon"], epoch)
    w.add_scalar(f"Loss/{split_label}_vae_kl", eval_metrics["eval_vae_kl"], epoch)
    w.add_scalar(f"Mean Latent Magnitude/{split_label}", eval_metrics["eval_vae_lat_mag"], epoch)
    return eval_metrics


def compute_disentanglement_metrics(
    trainer, epoch: int, split_label: str, scene_indices=None, writer=None,
    dataset=None, eval_latents=None,
):
    """SAP (+ Locatello) on the diagnosis label and SAP-age on the age
    label over the VAE mu's. Returns {sap, sap_locatello, sap_age}."""
    specs = trainer.specs
    from msd_tpu.config import get_spec_with_default as g

    ds = dataset if dataset is not None else trainer.dataset
    compute_sap = g(specs, "ComputeSAP", False)
    compute_sap_age = g(specs, "ComputeSAPAge", False)
    if not compute_sap and not compute_sap_age:
        return {}
    if trainer.metric_label_matrix(ds) is None:
        return {}

    label_task_type = trainer.label_task_type
    if "SAPRegression" in specs:
        sap_regression = specs["SAPRegression"]
    elif label_task_type in ("classification", "class", "cls", "binary"):
        sap_regression = False
    elif label_task_type in ("regression", "reg", "continuous"):
        sap_regression = True
    else:
        sap_regression = g(specs, "SAPRegression", False)
    if "SAPContinuousFactors" in specs:
        sap_continuous = specs["SAPContinuousFactors"]
    elif label_task_type in ("classification", "class", "cls", "binary"):
        sap_continuous = False
    elif label_task_type in ("regression", "reg", "continuous"):
        sap_continuous = True
    else:
        sap_continuous = g(specs, "SAPContinuousFactors", True)
    sap_nb_bins = g(specs, "SAPNumBins", 10)
    sap_label_indices = g(specs, "SAPLabelIndices", None) or [trainer.label_index]

    codes = _codes_for(trainer, dataset, eval_latents, scene_indices)
    if codes is None:
        logging.warning("SAP skipped (%s): VAE inputs unavailable.", split_label)
        return {}
    labels = trainer.metric_label_matrix(ds)
    if scene_indices is not None:
        labels = labels[np.asarray(scene_indices)]

    out = {"sap": None, "sap_locatello": None, "sap_age": None}
    if compute_sap:
        factors = labels[:, [int(i) for i in sap_label_indices]]
        mask = _valid_mask(factors).all(axis=1)
        if mask.sum() >= 4:
            f_np, c_np = factors[mask], codes[mask]
            out["sap"] = sap_metric.sap(
                f_np, c_np, continuous_factors=sap_continuous,
                nb_bins=sap_nb_bins, regression=sap_regression,
            )
            if not sap_regression and not sap_continuous:
                try:
                    out["sap_locatello"], _ = sap_metric.sap_binary_classification_locatello(f_np, c_np)
                except Exception as exc:
                    logging.warning("Locatello SAP skipped (%s): %s", split_label, exc)
            if writer is not None:
                writer.add_scalar(f"SAP/vae_{split_label}", out["sap"], epoch)
                if out["sap_locatello"] is not None:
                    writer.add_scalar(f"SAP/vae_locatello_{split_label}", out["sap_locatello"], epoch)

    age_labels = labels
    if compute_sap_age and trainer.sap_age_corr_labels_file != trainer.sap_corr_labels_file:
        # SAP-age may read its own labels file (ref: :1958-1966)
        age_labels = trainer.metric_label_matrix(ds, age=True)
        if age_labels is not None and scene_indices is not None:
            age_labels = age_labels[np.asarray(scene_indices)]
    if compute_sap_age and age_labels is not None:
        age_idx = g(specs, "SAPAgeLabelIndices", None) or [trainer.age_snnl_reg_label_index]
        factors = age_labels[:, [int(i) for i in age_idx]]
        mask = _valid_mask(factors).all(axis=1)
        if mask.sum() >= 4:
            out["sap_age"] = sap_metric.sap(
                factors[mask], codes[mask],
                continuous_factors=g(specs, "SAPAgeContinuousFactors", True),
                nb_bins=g(specs, "SAPAgeNumBins", sap_nb_bins),
                regression=g(specs, "SAPAgeRegression", True),
            )
            if writer is not None:
                writer.add_scalar(f"SAP/vae_{split_label}_age", out["sap_age"], epoch)

    parts = [f"{k}={v:.6f}" for k, v in out.items() if v is not None]
    if parts:
        logging.info("Epoch %d metrics (%s): %s", epoch, split_label, " | ".join(parts))
    return out


def compute_latent_label_correlation(
    trainer, epoch, split_label, scene_indices=None, writer=None,
    dataset=None, eval_latents=None,
):
    """corr(latent0, diagnosis label) (ref: :2114-2170)."""
    labels_np = _labels_for(trainer, dataset, trainer.label_index, scene_indices)
    codes = _codes_for(trainer, dataset, eval_latents, scene_indices)
    if labels_np is None or codes is None:
        return None
    mask = _valid_mask(labels_np)
    if mask.sum() < 2:
        return None
    latent0 = codes[mask, 0]
    labels_np = labels_np[mask]
    if np.std(latent0) == 0 or np.std(labels_np) == 0:
        corr = float("nan")
    else:
        corr = float(np.corrcoef(latent0, labels_np)[0, 1])
    if writer is not None:
        writer.add_scalar(f"Correlation/{split_label}_latent0_label", corr, epoch)
    logging.info(
        "Epoch %d correlation (%s): latent0 vs label[%d] = %.6f",
        epoch, split_label, trainer.label_index, corr,
    )
    return corr


def latent_label_table(
    trainer, epoch, split_label, label_index, scene_indices=None,
    regression=True, nb_bins=10, dataset=None, eval_latents=None, age=False,
):
    """Per-dim (corr, sap) rows (ref diagnosis table :2172-2434)."""
    labels_np = _labels_for(trainer, dataset, label_index, scene_indices, age=age)
    codes = _codes_for(trainer, dataset, eval_latents, scene_indices)
    if labels_np is None or codes is None:
        return []
    mask = _valid_mask(labels_np)
    if mask.sum() < 2:
        return []
    labels_np = labels_np[mask]
    latents = codes[mask]
    try:
        sap_matrix = sap_metric.sap_score_matrix(
            labels_np.reshape(-1, 1), latents,
            continuous_factors=regression, nb_bins=nb_bins, regression=regression,
        )
        sap_scores = sap_matrix[0]
    except Exception:
        sap_scores = np.full(latents.shape[1], np.nan)
    rows = []
    for dim in range(latents.shape[1]):
        x = latents[:, dim]
        if np.std(x) == 0 or np.std(labels_np) == 0:
            corr = float("nan")
        else:
            corr = float(np.corrcoef(x, labels_np)[0, 1])
        rows.append((dim, corr, float(sap_scores[dim])))
    return rows


def write_age_table(trainer, epoch, split_label, scene_indices=None, dataset=None, eval_latents=None):
    """AgeTables CSV: dim,corr,sap_r2,pred_mean,pred_std
    (ref: :2436-2581)."""
    from msd_tpu.config import get_spec_with_default as g

    age_idx = g(trainer.specs, "AgeLabelIndexForTable", None)
    if age_idx is None:
        age_indices = g(trainer.specs, "SAPAgeLabelIndices", None)
        age_idx = int(age_indices[0]) if age_indices else int(trainer.age_snnl_reg_label_index)
    rows3 = latent_label_table(
        trainer, epoch, split_label, age_idx, scene_indices,
        regression=g(trainer.specs, "SAPAgeRegression", True),
        nb_bins=g(trainer.specs, "SAPAgeNumBins", 10),
        dataset=dataset, eval_latents=eval_latents, age=True,
    )
    if not rows3:
        return None
    # linear-regression prediction stats per dim
    labels_np = _labels_for(trainer, dataset, age_idx, scene_indices, age=True)
    codes = _codes_for(trainer, dataset, eval_latents, scene_indices)
    if labels_np is None or codes is None:
        return None
    mask = _valid_mask(labels_np)
    labels_v = labels_np[mask]
    latents = codes[mask]

    table_dir = os.path.join(trainer.experiment_directory, ws.tb_logs_dir, "AgeTables")
    os.makedirs(table_dir, exist_ok=True)
    table_path = os.path.join(table_dir, f"age_table_{split_label}_epoch_{epoch}.csv")
    logging.info("Epoch %d age latent table (%s):", epoch, split_label)
    logging.info("  dim | corr | sap_r2 | pred_mean | pred_std")
    with open(table_path, "w", encoding="utf-8") as f:
        f.write("dim,corr,sap_r2,pred_mean,pred_std\n")
        for dim, corr, sap_val in rows3:
            x = latents[:, dim]
            vx = np.var(x)
            if vx > 0:
                # least-squares slope: matched ddof=0 sums (np.cov defaults
                # to ddof=1, which would inflate the slope by n/(n-1))
                a = np.mean((x - x.mean()) * (labels_v - labels_v.mean())) / vx
                pred = a * (x - x.mean()) + labels_v.mean()
            else:
                pred = np.full_like(labels_v, labels_v.mean())
            pm, ps = float(np.mean(pred)), float(np.std(pred))
            logging.info("  %3d | %6.3f | %6.3f | %9.4f | %8.4f", dim, corr, sap_val, pm, ps)
            f.write(f"{dim},{corr:.6f},{sap_val:.6f},{pm:.6f},{ps:.6f}\n")
    return table_path


def write_diagnosis_table(trainer, epoch, split_label, scene_indices=None, dataset=None, eval_latents=None):
    """Per-dim latent-vs-diagnosis tables (ref print_latent_diagnosis_table,
    train_MLP_VAE_deep_sdf.py:2171-2434). Regression labels log
    dim|corr|sap_r2; classification labels log tables A (corr, SAP acc/err,
    Kumar-holdout acc) and B (holdout err, Locatello acc/err). Returns the
    row list (A-rows for classification)."""
    from msd_tpu.config import get_spec_with_default as g

    specs = trainer.specs
    labels_np = _labels_for(trainer, dataset, trainer.label_index, scene_indices)
    codes = _codes_for(trainer, dataset, eval_latents, scene_indices)
    if labels_np is None or codes is None:
        logging.warning("Latent table skipped (%s): inputs unavailable.", split_label)
        return []
    mask = _valid_mask(labels_np)
    if mask.sum() < 2:
        logging.warning("Latent table skipped (%s): insufficient valid labels.", split_label)
        return []
    labels_np = labels_np[mask].astype(float)
    latents = codes[mask]

    label_task_type = trainer.label_task_type
    sap_regression = g(specs, "SAPRegression", label_task_type in ("regression", "reg", "continuous"))
    sap_continuous = g(specs, "SAPContinuousFactors", label_task_type not in ("classification", "class", "cls", "binary"))
    sap_nb_bins = g(specs, "SAPNumBins", 10)
    is_regression = bool(sap_regression or sap_continuous)

    sap_scores = None
    if g(specs, "ComputeSAP", False):
        try:
            sap_matrix = sap_metric.sap_score_matrix(
                labels_np.reshape(-1, 1), latents,
                continuous_factors=sap_continuous, nb_bins=sap_nb_bins,
                regression=sap_regression,
            )
            if sap_matrix.shape[0] > 0:
                sap_scores = sap_matrix[0]
        except Exception as exc:
            logging.warning("SAP per-latent scores unavailable (%s): %s", split_label, exc)

    def _corr(dim):
        x = latents[:, dim]
        if np.std(x) == 0 or np.std(labels_np) == 0:
            return float("nan")
        return float(np.corrcoef(x, labels_np)[0, 1])

    # prediction-debug summaries (ref: train_MLP_VAE_deep_sdf.py:2233-2246)
    debug_preds = bool(g(specs, "SAPDebugPredictions", False))
    debug_pred_n = int(g(specs, "SAPDebugPredSamples", 0))
    sap_pred_info = None
    if debug_preds:
        try:
            factors = labels_np.reshape(-1, 1)
            if is_regression:
                sap_pred_info = sap_metric.sap_regression_predictions(
                    factors, latents, pred_sample_n=debug_pred_n
                )
            else:
                sap_pred_info = sap_metric.sap_classification_predictions(
                    factors, latents, continuous_factors=sap_continuous,
                    nb_bins=sap_nb_bins, pred_sample_n=debug_pred_n,
                )
        except Exception as exc:
            logging.warning("SAP prediction debug unavailable (%s): %s", split_label, exc)

    if is_regression:
        logging.info("Epoch %d latent vs label table (%s):", epoch, split_label)
        logging.info("  dim | corr | sap_r2")
        rows = []
        for dim in range(latents.shape[1]):
            sap_val = float(sap_scores[dim]) if sap_scores is not None else float("nan")
            rows.append((dim, _corr(dim), sap_val))
            logging.info("  %3d | %6.3f | %6.3f", dim, rows[-1][1], sap_val)
        if debug_preds and sap_pred_info is not None:
            # ref: :2268-2283
            logging.info("  dim | sap_pred_mean | sap_pred_std | sap_pred_sample")
            for dim in range(latents.shape[1]):
                info = sap_pred_info[0][dim] if sap_pred_info else None
                logging.info(
                    "  %3d | %12s | %12s | %s", dim,
                    "n/a" if not info else "%.4f" % info.get("pred_mean", float("nan")),
                    "n/a" if not info else "%.4f" % info.get("pred_std", float("nan")),
                    "n/a" if not info or info.get("pred_sample") is None else info["pred_sample"],
                )
        return rows

    labels_int = labels_np.astype(int)
    unique_labels, unique_counts = np.unique(labels_int, return_counts=True)
    logging.info(
        "  label balance (%s): %s", split_label,
        {int(k): int(v) for k, v in zip(unique_labels, unique_counts)},
    )
    loc_err_matrix = None
    loc_pred_info = None
    try:
        if debug_preds:
            _, loc_err_matrix, loc_pred_info = sap_metric.sap_binary_classification_locatello(
                labels_int.reshape(-1, 1), latents,
                return_predictions=True, pred_sample_n=debug_pred_n,
            )
        else:
            _, loc_err_matrix = sap_metric.sap_binary_classification_locatello(
                labels_int.reshape(-1, 1), latents
            )
    except Exception as exc:
        logging.warning("Locatello SAP per-latent scores unavailable (%s): %s", split_label, exc)
    sap_holdout_test_acc = None
    sap_holdout_pred_info = None
    sap_kumar_holdout = bool(g(specs, "SAPKumarHoldout", False))
    if sap_kumar_holdout:
        try:
            _, sap_holdout_test_acc, sap_holdout_pred_info = (
                sap_metric.sap_classification_holdout_predictions(
                    labels_int.reshape(-1, 1), latents,
                    continuous_factors=sap_continuous, nb_bins=sap_nb_bins,
                    train_frac=float(g(specs, "SAPKumarHoldoutFrac", 0.8)),
                    random_state=g(specs, "SAPKumarHoldoutSeed", 0),
                    pred_sample_n=debug_pred_n if debug_preds else 0,
                )
            )
        except Exception as exc:
            logging.warning("Kumar holdout SAP unavailable (%s): %s", split_label, exc)

    logging.info("Epoch %d latent vs diagnosis tables (%s):", epoch, split_label)
    logging.info("  table A: dim | corr | sap_acc | sap_err | sap_hold_acc")
    logging.info("  table B: dim | sap_hold_err | loc_acc | loc_err")
    rows_a, rows_b = [], []
    for dim in range(latents.shape[1]):
        corr = _corr(dim)
        sap_val = float(sap_scores[dim]) if sap_scores is not None else float("nan")
        sap_err = 1.0 - sap_val if np.isfinite(sap_val) else float("nan")
        hold_val = hold_err = float("nan")
        if sap_holdout_test_acc is not None:
            hold_val = float(sap_holdout_test_acc[0][dim])
            if np.isfinite(hold_val):
                hold_err = 1.0 - hold_val
        loc_err = loc_val = float("nan")
        if loc_err_matrix is not None and loc_err_matrix.shape[0] > 0:
            loc_err = float(loc_err_matrix[0][dim])
            if np.isfinite(loc_err):
                loc_val = 1.0 - loc_err
        rows_a.append((dim, corr, sap_val, sap_err, hold_val))
        rows_b.append((dim, hold_err, loc_val, loc_err))
    for dim, corr, sap_val, sap_err, hold_val in rows_a:
        logging.info("  A %3d | %6.3f | %7.3f | %7.3f | %12.3f", dim, corr, sap_val, sap_err, hold_val)
    for dim, hold_err, loc_val, loc_err in rows_b:
        logging.info("  B %3d | %12.3f | %7.3f | %7.3f", dim, hold_err, loc_val, loc_err)
    if sap_holdout_test_acc is not None:
        vals = sap_holdout_test_acc[0]
        vals = np.sort(vals[np.isfinite(vals)])
        if vals.size >= 2:
            logging.info(
                "Epoch %d Kumar SAP holdout gap (%s): %.6f",
                epoch, split_label, float(vals[-1] - vals[-2]),
            )
    if debug_preds:
        # per-dim prediction-count/sample table (ref: :2392-2434)
        if sap_kumar_holdout:
            logging.info(
                "  dim | sap_pred_counts | sap_hold_pred_counts | loc_pred_counts"
                " | sap_pred_sample | sap_hold_pred_sample | loc_pred_sample"
            )
        else:
            logging.info("  dim | sap_pred_counts | loc_pred_counts | sap_pred_sample | loc_pred_sample")
        for dim in range(latents.shape[1]):
            sap_info = sap_pred_info[0][dim] if sap_pred_info else None
            loc_info = loc_pred_info[0][dim] if loc_pred_info else None
            hold_info = sap_holdout_pred_info[0][dim] if sap_holdout_pred_info else None
            cells = [
                sap_info.get("pred_counts") if sap_info else None,
            ]
            if sap_kumar_holdout:
                cells.append(hold_info.get("test_pred_counts") if hold_info else None)
            cells += [
                loc_info.get("pred_counts") if loc_info else None,
                sap_info.get("pred_sample") if sap_info else None,
            ]
            if sap_kumar_holdout:
                cells.append(hold_info.get("test_pred_sample") if hold_info else None)
            cells.append(loc_info.get("pred_sample") if loc_info else None)
            logging.info(
                "  %3d | " + " | ".join("%s" for _ in cells), dim,
                *("n/a" if c is None else c for c in cells),
            )
    return rows_a


def _zhat_for_scenes(trainer, scene_indices, dataset=None, eval_latents=None):
    """z_hat (VAE-reconstructed latents) for selected scenes of a split.
    Returns (ds, z_hat [len(idx), L]) or (ds, None) if inputs missing."""
    import jax

    ds = dataset if dataset is not None else trainer.dataset
    inputs = _eval_inputs(trainer, dataset, eval_latents)
    if inputs is None:
        return ds, None
    sel = np.asarray(scene_indices)
    vae_out = trainer.vae.apply(
        trainer.state["vae"], np.asarray(inputs, np.float32)[sel],
        rng=jax.random.PRNGKey(0), train=False,
    )
    return ds, np.asarray(vae_out["z_hat"])


def generate_eval_meshes(
    trainer, epoch, split_label, scene_indices, resolution=None, writer=None,
    dataset=None, eval_latents=None, return_meshes=False,
):
    """Decode selected scenes' z_hat to meshes under the TensorBoard
    reconstruction dirs (ref generate_eval_meshes, :1997-2047).

    With ``return_meshes`` returns (written_ids, {scene_idx: (verts,
    faces)}) so a following Chamfer pass can reuse the extractions
    instead of re-running create_mesh per scene."""
    from msd_tpu.config import get_spec_with_default as g
    from msd_tpu import mesh as mesh_mod

    if scene_indices is None or len(scene_indices) == 0:
        return ([], {}) if return_meshes else []
    specs = trainer.specs
    resolution = resolution or g(specs, "EvalGridResolution", 256)
    max_batch = g(specs, "EvalMaxBatch", 2**18)
    ds, z_hat = _zhat_for_scenes(trainer, scene_indices, dataset, eval_latents)
    if z_hat is None:
        logging.error("%s latents missing; skipping %s mesh generation.", split_label, split_label)
        return ([], {}) if return_meshes else []
    recon_dir = (
        ws.tb_logs_train_reconstructions if split_label == "train"
        else ws.tb_logs_test_reconstructions
    )
    written = []
    meshes = {}
    sdf_params = trainer.sdf_params()
    for j, idx in enumerate(scene_indices):
        iid = ds.instance_ids[idx]
        out_dir = os.path.join(trainer.experiment_directory, ws.tb_logs_dir, recon_dir, iid)
        os.makedirs(out_dir, exist_ok=True)
        res = mesh_mod.create_mesh(
            trainer.sdf_decoder, sdf_params, z_hat[j],
            filename=os.path.join(out_dir, f"epoch={epoch}"),
            N=resolution, max_batch=max_batch, return_mesh=True,
        )
        if res is not None and res is not False:
            written.append(iid)
            meshes[int(idx)] = res
    return (written, meshes) if return_meshes else written


def compute_chamfer_for_scenes(
    trainer, epoch, split_label, scene_indices, writer=None,
    dataset=None, eval_latents=None, meshes=None,
):
    """Mean Chamfer of selected scenes' decoded meshes vs EvalGTMeshDir
    ground truth; logs Chamfer/{split} (ref compute_chamfer_for_scenes,
    :2049-2112). Returns the mean CD or None. ``meshes`` (optional,
    {scene_idx: (verts, faces)} from ``generate_eval_meshes(...,
    return_meshes=True)``) reuses already-extracted meshes instead of
    re-running create_mesh per scene."""
    from msd_tpu.config import get_spec_with_default as g
    from msd_tpu import mesh as mesh_mod
    from msd_tpu.metrics.chamfer import compute_mesh_chamfer

    specs = trainer.specs
    gt_dir = g(specs, "EvalGTMeshDir", None)
    if gt_dir is None or scene_indices is None or len(scene_indices) == 0:
        return None
    gt_ext = g(specs, "EvalGTMeshExt", ".obj")
    resolution = g(specs, "EvalGridResolution", 256)
    max_batch = g(specs, "EvalMaxBatch", 2**18)
    ds, z_hat = _zhat_for_scenes(trainer, scene_indices, dataset, eval_latents)
    if z_hat is None:
        logging.error("%s latents missing; skipping %s Chamfer.", split_label, split_label)
        return None
    sdf_params = trainer.sdf_params()
    cds = []
    for j, idx in enumerate(scene_indices):
        iid = ds.instance_ids[idx]
        gt_path = os.path.join(str(gt_dir), iid + gt_ext)
        if not os.path.isfile(gt_path):
            logging.warning("GT mesh missing for chamfer: %s", gt_path)
            continue
        res = meshes.get(int(idx)) if meshes is not None else None
        if res is None:
            res = mesh_mod.create_mesh(
                trainer.sdf_decoder, sdf_params, z_hat[j],
                N=resolution, max_batch=max_batch, return_mesh=True,
            )
        if res is None or res is False:
            continue
        cd, _ = compute_mesh_chamfer(
            gt_path, res, num_mesh_samples=g(specs, "EvalGTMeshSamples", 30000)
        )
        cds.append(cd)
    if not cds:
        return None
    mean_cd = float(np.mean(cds))
    w = writer if writer is not None else trainer.writer
    w.add_scalar(f"Chamfer/{split_label}", mean_cd, epoch)
    return mean_cd
