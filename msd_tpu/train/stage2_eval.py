"""Stage-2 evaluation blocks: SAP metrics, latent-label correlation,
diagnosis/age tables (CSV), and per-split mesh + Chamfer evaluation.

Behavioral ports of train_MLP_VAE_deep_sdf.py:1911-1995
(compute_disentanglement_metrics), :2114-2434 (correlation + diagnosis
table), :2436-2581 (age table + AgeTables CSVs), :1997-2112 (mesh +
chamfer eval).
"""

from __future__ import annotations

import logging
import os

import numpy as np

import msd_tpu.workspace as ws
from msd_tpu.metrics import sap as sap_metric


def _valid_mask(labels_np):
    return np.isfinite(labels_np) & (labels_np != -1)


def compute_disentanglement_metrics(
    trainer, epoch: int, split_label: str, scene_indices=None, writer=None
):
    """SAP (+ Locatello) on the diagnosis label and SAP-age on the age
    label over the VAE mu's. Returns {sap, sap_locatello, sap_age}."""
    specs = trainer.specs
    from msd_tpu.config import get_spec_with_default as g

    compute_sap = g(specs, "ComputeSAP", False)
    compute_sap_age = g(specs, "ComputeSAPAge", False)
    if not compute_sap and not compute_sap_age:
        return {}
    if trainer.dataset.labels is None:
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

    codes = trainer.eval_latents(scene_indices)
    labels = trainer.dataset.labels
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

    if compute_sap_age:
        age_idx = g(specs, "SAPAgeLabelIndices", None) or [trainer.age_snnl_reg_label_index]
        factors = labels[:, [int(i) for i in age_idx]]
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


def compute_latent_label_correlation(trainer, epoch, split_label, scene_indices=None, writer=None):
    """corr(latent0, diagnosis label) (ref: :2114-2170)."""
    if trainer.dataset.labels is None:
        return None
    labels_np = trainer.dataset.labels[:, trainer.label_index].astype(float)
    codes = trainer.eval_latents(scene_indices)
    if scene_indices is not None:
        labels_np = labels_np[np.asarray(scene_indices)]
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


def latent_label_table(trainer, epoch, split_label, label_index, scene_indices=None, regression=True, nb_bins=10):
    """Per-dim (corr, sap) rows (ref diagnosis table :2172-2434)."""
    if trainer.dataset.labels is None:
        return []
    labels_np = trainer.dataset.labels[:, label_index].astype(float)
    codes = trainer.eval_latents(scene_indices)
    if scene_indices is not None:
        labels_np = labels_np[np.asarray(scene_indices)]
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


def write_age_table(trainer, epoch, split_label, scene_indices=None):
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
    )
    if not rows3:
        return None
    # linear-regression prediction stats per dim
    if trainer.dataset.labels is None:
        return None
    labels_np = trainer.dataset.labels[:, age_idx].astype(float)
    codes = trainer.eval_latents(scene_indices)
    if scene_indices is not None:
        labels_np = labels_np[np.asarray(scene_indices)]
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
                a = np.cov(x, labels_v)[0, 1] / vx
                pred = a * (x - x.mean()) + labels_v.mean()
            else:
                pred = np.full_like(labels_v, labels_v.mean())
            pm, ps = float(np.mean(pred)), float(np.std(pred))
            logging.info("  %3d | %6.3f | %6.3f | %9.4f | %8.4f", dim, corr, sap_val, pm, ps)
            f.write(f"{dim},{corr:.6f},{sap_val:.6f},{pm:.6f},{ps:.6f}\n")
    return table_path


def generate_eval_meshes(trainer, epoch, split_label, scene_indices, resolution=None, writer=None):
    """Decode selected scenes' VAE-reconstructed latents to meshes and
    Chamfer them against GT meshes when EvalGTMeshDir is set
    (ref: :1997-2112)."""
    from msd_tpu.config import get_spec_with_default as g
    from msd_tpu import mesh as mesh_mod
    from msd_tpu.metrics.chamfer import compute_mesh_chamfer

    specs = trainer.specs
    resolution = resolution or g(specs, "EvalGridResolution", 256)
    max_batch = g(specs, "EvalMaxBatch", 2**18)
    gt_dir = g(specs, "EvalGTMeshDir", None)
    gt_ext = g(specs, "EvalGTMeshExt", ".obj")

    import jax

    # z_hat = decoder(mu): the VAE-reconstructed teacher latents
    mu = trainer.eval_latents()
    z_hat = np.asarray(
        trainer.vae.decode(trainer.state["vae"], np.asarray(mu, np.float32))
    )
    sdf_params = trainer.sdf_params()
    cds = []
    for idx in scene_indices:
        iid = trainer.dataset.instance_ids[idx]
        out_dir = os.path.join(
            trainer.experiment_directory, ws.tb_logs_dir,
            f"Reconstructions{split_label.capitalize()}", iid,
        )
        os.makedirs(out_dir, exist_ok=True)
        res = mesh_mod.create_mesh(
            trainer.sdf_decoder, sdf_params, z_hat[idx],
            filename=os.path.join(out_dir, f"epoch={epoch}"),
            N=resolution, max_batch=max_batch, return_mesh=True,
        )
        if res is None or res is False:
            continue
        if gt_dir:
            gt_path = os.path.join(str(gt_dir), iid + gt_ext)
            if os.path.exists(gt_path):
                cd, _ = compute_mesh_chamfer(gt_path, res, num_mesh_samples=g(specs, "EvalGTMeshSamples", 30000))
                cds.append(cd)
    if cds and writer is not None:
        writer.add_scalar(f"Mean Chamfer Dist/{split_label}", float(np.mean(cds)), epoch)
    return cds
