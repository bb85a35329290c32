#!/usr/bin/env python3
"""Preflight validator for experiment specs/labels — CLI compatible with the
reference's check_experiment_inputs.py (ref: check_experiment_inputs.py:1-291):
resolves spec paths, loads label maps, prints per-split label coverage/stats,
split overlaps, latent-file dimension checks, and decoder-path existence."""

import argparse
import json
import math
import os

import numpy as np

from msd_tpu.data.labels import load_labels
from msd_tpu.data.splits import get_instance_filenames


def resolve_spec_path(experiment_directory, spec_path):
    if spec_path is None:
        return None
    if os.path.isabs(spec_path):
        return spec_path
    return os.path.join(experiment_directory, spec_path)


def resolve_labels_path(data_source, labels_file):
    if labels_file is None:
        return None
    if os.path.isabs(labels_file):
        return labels_file
    return os.path.join(data_source, labels_file)


def _values_for_index(label_map, npyfiles, index):
    values, missing, bad_index = [], 0, 0
    for npy_path in npyfiles:
        base = os.path.splitext(os.path.basename(npy_path))[0]
        label = label_map.get(base)
        if label is None:
            missing += 1
            continue
        flat = np.asarray(label).reshape(-1)
        if index >= flat.size:
            bad_index += 1
            continue
        values.append(float(flat[index]))
    return values, missing, bad_index


def _summarize_values(values):
    arr = np.asarray([v for v in values if math.isfinite(v) and v != -1], float)
    return {
        "count": len(values),
        "valid": int(arr.size),
        "min": float(arr.min()) if arr.size else float("nan"),
        "max": float(arr.max()) if arr.size else float("nan"),
        "mean": float(arr.mean()) if arr.size else float("nan"),
        "std": float(arr.std()) if arr.size else float("nan"),
        "missing_or_invalid": len(values) - int(arr.size),
    }


def _print_stats(prefix, s):
    print(
        f"{prefix} count={s['count']} valid={s['valid']} min={s['min']:.4f} "
        f"max={s['max']:.4f} mean={s['mean']:.4f} std={s['std']:.4f} "
        f"missing_or_invalid={s['missing_or_invalid']}"
    )


def _check_latents(path, split_name, expected_dim, split_basenames):
    if path is None:
        print(f"[latents] {split_name}: path missing")
        return
    if not os.path.isfile(path):
        print(f"[latents] {split_name}: file not found: {path}")
        return
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "latent_codes" in data:
        codes = data["latent_codes"]
        if isinstance(codes, dict) and "weight" in codes:
            arr = codes["weight"]
            print(
                f"[latents] {split_name}: embedding table shape={tuple(arr.shape)} "
                f"expected_dim={expected_dim} dim_ok={arr.shape[-1] == expected_dim}"
            )
            return
    if not isinstance(data, dict):
        print(f"[latents] {split_name}: not a dict: {path}")
        return
    keys = set(data.keys())
    missing = [k for k in split_basenames if k not in keys]
    extra = [k for k in keys if k not in split_basenames]
    dims = set()
    for k in list(data.keys())[:10]:
        dims.add(int(np.asarray(data[k]).reshape(-1).size))
    dim_ok = expected_dim in dims if dims else False
    print(
        f"[latents] {split_name}: total={len(data)} missing={len(missing)} "
        f"extra={len(extra)} dims_sample={sorted(dims)} expected_dim={expected_dim} dim_ok={dim_ok}"
    )


def main():
    parser = argparse.ArgumentParser(description="Check experiment specs inputs/labels.")
    parser.add_argument("--experiment", "-e", required=True)
    parser.add_argument("--max_samples", type=int, default=0)
    args = parser.parse_args()

    exp_dir = args.experiment
    specs_path = os.path.join(exp_dir, "specs.json")
    if not os.path.isfile(specs_path):
        raise FileNotFoundError(f"specs.json not found: {specs_path}")
    with open(specs_path, encoding="utf-8") as f:
        specs = json.load(f)

    data_source = specs.get("DataSource")
    if data_source is None:
        raise ValueError("DataSource missing from specs")
    print(f"[data] DataSource {'ok' if os.path.isdir(data_source) else 'missing'}: {data_source}")

    split_files = {
        "train": specs.get("TrainSplit"),
        "test": specs.get("TestSplit"),
        "val": specs.get("ValSplit") or specs.get("ValidationSplit"),
    }
    split_npy = {}
    for name, split_path in split_files.items():
        if split_path is None:
            continue
        if not os.path.isfile(split_path):
            print(f"[split] {name} missing: {split_path}")
            continue
        with open(split_path, encoding="utf-8") as f:
            split_list = json.load(f)
        npyfiles = get_instance_filenames(data_source, split_list)
        if args.max_samples > 0:
            npyfiles = npyfiles[: args.max_samples]
        split_npy[name] = npyfiles
        print(f"[split] {name} count={len(npyfiles)} path={split_path}")

    def _basenames(files):
        return {os.path.splitext(os.path.basename(p))[0] for p in files}

    split_basenames = {k: _basenames(v) for k, v in split_npy.items()}
    for a, b in (("train", "test"), ("train", "val"), ("test", "val")):
        if a in split_basenames and b in split_basenames:
            print(f"[split] {a}∩{b} overlap={len(split_basenames[a] & split_basenames[b])}")

    label_index = int(specs.get("LabelIndex", 0))
    age_snnl_idx = int(specs.get("AgeSNNLRegLabelIndex", 1))
    sap_indices = specs.get("SAPLabelIndices", None)
    sap_age_indices = specs.get("SAPAgeLabelIndices", None)
    age_table_idx = specs.get("AgeLabelIndexForTable", None)
    if age_table_idx is None:
        age_table_idx = int(sap_age_indices[0]) if sap_age_indices else age_snnl_idx
    indices_to_check = sorted(
        {label_index, age_snnl_idx, age_table_idx}
        | (set(sap_indices) if sap_indices else set())
        | (set(sap_age_indices) if sap_age_indices else set())
    )

    labels_files = {
        "LabelsFile": specs.get("LabelsFile"),
        "PseudoLabelsFile": specs.get("PseudoLabelsFile"),
        "RealLabelsFile": specs.get("RealLabelsFile"),
        "SAPCORRLabelsFile": specs.get("SAPCORRLabelsFile"),
        "SAPAgeCORRLabelsFile": specs.get("SAPAgeCORRLabelsFile"),
    }
    for name, label_file in labels_files.items():
        if label_file is None:
            continue
        label_path = resolve_labels_path(data_source, label_file)
        try:
            label_map = load_labels(label_path)
        except Exception as exc:
            print(f"[labels] {name} error: {exc}")
            continue
        print(f"[labels] {name} path={label_path}")
        for split_name, npyfiles in split_npy.items():
            base_missing = sum(
                1 for p in npyfiles
                if os.path.splitext(os.path.basename(p))[0] not in label_map
            )
            print(f"[labels] {name} split={split_name} missing={base_missing} total={len(npyfiles)}")
            for idx in indices_to_check:
                values, missing, bad_index = _values_for_index(label_map, npyfiles, idx)
                stats = _summarize_values(values)
                prefix = f"[labels] {name} split={split_name} idx={idx}"
                _print_stats(prefix, stats)
                if missing or bad_index:
                    print(f"{prefix} missing_labels={missing} bad_index={bad_index}")

    code_length = int(specs.get("CodeLength", 0))
    pretrained_latents = resolve_spec_path(
        exp_dir, specs.get("PretrainedLatentPath") or specs.get("LatentCodesPath")
    )
    test_latents = resolve_spec_path(exp_dir, specs.get("TestLatentPath"))
    val_latents = resolve_spec_path(exp_dir, specs.get("ValLatentPath"))
    if "train" in split_basenames:
        _check_latents(pretrained_latents, "train", code_length, split_basenames["train"])
    if "test" in split_basenames:
        _check_latents(test_latents, "test", code_length, split_basenames["test"])
    if "val" in split_basenames:
        _check_latents(val_latents, "val", code_length, split_basenames["val"])

    pretrained_decoder = resolve_spec_path(
        exp_dir, specs.get("PretrainedSDFDecoderPath") or specs.get("PretrainedDecoderPath")
    )
    if pretrained_decoder is not None:
        status = "ok" if os.path.isfile(pretrained_decoder) else "missing"
        print(f"[decoder] {status}: {pretrained_decoder}")


if __name__ == "__main__":
    main()
