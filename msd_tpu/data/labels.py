"""Label loading.

The reference stores per-shape labels as ``labels.pt`` — a torch-saved dict
``{instance_id: tensor}`` next to the SdfSamples (ref: deep_sdf/data.py:231-263,
train_MLP_VAE_deep_sdf.py label specs). torch (CPU) is used only for this
file-format interop; a ``.npz``/``.json`` fallback keeps the framework usable
without torch.
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np


def load_labels(labels_path: str) -> dict:
    """Load an id->vector label map from .pt (torch), .npz, or .json."""
    if not os.path.isfile(labels_path):
        raise FileNotFoundError(f"labels file not found: {labels_path}")
    ext = os.path.splitext(labels_path)[1].lower()
    if ext in (".pt", ".pth"):
        import torch  # file-format interop only

        raw = torch.load(labels_path, map_location="cpu", weights_only=False)
        return {
            k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v, np.float32).reshape(-1)
            for k, v in raw.items()
        }
    if ext == ".npz":
        npz = np.load(labels_path)
        return {k: np.asarray(npz[k], np.float32).reshape(-1) for k in npz.files}
    if ext == ".json":
        with open(labels_path) as f:
            raw = json.load(f)
        return {k: np.asarray(v, np.float32).reshape(-1) for k, v in raw.items()}
    raise ValueError(f"unsupported labels file format: {labels_path}")


def save_labels(labels_path: str, label_map: dict):
    ext = os.path.splitext(labels_path)[1].lower()
    if ext in (".pt", ".pth"):
        import torch

        torch.save({k: torch.as_tensor(np.asarray(v)) for k, v in label_map.items()}, labels_path)
    elif ext == ".npz":
        np.savez(labels_path, **{k: np.asarray(v) for k, v in label_map.items()})
    elif ext == ".json":
        with open(labels_path, "w") as f:
            json.dump({k: np.asarray(v).tolist() for k, v in label_map.items()}, f)
    else:
        raise ValueError(f"unsupported labels file format: {labels_path}")
    logging.debug("saved %d labels to %s", len(label_map), labels_path)
