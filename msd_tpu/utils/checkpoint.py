"""Checkpoint IO in the reference's on-disk formats.

Three synchronized checkpoint families per experiment, written at
SnapshotFrequency multiples + AdditionalSnapshots + rolling latest.pth
(ref: train_deep_sdf.py:32-79,231-257,891-904):

* ModelParameters/<E>.pth  = {"epoch", "model_state_dict"}
* OptimizerParameters/<E>.pth = {"epoch", "optimizer_state_dict"}
* LatentCodes/<E>.pth      = {"epoch", "latent_codes": Embedding state dict}
* Logs.pth                 = loss/lr/timing/magnitude histories + epoch

Model state dicts use the reference's parameter naming (via each model's
``params_to_torch_state_dict``) so checkpoints interoperate with reference
tooling in both directions. Optimizer state is ours (JAX Adam moments stored
as tensors under "msd_tpu_adam") — the reference only reads it to resume its
own runs, so cross-framework *optimizer* resume is not a supported contract.

torch is used strictly as the .pth (de)serializer.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

import msd_tpu.workspace as ws


def _torch():
    import torch

    return torch


def save_model(experiment_directory, filename, decoder, params, epoch):
    torch = _torch()
    d = ws.get_model_params_dir(experiment_directory, True)
    torch.save(
        {"epoch": epoch, "model_state_dict": decoder.params_to_torch_state_dict(params)},
        os.path.join(d, filename),
    )


def load_model(experiment_directory, checkpoint, decoder):
    """Returns (params, epoch). Accepts reference-trained checkpoints
    (DataParallel prefixes handled by the converter)."""
    torch = _torch()
    filename = os.path.join(
        ws.get_model_params_dir(experiment_directory), str(checkpoint) + ".pth"
    )
    if not os.path.isfile(filename):
        raise Exception(f'model state dict "{filename}" does not exist')
    data = torch.load(filename, map_location="cpu", weights_only=False)
    params = decoder.params_from_torch_state_dict(data["model_state_dict"])
    return params, data["epoch"]


def save_latent_vectors(experiment_directory, filename, latents, epoch):
    """latents: [num_scenes, latent_size] array. Stored as an Embedding
    state dict {"weight": tensor} (ref: train_deep_sdf.py:70-79)."""
    torch = _torch()
    d = ws.get_latent_codes_dir(experiment_directory, True)
    weight = torch.from_numpy(np.asarray(latents).copy())
    torch.save(
        {"epoch": epoch, "latent_codes": {"weight": weight}},
        os.path.join(d, filename),
    )


def load_latent_vectors(experiment_directory, filename, expected_shape=None):
    """Returns (latents [S, L] f32 array, epoch). Handles both the Embedding
    state-dict format and the legacy [S, 1, L] raw-tensor format
    (ref: train_deep_sdf.py:83-113, deep_sdf/workspace.py:83-115)."""
    torch = _torch()
    full = os.path.join(ws.get_latent_codes_dir(experiment_directory), filename)
    if not os.path.isfile(full):
        raise Exception(f'latent state file "{full}" does not exist')
    data = torch.load(full, map_location="cpu", weights_only=False)
    codes = data["latent_codes"]
    if isinstance(codes, dict):
        arr = codes["weight"].detach().numpy()
    else:
        arr = codes.detach().numpy()
        if arr.ndim == 3:  # legacy [S, 1, L]
            arr = arr[:, 0, :]
    arr = np.asarray(arr, np.float32)
    if expected_shape is not None and tuple(arr.shape) != tuple(expected_shape):
        raise Exception(
            f"num latent codes mismatched: {arr.shape} vs {expected_shape}"
        )
    return arr, data["epoch"]


def save_optimizer(experiment_directory, filename, opt_state, epoch):
    torch = _torch()
    d = ws.get_optimizer_params_dir(experiment_directory, True)
    flat, treedef = jax.tree.flatten(opt_state)
    torch.save(
        {
            "epoch": epoch,
            "optimizer_state_dict": {
                "msd_tpu_adam": [torch.from_numpy(np.asarray(x).copy()) for x in flat]
            },
        },
        os.path.join(d, filename),
    )


def load_optimizer(experiment_directory, filename, opt_state_template):
    torch = _torch()
    full = os.path.join(ws.get_optimizer_params_dir(experiment_directory), filename)
    if not os.path.isfile(full):
        raise Exception(f'optimizer state dict "{full}" does not exist')
    data = torch.load(full, map_location="cpu", weights_only=False)
    flat_t = data["optimizer_state_dict"]["msd_tpu_adam"]
    flat, treedef = jax.tree.flatten(opt_state_template)
    if len(flat) != len(flat_t):
        raise Exception("optimizer state structure mismatch")
    new_flat = [
        jnp.asarray(t.numpy()).astype(x.dtype).reshape(x.shape)
        for t, x in zip(flat_t, flat)
    ]
    return jax.tree.unflatten(treedef, new_flat), data["epoch"]


def save_logs(experiment_directory, loss_log, lr_log, timing_log, lat_mag_log, param_mag_log, epoch):
    """ref: train_deep_sdf.py:135-155."""
    torch = _torch()
    torch.save(
        {
            "epoch": epoch,
            "loss": loss_log,
            "learning_rate": lr_log,
            "timing": timing_log,
            "latent_magnitude": lat_mag_log,
            "param_magnitude": param_mag_log,
        },
        os.path.join(experiment_directory, ws.logs_filename),
    )


def load_logs(experiment_directory):
    torch = _torch()
    full = os.path.join(experiment_directory, ws.logs_filename)
    if not os.path.isfile(full):
        raise Exception(f'log file "{full}" does not exist')
    data = torch.load(full, map_location="cpu", weights_only=False)
    return (
        data["loss"],
        data["learning_rate"],
        data["timing"],
        data["latent_magnitude"],
        data["param_magnitude"],
        data["epoch"],
    )


def clip_logs(loss_log, lr_log, timing_log, lat_mag_log, param_mag_log, epoch):
    """ref: train_deep_sdf.py:177-188."""
    iters_per_epoch = len(loss_log) // max(1, len(lr_log))
    loss_log = loss_log[: (iters_per_epoch * epoch)]
    lr_log = lr_log[:epoch]
    timing_log = timing_log[:epoch]
    lat_mag_log = lat_mag_log[:epoch]
    for n in param_mag_log:
        param_mag_log[n] = param_mag_log[n][:epoch]
    return loss_log, lr_log, timing_log, lat_mag_log, param_mag_log


# ---------------------------------------------------------------------------
# Orbax checkpointing (optional fast native format alongside the
# reference-compatible .pth files — SURVEY §5.4 TPU equivalent).


def save_orbax(experiment_directory, name, state, opt_state, epoch):
    """Save the full {params, opt_state, epoch} pytree with orbax under
    <exp>/OrbaxCheckpoints/<name>."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(experiment_directory, "OrbaxCheckpoints", str(name)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {"state": state, "opt_state": opt_state._asdict(), "epoch": epoch},
        force=True,
    )
    ckptr.wait_until_finished()
    return path


def load_orbax(experiment_directory, name, state_template, opt_state_template):
    """Restore a pytree saved by save_orbax. Returns (state, opt_state, epoch)."""
    import orbax.checkpoint as ocp

    from msd_tpu.utils.optim import AdamState

    path = os.path.abspath(os.path.join(experiment_directory, "OrbaxCheckpoints", str(name)))
    ckptr = ocp.StandardCheckpointer()
    template = {
        "state": state_template,
        "opt_state": opt_state_template._asdict(),
        "epoch": 0,
    }
    restored = ckptr.restore(path, template)
    return restored["state"], AdamState(**restored["opt_state"]), int(restored["epoch"])
