#!/usr/bin/env python3
"""Reconstruct shapes from SDF samples with a trained decoder — CLI
compatible with the reference (ref: reconstruct.py:154-357)."""

import argparse
import json
import logging
import os
import random
import time

import numpy as np

import msd_tpu.workspace as ws
from msd_tpu import mesh
from msd_tpu.data.sdf_samples import read_sdf_samples, remove_nans
from msd_tpu.data.splits import get_instance_filenames
from msd_tpu.models import build_decoder
from msd_tpu.train.reconstruct import reconstruct
from msd_tpu.utils import add_common_args, configure_logging
from msd_tpu.utils import checkpoint as ckpt

from msd_tpu.utils.compile_cache import enable_compile_cache

if __name__ == "__main__":
    enable_compile_cache()
    arg_parser = argparse.ArgumentParser(
        description="Use a trained DeepSDF decoder to reconstruct a shape given SDF samples."
    )
    arg_parser.add_argument("--experiment", "-e", dest="experiment_directory", required=True)
    arg_parser.add_argument("--checkpoint", "-c", dest="checkpoint", default="latest")
    arg_parser.add_argument("--data", "-d", dest="data_source", required=True)
    arg_parser.add_argument("--split", "-s", dest="split_filename", required=True)
    arg_parser.add_argument("--iters", dest="iterations", default=800)
    arg_parser.add_argument("--mesh_resolution", dest="mesh_resolution", type=int, default=256)
    arg_parser.add_argument(
        "--skip", dest="skip", action="store_true", help="Skip shapes already reconstructed."
    )
    arg_parser.add_argument(
        "--batch", dest="batch_size", type=int, default=0,
        help="Fit this many shapes per device program (0 = one at a time, the "
        "reference's behavior). Latent fits are independent, so batching "
        "vmaps them into one program; on a multi-chip mesh the batch shards "
        "across chips.",
    )
    add_common_args(arg_parser)
    args = arg_parser.parse_args()
    configure_logging(args)

    specs = ws.load_experiment_specifications(args.experiment_directory)
    latent_size = specs["CodeLength"]
    decoder = build_decoder(specs["NetworkArch"], latent_size, specs["NetworkSpecs"])
    params, saved_model_epoch = ckpt.load_model(
        args.experiment_directory, args.checkpoint, decoder
    )

    with open(args.split_filename) as f:
        split = json.load(f)
    npz_filenames = get_instance_filenames(args.data_source, split)
    random.shuffle(npz_filenames)

    dirname = str(saved_model_epoch)
    if "train" in args.split_filename:
        dirname += "_on_train_set"
    reconstruction_dir = os.path.join(
        args.experiment_directory, ws.reconstructions_subdir, dirname
    )
    reconstruction_meshes_dir = os.path.join(reconstruction_dir, ws.reconstruction_meshes_subdir)
    reconstruction_codes_dir = os.path.join(reconstruction_dir, ws.reconstruction_codes_subdir)
    os.makedirs(reconstruction_meshes_dir, exist_ok=True)
    os.makedirs(reconstruction_codes_dir, exist_ok=True)

    # resolve the worklist first (shared by both modes)
    work = []
    for npz in npz_filenames:
        if "npz" not in npz or not os.path.isfile(npz):
            continue
        mesh_filename = os.path.join(reconstruction_meshes_dir, os.path.basename(npz)[:-4])
        latent_filename = os.path.join(
            reconstruction_codes_dir, os.path.basename(npz)[:-4] + ".pth"
        )
        if args.skip and os.path.isfile(mesh_filename + ".ply") and os.path.isfile(latent_filename):
            continue
        work.append((npz, mesh_filename, latent_filename))

    def save_outputs(latent, mesh_filename, latent_filename):
        mesh.create_mesh(
            decoder, params, latent, mesh_filename, N=args.mesh_resolution, max_batch=int(2**18)
        )
        import torch

        torch.save(torch.from_numpy(np.asarray(latent).reshape(1, -1).copy())[None, ...], latent_filename)

    err_sum = 0.0
    if args.batch_size > 1:
        # fit batch_size shapes per device program (sharded over the mesh
        # when multiple chips are visible)
        from msd_tpu.train.reconstruct import reconstruct_batch

        n_dev = len(__import__("jax").devices())
        dev_mesh = None
        if n_dev > 1:
            from msd_tpu.parallel.mesh_utils import make_mesh

            dev_mesh = make_mesh()
        done = 0
        for start_i in range(0, len(work), args.batch_size):
            group = work[start_i : start_i + args.batch_size]
            shapes = []
            for npz, _, _ in group:
                pos, neg = read_sdf_samples(npz)
                shapes.append((remove_nans(pos), remove_nans(neg)))
            start = time.time()
            errs, latents = reconstruct_batch(
                decoder, params, int(args.iterations), latent_size, shapes,
                0.01, 0.1, num_samples=8000, lr=5e-3, l2reg=True, mesh=dev_mesh,
            )
            logging.info(
                "reconstructed %d shapes in %.2fs (%.2fs/shape)",
                len(group), time.time() - start, (time.time() - start) / len(group),
            )
            for (npz, mesh_filename, latent_filename), err, latent in zip(group, errs, latents):
                err_sum += float(err)
                done += 1
                logging.debug("current_error avg: %s", err_sum / done)
                save_outputs(latent, mesh_filename, latent_filename)
    else:
        # one shape at a time (pow2 sample padding keeps one jitted program
        # reused across every shape — no per-shape recompiles)
        for ii, (npz, mesh_filename, latent_filename) in enumerate(work):
            logging.info("reconstructing %s", npz)
            pos, neg = read_sdf_samples(npz)
            pos, neg = remove_nans(pos), remove_nans(neg)

            start = time.time()
            err, latent = reconstruct(
                decoder,
                params,
                int(args.iterations),
                latent_size,
                [pos, neg],
                0.01,
                0.1,
                num_samples=8000,
                lr=5e-3,
                l2reg=True,
            )
            logging.debug("reconstruct time: %s", time.time() - start)
            err_sum += err
            logging.debug("current_error avg: %s", err_sum / (ii + 1))

            start = time.time()
            save_outputs(latent, mesh_filename, latent_filename)
            logging.info("total time: %s", time.time() - start)
