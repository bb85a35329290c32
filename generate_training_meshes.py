#!/usr/bin/env python3
"""Decode every training latent to a mesh under TrainingMeshes/<epoch>/ —
CLI compatible with the reference (ref: generate_training_meshes.py:14-140)."""

import argparse
import logging
import os

import numpy as np

import msd_tpu.workspace as ws
from msd_tpu import mesh
from msd_tpu.data.splits import get_instance_filenames, load_split
from msd_tpu.models import build_decoder
from msd_tpu.utils import add_common_args, configure_logging
from msd_tpu.utils import checkpoint as ckpt


def code_to_mesh(experiment_directory, checkpoint, keep_normalized=False, resolution=256):
    specs = ws.load_experiment_specifications(experiment_directory)
    latent_size = specs["CodeLength"]
    decoder = build_decoder(specs["NetworkArch"], latent_size, specs["NetworkSpecs"])
    params, saved_model_epoch = ckpt.load_model(experiment_directory, checkpoint, decoder)
    latent_vectors, _ = ckpt.load_latent_vectors(experiment_directory, checkpoint + ".pth")

    data_source = specs["DataSource"]
    train_split = load_split(specs["TrainSplit"])
    instance_filenames = get_instance_filenames(data_source, train_split)
    logging.info("%d instances vs %d latents", len(instance_filenames), len(latent_vectors))

    for i, latent_vector in enumerate(latent_vectors):
        parts = instance_filenames[i].split("/")
        instance_name = os.path.splitext(parts[-1])[0]
        dataset_name = parts[-3] if len(parts) >= 3 else ""
        class_name = parts[-2] if len(parts) >= 2 else ""

        mesh_dir = os.path.join(
            experiment_directory, ws.training_meshes_subdir, str(saved_model_epoch),
            dataset_name, class_name,
        )
        os.makedirs(mesh_dir, exist_ok=True)
        mesh_filename = os.path.join(mesh_dir, instance_name)

        offset = None
        scale = None
        if not keep_normalized:
            norm_file = ws.get_normalization_params_filename(
                data_source, dataset_name, class_name, instance_name
            )
            if os.path.isfile(norm_file):
                normalization_params = np.load(norm_file)
                offset = normalization_params["offset"]
                scale = normalization_params["scale"]

        mesh.create_mesh(
            decoder, params, latent_vector, mesh_filename,
            N=resolution, max_batch=int(2**18), offset=offset, scale=scale,
        )


from msd_tpu.utils.compile_cache import enable_compile_cache

if __name__ == "__main__":
    enable_compile_cache()
    arg_parser = argparse.ArgumentParser(
        description="Use a trained DeepSDF decoder to generate a mesh given a latent code."
    )
    arg_parser.add_argument("--experiment", "-e", dest="experiment_directory", required=True)
    arg_parser.add_argument("--checkpoint", "-c", dest="checkpoint", default="latest")
    arg_parser.add_argument("--keep_normalized", "-k", dest="keep_normalized", action="store_true")
    arg_parser.add_argument("--resolution", dest="resolution", type=int, default=256)
    add_common_args(arg_parser)
    args = arg_parser.parse_args()
    configure_logging(args)
    code_to_mesh(
        args.experiment_directory, args.checkpoint, args.keep_normalized, args.resolution
    )
