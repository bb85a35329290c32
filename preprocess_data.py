#!/usr/bin/env python3
"""Pre-process meshes into SDF samples / surface samples — CLI compatible
with the reference's preprocess_data.py (ref: preprocess_data.py:81-269),
with the C++/OpenGL binaries replaced by the TPU-native sampling pipeline
(msd_tpu/preprocess/mesh_to_sdf.py).

Unlike the reference (one subprocess per mesh over a thread pool), meshes
are processed sequentially on the accelerator — the kNN sign vote batches
500k queries per mesh, which saturates the chip on its own.
"""

import argparse
import json
import logging
import os

import numpy as np

import msd_tpu.workspace as ws
from msd_tpu.data.mesh_io import load_mesh, save_ply
from msd_tpu.preprocess import preprocess_mesh
from msd_tpu.preprocess.mesh_to_sdf import sample_visible_surface
from msd_tpu.utils import add_common_args, configure_logging
from msd_tpu.utils.compile_cache import enable_compile_cache


def append_data_source_map(data_dir, name, source):
    """Maintain .datasources.json (ref: preprocess_data.py:56-78)."""
    data_source_map_filename = ws.get_data_source_map_filename(data_dir)
    source = os.path.abspath(source)
    data_source_map = {}
    if os.path.isfile(data_source_map_filename):
        with open(data_source_map_filename) as f:
            data_source_map = json.load(f)
    if name in data_source_map and not os.path.abspath(data_source_map[name]) == source:
        raise RuntimeError(f"Cannot add data with the same name and a different source: {name}")
    data_source_map[name] = source
    with open(data_source_map_filename, "w") as f:
        json.dump(data_source_map, f, indent=2)


if __name__ == "__main__":
    enable_compile_cache()
    arg_parser = argparse.ArgumentParser(
        description="Pre-processes data from a data source and appends the results to a dataset."
    )
    arg_parser.add_argument("--data_dir", "-d", dest="data_dir", required=True)
    arg_parser.add_argument("--source", "-s", dest="source_dir", required=True)
    arg_parser.add_argument("--name", "-n", dest="source_name", default=None)
    arg_parser.add_argument("--split", dest="split_filename", required=True)
    arg_parser.add_argument("--skip", dest="skip", default=False, action="store_true")
    arg_parser.add_argument(
        "--threads", dest="num_threads", default=8,
        help="(accepted for CLI compat with the reference's per-shape thread "
        "pool, ref preprocess_data.py:252-269; here every local device "
        "cooperates on every shape — the KNN vote's query axis is sharded "
        "over the device mesh, see msd_tpu.preprocess.knn_sign_vote)",
    )
    arg_parser.add_argument("--test", "-t", dest="test_sampling", default=False, action="store_true")
    arg_parser.add_argument("--surface", dest="surface_sampling", default=False, action="store_true")
    arg_parser.add_argument("--aug", dest="use_augmented", default=False, action="store_true")
    arg_parser.add_argument("--samples", dest="num_samples", type=int, default=500000)
    arg_parser.add_argument(
        "--visibility", dest="visibility", default="auto",
        choices=("auto", "render", "watertight"),
        help="surface-point source: 'render' = the reference's multi-view "
        "visibility pass (C++ rasterizer); 'watertight' = all faces; "
        "'auto' = render only for non-watertight meshes.",
    )
    add_common_args(arg_parser)
    args = arg_parser.parse_args()
    configure_logging(args)

    if args.surface_sampling:
        subdir = ws.surface_samples_subdir
        extension = ".ply"
    else:
        subdir = ws.sdf_samples_subdir
        extension = ".npz"

    with open(args.split_filename) as f:
        object_files = json.load(f)
    if isinstance(object_files, dict):  # nested split
        flat = []
        for ds in object_files.values():
            for cls in ds.values():
                flat.extend(cls)
        object_files = flat

    if args.source_name is None:
        args.source_name = os.path.basename(os.path.normpath(args.source_dir))

    dest_dir = os.path.join(args.data_dir, subdir, args.source_name)
    os.makedirs(dest_dir, exist_ok=True)
    if args.surface_sampling:
        normalization_param_dir = os.path.join(
            args.data_dir, ws.normalization_param_subdir, args.source_name
        )
        os.makedirs(normalization_param_dir, exist_ok=True)

    append_data_source_map(args.data_dir, args.source_name, args.source_dir)

    if args.use_augmented:
        original_files = object_files.copy()
        for obj_file in original_files:
            base_name = os.path.splitext(obj_file)[0]
            for i in range(5):
                object_files.append(base_name + "_transformed_" + str(i) + ".obj")
        logging.info(
            "Augmentation enabled: %d original + %d augmented files",
            len(original_files), len(original_files) * 5,
        )

    logging.info("Preprocessing %d meshes from %s into %s", len(object_files), args.source_dir, dest_dir)

    for obj_file in object_files:
        mesh_path = os.path.join(args.source_dir, obj_file)
        base = os.path.splitext(obj_file)[0]
        target = os.path.join(dest_dir, base + extension)
        if args.skip and os.path.isfile(target):
            logging.debug("skipping %s", target)
            continue
        if not os.path.isfile(mesh_path):
            logging.warning("No mesh found for instance %s", obj_file)
            continue
        try:
            verts, faces = load_mesh(mesh_path)
            if args.surface_sampling:
                pts, offset, scale = sample_visible_surface(
                    verts, faces, visibility=args.visibility
                )
                save_ply(target, pts)
                np.savez(
                    os.path.join(normalization_param_dir, base + ".npz"),
                    offset=offset, scale=scale,
                )
            else:
                pos, neg, info = preprocess_mesh(
                    verts, faces, num_samples=args.num_samples,
                    test=args.test_sampling, visibility=args.visibility,
                )
                np.savez(target, pos=pos, neg=neg)
                logging.info(
                    "%s: %d pos / %d neg (rejected %.2f%%)",
                    base, len(pos), len(neg), 100 * info["rejected_fraction"],
                )
                if info.get("rejected"):
                    # quality gate tripped (ref "mesh rejected" print,
                    # PreprocessMesh.cpp:509-512) — output was still written
                    q = info["quality"]
                    logging.warning(
                        "%s: mesh rejected (winding=%.4f boundary=%.4f); "
                        "winding auto-repaired=%s",
                        base, q["inconsistent_winding_ratio"],
                        q["boundary_edge_ratio"], q.get("repaired_faces", 0),
                    )
        except Exception as e:
            logging.error("failed to process %s: %s", obj_file, e)
