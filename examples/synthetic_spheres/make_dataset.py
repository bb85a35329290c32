#!/usr/bin/env python3
"""Build a fully synthetic end-to-end demo dataset (spheres of varying
radius) exercising the whole pipeline without any medical data:

    python examples/synthetic_spheres/make_dataset.py --out demo
    python preprocess_data.py -d demo/data -s demo/meshes --split demo/splits/demo_train_split.json
    python preprocess_data.py -d demo/data -s demo/meshes --split demo/splits/demo_train_split.json --surface
    python train_deep_sdf.py -e demo/stage1
    python reconstruct.py -e demo/stage1 -c latest -d demo/data/SdfSamples/meshes -s demo/splits/demo_test_split.json
    python evaluate.py -e demo/stage1 -c <epoch> -d demo/data -s demo/splits/demo_test_split.json
    python train_MLP_VAE_deep_sdf.py -e demo/stage2
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from msd_tpu.data.mesh_io import save_obj  # noqa: E402
from msd_tpu.data.splits import create_split_files  # noqa: E402


def make_sphere(radius, n_theta=64, n_phi=128):
    thetas = np.linspace(0, np.pi, n_theta)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    verts = []
    for t in thetas:
        for p in phis:
            verts.append((radius * np.sin(t) * np.cos(p), radius * np.sin(t) * np.sin(p), radius * np.cos(t)))
    verts = np.asarray(verts, np.float32)
    faces = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            faces.append((a, c, b))
            faces.append((b, c, d))
    return verts, np.asarray(faces, np.int32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="demo")
    parser.add_argument("--num_shapes", type=int, default=24)
    args = parser.parse_args()

    mesh_dir = os.path.join(args.out, "meshes")
    os.makedirs(mesh_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    names, labels = [], {}
    for i in range(args.num_shapes):
        r = float(rng.uniform(0.3, 0.8))
        v, f = make_sphere(r)
        name = f"sphere_{i:03d}"
        save_obj(os.path.join(mesh_dir, name + ".obj"), v, f)
        names.append(name + ".obj")
        # "diagnosis" = big-vs-small, "age" = radius (mirrors disease/age labels)
        labels[name] = np.array([float(r > 0.55), r], np.float32)
    create_split_files(names, os.path.join(args.out, "splits"), "demo")

    data_dir = os.path.join(args.out, "data", "SdfSamples", "meshes")
    os.makedirs(data_dir, exist_ok=True)
    from msd_tpu.data.labels import save_labels

    save_labels(os.path.join(data_dir, "labels.pt"), labels)

    # stage-1 + stage-2 experiment specs pointed at the demo layout
    import msd_tpu.workspace as ws

    split = os.path.abspath(os.path.join(args.out, "splits", "demo_train_split.json"))
    test_split = os.path.abspath(os.path.join(args.out, "splits", "demo_test_split.json"))
    s1 = {
        "Description": ["Synthetic sphere demo (Stage 1)"],
        "DataSource": os.path.abspath(data_dir),
        "TrainSplit": split,
        "TestSplit": test_split,
        "TorusPath": os.path.abspath(mesh_dir),
        "NetworkArch": "deep_sdf_decoder",
        "NetworkSpecs": {
            "dims": [128] * 6, "dropout": [], "dropout_prob": 0.0, "norm_layers": [],
            "latent_in": [3], "xyz_in_all": False, "use_tanh": False,
            "latent_dropout": False, "weight_norm": True,
        },
        "CodeLength": 32,
        "NumEpochs": 300,
        "SnapshotFrequency": 100,
        "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 0.001, "Interval": 150, "Factor": 0.5},
            {"Type": "Step", "Initial": 0.005, "Interval": 150, "Factor": 0.5},
        ],
        "SamplesPerScene": 8192,
        "ScenesPerBatch": 8,
        "UseEikonal": True,
        "ClampingDistance": 0.1,
        "CodeRegularization": True,
        "CodeRegularizationLambda": 1e-4,
        "CodeBound": 1.0,
        "GradientClipNorm": 1.0,
        "EvalTrainFrequency": 100,
        "EvalTestFrequency": 0,
        "EvalGridResolution": 129,
    }
    ws.save_experiment_specifications(os.path.join(args.out, "stage1"), s1)

    s2 = dict(s1)
    s2.update({
        "Description": ["Synthetic sphere demo (Stage 2)"],
        "NumEpochs": 200,
        "PretrainedLatentPath": os.path.abspath(os.path.join(args.out, "stage1", "LatentCodes", "latest.pth")),
        "PretrainedSDFDecoderPath": os.path.abspath(os.path.join(args.out, "stage1", "ModelParameters", "latest.pth")),
        "VAELatentDim": 4,
        "VAEEncoderHiddenDims": [64, 32],
        "VAEDecoderHiddenDims": [32, 64],
        "ScenesPerBatch": 6,
        "LabelTaskType": "classification",
        "GuidedContrastiveLoss": True,
        "SNNLType": "cls",
        "LabelsFile": "labels.pt",
        "ComputeSAP": True,
        "ComputeSAPAge": True,
        "AgeSNNLRegLoss": True,
        "AgeSNNLRegLabelIndex": 1,
        "TrainLatentHoldoutFraction": 0.15,
        "EvalTrainFrequency": 50,
    })
    del s2["TorusPath"]
    ws.save_experiment_specifications(os.path.join(args.out, "stage2"), s2)
    print(f"demo dataset written under {args.out}/ — see the module docstring for the pipeline commands")


if __name__ == "__main__":
    main()
