#!/usr/bin/env python3
"""Generate synthetic stand-ins for the ADNI hippocampus and OAI-ZIB femur
example datasets, so every stock config under ``examples/`` runs end-to-end
without any medical data.

The reference ships real split families (examples/splits/, 696-entry ADNI
train split) whose patient meshes obviously cannot be redistributed; its
example specs are therefore dead-on-arrival without institutional data
access. This generator creates anatomy-*shaped* synthetic populations with
the same file contracts instead:

- ``examples/source_meshes/ADNI/``     — bumpy bent-ellipsoid "hippocampi",
  IDs shaped like the reference's (``ADNI_<site>_S_<subject>_...``, so the
  subject-split regex in create_subject_split_files works on them)
- ``examples/source_meshes/OAI-ZIB/``  — elongated "femora" with condyle /
  trochanter bulges, IDs like ``9000123_femur``
- ``examples/splits/splits_synthetic_hippocampus/`` and
  ``.../splits_synthetic_femur/`` — flat reference-format split JSONs
- ``examples/data/SdfSamples/<ds>/labels.pt`` — id -> [diagnosis, age]
  (the femur labels are keyed WITHOUT the ``_femur`` suffix, exercising the
  reference's suffix fallback, deep_sdf/data.py:239-251)
- with ``--preprocess`` (default): SdfSamples `.npz` + SurfaceSamples
  `.ply` + NormalizationParameters through the same pipeline
  ``preprocess_data.py`` drives

Both "diagnosis" and "age" causally deform the meshes (atrophy/thinning
for diagnosis, size/roughness drift for age), so the Stage-2
disentanglement losses and SAP/correlation metrics have real signal.

One command:

    python examples/make_example_data.py

then any stock config runs as-shipped from the repo root:

    python train_deep_sdf.py -e examples/ADNI/minimal_eikonal
    python train_MLP_VAE_deep_sdf.py -e examples/ADNI/MLP_VAE_SDF_disentangle_all_true_label_age
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from msd_tpu.data.mesh_io import save_obj  # noqa: E402


def unit_sphere_grid(n_theta=56, n_phi=112):
    """UV-sphere directions + faces (watertight, genus 0)."""
    thetas = np.linspace(0, np.pi, n_theta)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    t, p = np.meshgrid(thetas, phis, indexing="ij")
    dirs = np.stack(
        [np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], axis=-1
    ).reshape(-1, 3)
    faces = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            faces.append((a, c, b))
            faces.append((b, c, d))
    return dirs.astype(np.float64), np.asarray(faces, np.int32)


def bump_field(dirs, centers, amps, width):
    """Sum of Gaussian radial bumps centered at unit directions."""
    out = np.zeros(len(dirs))
    for c, a in zip(centers, amps):
        out += a * np.exp((dirs @ c - 1.0) / (width**2))
    return out


def make_hippocampus(rng, diagnosis, age_norm):
    """Banana-bent bumpy ellipsoid. Diagnosis (AD=1) shrinks volume and
    thins the medial axis (atrophy); age adds shrink + roughness drift."""
    dirs, faces = unit_sphere_grid()
    radii = np.array([0.62, 0.36, 0.28])
    # per-shape smooth bumpiness (anatomy noise) + age-dependent roughness
    k = 6
    centers = rng.normal(size=(k, 3))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    amps = rng.uniform(-0.04, 0.04, k) * (1.0 + 0.5 * age_norm)
    r_mod = 1.0 + bump_field(dirs, centers, amps, 0.55)
    atrophy = 1.0 - 0.10 * diagnosis - 0.03 * age_norm
    scale = radii * atrophy
    scale = scale * np.array([1.0, 1.0 - 0.15 * diagnosis, 1.0])  # medial thinning
    verts = dirs * r_mod[:, None] * scale
    # banana bend: curve the long (x) axis through z
    verts[:, 2] += 0.35 * verts[:, 0] ** 2
    verts -= verts.mean(axis=0)
    return verts.astype(np.float32), faces


def make_femur(rng, diagnosis, age_norm):
    """Elongated shaft + condyle bulges (distal) + greater-trochanter bump
    (proximal). Diagnosis (OA=1) widens the condyles; age thins the
    shaft."""
    dirs, faces = unit_sphere_grid(64, 96)
    shaft = np.array([0.26, 0.26, 0.88])
    thin = 1.0 - 0.06 * age_norm
    bumps = [
        (np.array([0.45, 0.25, -0.86]), 0.16 + 0.10 * diagnosis),   # lateral condyle
        (np.array([-0.45, 0.25, -0.86]), 0.16 + 0.10 * diagnosis),  # medial condyle
        (np.array([0.55, 0.0, 0.83]), 0.13),                        # greater trochanter
        (np.array([-0.35, 0.1, 0.93]), 0.10),                       # femoral head-ish
    ]
    centers = [b[0] / np.linalg.norm(b[0]) for b in bumps]
    amps = [b[1] for b in bumps]
    # mild per-shape noise bumps
    k = 4
    nc = rng.normal(size=(k, 3))
    nc /= np.linalg.norm(nc, axis=1, keepdims=True)
    centers += list(nc)
    amps += list(rng.uniform(-0.02, 0.02, k))
    r_mod = 1.0 + bump_field(dirs, centers, amps, 0.38)
    verts = dirs * r_mod[:, None] * (shaft * np.array([thin, thin, 1.0]))
    verts -= verts.mean(axis=0)
    return verts.astype(np.float32), faces


def write_splits(split_dir, prefix, names, n_test, n_val, seed):
    rng = np.random.default_rng(seed)
    names = list(names)
    rng.shuffle(names)
    test, val, train = names[:n_test], names[n_test : n_test + n_val], names[n_test + n_val :]
    os.makedirs(split_dir, exist_ok=True)
    paths = {}
    for kind, entries in (("train", sorted(train)), ("test", sorted(test)), ("val", sorted(val))):
        path = os.path.join(split_dir, f"{kind}_split_{prefix}.json")
        with open(path, "w") as f:
            json.dump(entries, f, indent=1)
        paths[kind] = path
    return paths


def preprocess_dataset(mesh_dir, data_dir, source_name, split_paths, num_samples):
    """Same pipeline preprocess_data.py drives: SdfSamples for train+val
    (train mode) and test (test mode), SurfaceSamples+NormalizationParameters
    for every split (evaluate.py needs them)."""
    from msd_tpu.data.mesh_io import load_mesh, save_ply
    from msd_tpu.preprocess import preprocess_mesh
    from msd_tpu.preprocess.mesh_to_sdf import sample_visible_surface
    from preprocess_data import append_data_source_map
    import msd_tpu.workspace as ws

    sdf_dir = os.path.join(data_dir, ws.sdf_samples_subdir, source_name)
    surf_dir = os.path.join(data_dir, ws.surface_samples_subdir, source_name)
    norm_dir = os.path.join(data_dir, ws.normalization_param_subdir, source_name)
    for d in (sdf_dir, surf_dir, norm_dir):
        os.makedirs(d, exist_ok=True)
    append_data_source_map(data_dir, source_name, mesh_dir)

    for kind, split_path in split_paths.items():
        with open(split_path) as f:
            names = json.load(f)
        for obj_name in names:
            base = os.path.splitext(obj_name)[0]
            verts, faces = load_mesh(os.path.join(mesh_dir, obj_name))
            target = os.path.join(sdf_dir, base + ".npz")
            if not os.path.isfile(target):
                pos, neg, _ = preprocess_mesh(
                    verts, faces, num_samples=num_samples, test=(kind == "test")
                )
                np.savez(target, pos=pos, neg=neg)
            ply_target = os.path.join(surf_dir, base + ".ply")
            if not os.path.isfile(ply_target):
                pts, offset, scale = sample_visible_surface(verts, faces)
                save_ply(ply_target, pts)
                np.savez(os.path.join(norm_dir, base + ".npz"), offset=offset, scale=scale)
            print(f"  preprocessed {base} ({kind})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.path.join(REPO, "examples"))
    ap.add_argument("--num_adni", type=int, default=30)
    ap.add_argument("--num_femur", type=int, default=20)
    ap.add_argument("--samples", type=int, default=150000,
                    help="SDF samples per shape (reference default is 500k; "
                    "150k keeps the demo fast and is >> SamplesPerScene)")
    ap.add_argument("--no-preprocess", dest="preprocess", action="store_false")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from msd_tpu.data.labels import save_labels
    import msd_tpu.workspace as ws

    root = args.root
    data_dir = os.path.join(root, "data")

    jobs = []  # (source_name, split_prefix, split_dirname, names, labels, label_file, keys)
    rng = np.random.default_rng(args.seed)

    # --- ADNI-shaped hippocampi ---
    adni_dir = os.path.join(root, "source_meshes", "ADNI")
    os.makedirs(adni_dir, exist_ok=True)
    adni_names, adni_labels = [], {}
    for i in range(args.num_adni):
        diagnosis = float(i % 2)  # CN=0 / AD=1, balanced
        age = float(rng.uniform(55, 90))
        age_norm = (age - 70.0) / 10.0
        iid = f"ADNI_{rng.integers(2, 200):03d}_S_{1000 + i:04d}_MR_Hippocampal_Mask_synth_I{i:05d}_combined"
        verts, faces = make_hippocampus(rng, diagnosis, age_norm)
        save_obj(os.path.join(adni_dir, iid + ".obj"), verts, faces)
        adni_names.append(iid + ".obj")
        adni_labels[iid] = np.array([diagnosis, age_norm], np.float32)
        print(f"mesh {iid} (diag={diagnosis:.0f}, age={age:.0f})")
    jobs.append(("ADNI", "synthetic_hippocampus", "splits_synthetic_hippocampus",
                 adni_names, adni_labels, adni_dir))

    # --- OAI-ZIB-shaped femora ---
    femur_dir = os.path.join(root, "source_meshes", "OAI-ZIB")
    os.makedirs(femur_dir, exist_ok=True)
    femur_names, femur_labels = [], {}
    for i in range(args.num_femur):
        diagnosis = float(i % 2)
        age = float(rng.uniform(45, 80))
        age_norm = (age - 60.0) / 10.0
        iid = f"{9000000 + i}_femur"
        verts, faces = make_femur(rng, diagnosis, age_norm)
        save_obj(os.path.join(femur_dir, iid + ".obj"), verts, faces)
        femur_names.append(iid + ".obj")
        # keyed WITHOUT the _femur suffix: exercises the reference's
        # fallback (deep_sdf/data.py:239-251)
        femur_labels[iid[:-6]] = np.array([diagnosis, age_norm], np.float32)
        print(f"mesh {iid} (diag={diagnosis:.0f}, age={age:.0f})")
    jobs.append(("OAI-ZIB", "synthetic_femur", "splits_synthetic_femur",
                 femur_names, femur_labels, femur_dir))

    for source_name, prefix, split_dirname, names, labels, mesh_dir in jobs:
        split_paths = write_splits(
            os.path.join(root, "splits", split_dirname), prefix, names,
            n_test=max(2, len(names) // 10), n_val=max(2, len(names) // 10),
            seed=args.seed,
        )
        label_dir = os.path.join(data_dir, ws.sdf_samples_subdir, source_name)
        os.makedirs(label_dir, exist_ok=True)
        save_labels(os.path.join(label_dir, "labels.pt"), labels)
        # pseudo labels for the *_pseudo_label_with_age configs
        # (PseudoLabelsFile=pseudo_label.pt): the real diagnosis with ~15%
        # label noise, as a classifier-produced pseudo-label stand-in
        pseudo = {}
        for key, lab in labels.items():
            diag = lab[0]
            if rng.random() < 0.15:
                diag = 1.0 - diag
            pseudo[key] = np.array([diag, lab[1]], np.float32)
        save_labels(os.path.join(label_dir, "pseudo_label.pt"), pseudo)
        if args.preprocess:
            print(f"preprocessing {source_name} ({len(names)} meshes, {args.samples} samples each)...")
            preprocess_dataset(mesh_dir, data_dir, source_name, split_paths, args.samples)

    print("done. Stock example configs now run from the repo root, e.g.:")
    print("  python train_deep_sdf.py -e examples/ADNI/minimal_eikonal")


if __name__ == "__main__":
    main()
