#!/usr/bin/env python3
"""Measure Chamfer-L2 parity: msd_tpu vs the ACTUAL PyTorch reference,
trained on byte-identical data.

The north star (BASELINE.json) is ">=10x per-chip throughput at equal
Chamfer-L2". bench.py's absolute chamfer guards show our reconstructions
are good; this harness proves the "equal" half by training BOTH stacks on
the same small matched config and comparing the reference eval protocol
end-to-end (train -> latent-opt reconstruction of held-out shapes -> mesh
-> Chamfer vs analytic GT surface points):

* torch side: the reference's own decoder module
  (/root/reference/networks/deep_sdf_decoder.py, imported as the oracle)
  driven by a faithful re-statement of its training loop semantics
  (ref: train_deep_sdf.py:594-784 — balanced pos/neg subsample, clamped-L1
  sum/N, epoch-ramped code regularization on per-point expanded codes,
  Embedding max_norm CodeBound, grad clip, two-group Adam) and its
  latent-optimization reconstruction (ref: reconstruct.py:16-151 — init
  N(0, 0.01^2), Adam lr 5e-3 with /10 decay at half, clamped-L1 + 1e-4
  code reg).
* msd side: Stage1Trainer + train.reconstruct on the SAME .npz bytes.

Both sides mesh through the same dense-grid + marching-tetrahedra path
(skimage is not installed here, and sharing the mesher removes it as a
confounder — differences reflect the trained SDF fields only) and score
with the same Chamfer implementation (msd_tpu.metrics.chamfer, the port of
ref deep_sdf/metrics/chamfer.py).

Writes/merges chamfer_parity.json at the repo root; bench.py embeds it as
detail["chamfer_parity"]. The dataset is regenerated deterministically from
the seed and content-hashed so the two sides (possibly run on different
days/backends) provably saw identical bytes.

Matched config (CPU-feasible for torch): 4x64 weight-norm decoder,
latent 16, latent_in=[2], 8 train + 4 test scenes (sphere/torus/union
families), 300 epochs of 8x4096 points.
"""

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import torus_sdf, union_sdf  # noqa: E402  (analytic SDF helpers)

LATENT = 16
DIMS = [64] * 4
LATENT_IN = [2]
CLAMP = 0.1
CODE_BOUND = 1.0
CODE_REG_LAMBDA = 1e-4
GRAD_CLIP = 1.0
LR_NET, LR_LAT = 5e-4, 1e-3
EPOCHS = 300
SCENES_TRAIN, SCENES_TEST = 8, 4
SAMPLES_PER_SCENE = 4096
RECON_ITERS, RECON_SAMPLES, RECON_LR = 300, 4000, 5e-3
GRID_N = 129
GT_POINTS = 30000
SEED = 7


def scene_specs(num_scenes, rng):
    """Per-scene (family, params): balanced sphere/torus/union mix (a lone
    non-convex shape collapses in a shared auto-decoder; see bench.py)."""
    out = []
    for i in range(num_scenes):
        fam = i % 3
        if fam == 0:
            out.append(("sphere", {"r": float(rng.uniform(0.35, 0.75))}))
        elif fam == 1:
            out.append(("torus", {"R": float(rng.uniform(0.35, 0.55)),
                                  "r": float(rng.uniform(0.12, 0.25))}))
        else:
            out.append(("union", {"c": float(rng.uniform(0.18, 0.35)),
                                  "r": float(rng.uniform(0.22, 0.38))}))
    return out


def scene_sdf(spec, pts):
    fam, p = spec
    if fam == "sphere":
        return np.linalg.norm(pts, axis=1) - p["r"]
    if fam == "torus":
        return torus_sdf(pts, p["R"], p["r"])
    return union_sdf(pts, p["c"], p["r"])


def scene_surface(spec, n, rng):
    fam, p = spec
    if fam == "sphere":
        d = rng.normal(size=(n, 3))
        return (p["r"] * d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    if fam == "torus":
        u = rng.uniform(0, 2 * np.pi, n)
        v = rng.uniform(0, 2 * np.pi, n)
        return np.stack([
            (p["R"] + p["r"] * np.cos(v)) * np.cos(u),
            (p["R"] + p["r"] * np.cos(v)) * np.sin(u),
            p["r"] * np.sin(v),
        ], axis=1).astype(np.float32)
    d = rng.normal(size=(n, 3))
    pts = (p["r"] * d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    side = np.where(rng.random(n) < 0.5, 1.0, -1.0).astype(np.float32)
    pts[:, 0] += side * p["c"]
    # drop points from one sphere that fall inside the other (true surface)
    keep = np.abs(scene_sdf(spec, pts)) < 1e-4
    return pts[keep]


def make_dataset(n_train=SCENES_TRAIN, n_test=SCENES_TEST):
    """Deterministic dataset: per-scene {pos, neg} samples (preprocessing
    recipe: two near-surface jitter scales + uniform fill,
    ref PreprocessMesh.cpp:291-319) and GT surface points for eval."""
    rng = np.random.default_rng(SEED)
    specs = scene_specs(n_train + n_test, rng)
    scenes, gt_points = [], []
    n_half = 20000
    for spec in specs:
        base = scene_surface(spec, int(1.6 * n_half), rng)
        s1 = base + rng.normal(0, np.sqrt(0.005), base.shape)
        s2 = base + rng.normal(0, np.sqrt(0.0005), base.shape)
        uni = rng.uniform(-1, 1, size=(int(0.13 * len(base)), 3))
        pts = np.concatenate([s1, s2, uni]).astype(np.float32)
        sdf = scene_sdf(spec, pts).astype(np.float32)
        pos = np.concatenate([pts[sdf >= 0][:n_half], sdf[sdf >= 0][:n_half, None]], axis=1)
        neg = np.concatenate([pts[sdf < 0][:n_half], sdf[sdf < 0][:n_half, None]], axis=1)
        scenes.append((pos.astype(np.float32), neg.astype(np.float32)))
        gt_points.append(scene_surface(spec, GT_POINTS, rng)[:GT_POINTS])
    h = hashlib.sha256()
    for pos, neg in scenes:
        h.update(pos.tobytes())
        h.update(neg.tobytes())
    return specs, scenes, gt_points, h.hexdigest()[:16]


def grid_points(n=GRID_N):
    axis = np.linspace(-1, 1, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def mesh_from_grid(sdf_flat, n=GRID_N):
    from msd_tpu.ops.marching_cubes import marching_tetrahedra

    return marching_tetrahedra(
        np.asarray(sdf_flat, np.float32).reshape(n, n, n),
        level=0.0, spacing=(2.0 / (n - 1),) * 3, origin=(-1.0, -1.0, -1.0),
    )


def chamfer_vs_gt(gt_pts, mesh):
    from msd_tpu.metrics.chamfer import compute_mesh_chamfer

    cd, _ = compute_mesh_chamfer(gt_pts, mesh, num_mesh_samples=GT_POINTS)
    return float(cd)


# ---------------------------------------------------------------------------
# torch reference side
# ---------------------------------------------------------------------------

def run_torch_side(scenes, gt_points):
    import torch

    sys.path.insert(0, "/root/reference")
    from networks.deep_sdf_decoder import Decoder as RefDecoder  # the oracle

    torch.manual_seed(SEED)
    torch.set_num_threads(os.cpu_count() or 8)
    dec = RefDecoder(
        LATENT, dims=DIMS, dropout=[], dropout_prob=0.0, norm_layers=[],
        latent_in=LATENT_IN, weight_norm=True, xyz_in_all=False,
        use_tanh=False, latent_dropout=False,
    )
    lat = torch.nn.Embedding(SCENES_TRAIN, LATENT, max_norm=CODE_BOUND)
    torch.nn.init.normal_(lat.weight.data, 0.0, 1.0 / np.sqrt(LATENT))
    opt = torch.optim.Adam([
        {"params": dec.parameters(), "lr": LR_NET},
        {"params": lat.parameters(), "lr": LR_LAT},
    ])
    train = [(torch.from_numpy(p), torch.from_numpy(n)) for p, n in scenes[:SCENES_TRAIN]]
    rng = np.random.default_rng(SEED + 1)
    half = SAMPLES_PER_SCENE // 2
    num_total = SCENES_TRAIN * SAMPLES_PER_SCENE

    t0 = time.time()
    for epoch in range(1, EPOCHS + 1):
        # balanced per-scene subsample (ref: deep_sdf/data.py:91-109)
        rows, idx = [], []
        for s, (p, n) in enumerate(train):
            rows.append(p[rng.integers(0, len(p), half)])
            rows.append(n[rng.integers(0, len(n), half)])
            idx.append(np.full(SAMPLES_PER_SCENE, s, np.int64))
        batch = torch.cat(rows)
        indices = torch.from_numpy(np.concatenate(idx))
        xyz = batch[:, :3]
        sdf_gt = torch.clamp(batch[:, 3:4], -CLAMP, CLAMP)

        opt.zero_grad()
        z = lat(indices)  # per-point expanded codes (ref :598)
        pred = torch.clamp(dec(torch.cat([z, xyz], dim=1)), -CLAMP, CLAMP)
        loss = torch.nn.functional.l1_loss(pred, sdf_gt, reduction="sum") / num_total
        reg = min(1.0, epoch / 100.0) * CODE_REG_LAMBDA * z.norm(dim=1).sum() / num_total
        (loss + reg).backward()
        torch.nn.utils.clip_grad_norm_(dec.parameters(), GRAD_CLIP)
        opt.step()
    train_s = time.time() - t0

    # reference eval protocol: latent-opt reconstruction of held-out shapes
    # (ref: reconstruct.py:16-151) -> dense grid -> mesh -> chamfer
    gpts = torch.from_numpy(grid_points())
    chamfers = []
    t0 = time.time()
    for ti in range(SCENES_TEST):
        p, n = scenes[SCENES_TRAIN + ti]
        p_t, n_t = torch.from_numpy(p), torch.from_numpy(n)
        z = torch.ones(1, LATENT).normal_(0, 0.01).requires_grad_(True)
        zopt = torch.optim.Adam([z], lr=RECON_LR)
        for it in range(RECON_ITERS):
            for g in zopt.param_groups:
                g["lr"] = RECON_LR * (0.1 if it >= RECON_ITERS // 2 else 1.0)
            half_r = RECON_SAMPLES // 2
            samp = torch.cat([
                p_t[torch.from_numpy(rng.integers(0, len(p), half_r))],
                n_t[torch.from_numpy(rng.integers(0, len(n), half_r))],
            ])
            xyz = samp[:, :3]
            gt = torch.clamp(samp[:, 3:4], -CLAMP, CLAMP)
            zopt.zero_grad()
            pred = torch.clamp(dec(torch.cat([z.expand(len(xyz), -1), xyz], dim=1)), -CLAMP, CLAMP)
            l = torch.nn.functional.l1_loss(pred, gt) + 1e-4 * torch.mean(z**2)
            l.backward()
            zopt.step()
        with torch.no_grad():
            sdf = np.concatenate([
                dec(torch.cat([z.expand(len(c), -1), c], dim=1)).numpy()
                for c in torch.split(gpts, 2**17)
            ])
        mesh = mesh_from_grid(sdf)
        chamfers.append(chamfer_vs_gt(gt_points[SCENES_TRAIN + ti], mesh))
    recon_s = time.time() - t0
    return {
        "chamfer_per_scene": chamfers,
        "chamfer_mean": float(np.mean(chamfers)),
        "train_seconds": round(train_s, 1),
        "recon_eval_seconds": round(recon_s, 1),
        "stack": f"reference networks.deep_sdf_decoder (torch {__import__('torch').__version__}, cpu)",
    }


# ---------------------------------------------------------------------------
# msd_tpu side
# ---------------------------------------------------------------------------

def run_msd_side(scenes, gt_points):
    import jax

    from msd_tpu.data.sdf_samples import SdfDataset, _pad_stack
    from msd_tpu.models.deepsdf import decode_sdf
    from msd_tpu.train.reconstruct import reconstruct
    from msd_tpu.train.stage1 import Stage1Trainer

    specs = {
        "Description": "chamfer parity",
        "DataSource": "<mem>", "TrainSplit": "<mem>", "TestSplit": "<mem>",
        "NetworkArch": "deep_sdf_decoder",
        "NetworkSpecs": {
            "dims": DIMS, "dropout": [], "dropout_prob": 0.0, "norm_layers": [],
            "latent_in": LATENT_IN, "xyz_in_all": False, "use_tanh": False,
            "latent_dropout": False, "weight_norm": True,
        },
        "CodeLength": LATENT,
        "NumEpochs": EPOCHS,
        "SnapshotFrequency": 10000,
        "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": LR_NET, "Interval": 500, "Factor": 0.5},
            {"Type": "Step", "Initial": LR_LAT, "Interval": 500, "Factor": 0.5},
        ],
        "SamplesPerScene": SAMPLES_PER_SCENE,
        "ScenesPerBatch": SCENES_TRAIN,
        "ClampingDistance": CLAMP,
        "CodeRegularization": True,
        "CodeRegularizationLambda": CODE_REG_LAMBDA,
        "CodeBound": CODE_BOUND,
        "GradientClipNorm": GRAD_CLIP,
        "Seed": SEED,
    }
    pos, pc = _pad_stack([p for p, _ in scenes[:SCENES_TRAIN]])
    neg, nc = _pad_stack([n for _, n in scenes[:SCENES_TRAIN]])
    ds = SdfDataset(
        npyfiles=[f"s{i}.npz" for i in range(SCENES_TRAIN)],
        instance_ids=[f"s{i}" for i in range(SCENES_TRAIN)],
        pos=pos, pos_counts=pc, neg=neg, neg_counts=nc,
        subsample=SAMPLES_PER_SCENE,
    )
    trainer = Stage1Trainer("/tmp/msd_parity_exp", specs=specs, dataset=ds)
    t0 = time.time()
    for e in range(1, EPOCHS + 1):
        trainer.train_epoch(e)
    train_s = time.time() - t0

    gpts = grid_points()
    chamfers = []
    t0 = time.time()
    for ti in range(SCENES_TEST):
        p, n = scenes[SCENES_TRAIN + ti]
        err, latent = reconstruct(
            trainer.decoder, trainer.state["net"], RECON_ITERS, LATENT,
            (p, n), 0.01, CLAMP, num_samples=RECON_SAMPLES, lr=RECON_LR, l2reg=True,
        )
        sdf = np.concatenate([
            np.asarray(decode_sdf(trainer.decoder, trainer.state["net"], latent, c))
            for c in np.array_split(gpts, 16)
        ])
        mesh = mesh_from_grid(sdf)
        chamfers.append(chamfer_vs_gt(gt_points[SCENES_TRAIN + ti], mesh))
    recon_s = time.time() - t0
    return {
        "chamfer_per_scene": chamfers,
        "chamfer_mean": float(np.mean(chamfers)),
        "train_seconds": round(train_s, 1),
        "recon_eval_seconds": round(recon_s, 1),
        "stack": f"msd_tpu Stage1Trainer ({jax.default_backend()})",
    }


FLAGSHIP = {
    # the reference's flagship shape: examples/ADNI/minimal_eikonal/specs.json
    # (8x512 weight-norm decoder, latent 256, latent_in=[4], eikonal on,
    # 32x16384-point steps; epochs >= 1000 per VERDICT r4 #7 — the ref
    # default is 2001, but the loss/Chamfer plateau is well before 1000
    # at this population size). Torch-side stays at the toy scale (its
    # measured per-step linearity factor is in baseline_torch_measured.json);
    # this row demonstrates msd quality at the flagship shape.
    "latent": 256, "dims": [512] * 8, "latent_in": [4],
    "epochs": 1000, "scenes_train": 128, "scenes_test": 16,
    "samples_per_scene": 16384, "scenes_per_batch": 32,
    "recon_iters": 800, "recon_samples": 8000, "recon_lr": 5e-3,  # ref reconstruct.py:194,329-331
    "mesh_n": 257,  # ref mesh default N=256 (reconstruct.py:349), snapped by the sparse path
}


def run_msd_flagship(scenes, gt_points):
    """Flagship-shaped msd-side run (VERDICT r4 #7): Stage1Trainer with the
    ADNI minimal_eikonal network/workload on a 128-scene synthetic
    population, reference-default latent-opt reconstruction of 16 held-out
    scenes, production create_mesh (N=257 sparse streaming path), Chamfer
    vs analytic GT surface points."""
    import jax

    from msd_tpu import mesh as mesh_mod
    from msd_tpu.data.sdf_samples import SdfDataset, _pad_stack
    from msd_tpu.train.reconstruct import reconstruct_batch
    from msd_tpu.train.stage1 import Stage1Trainer

    F = FLAGSHIP
    specs = {
        "Description": "chamfer parity (flagship shape)",
        "DataSource": "<mem>", "TrainSplit": "<mem>", "TestSplit": "<mem>",
        "NetworkArch": "deep_sdf_decoder",
        "NetworkSpecs": {
            "dims": F["dims"], "dropout": [], "dropout_prob": 0.0, "norm_layers": [],
            "latent_in": F["latent_in"], "xyz_in_all": False, "use_tanh": False,
            "latent_dropout": False, "weight_norm": True,
        },
        "CodeLength": F["latent"],
        "NumEpochs": F["epochs"],
        "SnapshotFrequency": 100000,
        "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 5e-4, "Interval": 500, "Factor": 0.5},
            {"Type": "Step", "Initial": 1e-3, "Interval": 500, "Factor": 0.5},
        ],
        "SamplesPerScene": F["samples_per_scene"],
        "ScenesPerBatch": F["scenes_per_batch"],
        "UseEikonal": True,
        "ClampingDistance": CLAMP,
        "CodeRegularization": True,
        "CodeRegularizationLambda": CODE_REG_LAMBDA,
        "CodeBound": CODE_BOUND,
        "GradientClipNorm": GRAD_CLIP,
        "Seed": SEED,
    }
    n_train, n_test = F["scenes_train"], F["scenes_test"]
    pos, pc = _pad_stack([p for p, _ in scenes[:n_train]])
    neg, nc = _pad_stack([n for _, n in scenes[:n_train]])
    ds = SdfDataset(
        npyfiles=[f"s{i}.npz" for i in range(n_train)],
        instance_ids=[f"s{i}" for i in range(n_train)],
        pos=pos, pos_counts=pc, neg=neg, neg_counts=nc,
        subsample=F["samples_per_scene"],
    )
    trainer = Stage1Trainer("/tmp/msd_parity_flagship", specs=specs, dataset=ds)
    t0 = time.time()
    trainer.train_epochs(1, F["epochs"] + 1, block=10)
    train_s = time.time() - t0

    t0 = time.time()
    _, latents = reconstruct_batch(
        trainer.decoder, trainer.state["net"], F["recon_iters"], F["latent"],
        [scenes[n_train + ti] for ti in range(n_test)], 0.01, CLAMP,
        num_samples=F["recon_samples"], lr=F["recon_lr"], l2reg=True,
    )
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    chamfers = []
    for ti in range(n_test):
        mesh = mesh_mod.create_mesh(
            trainer.decoder, trainer.state["net"], latents[ti],
            N=F["mesh_n"], return_mesh=True, evaluator=ev,
        )
        if mesh is None or mesh is False:
            chamfers.append(float("nan"))
            continue
        chamfers.append(chamfer_vs_gt(gt_points[n_train + ti], mesh))
    recon_s = time.time() - t0
    return {
        "chamfer_per_scene": chamfers,
        "chamfer_mean": float(np.nanmean(chamfers)),
        "train_seconds": round(train_s, 1),
        "recon_eval_seconds": round(recon_s, 1),
        "config": {
            "decoder": "8x512 weight-norm, latent 256, latent_in=[4], eikonal",
            "scenes": f"{n_train} train + {n_test} test (sphere/torus/union)",
            "epochs": F["epochs"],
            "eval": "latent-opt 800x8000 -> create_mesh N=257 (production "
                    "streaming path) -> chamfer vs analytic GT",
        },
        "stack": f"msd_tpu Stage1Trainer ({jax.default_backend()})",
    }


def run_msd_time_to_parity(scenes, gt_points, torch_final):
    """Epochs-to-equal-Chamfer (BASELINE.md "time-to-quality" axis): train
    the msd side of the toy matched config, evaluating held-out Chamfer at
    checkpoints, and report the first epoch whose mean Chamfer is <= the
    torch stack's FINAL (300-epoch) Chamfer. The epoch multiple composes
    with the per-step throughput ratio measured in bench.py."""
    from msd_tpu.data.sdf_samples import SdfDataset, _pad_stack
    from msd_tpu.models.deepsdf import decode_sdf
    from msd_tpu.train.reconstruct import reconstruct_batch
    from msd_tpu.train.stage1 import Stage1Trainer

    specs = {
        "Description": "time to parity",
        "DataSource": "<mem>", "TrainSplit": "<mem>", "TestSplit": "<mem>",
        "NetworkArch": "deep_sdf_decoder",
        "NetworkSpecs": {
            "dims": DIMS, "dropout": [], "dropout_prob": 0.0, "norm_layers": [],
            "latent_in": LATENT_IN, "xyz_in_all": False, "use_tanh": False,
            "latent_dropout": False, "weight_norm": True,
        },
        "CodeLength": LATENT,
        "NumEpochs": EPOCHS,
        "SnapshotFrequency": 10000,
        "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": LR_NET, "Interval": 500, "Factor": 0.5},
            {"Type": "Step", "Initial": LR_LAT, "Interval": 500, "Factor": 0.5},
        ],
        "SamplesPerScene": SAMPLES_PER_SCENE,
        "ScenesPerBatch": SCENES_TRAIN,
        "ClampingDistance": CLAMP,
        "CodeRegularization": True,
        "CodeRegularizationLambda": CODE_REG_LAMBDA,
        "CodeBound": CODE_BOUND,
        "GradientClipNorm": GRAD_CLIP,
        "Seed": SEED,
    }
    pos, pc = _pad_stack([p for p, _ in scenes[:SCENES_TRAIN]])
    neg, nc = _pad_stack([n for _, n in scenes[:SCENES_TRAIN]])
    ds = SdfDataset(
        npyfiles=[f"s{i}.npz" for i in range(SCENES_TRAIN)],
        instance_ids=[f"s{i}" for i in range(SCENES_TRAIN)],
        pos=pos, pos_counts=pc, neg=neg, neg_counts=nc,
        subsample=SAMPLES_PER_SCENE,
    )
    trainer = Stage1Trainer("/tmp/msd_parity_ttp", specs=specs, dataset=ds)
    gpts = grid_points()
    checkpoints = [25, 50, 75, 100, 150, 200, 250, 300]
    curve = {}
    prev = 1
    for ck in checkpoints:
        for e in range(prev, ck + 1):
            trainer.train_epoch(e)
        prev = ck + 1
        _, latents = reconstruct_batch(
            trainer.decoder, trainer.state["net"], RECON_ITERS, LATENT,
            [scenes[SCENES_TRAIN + ti] for ti in range(SCENES_TEST)],
            0.01, CLAMP, num_samples=RECON_SAMPLES, lr=RECON_LR, l2reg=True,
        )
        cds = []
        for ti in range(SCENES_TEST):
            sdf = np.concatenate([
                np.asarray(decode_sdf(trainer.decoder, trainer.state["net"],
                                      latents[ti], c))
                for c in np.array_split(gpts, 16)
            ])
            try:
                cds.append(chamfer_vs_gt(gt_points[SCENES_TRAIN + ti],
                                         mesh_from_grid(sdf)))
            except ValueError:
                cds.append(float("inf"))  # no surface yet at this epoch
        curve[ck] = float(np.mean(cds))
    hit = next((ck for ck in checkpoints if curve[ck] <= torch_final), None)
    return {
        "torch_final_chamfer": torch_final,
        "chamfer_curve_by_epoch": curve,
        "msd_epochs_to_torch_final": hit,
        "epoch_multiple_vs_torch_300": (None if hit is None
                                        else round(EPOCHS / hit, 2)),
        "note": "eval epochs are the checkpoint grid; the true crossing lies "
                "at or before the reported epoch",
    }


def load_real_dataset(data_source, train_split, test_split):
    """Real-data mode: reference-format SdfSamples `.npz` {pos,neg} named by
    split JSONs, GT eval points from SurfaceSamples `.ply` (the reference
    eval protocol, evaluate.py:32-67). Train scenes come first, then test;
    the returned tuple matches make_dataset()'s."""
    from msd_tpu.data.mesh_io import load_ply
    from msd_tpu.data.splits import load_split, split_triples
    from msd_tpu.workspace import sdf_samples_subdir, surface_samples_subdir

    import glob as _glob

    def _resolve(subdir, ds_name, cls, iid, ext):
        """Find <iid><ext> under <data_source>/<subdir>: exact split-triple
        path first, then one/two levels of source-name directories — flat
        split JSONs (this repo's own preprocessing layout,
        SdfSamples/<source_name>/<iid>.npz) carry no dataset/class
        components."""
        base = os.path.join(data_source, subdir)
        cands = [os.path.join(base, *[p for p in (ds_name, cls) if p], iid + ext)]
        cands += sorted(_glob.glob(os.path.join(base, "*", iid + ext)))
        cands += sorted(_glob.glob(os.path.join(base, "*", "*", iid + ext)))
        for c in cands:
            if os.path.isfile(c):
                return c
        raise FileNotFoundError(f"{iid}{ext} not found under {base}")

    global SCENES_TRAIN, SCENES_TEST
    scenes, gt_points, specs = [], [], []
    counts = []
    for split_file in (train_split, test_split):
        triples = split_triples(load_split(split_file))
        counts.append(len(triples))
        for ds_name, cls, iid in triples:
            npz = np.load(_resolve(sdf_samples_subdir, ds_name, cls, iid, ".npz"))
            pos = npz["pos"][np.isfinite(npz["pos"]).all(axis=1)].astype(np.float32)
            neg = npz["neg"][np.isfinite(npz["neg"]).all(axis=1)].astype(np.float32)
            scenes.append((pos, neg))
            verts, _ = load_ply(_resolve(surface_samples_subdir, ds_name, cls, iid, ".ply"))
            gt_points.append(np.asarray(verts, np.float32))
            specs.append(("real", {"id": iid}))
    SCENES_TRAIN, SCENES_TEST = counts
    h = hashlib.sha256()
    for pos, neg in scenes:
        h.update(pos.tobytes())
        h.update(neg.tobytes())
    return specs, scenes, gt_points, h.hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["torch", "msd", "both", "flagship",
                                       "time_to_parity"], default="both")
    ap.add_argument("--out", default=os.path.join(REPO, "chamfer_parity.json"))
    ap.add_argument("--data_source", default=None,
                    help="run on real preprocessed data (dir holding SdfSamples/ "
                         "and SurfaceSamples/) instead of the synthetic population")
    ap.add_argument("--train_split", default=None, help="split JSON (real-data mode)")
    ap.add_argument("--test_split", default=None, help="split JSON (real-data mode)")
    args = ap.parse_args()

    if args.side == "time_to_parity":
        specs, scenes, gt_points, data_hash = make_dataset()
        result = {}
        if os.path.isfile(args.out):
            with open(args.out) as f:
                result = json.load(f)
        torch_final = result.get("torch_ref", {}).get("chamfer_mean")
        if torch_final is None:
            ap.error("time_to_parity needs a prior --side torch run in the out file")
        if result.get("dataset_sha256_16") != data_hash:
            ap.error("dataset hash mismatch vs the stored torch run")
        row = run_msd_time_to_parity(scenes, gt_points, torch_final)
        result["time_to_parity"] = row
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print("time_to_parity:", json.dumps(row))
        return

    if args.side == "flagship":
        # flagship-shaped msd row (own dataset + hash; the toy-scale
        # torch/msd entries and their ratio are left untouched)
        F = FLAGSHIP
        specs, scenes, gt_points, fhash = make_dataset(
            F["scenes_train"], F["scenes_test"])
        result = {}
        if os.path.isfile(args.out):
            with open(args.out) as f:
                result = json.load(f)
        row = run_msd_flagship(scenes, gt_points)
        row["dataset_sha256_16"] = fhash
        result["msd_flagship"] = row
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print("msd_flagship:", json.dumps(row))
        return

    if args.data_source:
        if not (args.train_split and args.test_split):
            ap.error("--data_source requires --train_split and --test_split")
        specs, scenes, gt_points, data_hash = load_real_dataset(
            args.data_source, args.train_split, args.test_split)
    else:
        specs, scenes, gt_points, data_hash = make_dataset()
    result = {}
    if os.path.isfile(args.out):
        with open(args.out) as f:
            result = json.load(f)
        if result.get("dataset_sha256_16") not in (None, data_hash):
            print("dataset hash changed; discarding stale results", file=sys.stderr)
            result = {}
    result["dataset_sha256_16"] = data_hash
    result["config"] = {
        "decoder": f"{len(DIMS)}x{DIMS[0]} weight-norm, latent {LATENT}, latent_in={LATENT_IN}",
        "scenes": f"{SCENES_TRAIN} train + {SCENES_TEST} test (sphere/torus/union)",
        "epochs": EPOCHS,
        "eval": f"latent-opt {RECON_ITERS}x{RECON_SAMPLES} -> {GRID_N}^3 grid -> "
                "marching tetrahedra (shared) -> chamfer vs analytic GT",
    }

    if args.side in ("torch", "both"):
        result["torch_ref"] = run_torch_side(scenes, gt_points)
        print("torch_ref:", json.dumps(result["torch_ref"]))
    if args.side in ("msd", "both"):
        result["msd_tpu"] = run_msd_side(scenes, gt_points)
        print("msd_tpu:", json.dumps(result["msd_tpu"]))

    if "torch_ref" in result and "msd_tpu" in result:
        ratio = result["msd_tpu"]["chamfer_mean"] / result["torch_ref"]["chamfer_mean"]
        result["msd_over_torch_ratio"] = round(ratio, 3)
        # "equal Chamfer-L2": msd no worse than 10% above the reference
        # (lower is better; being below the reference also passes)
        result["within_tolerance"] = bool(ratio <= 1.10)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "config"}))


if __name__ == "__main__":
    main()
