#!/usr/bin/env python3
"""A/B: EikonalNumPoints subsampling vs full eikonal — speed AND parity.

The eikonal chains are exactly 50% of the stage-1 fused kernel's FLOPs
(PERF.md round-4 budget), so subsampling them is the one FLOP-reduction
lever on a step that already runs at ~78% sustained MXU. This harness
answers "is the subsampled field as good?" with numbers:

* trains TWO Stage1Trainers on the identical synthetic population and
  PRNG stream (bench.py's sphere/torus/union mix) — (A) full eikonal,
  (B) EikonalNumPoints=E — same epochs, same everything else;
* same-window step-time A/B (interleaved epoch blocks so relay drift
  can't masquerade as a win);
* parity metrics: final clamped-L1, full-point eikonal residual of BOTH
  fields (B's training used the subsample; its *report* evaluates
  (|∇f|-1)² on every point via the XLA path for a fair comparison), and
  mesh Chamfer-L2 vs the analytic sphere/torus/union surfaces.

Writes/merges eikonal_subsample.json at the repo root; bench.py embeds it
as detail["eikonal_subsample"] when present.

Ref behavior being matched: train_deep_sdf.py:724-729 (the reference
computes eikonal on every point; EikonalNumPoints is a TPU extension,
default off — this file is the evidence it is safe to turn on).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("MSD_FORCE_CPU") == "1":
    # the axon sitecustomize overrides JAX_PLATFORMS at interpreter start;
    # force it back before any backend initializes (tests/conftest.py recipe)
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eik-points", type=int, default=4096)
    ap.add_argument("--scenes", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--samples", type=int, default=16384)
    ap.add_argument("--scenes-per-batch", type=int, default=32)
    ap.add_argument("--dims", type=int, default=512)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--code", type=int, default=256)
    ap.add_argument("--mesh-n", type=int, default=256)
    ap.add_argument("--out", default=os.path.join(REPO, "eikonal_subsample.json"))
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench as bench_mod
    from msd_tpu import mesh as mesh_mod
    from msd_tpu.data.sdf_samples import SdfDataset, _pad_stack
    from msd_tpu.metrics.chamfer import compute_mesh_chamfer
    from msd_tpu.train.stage1 import Stage1Trainer

    def specs(eik_points):
        s = {
            "Description": "eikonal-subsample-ab",
            "DataSource": "<in-memory>",
            "TrainSplit": "<in-memory>",
            "TestSplit": "<in-memory>",
            "NetworkArch": "deep_sdf_decoder",
            "NetworkSpecs": {
                "dims": [args.dims] * args.layers,
                "dropout": [],
                "dropout_prob": 0.2,
                "norm_layers": [],
                "latent_in": [args.layers // 2],
                "xyz_in_all": False,
                "use_tanh": False,
                "latent_dropout": False,
                "weight_norm": True,
            },
            "CodeLength": args.code,
            "NumEpochs": args.epochs + 1,
            "SnapshotFrequency": 10_000,
            "AdditionalSnapshots": [],
            "LearningRateSchedule": [
                {"Type": "Step", "Initial": 0.0005, "Interval": 500, "Factor": 0.5},
                {"Type": "Step", "Initial": 0.001, "Interval": 500, "Factor": 0.5},
            ],
            "SamplesPerScene": args.samples,
            "ScenesPerBatch": args.scenes_per_batch,
            "UseEikonal": True,
            "ClampingDistance": 0.1,
            "CodeRegularization": True,
            "CodeRegularizationLambda": 1e-4,
            "CodeBound": 1.0,
            "GradientClipNorm": 1.0,
        }
        if eik_points is not None:
            s["EikonalNumPoints"] = int(eik_points)
        return s

    pos_all, neg_all, radii = bench_mod.make_shape_data(args.scenes)
    pos, pos_counts = _pad_stack(pos_all)
    neg, neg_counts = _pad_stack(neg_all)

    def dataset():
        return SdfDataset(
            npyfiles=[f"shape_{i}.npz" for i in range(args.scenes)],
            instance_ids=[f"shape_{i}" for i in range(args.scenes)],
            pos=pos, pos_counts=pos_counts, neg=neg, neg_counts=neg_counts,
            subsample=args.samples,
        )

    trainers = {
        "full": Stage1Trainer("/tmp/msd_eik_ab_full", specs=specs(None), dataset=dataset()),
        "sub": Stage1Trainer("/tmp/msd_eik_ab_sub", specs=specs(args.eik_points), dataset=dataset()),
    }
    steps_per_epoch = args.scenes // args.scenes_per_batch

    # warmup/compile both before any timing (incl. the 5-epoch block
    # program that the timed train_epochs calls dispatch)
    for t in trainers.values():
        t.train_epoch(1)
        t.train_epochs(2, 7, block=5)

    # interleaved same-window step timing: 4 alternating blocks of 5 epochs
    times = {"full": 0.0, "sub": 0.0}
    epochs_done = {"full": 6, "sub": 6}
    timed_epochs = {"full": 0, "sub": 0}
    for _ in range(4):
        for name, tr in trainers.items():
            e0 = epochs_done[name] + 1
            t0 = time.time()
            # block=5 pinned: the warmup compiled exactly this program, and
            # a smaller MSD_EPOCH_BLOCK env default would otherwise compile
            # fresh programs inside the timed window
            tr.train_epochs(e0, e0 + 5, block=5)
            times[name] += time.time() - t0
            epochs_done[name] = e0 + 4
            timed_epochs[name] += 5
    # finish training to args.epochs (untimed)
    for name, tr in trainers.items():
        if epochs_done[name] < args.epochs:
            # block=5 reuses the already-compiled 5-epoch block program
            tr.train_epochs(epochs_done[name] + 1, args.epochs + 1, block=5)
            epochs_done[name] = args.epochs

    step_ms = {
        k: times[k] / (timed_epochs[k] * steps_per_epoch) * 1000.0 for k in trainers
    }

    # full-point eikonal residual of both fields, via the XLA path on the
    # same fixed batch (measures the FIELD, not the training estimator)
    import jax

    residuals = {}
    final_sdf = {}
    for name, tr in trainers.items():
        lat = tr.state["lat"]
        xyz = jnp.asarray(
            np.random.default_rng(7).uniform(-1, 1, size=(args.scenes, 4096, 3)).astype(np.float32)
        )

        def eik_resid(net, lat_rows, xyz):
            B, P = xyz.shape[:2]
            expanded = jnp.repeat(lat_rows, P, axis=0)
            flat = xyz.reshape(-1, 3)

            def f(x):
                return tr.decoder.apply(net, jnp.concatenate([expanded, x], axis=1))

            _, vjp = jax.vjp(f, flat)
            (g,) = vjp(jnp.ones((B * P, 1)))
            gn = jnp.linalg.norm(g, axis=1)
            return jnp.mean((gn - 1.0) ** 2)

        residuals[name] = float(jax.jit(eik_resid)(tr.state["net"], lat, xyz))
        m = tr.train_epoch(epochs_done[name] + 1)
        final_sdf[name] = float(m["sdf"])
        epochs_done[name] += 1

    # Chamfer vs analytic surfaces for scenes {0: sphere, 1: torus, 2: union}
    # (bench.py's quality-guard recipe, applied to BOTH fields)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from conftest import make_sphere_mesh

    from msd_tpu.ops.marching_cubes import marching_tetrahedra

    Ng = 129
    axis = np.linspace(-1, 1, Ng, dtype=np.float32)
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    grid_pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    union_grid = bench_mod.union_sdf(grid_pts).reshape(Ng, Ng, Ng)
    gt_meshes = {
        "sphere": make_sphere_mesh(radius=float(radii[0])),
        "torus": bench_mod.make_torus_mesh(),
        "union": marching_tetrahedra(
            union_grid, level=0.0, spacing=(2.0 / (Ng - 1),) * 3,
            origin=(-1.0, -1.0, -1.0),
        ),
    }
    chamfer = {}
    for name, tr in trainers.items():
        ev = mesh_mod.PointEvaluator(tr.decoder, tr.state["net"])
        per = {}
        for si, tag in ((0, "sphere"), (1, "torus"), (2, "union")):
            res = mesh_mod.create_mesh(
                tr.decoder, tr.state["net"], tr.state["lat"][si],
                N=args.mesh_n, return_mesh=True, evaluator=ev,
            )
            if res is None or res is False:
                per[tag] = None
                continue
            c, _ = compute_mesh_chamfer(gt_meshes[tag], res, num_mesh_samples=10000)
            per[tag] = float(c)
        chamfer[name] = per

    out = {
        "eik_points": args.eik_points,
        "samples_per_scene": args.samples,
        "epochs": args.epochs,
        "step_ms": {k: round(v, 2) for k, v in step_ms.items()},
        "speedup": round(step_ms["full"] / step_ms["sub"], 3),
        "final_sdf_l1": final_sdf,
        "eikonal_residual_full_points": residuals,
        "chamfer": chamfer,
        "backend": jax.default_backend(),
    }
    # merge: the top-level fields track the evidenced default setting
    # (E=4096); every run also lands in a per-E "sweep" map so the
    # downward sweep (VERDICT r4 #2 follow-up) accumulates in one file
    result = {}
    if os.path.isfile(args.out):
        with open(args.out) as f:
            result = json.load(f)
    sweep = result.get("sweep", {})
    sweep[str(args.eik_points)] = {
        "step_ms": out["step_ms"], "speedup": out["speedup"],
        "final_sdf_l1": final_sdf,
        "eikonal_residual_full_points": residuals,
        "chamfer_sub": chamfer.get("sub"),
        "epochs": args.epochs,
    }
    # the top-level fields are RESERVED for the default-setting (E=4096)
    # evidence that bench.py embeds — a non-default run on a fresh file
    # must not masquerade as it (it still lands in the sweep map)
    if args.eik_points == 4096:
        result.update(out)
    result["sweep"] = sweep
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
