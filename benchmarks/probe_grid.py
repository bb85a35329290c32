"""Standalone 513^3 extraction probe for streaming-pipeline work.

Trains the flagship bench workload once and caches the trained state in
/dev/shm, then times create_mesh reps with per-stage stats — so codec /
dedup / scheduling experiments iterate in seconds instead of re-running
the full bench. Usage:

    python benchmarks/probe_grid.py [--reps 6] [--N 512] [--codec packed]

Not part of the benchmark contract (bench.py is); numbers here are for
engineering iteration only.
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/dev/shm/msd_probe_state.pkl"


def get_state():
    import jax.numpy as jnp
    import numpy as np

    from bench import make_shape_data
    from msd_tpu.data.sdf_samples import SdfDataset, _pad_stack
    from msd_tpu.train.stage1 import Stage1Trainer

    specs = {
        "Description": "probe",
        "DataSource": "<in-memory>",
        "TrainSplit": "<in-memory>",
        "TestSplit": "<in-memory>",
        "NetworkArch": "deep_sdf_decoder",
        "NetworkSpecs": {
            "dims": [512] * 8, "dropout": [], "dropout_prob": 0.2,
            "norm_layers": [], "latent_in": [4], "xyz_in_all": False,
            "use_tanh": False, "latent_dropout": False, "weight_norm": True,
        },
        "CodeLength": 256, "NumEpochs": 2001, "SnapshotFrequency": 1000,
        "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 0.0005, "Interval": 500, "Factor": 0.5},
            {"Type": "Step", "Initial": 0.001, "Interval": 500, "Factor": 0.5},
        ],
        "SamplesPerScene": 16384, "ScenesPerBatch": 32,
        "UseEikonal": True, "ClampingDistance": 0.1,
        "CodeRegularization": True, "CodeRegularizationLambda": 1e-4,
        "CodeBound": 1.0, "GradientClipNorm": 1.0,
    }
    num_scenes = 128
    pos_all, neg_all, _ = make_shape_data(num_scenes)
    pos, pos_counts = _pad_stack(pos_all)
    neg, neg_counts = _pad_stack(neg_all)
    dataset = SdfDataset(
        npyfiles=[f"s_{i}.npz" for i in range(num_scenes)],
        instance_ids=[f"s_{i}" for i in range(num_scenes)],
        pos=pos, pos_counts=pos_counts, neg=neg, neg_counts=neg_counts,
        subsample=specs["SamplesPerScene"],
    )
    trainer = Stage1Trainer("/tmp/msd_probe_exp", specs=specs, dataset=dataset)
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            net, lat = pickle.load(f)
        import jax

        trainer.state["net"] = jax.tree.map(jnp.asarray, net)
        trainer.state["lat"] = jnp.asarray(lat)
        print("loaded cached trained state", flush=True)
    else:
        t0 = time.time()
        trainer.train_epoch(1)
        trainer.train_epochs(2, 101)
        print(f"trained in {time.time()-t0:.1f}s", flush=True)
        import jax

        with open(CACHE, "wb") as f:
            pickle.dump((jax.tree.map(lambda a: __import__('numpy').asarray(a), trainer.state["net"]),
                         __import__('numpy').asarray(trainer.state["lat"])), f)
    return trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--N", type=int, default=512)
    ap.add_argument("--codec", default="packed")
    ap.add_argument("--retrain", action="store_true")
    args = ap.parse_args()
    if args.retrain and os.path.exists(CACHE):
        os.remove(CACHE)

    from msd_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from msd_tpu import mesh as mesh_mod

    trainer = get_state()
    latent = trainer.state["lat"][0]
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    out = "/dev/shm/msd_probe_mesh"
    for n_warm in (256, args.N):
        mesh_mod.create_mesh(
            trainer.decoder, trainer.state["net"], latent, filename=out + "_warm",
            N=n_warm, evaluator=ev, value_codec=args.codec,
        )
    print("warmed", flush=True)
    times = []
    for rep in range(args.reps):
        t0 = time.time()
        ok = mesh_mod.create_mesh(
            trainer.decoder, trainer.state["net"], latent, filename=out,
            N=args.N, evaluator=ev, value_codec=args.codec,
        )
        dt = time.time() - t0
        times.append(dt)
        s = mesh_mod.LAST_STREAMING_STATS
        print(f"rep {rep}: {dt:.3f}s  ok={ok}  stages={ {k: s.get(k) for k in ('t_refine','t_crossing','t_fetch','t_mesher','t_prep','t_stream','t_finish','t_ply','crossing_blocks','active_blocks','evaluated','num_verts')} }", flush=True)
    import numpy as np

    print(f"min={min(times):.3f} median={float(np.median(times)):.3f}", flush=True)


if __name__ == "__main__":
    main()
