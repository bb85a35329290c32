#!/usr/bin/env python3
"""Same-window A/B of the 512-class streaming extraction knobs.

Trains the bench population briefly (fields only need a stable shell for
timing — the mesher workload is set by the Lipschitz threshold, not field
quality), then interleaves create_mesh(N=513) repetitions across knob
settings in one process so relay drift cannot masquerade as a win
(PERF.md §4: the relay swings by the hour; only same-window A/Bs count).

Default comparison: MSD_STREAM_HYBRID on vs off (the round-4 hybrid
two-level dispatch). --knob/--values generalize to any env knob, e.g.
    python benchmarks/grid512_ab.py --knob MSD_STREAM_SLABS --values 2,3,4
A value may also be a compound env assignment "K1=v1+K2=v2" (ignoring
--knob), so interacting knobs can be A/B'd jointly in one window:
    --values 'MSD_STREAM_DEDUP=auto+MSD_VALUE_CODEC=packed,MSD_STREAM_DEDUP=off+MSD_VALUE_CODEC=int8'

Prints one JSON line: per-setting {median, min, p90} wall seconds plus the
median per-stage breakdown (t_refine/t_crossing/t_stream/t_fetch/t_finish).
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
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knob", default="MSD_STREAM_HYBRID")
    ap.add_argument("--values", default="on,off")
    ap.add_argument("--n", type=int, default=513)
    ap.add_argument("--reps", type=int, default=6, help="reps per setting")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--scenes", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import bench as bench_mod
    from msd_tpu import mesh as mesh_mod
    from msd_tpu.data.sdf_samples import SdfDataset, _pad_stack
    from msd_tpu.train.stage1 import Stage1Trainer

    # bench.py's flagship stage-1 config/population (keeps the decoder and
    # the active-set workload identical to the headline benchmark)
    pos_all, neg_all, radii = bench_mod.make_shape_data(args.scenes)
    pos, pc = _pad_stack(pos_all)
    neg, nc = _pad_stack(neg_all)
    specs = {
        "Description": "grid512-ab", "DataSource": "<mem>", "TrainSplit": "<mem>",
        "TestSplit": "<mem>", "NetworkArch": "deep_sdf_decoder",
        "NetworkSpecs": {
            "dims": [512] * 8, "dropout": [], "dropout_prob": 0.2,
            "norm_layers": [], "latent_in": [4], "xyz_in_all": False,
            "use_tanh": False, "latent_dropout": False, "weight_norm": True,
        },
        "CodeLength": 256, "NumEpochs": args.epochs + 1,
        "SnapshotFrequency": 10_000, "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 0.0005, "Interval": 500, "Factor": 0.5},
            {"Type": "Step", "Initial": 0.001, "Interval": 500, "Factor": 0.5},
        ],
        "SamplesPerScene": 16384, "ScenesPerBatch": args.scenes,
        "UseEikonal": True, "ClampingDistance": 0.1,
        "CodeRegularization": True, "CodeRegularizationLambda": 1e-4,
        "CodeBound": 1.0, "GradientClipNorm": 1.0,
    }
    dataset = SdfDataset(
        npyfiles=[f"s{i}.npz" for i in range(args.scenes)],
        instance_ids=[f"s{i}" for i in range(args.scenes)],
        pos=pos, pos_counts=pc, neg=neg, neg_counts=nc,
        subsample=specs["SamplesPerScene"],
    )
    trainer = Stage1Trainer("/tmp/msd_grid_ab", specs=specs, dataset=dataset)
    trainer.train_epochs(1, args.epochs + 1)
    latent = trainer.state["lat"][0]
    evaluator = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    scratch = os.environ.get("MSD_SPILL_TMP") or (
        "/dev/shm" if os.access("/dev/shm", os.W_OK) else "/tmp")

    values = args.values.split(",")

    def parse_setting(v):
        if "=" in v:
            return dict(kv.split("=", 1) for kv in v.split("+"))
        return {args.knob: v}

    settings_env = {v: parse_setting(v) for v in values}
    all_keys = sorted({k for env in settings_env.values() for k in env})

    def apply_setting(v):
        for k in all_keys:
            os.environ.pop(k, None)
        os.environ.update(settings_env[v])

    times = {v: [] for v in values}
    stages = {v: [] for v in values}
    # warm every setting's programs before any timed rep
    for v in values:
        apply_setting(v)
        mesh_mod.create_mesh(
            trainer.decoder, trainer.state["net"], latent,
            filename=os.path.join(scratch, "grid_ab_warm"), N=args.n,
            evaluator=evaluator,
        )
    for rep in range(args.reps):
        for v in values:
            apply_setting(v)
            t0 = time.time()
            ok = mesh_mod.create_mesh(
                trainer.decoder, trainer.state["net"], latent,
                filename=os.path.join(scratch, "grid_ab"), N=args.n,
                evaluator=evaluator,
            )
            dt = time.time() - t0
            assert ok, f"extraction failed at {args.knob}={v}"
            times[v].append(dt)
            stages[v].append(dict(mesh_mod.LAST_STREAMING_STATS))

    stage_keys = ("t_refine", "t_crossing", "t_stream", "t_fetch", "t_finish")
    out = {
        "knob": args.knob, "n": args.n, "reps": args.reps,
        "settings": {
            v: {
                "median": round(float(np.median(times[v])), 3),
                "min": round(min(times[v]), 3),
                "p90": round(float(np.percentile(times[v], 90)), 3),
                "stages_median": {
                    k: round(float(np.median([s.get(k, 0.0) for s in stages[v]])), 3)
                    for k in stage_keys
                },
                "hybrid": bool(stages[v][-1].get("hybrid", False)),
                "crossing_blocks": int(stages[v][-1].get("crossing_blocks", -1)),
            }
            for v in values
        },
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
