#!/usr/bin/env python3
"""Decompose the Stage-2 step time: kernel floor vs everything else.

The stage-2 roofline (PERF.md) predicts the fused SDF-consistency kernel at
~21 ms (frozen) / ~32 ms (full) at stage-1's sustained utilization, but the
measured step is ~46 ms — and the frozen-mode A/B recovered only ~3 ms of
the ~11 ms the FLOP budget promises. This harness separates the step into
a point-linear component (the SDF chain: batch gather + kernel) and a fixed
component (VAE fwd/bwd, optimizer, dispatch) two ways, in one process:

1. step(P) at SamplesPerScene = 16384 and 4096 — the slope gives the
   point-linear cost, the intercept the fixed cost;
2. kernel-only time via a lax.scan of 8 chained value_and_grad calls of
   ``make_fused_sdf_l1`` inside ONE jitted program (chaining hides dispatch,
   so this is device time, not the dispatch-dominated microbench antipattern)
   for both train_net modes.

Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--block", type=int, default=5, help="epochs per timed block")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from msd_tpu.data.sdf_samples import SdfDataset, _pad_stack
    from msd_tpu.models.deepsdf import DeepSDFDecoder
    from msd_tpu.ops.fused_train import make_fused_sdf_l1
    from msd_tpu.train.stage2 import Stage2Trainer

    pos_all, neg_all, _ = bench_mod.make_shape_data(args.scenes)
    pos, pc = _pad_stack(pos_all)
    neg, nc = _pad_stack(neg_all)

    def make_specs(P):
        return {
            "Description": f"s2-breakdown-P{P}", "DataSource": "<mem>",
            "TrainSplit": "<mem>", "NetworkArch": "deep_sdf_decoder",
            "NetworkSpecs": {
                "dims": [512] * 8, "dropout": [], "dropout_prob": 0.2,
                "norm_layers": [], "latent_in": [4], "xyz_in_all": False,
                "use_tanh": False, "latent_dropout": False, "weight_norm": True,
            },
            "CodeLength": 256, "NumEpochs": 10_000, "SnapshotFrequency": 10_000,
            "AdditionalSnapshots": [],
            "LearningRateSchedule": [
                {"Type": "Step", "Initial": 0.0005, "Interval": 500, "Factor": 0.5},
                {"Type": "Step", "Initial": 0.0005, "Interval": 500, "Factor": 0.5},
            ],
            "SamplesPerScene": P, "ScenesPerBatch": args.scenes,
            "ClampingDistance": 0.1, "VAELatentDim": 16,
            "VAEEncoderHiddenDims": [512, 512], "VAEDecoderHiddenDims": [512, 512],
            "GradientClipNorm": 1.0, "TrainSDFDecoder": False,
        }

    teacher = np.random.default_rng(0).normal(0.0, 0.01, (args.scenes, 256)).astype(np.float32)
    trainers = {}
    for P in (16384, 4096):
        ds = SdfDataset(
            npyfiles=[f"s{i}.npz" for i in range(args.scenes)],
            instance_ids=[f"s{i}" for i in range(args.scenes)],
            pos=pos, pos_counts=pc, neg=neg, neg_counts=nc, subsample=P,
        )
        tr = Stage2Trainer(
            f"/tmp/msd_s2bd_{P}", specs=make_specs(P), dataset=ds,
            teacher_latents=teacher,
        )
        tr.train_epoch(1)
        assert tr._fused_sdf_active
        trainers[P] = tr

    # ---- kernel-only: lax.scan of chained value_and_grad calls ----
    sdf_decoder = trainers[16384].sdf_decoder
    net = trainers[16384].sdf_params_frozen
    B, P, L = args.scenes, 16384, 256
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (B, P, 3), jnp.float32, -1, 1)
    gt = jax.random.uniform(key, (B, P, 1), jnp.float32, -0.1, 0.1)
    lat0 = jnp.zeros((B, L), jnp.float32)
    SCAN_N = 8

    def make_kernel_only(train_net):
        f = make_fused_sdf_l1(sdf_decoder, 0.1, train_net=train_net)
        vg = jax.value_and_grad(lambda lat: f(net, lat, xyz, gt))

        @jax.jit
        def run(lat):
            def body(carry, _):
                val, g = vg(carry)
                # chain the iterations so the scan is sequential device work
                return carry + 1e-30 * g + 0.0 * val, val
            out, vals = jax.lax.scan(body, lat, None, length=SCAN_N)
            return out, vals
        return run

    kernel_ms = {}
    for name, tn in (("frozen", False), ("full", True)):
        run = make_kernel_only(tn)
        jax.block_until_ready(run(lat0))  # compile
        samples = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(lat0))
            samples.append((time.time() - t0) / SCAN_N * 1000.0)
        kernel_ms[name] = round(float(np.median(samples)), 2)

    # ---- step(P): interleaved timed blocks ----
    steps_per_epoch = 1
    times = {P: [] for P in trainers}
    for tr in trainers.values():  # warm the epoch-block programs
        tr.train_epochs(2, 2 + args.block, block=args.block)
    epoch = {P: 2 + args.block for P in trainers}
    for _ in range(args.reps):
        for P, tr in trainers.items():
            e0 = epoch[P]
            t0 = time.time()
            tr.train_epochs(e0, e0 + args.block, block=args.block)
            dt = time.time() - t0
            epoch[P] = e0 + args.block
            times[P].append(dt / (args.block * steps_per_epoch) * 1000.0)

    step16 = float(np.median(times[16384]))
    step4 = float(np.median(times[4096]))
    # step(P) = fixed + slope*P  (per-scene points)
    slope = (step16 - step4) / (16384 - 4096)
    fixed = step4 - slope * 4096
    out = {
        "scenes": args.scenes, "reps": args.reps,
        "step_ms_P16384": round(step16, 2),
        "step_ms_P4096": round(step4, 2),
        "point_linear_ms_at_P16384": round(slope * 16384, 2),
        "fixed_ms": round(fixed, 2),
        "kernel_only_ms": kernel_ms,
        "kernel_scan_len": SCAN_N,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
