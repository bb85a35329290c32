#!/usr/bin/env python3
"""Same-window A/B of the Stage-2 fused SDF kernel's frozen-decoder mode.

Round-3 ran the fused SDF-consistency kernel with ``train_net=True``
unconditionally, spending the full weight-gradient sweep (~1/3 of the
kernel's FLOPs) even in the flagship TrainSDFDecoder=false config. Round 4
auto-selects ``train_net=False`` there (PERF.md stage-2 roofline: analytic
floor 16.7 vs 25.1 ms/step). This harness measures the two kernel modes in
one process with interleaved timed blocks so relay drift cannot masquerade
as a win: trainer A is the stock frozen-decoder config, trainer B is the
same config with ``make_fused_sdf_l1`` forced back to ``train_net=True``
(the round-3 behavior — gradients are computed and discarded; the optimizer
and loss are identical, so the loss trajectories must agree to bf16
accumulation-order noise — the two modes auto-select different point tiles
since the round-4 tile tuning, so bitwise equality no longer holds).

Prints one JSON line {frozen_ms, full_kernel_ms, speedup, loss_delta}.
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
    ap.add_argument("--reps", type=int, default=6, help="timed blocks per setting")
    ap.add_argument("--block", type=int, default=5, help="epochs per timed block")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import bench as bench_mod
    from msd_tpu.data.sdf_samples import SdfDataset, _pad_stack
    from msd_tpu.ops import fused_train
    from msd_tpu.train.stage2 import Stage2Trainer

    pos_all, neg_all, _ = bench_mod.make_shape_data(args.scenes)
    pos, pc = _pad_stack(pos_all)
    neg, nc = _pad_stack(neg_all)
    specs = {
        "Description": "stage2-step-ab", "DataSource": "<mem>",
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
        "SamplesPerScene": 16384, "ScenesPerBatch": args.scenes,
        "ClampingDistance": 0.1, "VAELatentDim": 16,
        "VAEEncoderHiddenDims": [512, 512], "VAEDecoderHiddenDims": [512, 512],
        "GradientClipNorm": 1.0,
        # flagship mode under test: frozen SDF decoder
        "TrainSDFDecoder": False,
    }
    dataset = SdfDataset(
        npyfiles=[f"s{i}.npz" for i in range(args.scenes)],
        instance_ids=[f"s{i}" for i in range(args.scenes)],
        pos=pos, pos_counts=pc, neg=neg, neg_counts=nc,
        subsample=specs["SamplesPerScene"],
    )
    # teacher latents: timing is value-independent; any fixed table works
    teacher = np.random.default_rng(0).normal(0.0, 0.01, (args.scenes, 256)).astype(np.float32)

    tr_frozen = Stage2Trainer(
        "/tmp/msd_s2ab_frozen", specs=dict(specs), dataset=dataset,
        teacher_latents=teacher,
    )
    tr_frozen.train_epoch(1)  # builds + compiles the train_net=False step
    assert tr_frozen._fused_sdf_active, "fused SDF kernel did not engage (frozen)"

    orig = fused_train.make_fused_sdf_l1

    def force_full_kernel(*a, **kw):
        kw["train_net"] = True
        return orig(*a, **kw)

    fused_train.make_fused_sdf_l1 = force_full_kernel
    try:
        tr_full = Stage2Trainer(
            "/tmp/msd_s2ab_full", specs=dict(specs), dataset=dataset,
            teacher_latents=teacher,
        )
        tr_full.train_epoch(1)  # builds + compiles the train_net=True step
        assert tr_full._fused_sdf_active, "fused SDF kernel did not engage (full)"
        # the epoch-BLOCK program must also be built while the patch is
        # active (each block size builds its own step via _build_step)
        tr_full.train_epochs(2, 2 + args.block, block=args.block)
    finally:
        fused_train.make_fused_sdf_l1 = orig

    steps_per_epoch = max(1, args.scenes // specs["ScenesPerBatch"])
    # warm the frozen epoch-block program (the full one was warmed under
    # the patch above)
    tr_frozen.train_epochs(2, 2 + args.block, block=args.block)
    times = {"frozen": [], "full_kernel": []}
    last_loss = {}
    epoch = {"frozen": 2 + args.block, "full_kernel": 2 + args.block}
    for _ in range(args.reps):
        for name, tr in (("frozen", tr_frozen), ("full_kernel", tr_full)):
            e0 = epoch[name]
            t0 = time.time()
            means = tr.train_epochs(e0, e0 + args.block, block=args.block)
            dt = time.time() - t0
            epoch[name] = e0 + args.block
            times[name].append(dt / (args.block * steps_per_epoch) * 1000.0)
            last_loss[name] = means[-1]["total"]

    out = {
        "scenes": args.scenes,
        "reps": args.reps,
        "block_epochs": args.block,
        "frozen_ms": round(float(np.median(times["frozen"])), 2),
        "full_kernel_ms": round(float(np.median(times["full_kernel"])), 2),
        "frozen_ms_min": round(min(times["frozen"]), 2),
        "full_kernel_ms_min": round(min(times["full_kernel"]), 2),
        "speedup": round(float(np.median(times["full_kernel"]) / np.median(times["frozen"])), 3),
        # identical math modulo discarded gradients: trajectories must agree
        "loss_delta": abs(last_loss["frozen"] - last_loss["full_kernel"]),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
