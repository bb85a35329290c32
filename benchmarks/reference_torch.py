#!/usr/bin/env python3
"""Measure the PyTorch reference's throughput on this host (the denominator).

The reference publishes no training-throughput figure (BASELINE.md); its only
perf anchor is "~10 s GPU / ~100 s CPU" for a 512^3 grid eval
(ref: deep_sdf/mesh.py:27). This script measures, on this host's CPU, a
PyTorch decoder equivalent to the flagship workload
(ref: examples/ADNI/minimal_eikonal/specs.json — 8x512 weight-norm MLP,
latent 256, latent_in=[4]):

  * one Stage-1 training step: forward + clamped-L1 + eikonal + code-reg
    + backward + Adam on 32 scenes x 16384 samples
    (ref: train_deep_sdf.py:594-784 semantics, re-implemented)
  * chunked 512^3 grid eval at max_batch=2^18 (ref: mesh.py:57-68 semantics)

Large workloads are measured at reduced sizes and extrapolated linearly
(per-point cost verified linear across sizes below). Writes JSON to stdout
and to --out (default: repo/baseline_torch_measured.json), which bench.py
reads to report measured train/grid ratios.
"""

import argparse
import json
import os
import platform
import time

import torch
import torch.nn as nn
from torch.nn.utils import weight_norm

LATENT = 256
DIMS = [512] * 8
LATENT_IN = 4  # full input re-injected at layer 4 (ref: deep_sdf_decoder.py:40-45)


class TorchDeepSDF(nn.Module):
    """Reference-equivalent decoder built from the spec (not a code copy)."""

    def __init__(self):
        super().__init__()
        in_dim = LATENT + 3
        layers = []
        prev = in_dim
        for i, w in enumerate(DIMS):
            out = w - in_dim if i == LATENT_IN - 1 else w
            layers.append(weight_norm(nn.Linear(prev, out)))
            prev = out if i != LATENT_IN - 1 else out + in_dim
        layers.append(weight_norm(nn.Linear(DIMS[-1], 1)))
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        h = x
        for i, lin in enumerate(self.layers):
            if i == LATENT_IN:
                h = torch.cat([h, x], dim=1)
            h = lin(h)
            if i < len(self.layers) - 1:
                h = torch.relu(h)
        return h


def measure_train_step(n_points, reps=2):
    """Seconds per training step at n_points (median of reps)."""
    torch.manual_seed(0)
    dec = TorchDeepSDF()
    lat_table = nn.Embedding(32, LATENT, max_norm=1.0)
    opt = torch.optim.Adam(
        [
            {"params": dec.parameters(), "lr": 5e-4},
            {"params": lat_table.parameters(), "lr": 1e-3},
        ]
    )
    idx = torch.randint(0, 32, (n_points,))
    xyz = (torch.rand(n_points, 3) * 2 - 1).requires_grad_(True)
    sdf_gt = torch.clamp(torch.randn(n_points, 1) * 0.05, -0.1, 0.1)
    times = []
    for _ in range(reps + 1):
        t0 = time.time()
        opt.zero_grad()
        z = lat_table(idx)
        pred = dec(torch.cat([z, xyz], dim=1))
        loss = torch.nn.functional.l1_loss(
            torch.clamp(pred, -0.1, 0.1), sdf_gt, reduction="sum"
        ) / n_points
        # eikonal (ref: train_deep_sdf.py:724-729 semantics)
        grad = torch.autograd.grad(pred.sum(), xyz, create_graph=True)[0]
        loss = loss + 0.002 * ((grad.norm(dim=1) - 1) ** 2).mean()
        loss = loss + 1e-4 * z.pow(2).sum() / n_points
        loss.backward()
        opt.step()
        times.append(time.time() - t0)
    times = sorted(times[1:])  # drop warmup
    return times[len(times) // 2]


def measure_grid_eval(chunk=2**18, n_chunks=3):
    """Seconds per max_batch chunk of latent-conditioned forward (no grad)."""
    torch.manual_seed(0)
    dec = TorchDeepSDF().eval()
    z = torch.randn(1, LATENT).expand(chunk, LATENT)
    xyz = torch.rand(chunk, 3) * 2 - 1
    x = torch.cat([z, xyz], dim=1)
    with torch.no_grad():
        dec(x[: chunk // 4])  # warmup
        t0 = time.time()
        for _ in range(n_chunks):
            dec(x)
    return (time.time() - t0) / n_chunks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "baseline_torch_measured.json"),
    )
    args = ap.parse_args()

    # training: measure two sizes, check linearity, extrapolate to 524288
    n_small, n_big = 16384, 65536
    t_small = measure_train_step(n_small)
    t_big = measure_train_step(n_big)
    per_point = t_big / n_big  # the larger size amortizes fixed overhead
    linearity = (t_big / t_small) / (n_big / n_small)
    full_points = 32 * 16384
    t_full_step = per_point * full_points
    train_qps = full_points / t_full_step

    t_chunk = measure_grid_eval()
    grid_total = 512**3
    t_grid = t_chunk * (grid_total / 2**18)
    grid_qps = grid_total / t_grid

    result = {
        "hardware": f"{platform.processor() or 'cpu'} x{os.cpu_count()} "
                    f"(torch {torch.__version__}, {torch.get_num_threads()} threads)",
        "train_step_seconds_524288pts": round(t_full_step, 3),
        "train_queries_per_sec": round(train_qps),
        "train_linearity_check": round(linearity, 3),
        "grid512_seconds": round(t_grid, 1),
        "grid_eval_queries_per_sec": round(grid_qps),
        "workload": "8x512 weight-norm decoder, latent 256, latent_in=[4]; "
                    "train: clamped-L1+eikonal+code-reg+Adam; "
                    "grid: no-grad chunks of 2^18",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
