"""Shared epoch-block dispatch plumbing for both trainers.

Through the TPU relay every host-side device interaction is a blocking RPC
(~25 ms per D2H fetch, ~25-40 ms per scalar device_put, ~5 ms per dispatch
measured on the 1-core host — PERF.md round-4 epoch-block section), so both
trainers batch E epochs into ONE jitted program and fetch all E epochs'
metrics in one packed [K, E, nb] transfer. The trainer-specific part (input
packing, the jitted block program) lives in each trainer's
``_dispatch_epoch_block``; the cap parsing, packed-metrics resolution and
the pipelined block loop are identical and live here.

Reference analog: one Python epoch loop (train_deep_sdf.py:528,
train_MLP_VAE_deep_sdf.py:2770) — epoch blocking is a pure dispatch
optimization with bitwise-identical training dynamics
(tests/test_epoch_blocks.py).
"""

import os

import numpy as np


def block_cap(default: int = 8) -> int:
    """Epochs per dispatched training program (``MSD_EPOCH_BLOCK``, >= 1)."""
    return max(1, int(os.environ.get("MSD_EPOCH_BLOCK", str(default))))


def resolve_epoch_block(trainer, keys, packed_dev, nb, n_epochs):
    """Fetch one dispatched block's packed [K, E, nb] metrics (ONE D2H
    transfer), fold them into the trainer's loss logs, and return the
    per-epoch mean metric dicts."""
    packed = np.asarray(packed_dev)
    ti = keys.index("total")
    means = []
    for e in range(n_epochs):
        for i in range(nb):
            trainer.loss_log.append(float(packed[ti, e, i]))
        mean = {k: float(np.mean(packed[j, e])) for j, k in enumerate(keys)}
        trainer.loss_log_epoch.append(mean["total"])
        means.append(mean)
    return means


def run_blocked_epochs(trainer, epochs, batch_split, rng, max_in_flight, block=None):
    """Dispatch ``epochs`` in blocks of ``block`` (one jitted program each),
    pipelined up to ``max_in_flight`` blocks deep; returns the per-epoch
    mean metric dicts in epoch order."""
    if block is None:
        block = block_cap()
    pending, means = [], []
    i = 0
    while i < len(epochs):
        n = min(block, len(epochs) - i)
        pending.append(trainer._dispatch_epoch_block(epochs[i : i + n], batch_split, rng))
        i += n
        if len(pending) >= max_in_flight:
            means.extend(resolve_epoch_block(trainer, *pending.pop(0)))
    while pending:
        means.extend(resolve_epoch_block(trainer, *pending.pop(0)))
    return means
