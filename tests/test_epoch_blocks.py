"""Epoch-block dispatch parity: train_epochs blocks E epochs into ONE jitted
program (outer lax.scan over epochs) to amortize the per-epoch host RPCs
through the TPU relay (Stage1Trainer._get_epoch_block_fn). The blocked path
must reproduce the sequential per-epoch path EXACTLY — same permutation
draws, same per-step PRNG key stream, same schedule values — so these tests
require bitwise-equal loss logs and final parameters.

Reference analog: one Python epoch loop (train_deep_sdf.py:528,
train_MLP_VAE_deep_sdf.py:2770) — batching epochs is a pure dispatch
optimization with no training-dynamics surface.
"""

import json

import numpy as np
import pytest

import msd_tpu.workspace as ws
from msd_tpu.train.stage1 import Stage1Trainer
from msd_tpu.train.stage2 import Stage2Trainer
from test_stage1_trainer import _specs
from test_stage2_trainer import _setup


def _tree_equal(a, b):
    import jax

    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_stage1_block_matches_sequential(tmp_path):
    exp_a, _ = _specs(tmp_path / "a", UseEikonal=True)
    exp_b, _ = _specs(tmp_path / "b", UseEikonal=True)
    ta, tb = Stage1Trainer(exp_a), Stage1Trainer(exp_b)
    rng = np.random.default_rng(7)
    seq = [ta.train_epoch(e, rng=rng) for e in range(1, 6)]
    # block=3 over 5 epochs → blocks of 3 and 2 (exercises the remainder)
    blk = tb.train_epochs(1, 6, rng=np.random.default_rng(7), block=3)
    np.testing.assert_array_equal(
        [m["total"] for m in seq], [m["total"] for m in blk]
    )
    np.testing.assert_array_equal(ta.loss_log, tb.loss_log)
    _tree_equal(ta.state, tb.state)
    assert ta.global_batch_idx == tb.global_batch_idx
    assert ta.lr_log == tb.lr_log


def test_stage2_block_matches_sequential(tmp_path):
    # label losses on: exercises the packed [E,4,nb,B] label/valid upload
    over = dict(GuidedContrastiveLoss=True, CorrLeakageLoss=True)
    exp_a, _, _ = _setup(tmp_path / "a", **over)
    exp_b, _, _ = _setup(tmp_path / "b", **over)
    ta, tb = Stage2Trainer(exp_a), Stage2Trainer(exp_b)
    rng = np.random.default_rng(3)
    seq = [ta.train_epoch(e, rng=rng) for e in range(1, 5)]
    blk = tb.train_epochs(1, 5, rng=np.random.default_rng(3), block=4)
    np.testing.assert_array_equal(
        [m["total"] for m in seq], [m["total"] for m in blk]
    )
    np.testing.assert_array_equal(ta.loss_log, tb.loss_log)
    _tree_equal(ta.state, tb.state)
    # eval blocks reuse the last epoch's schedule weights
    assert ta._last_kl_weight == tb._last_kl_weight
    assert ta._last_code_reg_weight == tb._last_code_reg_weight


def test_stage1_train_blocked_checkpoints_match_sequential(tmp_path):
    """train()'s event-boundary chunking must make every checkpoint epoch a
    block's LAST epoch: the state persisted under ModelParameters/<E>.pth by
    the blocked loop must equal the state a per-epoch loop persists there.
    (A mid-block event would silently checkpoint future-epoch weights.)"""
    import torch

    # SnapshotFrequency=3 + LogFrequency=4 put events at 3, 4, 6, 8 — none
    # aligned with the default block cap, so blocks of 3/1/2/2 are exercised
    over = dict(NumEpochs=8, SnapshotFrequency=3, AdditionalSnapshots=[], LogFrequency=4)
    exp_a, _ = _specs(tmp_path / "a", **over)
    exp_b, _ = _specs(tmp_path / "b", **over)
    ta, tb = Stage1Trainer(exp_a), Stage1Trainer(exp_b)
    # force the per-epoch path in the oracle (plateau-style fallback)
    tb._lr_needs_epoch_loss = lambda: True
    ta.train(eval_hooks=False)
    tb.train(eval_hooks=False)
    for name in ("3", "6", "latest"):
        sa = torch.load(f"{exp_a}/ModelParameters/{name}.pth", weights_only=False)
        sb = torch.load(f"{exp_b}/ModelParameters/{name}.pth", weights_only=False)
        assert sa["epoch"] == sb["epoch"], name
        for k in sa["model_state_dict"]:
            np.testing.assert_array_equal(
                sa["model_state_dict"][k].numpy(), sb["model_state_dict"][k].numpy(),
                err_msg=f"{name}:{k}",
            )
    _tree_equal(ta.state, tb.state)
    np.testing.assert_array_equal(ta.loss_log, tb.loss_log)
    assert len(ta.timing_log) == len(tb.timing_log) == 8


@pytest.mark.slow
def test_stage1_block_matches_sequential_on_mesh(tmp_path):
    """Blocked dispatch under an 8-device mesh (pad-and-mask scene batch)."""
    import jax
    from msd_tpu.parallel.mesh_utils import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh()
    exp_a, _ = _specs(tmp_path / "a")
    exp_b, _ = _specs(tmp_path / "b")
    ta = Stage1Trainer(exp_a, mesh=mesh)
    tb = Stage1Trainer(exp_b, mesh=mesh)
    rng = np.random.default_rng(11)
    seq = [ta.train_epoch(e, rng=rng) for e in range(1, 4)]
    blk = tb.train_epochs(1, 4, rng=np.random.default_rng(11), block=3)
    np.testing.assert_allclose(
        [m["total"] for m in seq], [m["total"] for m in blk], rtol=0, atol=0
    )
    _tree_equal(ta.state, tb.state)
