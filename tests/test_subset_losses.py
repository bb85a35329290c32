"""Group/subset loss parity vs deep_sdf/loss_subset.py oracles."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msd_tpu.losses import subset as sl

REF = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _ref():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_subset", os.path.join(REF, "deep_sdf", "loss_subset.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(20, 8)).astype(np.float32)
    y_cls = rng.integers(0, 2, 20).astype(np.float32)
    y_age = rng.uniform(0, 1, 20).astype(np.float32)
    return x, y_cls, y_age


@needs_reference
def test_group_penalties_parity(batch):
    import torch

    ref = _ref()
    x, y_cls, y_age = batch
    tdims = [0, 3]

    want = float(ref.corr_leakage_penalty_group(torch.from_numpy(x), torch.from_numpy(y_cls), tdims))
    got = float(sl.corr_leakage_penalty_group(jnp.asarray(x), jnp.asarray(y_cls), tdims))
    assert got == pytest.approx(want, rel=1e-3)

    want = float(ref.cross_cov_penalty_group(torch.from_numpy(x), tdims))
    got = float(sl.cross_cov_penalty_group(jnp.asarray(x), tdims))
    assert got == pytest.approx(want, rel=1e-3)

    subsets = [[1, 2], [4, 5, 6]]
    want = float(ref.corr_leakage_penalty_pca_subsets(torch.from_numpy(x), torch.from_numpy(y_age), subsets))
    got = float(sl.corr_leakage_penalty_pca_subsets(jnp.asarray(x), jnp.asarray(y_age), subsets))
    assert got == pytest.approx(want, rel=1e-3, abs=1e-6)

    want = float(ref.cross_cov_penalty_pca_subsets(torch.from_numpy(x), tdims, subsets))
    got = float(sl.cross_cov_penalty_pca_subsets(jnp.asarray(x), tdims, subsets))
    assert got == pytest.approx(want, rel=1e-3, abs=1e-7)


@needs_reference
def test_group_snnl_parity(batch):
    import torch

    ref = _ref()
    x, y_cls, y_age = batch
    tdims = [0, 1]
    want = float(ref.SNNLossClsGroup(T=2.0, target_dims=tdims)(torch.from_numpy(x), torch.from_numpy(y_cls)))
    got = float(sl.snn_loss_cls_group(jnp.asarray(x), jnp.asarray(y_cls), tdims, T=2.0))
    assert got == pytest.approx(want, rel=1e-3)

    want = float(
        ref.SNNRegLossExactGroup(T=2.0, threshold=0.1, target_dims=tdims)(
            torch.from_numpy(x), torch.from_numpy(y_age)
        )
    )
    got = float(sl.snn_reg_loss_exact_group(jnp.asarray(x), jnp.asarray(y_age), tdims, T=2.0, threshold=0.1))
    assert got == pytest.approx(want, rel=1e-3)


@needs_reference
def test_group_matchstd_rank_parity(batch):
    import torch

    ref = _ref()
    x, y_cls, _ = batch
    tdims = [2, 5]
    w_loss, w0, wref = ref.MatchStdGroup(target_dims=tdims)(torch.from_numpy(x))
    g_loss, g0, gref = sl.match_std_group(jnp.asarray(x), tdims)
    assert float(g_loss) == pytest.approx(float(w_loss), rel=1e-3)

    want = float(ref.RankLossGroup(margin=0.3, target_dims=tdims)(torch.from_numpy(x), torch.from_numpy(y_cls)))
    got = float(sl.rank_loss_group(jnp.asarray(x), jnp.asarray(y_cls), tdims, margin=0.3))
    assert got == pytest.approx(want, rel=1e-3)


def test_sensitivity_and_covariance_subset(batch):
    x, _, _ = batch
    decode = lambda z: z @ jnp.ones((8, 4)) * 5.0
    loss, delta = sl.sensitivity_group_loss(jnp.asarray(x), decode, [0, 1])
    assert float(loss) == 0.0 and float(delta) > 0

    out = sl.covariance_subset_loss(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)),
        {"disease": [0], "age": [1], "rest": [2, 3, 4, 5, 6, 7]},
    )
    assert np.isfinite(float(out)) and float(out) >= 0


def test_validation_errors(batch):
    x, y, _ = batch
    with pytest.raises(ValueError):
        sl.corr_leakage_penalty_group(jnp.asarray(x), jnp.asarray(y), [])
    with pytest.raises(ValueError):
        sl.cross_cov_penalty_group(jnp.asarray(x), [0, 0])
    with pytest.raises(ValueError):
        sl.match_std_group(jnp.asarray(x), [99])
