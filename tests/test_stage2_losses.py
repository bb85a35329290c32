"""Stage-2 VAE + disentanglement loss parity vs the reference torch code
(imported as an oracle where it is CPU-safe)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msd_tpu.losses import disentangle as dl
from msd_tpu.losses import vae as vl

REF = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _load_file_module(name, path):
    # load standalone to bypass deep_sdf/__init__'s trimesh dependency
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_loss_module():
    return _load_file_module("ref_loss", os.path.join(REF, "deep_sdf", "loss.py"))


def _ref_vae_module():
    return _load_file_module(
        "ref_rmvae", os.path.join(REF, "networks", "residual_mlp_vae.py")
    )


@pytest.fixture(scope="module")
def batch(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    x = rng.normal(size=(24, 6)).astype(np.float32)
    y_cls = rng.integers(0, 2, size=24).astype(np.float32)
    y_age = rng.uniform(0, 1, size=24).astype(np.float32)
    return x, y_cls, y_age


@needs_reference
def test_corr_leakage_and_cross_cov_parity(batch):
    import torch

    ref = _ref_loss_module()
    x, y_cls, _ = batch
    want = float(ref.corr_leakage_penalty(torch.from_numpy(x), torch.from_numpy(y_cls), 2))
    got = float(dl.corr_leakage_penalty(jnp.asarray(x), jnp.asarray(y_cls), 2))
    assert got == pytest.approx(want, rel=2e-4)

    want = float(ref.cross_cov_penalty(torch.from_numpy(x), 1))
    got = float(dl.cross_cov_penalty(jnp.asarray(x), 1))
    assert got == pytest.approx(want, rel=2e-4)


@needs_reference
def test_rank_and_matchstd_parity(batch):
    import torch

    ref = _ref_loss_module()
    x, y_cls, _ = batch
    want = float(ref.RankLossZ0(margin=0.5, target_dim=0)(torch.from_numpy(x), torch.from_numpy(y_cls)))
    got = float(dl.rank_loss_z0(jnp.asarray(x), jnp.asarray(y_cls), margin=0.5, target_dim=0))
    assert got == pytest.approx(want, rel=2e-4)

    w_loss, w0, wref = ref.MatchStdZ0(target_dim=1)(torch.from_numpy(x))
    g_loss, g0, gref = dl.match_std_z0(jnp.asarray(x), target_dim=1)
    assert float(g_loss) == pytest.approx(float(w_loss), rel=2e-4)
    assert float(g0) == pytest.approx(float(w0), rel=2e-4)


@needs_reference
def test_snnl_cls_parity(batch):
    import torch

    ref = _ref_loss_module()
    x, y_cls, _ = batch
    for adaptive in (False, True):
        fn = ref.SNNLossCls(T=2.0, target_dim=0, use_adaptive_T=adaptive)
        want = float(fn(torch.from_numpy(x), torch.from_numpy(y_cls)))
        got = float(
            dl.snn_loss_cls(jnp.asarray(x), jnp.asarray(y_cls), T=2.0, target_dim=0, use_adaptive_T=adaptive)
        )
        assert got == pytest.approx(want, rel=1e-3), adaptive


@needs_reference
def test_snn_reg_exact_parity(batch):
    import torch

    ref = _ref_loss_module()
    x, _, y_age = batch
    for mode in ("threshold", "topk"):
        fn = ref.SNNRegLossExact(T=2.0, threshold=0.1, target_dim=1, pos_mode=mode, use_adaptive_T=True)
        want = float(fn(torch.from_numpy(x), torch.from_numpy(y_age)))
        got = float(
            dl.snn_reg_loss_exact(
                jnp.asarray(x), jnp.asarray(y_age), T=2.0, threshold=0.1, target_dim=1,
                pos_mode=mode, use_adaptive_T=True,
            )
        )
        assert got == pytest.approx(want, rel=1e-3), mode


@needs_reference
def test_correlation_losses_parity(batch):
    import torch

    ref = _ref_loss_module()
    x, y_cls, y_age = batch
    want = float(ref.ClsCorrelationLoss()(torch.from_numpy(x), torch.from_numpy(y_cls)))
    got = float(dl.cls_correlation_loss(jnp.asarray(x), jnp.asarray(y_cls)))
    assert got == pytest.approx(want, rel=1e-3)

    want = float(ref.RegCorrelationLoss()(torch.from_numpy(x), torch.from_numpy(y_age)))
    got = float(dl.reg_correlation_loss(jnp.asarray(x), jnp.asarray(y_age)))
    # the reference writes corr of dim i into slot i-1, so for D dims its
    # "other" average misses the last dim and includes a duplicate; we
    # compute the intended mean over all non-target dims -> compare loosely
    assert got == pytest.approx(want, rel=1e-3)


@needs_reference
def test_vae_objectives_parity(batch):
    import torch

    rvae = _ref_vae_module()
    rng = np.random.default_rng(1)
    z_hat = rng.normal(size=(16, 8)).astype(np.float32)
    z_t = rng.normal(size=(16, 8)).astype(np.float32)
    mu = rng.normal(size=(16, 8)).astype(np.float32)
    logvar = rng.normal(size=(16, 8)).astype(np.float32) * 0.1
    z = rng.normal(size=(16, 8)).astype(np.float32)
    t = {k: torch.from_numpy(v) for k, v in dict(z_hat=z_hat, z_t=z_t, mu=mu, logvar=logvar, z=z).items()}

    want = rvae.vae_loss(t["z_hat"], t["z_t"], t["mu"], t["logvar"], 1.0, 0.5)
    got = vl.vae_loss(jnp.asarray(z_hat), jnp.asarray(z_t), jnp.asarray(mu), jnp.asarray(logvar), 1.0, 0.5)
    for w, g in zip(want, got):
        assert float(g) == pytest.approx(float(w), rel=1e-4)

    for dip_type in ("i", "ii"):
        want = rvae.dip_vae_loss(t["z_hat"], t["z_t"], t["mu"], t["logvar"], dip_type=dip_type)
        got = vl.dip_vae_loss(jnp.asarray(z_hat), jnp.asarray(z_t), jnp.asarray(mu), jnp.asarray(logvar), dip_type=dip_type)
        for w, g in zip(want, got):
            assert float(g) == pytest.approx(float(w), rel=1e-3)

    want = rvae.beta_tcvae_loss(t["z_hat"], t["z_t"], t["z"], t["mu"], t["logvar"], dataset_size=100)
    got = vl.beta_tcvae_loss(jnp.asarray(z_hat), jnp.asarray(z_t), jnp.asarray(z), jnp.asarray(mu), jnp.asarray(logvar), dataset_size=100)
    for w, g in zip(want, got):
        assert float(g) == pytest.approx(float(w), rel=1e-3, abs=1e-5)


def test_masked_variants_match_filtered(batch):
    """A masked call on the padded batch == a plain call on the filtered batch."""
    x, y_cls, y_age = batch
    valid = np.ones(24, bool)
    valid[[3, 7, 20]] = False
    xf, yf, af = x[valid], y_cls[valid], y_age[valid]

    pairs = [
        (dl.corr_leakage_penalty(jnp.asarray(x), jnp.asarray(y_cls), 0, valid=jnp.asarray(valid)),
         dl.corr_leakage_penalty(jnp.asarray(xf), jnp.asarray(yf), 0)),
        (dl.rank_loss_z0(jnp.asarray(x), jnp.asarray(y_cls), valid=jnp.asarray(valid)),
         dl.rank_loss_z0(jnp.asarray(xf), jnp.asarray(yf))),
        (dl.snn_loss_cls(jnp.asarray(x), jnp.asarray(y_cls), valid=jnp.asarray(valid)),
         dl.snn_loss_cls(jnp.asarray(xf), jnp.asarray(yf))),
        (dl.snn_reg_loss_exact(jnp.asarray(x), jnp.asarray(y_age), threshold=0.1, valid=jnp.asarray(valid)),
         dl.snn_reg_loss_exact(jnp.asarray(xf), jnp.asarray(af), threshold=0.1)),
        (dl.attribute_loss(jnp.asarray(x[:, 0]), jnp.asarray(y_age), valid=jnp.asarray(valid)),
         dl.attribute_loss(jnp.asarray(xf[:, 0]), jnp.asarray(af))),
        (dl.match_std_z0(jnp.asarray(x), valid=jnp.asarray(valid))[0],
         dl.match_std_z0(jnp.asarray(xf))[0]),
    ]
    for got, want in pairs:
        assert float(got) == pytest.approx(float(want), rel=1e-4, abs=1e-6)


def test_sensitivity_and_dipii():
    z = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32))
    decode = lambda zz: zz @ jnp.ones((4, 16)) * 0.001  # tiny sensitivity
    loss, delta = dl.sensitivity_loss(z, decode, eps=0.02, eta=0.0025, target_dim=0)
    assert float(loss) > 0  # insensitive decoder gets penalized... delta tiny
    decode2 = lambda zz: zz @ jnp.ones((4, 16)) * 10.0
    loss2, delta2 = dl.sensitivity_loss(z, decode2, eps=0.02, eta=0.0025, target_dim=0)
    assert float(loss2) == 0.0 and float(delta2) > float(delta)

    mu = jnp.zeros((16, 4))
    logvar = jnp.zeros((16, 4))
    out = vl.dip_vae_ii_loss(jax.random.PRNGKey(0), mu, logvar)
    assert np.isfinite(float(out))


def test_wasserstein_runs(batch):
    x, _, _ = batch
    loss = dl.wasserstein_loss(jax.random.PRNGKey(0), jnp.asarray(x), delta=1.0)
    assert float(loss) >= 0


def test_snnl_cross_entropy_runs(batch):
    x, y_cls, _ = batch
    for cos in (True, False):
        v = dl.snnl_cross_entropy(jnp.asarray(x), jnp.asarray(y_cls), temp=10.0, cos_distance=cos)
        assert np.isfinite(float(v))
