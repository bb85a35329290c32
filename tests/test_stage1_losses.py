import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msd_tpu.losses import (
    clamped_l1_sum,
    code_regularization,
    covariance_loss,
    eikonal_loss,
    gmm_prior_init,
    gmm_prior_loss,
    grad_metric_isotropy_loss,
    isometry_loss,
    select_near_surface_points,
)


def test_clamped_l1(rng):
    pred = jnp.asarray(rng.normal(size=(100, 1)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(100, 1)).astype(np.float32))
    got = float(clamped_l1_sum(pred, gt, 0.1))
    want = np.abs(np.clip(np.asarray(pred), -0.1, 0.1) - np.clip(np.asarray(gt), -0.1, 0.1)).sum() / 100
    assert got == pytest.approx(want, rel=1e-6)


def test_code_regularization_ramp(rng):
    z = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    norms = np.linalg.norm(np.asarray(z), axis=1).sum()
    # epoch 50 -> ramp 0.5; epoch 200 -> ramp 1.0
    assert float(code_regularization(z, 100, 1e-4, 50.0)) == pytest.approx(1e-4 * 0.5 * norms / 100, rel=1e-5)
    assert float(code_regularization(z, 100, 1e-4, 200.0)) == pytest.approx(1e-4 * norms / 100, rel=1e-5)


def test_eikonal_unit_gradient_is_zero():
    grads = jnp.ones((50, 3)) / np.sqrt(3.0)
    assert float(eikonal_loss(grads)) == pytest.approx(0.0, abs=1e-10)
    grads2 = 2 * grads
    assert float(eikonal_loss(grads2)) == pytest.approx(0.002 * 1.0, rel=1e-5)


def test_covariance_loss_oracle(rng):
    z = rng.normal(size=(32, 6)).astype(np.float32)
    zc = z - z.mean(0)
    cov = zc.T @ zc / (32 - 1)
    off = cov - np.diag(np.diag(cov))
    want = (off**2).sum() / (6 * 5)
    got = float(covariance_loss(jnp.asarray(z)))
    assert got == pytest.approx(want, rel=1e-4)
    # decorrelated data scores lower than correlated data
    corr = rng.normal(size=(256, 1)).astype(np.float32) @ np.ones((1, 6), np.float32)
    assert float(covariance_loss(jnp.asarray(corr))) > got


def test_gmm_prior_oracle(rng):
    K, D, B = 3, 4, 16
    gmm = gmm_prior_init(jax.random.PRNGKey(0), K, D, init_sigma=0.5)
    z = rng.normal(size=(B, D)).astype(np.float32)
    nll, aux = gmm_prior_loss(gmm, jnp.asarray(z), min_sigma=0.05, learn_pi=False)

    # numpy oracle
    mu = np.asarray(gmm["mu"])
    sigma = 0.05 + np.log1p(np.exp(np.asarray(gmm["log_sigma"])))
    var = sigma**2
    logps = []
    for i in range(B):
        comp = []
        for k in range(K):
            mahal = ((z[i] - mu[k]) ** 2 / (var[k] + 1e-6)).sum()
            log_det = np.log(var[k] + 1e-6).sum()
            comp.append(-0.5 * (mahal + log_det + D * np.log(2 * np.pi)) - np.log(K))
        logps.append(np.logaddexp.reduce(comp))
    want = -np.mean(logps)
    assert float(nll) == pytest.approx(want, rel=1e-4)
    assert 0.0 <= float(aux["gmm_entropy"]) <= np.log(K) + 1e-5


def _linear_decoder(A):
    """f(inp) = inp @ A -> [N,1]; input grad is A^T everywhere."""
    return lambda inp: inp @ A


def test_grad_metric_isotropy_analytic():
    m = 4
    # gradient wrt z is constant = a (first m rows of A)
    a = np.array([1.0, 2.0, 0.0, 0.0], np.float32)
    A = np.concatenate([a, np.zeros(3, np.float32)]).reshape(-1, 1)
    dec = _linear_decoder(jnp.asarray(A))
    codes = jnp.zeros((10, m))
    pts = jnp.zeros((10, 3))
    loss, aux = grad_metric_isotropy_loss(dec, codes, pts, m, alpha=1.0, normalize=False)
    # H = a a^T ; offdiag = 2*(1*2)^2 = 8 ; diag=[1,4,0,0], var = biased var
    H = np.outer(a, a)
    off = H - np.diag(np.diag(H))
    want = (off**2).sum() + np.var(np.diag(H))
    assert float(loss) == pytest.approx(want, rel=1e-4)


def test_isometry_loss_isotropic_map_small():
    # f(z, x) = w . z with isotropic w -> G2/G1 should be ~ constant ratio
    m = 3
    A = jnp.asarray(np.concatenate([np.ones(m, np.float32), np.zeros(3, np.float32)]).reshape(-1, 1))
    dec = _linear_decoder(A)
    codes = jnp.zeros((20, m))
    pts = jnp.zeros((20, 3))
    loss, aux = isometry_loss(dec, codes, pts, m, jax.random.PRNGKey(0), num_probes=2)
    # jvp = v.w constant across points; G1 = (v.w)^2, Dz_mean = (v.w) * w
    # G2 = (v.w)^2 ||w||^2 -> ratio = ||w||^2 = m
    assert float(loss) == pytest.approx(m, rel=1e-3)
    assert float(aux["iso_g1"]) > 0


def test_select_near_surface_points():
    key = jax.random.PRNGKey(0)
    xyz = jnp.arange(30.0).reshape(10, 3)
    sdf = jnp.asarray(np.array([0.01] * 4 + [0.5] * 6, np.float32)).reshape(-1, 1)
    pts = select_near_surface_points(key, xyz, sdf, clamp_dist=0.1, num_iso_points=4)
    # all 4 selected points must be from the 4 near-surface rows
    assert np.asarray(pts).max() < 12.0
    pts8 = select_near_surface_points(key, xyz, sdf, clamp_dist=0.1, num_iso_points=8)
    # near rows first, then far fill
    assert pts8.shape == (8, 3)
    got_rows = set(np.asarray(pts8)[:, 0].astype(int) // 3)
    assert {0, 1, 2, 3}.issubset(got_rows)


def test_losses_jittable():
    z = jnp.ones((4, 3))
    jax.jit(covariance_loss)(z)
    gmm = gmm_prior_init(jax.random.PRNGKey(0), 2, 3)
    jax.jit(lambda g, z: gmm_prior_loss(g, z)[0])(gmm, z)
