"""Stage-1 latent-space regularizers.

JAX ports (by behavior, not translation) of the reference's
CovarianceLoss / GMMPriorLoss / IsometryLoss / GradientMetricIsotropyLoss
(ref: deep_sdf/loss.py:89-539). The isometry losses are *cleaner* here:
per-point input gradients come from one `jax.grad` of the summed scalar
output instead of the reference's autograd.grad dance, and the per-scene
Python loop (ref: train_deep_sdf.py:640-709) becomes a vmap in the trainer.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def covariance_loss(z, eps: float = 1e-12):
    """Mean squared off-diagonal covariance, normalized by D(D-1)
    (ref: deep_sdf/loss.py:89-107)."""
    b, d = z.shape
    if b <= 1 or d <= 1:
        return jnp.float32(0.0)
    zc = z - z.mean(axis=0, keepdims=True)
    cov = (zc.T @ zc) / (float(b - 1) + eps)
    offdiag = cov - jnp.diag(jnp.diag(cov))
    return jnp.sum(offdiag**2) / (d * (d - 1))


# ---------------------------------------------------------------------------
# GMM prior (ref: deep_sdf/loss.py:110-209)


def gmm_prior_init(key, K: int, latent_dim: int, init_sigma: float = 0.5):
    """Learnable diagonal-GMM parameters as a pytree."""
    return {
        "mu": 0.01 * jax.random.normal(key, (K, latent_dim)),
        "log_sigma": jnp.full((K, latent_dim), math.log(float(init_sigma))),
        "logits": jnp.zeros((K,)),
    }


def gmm_prior_loss(gmm_params, z, min_sigma: float = 0.05, learn_pi: bool = False, eps: float = 1e-6):
    """NLL of z under the diagonal GMM; returns (nll, aux) where aux carries
    the responsibility entropy for logging (ref: deep_sdf/loss.py:186-209).

    When ``learn_pi`` is False the caller must stop gradients to
    ``gmm_params['logits']`` (or simply not include it in the trained
    subtree) — mixture weights stay uniform.
    """
    K, D = gmm_params["mu"].shape
    sigma = min_sigma + jax.nn.softplus(gmm_params["log_sigma"])  # [K, D]
    var = sigma * sigma

    z_ = z[:, None, :]  # [B, 1, D]
    mu_ = gmm_params["mu"][None]  # [1, K, D]
    var_ = var[None]
    mahal = jnp.sum((z_ - mu_) ** 2 / (var_ + eps), axis=2)  # [B, K]
    log_det = jnp.sum(jnp.log(var_ + eps), axis=2)  # [1, K]
    const = D * math.log(2.0 * math.pi)
    logN = -0.5 * (mahal + log_det + const)  # [B, K]

    if learn_pi:
        log_pi = jax.nn.log_softmax(gmm_params["logits"])
    else:
        log_pi = jnp.full((K,), -math.log(K))

    log_num = logN + log_pi[None]
    logp = jax.nn.logsumexp(log_num, axis=1)  # [B]
    nll = -jnp.mean(logp)

    # responsibilities (no-grad diagnostics)
    r = jax.lax.stop_gradient(jnp.exp(log_num - logp[:, None]))
    entropy = -jnp.mean(jnp.sum(r * jnp.log(r + eps), axis=1))
    return nll, {"gmm_nll": jax.lax.stop_gradient(nll), "gmm_entropy": entropy}


# ---------------------------------------------------------------------------
# Isometry losses (ref: deep_sdf/loss.py:317-494)


def _input_grads(decoder_fn, latent_codes, points):
    """Per-point gradient of the scalar SDF w.r.t. the [z||xyz] input.

    decoder_fn: params-closed function [N, m+3] -> [N, 1].
    Returns (G [N, m+3]) — rows are independent, so grad of the summed
    output gives exactly the per-row input gradients.
    """
    inp = jnp.concatenate([latent_codes, points], axis=-1)
    G = jax.grad(lambda t: jnp.sum(decoder_fn(t)))(inp)
    return G


def isometry_loss(decoder_fn, latent_codes, iso_points, latent_size, probe_key, num_probes: int = 1, eps: float = 1e-8):
    """Hutchinson-probe isometric regularization, G2/G1
    (ref: deep_sdf/loss.py:339-417 'Isometric Regularization for Manifolds
    of Functional Data'). Returns (loss, aux{iso_g1, iso_g2})."""
    n = iso_points.shape[0]
    m = latent_size
    G = _input_grads(decoder_fn, latent_codes, iso_points)  # [N, m+3]

    def one_probe(key):
        v = jax.random.normal(key, (1, m))
        v = jnp.broadcast_to(v, (n, m))
        tangent = jnp.concatenate([v, jnp.zeros((n, 3))], axis=-1)
        jvp_result = jnp.sum(G * tangent, axis=-1)  # [N]
        g1 = jnp.mean(jvp_result**2)
        d_full = jvp_result[:, None] * G
        dz_mean = jnp.mean(d_full[:, :m], axis=0)
        g2 = jnp.sum(dz_mean**2)
        return g1, g2

    keys = jax.random.split(probe_key, num_probes)
    g1s, g2s = jax.vmap(one_probe)(keys)
    g1, g2 = jnp.mean(g1s), jnp.mean(g2s)
    loss = g2 / (g1 + eps)
    return loss, {
        "iso_g1": jax.lax.stop_gradient(g1),
        "iso_g2": jax.lax.stop_gradient(g2),
    }


def grad_metric_isotropy_loss(decoder_fn, latent_codes, iso_points, latent_size, alpha: float = 1.0, normalize: bool = True, eps: float = 1e-12):
    """||offdiag(H)||^2 (+ normalized) + alpha * Var(diag H) with
    H = (Gz^T Gz)/N, Gz = grad_z f(z, x) (ref: deep_sdf/loss.py:420-494).
    Returns (loss, aux)."""
    n = iso_points.shape[0]
    m = latent_size
    G = _input_grads(decoder_fn, latent_codes, iso_points)[:, :m]  # [N, m]
    H = (G.T @ G) / (float(n) + eps)
    diag = jnp.diag(H)
    offdiag = H - jnp.diag(diag)
    off_loss = jnp.sum(offdiag**2)
    diag_var = jnp.var(diag)
    if normalize:
        off_loss = off_loss / (m * (m - 1) + eps)
    loss = off_loss + alpha * diag_var
    return loss, {
        "gmi_offdiag": jax.lax.stop_gradient(off_loss),
        "gmi_diag_var": jax.lax.stop_gradient(diag_var),
        "gmi_diag_mean": jax.lax.stop_gradient(jnp.mean(diag)),
    }


def select_near_surface_points(key, xyz, sdf_gt, clamp_dist, num_iso_points: int):
    """Jit-friendly equivalent of the reference's near-surface point
    selection (ref: deep_sdf/loss.py:497-539): prefer points with
    |SDF| < clamp_dist, random among them, topping up with random far
    points. Implemented as a top-k over (near_flag * 2 + uniform noise) so
    shapes stay static."""
    sdf_abs = jnp.abs(sdf_gt.reshape(-1))
    near = (sdf_abs < clamp_dist).astype(jnp.float32)
    score = near * 2.0 + jax.random.uniform(key, sdf_abs.shape)
    _, idx = jax.lax.top_k(score, num_iso_points)
    return xyz[idx]
