"""VAE objectives: beta-VAE / DIP-VAE-I/II / beta-TCVAE.

Behavioral ports of networks/residual_mlp_vae.py:278-423 and
deep_sdf/loss.py:1081-1124 (DIPVAEIILoss).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kl_divergence(mu, logvar):
    """-0.5 * mean(1 + logvar - mu^2 - e^logvar)
    (ref: residual_mlp_vae.py:278-279)."""
    return -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))


def log_density_gaussian(z, mu, logvar):
    log2pi = math.log(2.0 * math.pi)
    return -0.5 * (log2pi + logvar + (z - mu) ** 2 / jnp.exp(logvar))


def _recon(z_hat, z_target, recon_loss):
    if recon_loss == "l1":
        return jnp.mean(jnp.abs(z_hat - z_target))
    if recon_loss == "mse":
        return jnp.mean((z_hat - z_target) ** 2)
    raise ValueError(f"Unsupported recon_loss: {recon_loss}")


def vae_loss(z_hat, z_target, mu, logvar, recon_weight=1.0, kl_weight=1.0, recon_loss="mse"):
    """(total, recon, kl) (ref: residual_mlp_vae.py:287-304)."""
    recon = _recon(z_hat, z_target, recon_loss)
    kl = kl_divergence(mu, logvar)
    return recon_weight * recon + kl_weight * kl, recon, kl


def _covariance_matrix(x):
    n = x.shape[0]
    xc = x - x.mean(axis=0, keepdims=True)
    return (xc.T @ xc) / jnp.maximum(float(n - 1), 1.0)


def dip_vae_loss(
    z_hat, z_target, mu, logvar,
    recon_weight=1.0, kl_weight=1.0, dip_lambda_od=1.0, dip_lambda_d=1.0,
    dip_type="ii", recon_loss="mse",
):
    """(total, recon, kl, dip, off, diag) (ref: residual_mlp_vae.py:317-353)."""
    recon = _recon(z_hat, z_target, recon_loss)
    kl = kl_divergence(mu, logvar)
    cov_mu = _covariance_matrix(mu)
    if str(dip_type).lower() in ("ii", "2", "dip_vae_ii", "dip_vae2", "dip_ii", "dip2"):
        var = jnp.exp(logvar)
        cov_z = cov_mu + jnp.diag(var.mean(axis=0))
    else:
        cov_z = cov_mu
    diag = jnp.diag(cov_z)
    off_diag = cov_z - jnp.diag(diag)
    off_loss = jnp.sum(off_diag**2)
    diag_loss = jnp.sum((diag - 1.0) ** 2)
    dip = dip_lambda_od * off_loss + dip_lambda_d * diag_loss
    total = recon_weight * recon + kl_weight * kl + dip
    return total, recon, kl, dip, off_loss, diag_loss


def beta_tcvae_loss(
    z_hat, z_target, z, mu, logvar,
    recon_weight=1.0, kl_weight=1.0, tc_alpha=1.0, tc_beta=6.0, tc_gamma=1.0,
    recon_loss="mse", dataset_size=None,
):
    """beta-TCVAE MI/TC/DWKL decomposition with minibatch logsumexp
    (ref: residual_mlp_vae.py:356-402). Returns
    (total, recon, total_kl, mi, tc, dwkl)."""
    recon = _recon(z_hat, z_target, recon_loss)
    batch_size = z.shape[0]
    if dataset_size is None:
        dataset_size = batch_size
    dataset_size = max(int(dataset_size), 1)

    log_qz_condx = jnp.sum(log_density_gaussian(z, mu, logvar), axis=1)
    log_qz_x = log_density_gaussian(z[:, None, :], mu[None, :, :], logvar[None, :, :])
    log_qz = jax.nn.logsumexp(jnp.sum(log_qz_x, axis=2), axis=1) - math.log(dataset_size)
    log_qz_prod = jax.nn.logsumexp(log_qz_x, axis=1) - math.log(dataset_size)
    log_prod_qz = jnp.sum(log_qz_prod, axis=1)
    log_pz = jnp.sum(log_density_gaussian(z, jnp.zeros_like(z), jnp.zeros_like(z)), axis=1)

    mi = jnp.mean(log_qz_condx - log_qz)
    tc = jnp.mean(log_qz - log_prod_qz)
    dwkl = jnp.mean(log_prod_qz - log_pz)
    total_kl = mi + tc + dwkl
    weighted_kl = tc_alpha * mi + tc_beta * tc + tc_gamma * dwkl
    total = recon_weight * recon + kl_weight * weighted_kl
    return total, recon, total_kl, mi, tc, dwkl


def dip_vae_ii_loss(key, mu, logvar, lambda_off=1.0, lambda_diag=1.0, beta=0.01):
    """Stage-2 auxiliary DIP-VAE-II penalty on sampled z
    (ref: deep_sdf/loss.py:1081-1124)."""
    b, d = mu.shape
    std = jnp.exp(0.5 * logvar)
    z = mu + std * jax.random.normal(key, std.shape)
    z_mean = jnp.mean(z, axis=0)
    zc = z - z_mean[None, :]
    c_z = (zc.T @ zc) / max(b - 1, 1)
    mask = jnp.eye(d)
    loss_off = lambda_off * jnp.sum((c_z * (1 - mask)) ** 2)
    loss_diag = lambda_diag * jnp.sum((jnp.diag(c_z) - 1) ** 2)
    return beta * (loss_off + loss_diag)


def linear_warmup(step, warmup_steps):
    """ref: residual_mlp_vae.py:420-423."""
    if warmup_steps <= 0:
        return 1.0
    return min(1.0, float(step) / float(warmup_steps))
