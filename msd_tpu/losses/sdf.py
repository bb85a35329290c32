"""SDF regression losses (Stage 1 core).

ref: train_deep_sdf.py:443,566-616 (clamped-L1 with sum reduction divided by
total sample count, code-norm regularizer with 100-epoch ramp) and
networks/residual_mlp_vae.py:405-417 (Stage-2 reuse).
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_l2norm(x, axis=-1, tiny=1e-24):
    """L2 norm with a zero (not NaN) subgradient at the origin — matches
    torch.linalg.vector_norm's backward convention. Needed because clamped
    predictions give exactly-zero xyz-gradients outside the truncation band."""
    s = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(s, tiny))


def clamped_l1_sum(pred_sdf, sdf_gt, clamp_dist, num_sdf_samples=None):
    """sum |clamp(pred) - clamp(gt)| / num_samples
    (ref: train_deep_sdf.py:566-567,604-606)."""
    if num_sdf_samples is None:
        num_sdf_samples = pred_sdf.shape[0]
    pred = jnp.clip(pred_sdf, -clamp_dist, clamp_dist)
    gt = jnp.clip(sdf_gt, -clamp_dist, clamp_dist)
    return jnp.sum(jnp.abs(pred - gt)) / num_sdf_samples


def code_regularization(batch_vecs, num_sdf_samples, code_reg_lambda, epoch):
    """lambda * min(1, epoch/100) * sum(||z_i||_2) / num_samples
    (ref: train_deep_sdf.py:609-616). ``batch_vecs`` is the per-point
    expanded latent batch, exactly as the reference regularizes it."""
    l2_size_loss = jnp.sum(_safe_l2norm(batch_vecs, axis=1))
    ramp = jnp.minimum(1.0, epoch / 100.0)
    return code_reg_lambda * ramp * l2_size_loss / num_sdf_samples


def eikonal_loss(grad_xyz, weight=0.002, weights=None):
    """weight * mean((1 - ||grad f||)^2) (ref: train_deep_sdf.py:724-728).

    ``grad_xyz`` is d(clamped pred)/d(xyz) [N, 3] — computing it on the
    clamped prediction (as the reference does) zeroes the penalty outside
    the truncation band.

    ``weights``: optional [N, 1] 0/1 mask (padded-batch sharding); the mean
    runs over the masked points only.
    """
    norms = _safe_l2norm(grad_xyz, axis=1)
    sq = (1.0 - norms) ** 2
    if weights is None:
        return weight * jnp.mean(sq)
    w = weights.reshape(-1)
    return weight * jnp.sum(sq * w) / jnp.sum(w)


def deep_sdf_loss(pred_sdf, sdf_gt, latent_vecs, code_reg_lambda=1e-4, code_reg_weight=1.0):
    """Stage-2 SDF-consistency loss: L1(sum)/N + lambda*w*sum||z||/N
    (ref: networks/residual_mlp_vae.py:405-417). No clamping here: the
    reference applies clamping before calling it."""
    num = pred_sdf.shape[0]
    sdf_loss = jnp.sum(jnp.abs(pred_sdf - sdf_gt)) / num
    reg = code_reg_lambda * code_reg_weight * jnp.sum(_safe_l2norm(latent_vecs, axis=1)) / num
    return sdf_loss + reg, sdf_loss, reg
