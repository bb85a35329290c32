"""Multi-dimensional ("group") disentanglement loss variants.

Behavioral JAX ports of deep_sdf/loss_subset.py:7-519: the single-target-dim
losses generalized to ``target_dims`` index lists, plus PCA-1 subset scoring
variants. (Like the reference's module, these are part of the public loss
API even though the committed trainers don't wire them in —
ref: SURVEY.md §2.2.)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from msd_tpu.losses.disentangle import (
    _mask_or_ones,
    _masked_mean,
    _masked_median,
    _masked_std,
)


def _validate_target_dims(target_dims, total_dim):
    if target_dims is None or len(target_dims) == 0:
        raise ValueError("target_dims must be a non-empty list of indices.")
    if any(d < 0 or d >= total_dim for d in target_dims):
        raise ValueError(f"target_dims out of range for D={total_dim}: {target_dims}")
    if len(set(target_dims)) != len(target_dims):
        raise ValueError(f"target_dims has duplicates: {target_dims}")


def _dims_mask(total_dim, target_dims):
    m = np.ones(total_dim, bool)
    m[list(target_dims)] = False
    return jnp.asarray(m)  # True on OTHER dims


def pca1_scores(x):
    """Per-sample scores along the first PCA component; the component itself
    is gradient-stopped (ref: loss_subset.py:23-42)."""
    b, d = x.shape
    xc = x - x.mean(axis=0, keepdims=True)
    if d == 1:
        return xc[:, 0]
    cov = (xc.T @ xc) / float(max(b - 1, 1))
    _, eigvecs = jnp.linalg.eigh(jax.lax.stop_gradient(cov))
    v1 = eigvecs[:, -1]
    return xc @ v1


def corr_leakage_penalty_group(x, y, target_dims: Sequence[int], eps: float = 1e-6, valid=None):
    """sum over non-target dims of corr(x_d, y)^2 (ref: :45-85)."""
    b, d = x.shape
    _validate_target_dims(target_dims, d)
    m = _mask_or_ones(b, valid)
    y = y.reshape(-1).astype(x.dtype)
    y_std = (y - _masked_mean(y, m)) / jnp.maximum(_masked_std(y, m), eps)
    x_std = (x - _masked_mean(x, m)[None, :]) / jnp.maximum(_masked_std(x, m)[None, :], eps)
    corr = _masked_mean(x_std * y_std[:, None], m)
    return jnp.sum((corr**2) * _dims_mask(d, target_dims))


def corr_leakage_penalty_pca_subsets(x, y, other_subsets, eps: float = 1e-6):
    """sum over subsets of corr(pca1(x_subset), y)^2 (ref: :88-119)."""
    y = y.reshape(-1).astype(x.dtype)
    y = (y - y.mean()) / jnp.maximum(y.std(ddof=1), eps)
    total = 0.0
    for dims in other_subsets:
        if not dims:
            continue
        s = pca1_scores(x[:, list(dims)])
        s = (s - s.mean()) / jnp.maximum(s.std(ddof=1), eps)
        total = total + jnp.mean(s * y) ** 2
    return total


def cross_cov_penalty_group(x, target_dims: Sequence[int], eps: float = 1e-6, valid=None):
    """sum_{i in T} sum_{j not in T} cov(x_i, x_j)^2 — NB the reference
    divides by B (not B-1) here (ref: :146)."""
    b, d = x.shape
    _validate_target_dims(target_dims, d)
    m = _mask_or_ones(b, valid)
    count = jnp.sum(m)
    x0 = (x - _masked_mean(x, m)[None, :]) * m[:, None]
    xt = x0[:, list(target_dims)]
    other = np.asarray(~np.isin(np.arange(d), list(target_dims))).nonzero()[0]
    xr = x0[:, other]
    cov = (xt.T @ xr) / (count.astype(x.dtype) + eps)
    return jnp.sum(cov**2)


def cross_cov_penalty_pca_subsets(x, target_dims, other_subsets, eps: float = 1e-6):
    """sum over subsets of cov(pca1(x_T), pca1(x_subset))^2 (ref: :150-177)."""
    _validate_target_dims(target_dims, x.shape[1])
    s_t = pca1_scores(x[:, list(target_dims)])
    s_t = s_t - s_t.mean()
    total = 0.0
    for dims in other_subsets:
        if not dims:
            continue
        s_o = pca1_scores(x[:, list(dims)])
        s_o = s_o - s_o.mean()
        total = total + jnp.mean(s_t * s_o) ** 2
    return total


def snn_loss_cls_group(
    x, y, target_dims: Sequence[int], T: float = 2.0, lam1: float = 1.0, lam2: float = 2.0,
    normalize_z: bool = True, use_adaptive_T: bool = True, eps: float = 1e-8,
    clamp_ratio: bool = True, valid=None,
):
    """Grouped classification SNNL (ref: :180-267): mean squared distance
    over the target subset."""
    b, d = x.shape
    _validate_target_dims(target_dims, d)
    m = _mask_or_ones(b, valid)
    y = y.reshape(-1)
    if normalize_z:
        mean = jax.lax.stop_gradient(_masked_mean(x, m))
        std = jax.lax.stop_gradient(jnp.maximum(_masked_std(x, m), 1e-6))
        x = (x - mean[None, :]) / std[None, :]

    pair_valid = m[:, None] & m[None, :]
    offdiag = pair_valid & ~jnp.eye(b, dtype=bool)
    same = (y[:, None] == y[None, :]) & offdiag

    t_mask = jnp.asarray(np.isin(np.arange(d), list(target_dims)).astype(np.float32))
    diff = x[:, None, :] - x[None, :, :]
    d2_t = jnp.sum((diff**2) * t_mask[None, None, :], axis=2) / len(target_dims)

    if use_adaptive_T:
        t_med = _masked_median(d2_t.reshape(-1), same.reshape(-1))
        T_eff = jax.lax.stop_gradient(jnp.maximum(t_med, 1e-6))
        T_eff = jnp.where(jnp.any(same), T_eff, T)
    else:
        T_eff = jnp.asarray(T, x.dtype)

    Kt = jnp.exp(-d2_t / T_eff)
    num = jnp.sum(Kt * same, axis=1)
    den1 = jnp.sum(Kt * offdiag, axis=1)
    n_other = d - len(target_dims)
    if n_other > 0:
        o_mask = 1.0 - t_mask
        sq_mean = jnp.sum((diff**2) * o_mask[None, None, :], axis=2) / n_other
        K_other = jnp.exp(-sq_mean / T_eff)
        den2 = jnp.sum(K_other * same, axis=1)
    else:
        den2 = jnp.zeros((b,), x.dtype)

    denom = lam1 * den1 + lam2 * den2 + eps
    frac = num / denom
    if clamp_ratio:
        frac = jnp.clip(frac, 1e-12, 1.0 - 1e-7)
    has_pos = jnp.any(same, axis=1)
    loss = -jnp.sum(jnp.log(frac) * has_pos) / jnp.maximum(jnp.sum(has_pos), 1)
    return jnp.where(jnp.any(has_pos), loss, 0.0)


def snn_reg_loss_exact_group(
    x, y, target_dims: Sequence[int], T: float = 2.0, lam1: float = 1.0, lam2: float = 0.5,
    threshold: float = 0.05, normalize_z: bool = True, use_adaptive_T: bool = True,
    pos_mode: str = "threshold", topk_frac: float = 0.1, eps: float = 1e-8,
    clamp_ratio: bool = True, valid=None,
):
    """Grouped regression SNNL (ref: :270-371)."""
    b, d = x.shape
    _validate_target_dims(target_dims, d)
    m = _mask_or_ones(b, valid)
    y = y.reshape(-1).astype(x.dtype)
    if normalize_z:
        mean = jax.lax.stop_gradient(_masked_mean(x, m))
        std = jax.lax.stop_gradient(jnp.maximum(_masked_std(x, m), 1e-6))
        x = (x - mean[None, :]) / std[None, :]

    pair_valid = m[:, None] & m[None, :]
    offdiag = pair_valid & ~jnp.eye(b, dtype=bool)
    abs_dy = jnp.abs(y[:, None] - y[None, :])
    if pos_mode == "topk":
        masked_dy = jnp.where(offdiag, abs_dy, jnp.inf)
        K = max(1, int(round(topk_frac * (b - 1))))
        thr = jnp.sort(masked_dy, axis=1)[:, K - 1][:, None]
        same = (masked_dy <= thr) & offdiag
    else:
        same = (abs_dy <= threshold) & offdiag

    t_mask = jnp.asarray(np.isin(np.arange(d), list(target_dims)).astype(np.float32))
    diff = x[:, None, :] - x[None, :, :]
    d2_t = jnp.sum((diff**2) * t_mask[None, None, :], axis=2) / len(target_dims)

    if use_adaptive_T:
        t_med = _masked_median(d2_t.reshape(-1), same.reshape(-1))
        T_eff = jax.lax.stop_gradient(jnp.maximum(t_med, 1e-6))
        T_eff = jnp.where(jnp.any(same), T_eff, T)
    else:
        T_eff = jnp.asarray(T, x.dtype)

    Kt = jnp.exp(-d2_t / T_eff)
    num = jnp.sum(Kt * same, axis=1)
    den1 = jnp.sum(Kt * offdiag, axis=1)
    n_other = d - len(target_dims)
    if n_other > 0:
        o_mask = 1.0 - t_mask
        sq_mean = jnp.sum((diff**2) * o_mask[None, None, :], axis=2) / n_other
        K_other = jnp.exp(-sq_mean / T_eff)
        den2 = jnp.sum(K_other * same, axis=1)
    else:
        den2 = jnp.zeros((b,), x.dtype)

    denom = lam1 * den1 + lam2 * den2 + eps
    frac = num / denom
    if clamp_ratio:
        frac = jnp.clip(frac, 1e-12, 1.0 - 1e-7)
    has_pos = jnp.any(same, axis=1)
    loss = -jnp.sum(jnp.log(frac) * has_pos) / jnp.maximum(jnp.sum(has_pos), 1)
    return jnp.where(jnp.any(has_pos), loss, 0.0)


def match_std_group(z, target_dims: Sequence[int], eps: float = 1e-6, valid=None):
    """Match mean std of the target subset to other dims (ref: :374-404)."""
    b, d = z.shape
    _validate_target_dims(target_dims, d)
    m = _mask_or_ones(b, valid)
    stds = _masked_std(z, m, ddof=0)
    t_sel = np.asarray(list(target_dims))
    std_target = jnp.maximum(jnp.mean(stds[t_sel]), eps)
    other = np.asarray(~np.isin(np.arange(d), t_sel)).nonzero()[0]
    if other.size == 0:
        return jnp.zeros(()), jax.lax.stop_gradient(std_target), jax.lax.stop_gradient(std_target)
    std_ref = jnp.maximum(jnp.mean(stds[other]), eps)
    return (
        (std_target - std_ref) ** 2,
        jax.lax.stop_gradient(std_target),
        jax.lax.stop_gradient(std_ref),
    )


def sensitivity_group_loss(z, decode_fn, target_dims: Sequence[int], eps: float = 0.02, eta: float = 0.0025):
    """Hinge-floor sensitivity over a subset of dims (ref: :407-440)."""
    _validate_target_dims(target_dims, z.shape[1])
    sel = np.asarray(list(target_dims))
    z_plus = z.at[:, sel].add(eps)
    z_minus = z.at[:, sel].add(-eps)
    c_plus = decode_fn(z_plus)
    c_minus = decode_fn(z_minus)
    delta = jnp.mean(jnp.linalg.norm(c_plus - c_minus, axis=1))
    loss = (jax.nn.relu(eta - delta) / eta) ** 2
    return loss, delta


def rank_loss_group(z, y, target_dims: Sequence[int], margin: float = 0.5, cn_label: int = 1, valid=None):
    """Pairwise hinge on the mean of target dims (ref: :443-472)."""
    b, d = z.shape
    _validate_target_dims(target_dims, d)
    m = _mask_or_ones(b, valid)
    zt = jnp.mean(z[:, np.asarray(list(target_dims))], axis=1)
    y = y.reshape(-1)
    is_cn = (y == cn_label) & m
    is_ad = (y != cn_label) & m
    diffs = zt[:, None] - zt[None, :]
    pair = is_cn[:, None] & is_ad[None, :]
    n_pairs = jnp.sum(pair)
    loss = jnp.sum(jax.nn.relu(margin - diffs) * pair) / jnp.maximum(n_pairs, 1)
    return jnp.where(n_pairs > 0, loss, 0.0)


def covariance_subset_loss(key, mu, logvar, subsets: dict, lambda_off: float = 1.0, beta: float = 0.01):
    """Cross-subset covariance on sampled z (ref: :475-519)."""
    b, d = mu.shape
    std = jnp.exp(0.5 * logvar)
    z = mu + std * jax.random.normal(key, std.shape)
    total = 0.0
    items = [(k, list(v)) for k, v in subsets.items() if v]
    for i in range(len(items)):
        _, dims_i = items[i]
        if any(x < 0 or x >= d for x in dims_i):
            raise ValueError(f"subset dims out of range for D={d}: {dims_i}")
        zi = z[:, np.asarray(dims_i)]
        zi = zi - zi.mean(axis=0, keepdims=True)
        for j in range(i + 1, len(items)):
            _, dims_j = items[j]
            if any(x < 0 or x >= d for x in dims_j):
                raise ValueError(f"subset dims out of range for D={d}: {dims_j}")
            zj = z[:, np.asarray(dims_j)]
            zj = zj - zj.mean(axis=0, keepdims=True)
            cov = (zi.T @ zj) / max(b - 1, 1)
            total = total + lambda_off * jnp.sum(cov**2)
    return beta * total
