"""Stage-2 disentanglement loss arsenal.

Behavioral JAX ports of deep_sdf/loss.py:11-87 (leakage/cross-cov),
:212-314 (sensitivity/rank/match-std), :543-829 (SNNL family), :833-974
(attribute, Wasserstein, cls/reg correlation), :976-1076 (SNNL cross
entropy).

Jit-friendliness: the reference filters invalid-label rows before calling
each loss (dynamic shapes); here every supervised loss takes an optional
boolean ``valid`` mask instead, computing masked statistics with static
shapes. With ``valid=None`` the behavior matches the reference's filtered
call exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

STABILITY_EPS = 1e-5  # reference's 0.00001


def _mask_or_ones(x_rows, valid):
    if valid is None:
        return jnp.ones((x_rows,), bool)
    return valid.reshape(-1).astype(bool)


def _masked_mean(x, m, axis=0, eps=0.0):
    m = m.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    count = jnp.sum(m, axis=axis)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(count, 1.0)


def _masked_std(x, m, axis=0, ddof=1):
    m_ = m.astype(x.dtype)
    while m_.ndim < x.ndim:
        m_ = m_[..., None]
    count = jnp.sum(m_, axis=axis)
    mean = jnp.sum(x * m_, axis=axis) / jnp.maximum(count, 1.0)
    var = jnp.sum(((x - jnp.expand_dims(mean, axis)) ** 2) * m_, axis=axis) / jnp.maximum(
        count - ddof, 1.0
    )
    return jnp.sqrt(var)


def _masked_median(x, m):
    """Median of x over mask m (static shapes). torch semantics: for even
    counts, the LOWER of the two middle values (torch.Tensor.median)."""
    big = jnp.max(jnp.abs(x)) + 1.0
    sorted_x = jnp.sort(jnp.where(m, x, big))
    count = jnp.sum(m)
    k = jnp.maximum(count - 1, 0) // 2
    return sorted_x[k]


# ---------------------------------------------------------------------------
# correlation penalties (ref: deep_sdf/loss.py:11-87)


def corr_leakage_penalty(x, y, target_dim: int, eps: float = 1e-6, valid=None):
    """sum_{d != target} corr(x_d, y)^2 (ref: loss.py:11-52)."""
    b, d = x.shape
    m = _mask_or_ones(b, valid)
    y = y.reshape(-1).astype(x.dtype)
    y_std = (y - _masked_mean(y, m)) / jnp.maximum(_masked_std(y, m), eps)
    x_std = (x - _masked_mean(x, m)[None, :]) / jnp.maximum(_masked_std(x, m)[None, :], eps)
    corr = _masked_mean(x_std * y_std[:, None], m)  # [D]
    mask_d = jnp.ones((d,)).at[target_dim].set(0.0)
    return jnp.sum((corr**2) * mask_d)


def cross_cov_penalty(x, target_dim: int, eps: float = 1e-6, valid=None):
    """sum_j cov(x_target, x_j)^2 over j != target (ref: loss.py:55-87)."""
    b, d = x.shape
    m = _mask_or_ones(b, valid)
    x0 = x - _masked_mean(x, m)[None, :]
    xt = x0[:, target_dim]
    cov = _masked_mean(x0 * xt[:, None], m)  # [D]
    mask_d = jnp.ones((d,)).at[target_dim].set(0.0)
    return jnp.sum((cov**2) * mask_d)


# ---------------------------------------------------------------------------
# sensitivity / rank / match-std (ref: deep_sdf/loss.py:212-314)


def sensitivity_loss(z, decode_fn, eps: float = 0.02, eta: float = 0.0025, target_dim: int = 0):
    """Hinge-floor sensitivity of the decoder to a target dim
    (ref: loss.py:212-246). decode_fn: [B, D] -> [B, out].
    Returns (loss, delta)."""
    z_plus = z.at[:, target_dim].add(eps)
    z_minus = z.at[:, target_dim].add(-eps)
    c_plus = decode_fn(z_plus)
    c_minus = decode_fn(z_minus)
    delta = jnp.mean(jnp.linalg.norm(c_plus - c_minus, axis=1))
    loss = (jax.nn.relu(eta - delta) / eta) ** 2
    return loss, delta


def rank_loss_z0(z, y, margin: float = 0.5, target_dim: int = 0, cn_label: int = 1, valid=None):
    """Pairwise hinge: z[target] larger for CN than AD (ref: loss.py:249-281)."""
    b = z.shape[0]
    m = _mask_or_ones(b, valid)
    z0 = z[:, target_dim]
    y = y.reshape(-1)
    is_cn = (y == cn_label) & m
    is_ad = (y != cn_label) & m
    diffs = z0[:, None] - z0[None, :]  # [B, B] cn - ad
    pair = is_cn[:, None] & is_ad[None, :]
    n_pairs = jnp.sum(pair)
    loss = jnp.sum(jax.nn.relu(margin - diffs) * pair) / jnp.maximum(n_pairs, 1)
    return jnp.where(n_pairs > 0, loss, 0.0)


def match_std_z0(z, target_dim: int = 0, eps: float = 1e-6, valid=None):
    """Match target-dim std to the mean std of other dims
    (ref: loss.py:284-314). Returns (loss, std0, std_ref)."""
    b, d = z.shape
    m = _mask_or_ones(b, valid)
    stds = _masked_std(z, m, ddof=0)  # biased, like torch std(unbiased=False)
    std0 = jnp.maximum(stds[target_dim], eps)
    mask_d = jnp.ones((d,)).at[target_dim].set(0.0)
    std_ref = jnp.maximum(jnp.sum(stds * mask_d) / jnp.maximum(d - 1, 1), eps)
    return (std0 - std_ref) ** 2, jax.lax.stop_gradient(std0), jax.lax.stop_gradient(std_ref)


# ---------------------------------------------------------------------------
# SNNL family (ref: deep_sdf/loss.py:543-829)


def snn_loss_cls(
    x, y, T: float = 2.0, lam1: float = 1.0, lam2: float = 2.0, target_dim: int = 0,
    normalize_z: bool = True, use_adaptive_T: bool = True, eps: float = 1e-8,
    clamp_ratio: bool = True, valid=None,
):
    """Classification SNNL on a target latent dim (ref: loss.py:586-671)."""
    b, d = x.shape
    m = _mask_or_ones(b, valid)
    y = y.reshape(-1)
    if normalize_z:
        mean = jax.lax.stop_gradient(_masked_mean(x, m))
        std = jax.lax.stop_gradient(jnp.maximum(_masked_std(x, m), 1e-6))
        x = (x - mean[None, :]) / std[None, :]

    pair_valid = m[:, None] & m[None, :]
    offdiag = pair_valid & ~jnp.eye(b, dtype=bool)
    same = (y[:, None] == y[None, :]) & offdiag

    zt = x[:, target_dim]
    d2_t = (zt[:, None] - zt[None, :]) ** 2

    if use_adaptive_T:
        t_med = _masked_median(d2_t.reshape(-1), same.reshape(-1))
        T_eff = jax.lax.stop_gradient(jnp.maximum(t_med, 1e-6))
        T_eff = jnp.where(jnp.any(same), T_eff, T)
    else:
        T_eff = jnp.asarray(T, x.dtype)

    Kt = jnp.exp(-d2_t / T_eff)
    num = jnp.sum(Kt * same, axis=1)
    den1 = jnp.sum(Kt * offdiag, axis=1)

    if d > 1:
        mask_d = jnp.ones((d,)).at[target_dim].set(0.0)
        diff = x[:, None, :] - x[None, :, :]
        sq_mean = jnp.sum((diff**2) * mask_d[None, None, :], axis=2) / jnp.maximum(d - 1, 1)
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


def snn_reg_loss_exact(
    x, y, T: float = 2.0, lam1: float = 1.0, lam2: float = 0.5, threshold: float = 0.05,
    target_dim: int = 1, normalize_z: bool = True, use_adaptive_T: bool = True,
    pos_mode: str = "threshold", topk_frac: float = 0.1, eps: float = 1e-8,
    clamp_ratio: bool = True, valid=None,
):
    """Regression (age) SNNL with threshold/topk positive bands
    (ref: loss.py:725-829)."""
    b, d = x.shape
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
        same_age = (masked_dy <= thr) & offdiag
    else:
        same_age = (abs_dy <= threshold) & offdiag

    z2 = x[:, target_dim]
    d2 = (z2[:, None] - z2[None, :]) ** 2
    if use_adaptive_T:
        t_med = _masked_median(d2.reshape(-1), same_age.reshape(-1))
        T_eff = jax.lax.stop_gradient(jnp.maximum(t_med, 1e-6))
        T_eff = jnp.where(jnp.any(same_age), T_eff, T)
    else:
        T_eff = jnp.asarray(T, x.dtype)

    K2 = jnp.exp(-d2 / T_eff)
    num_sum = jnp.sum(K2 * same_age, axis=1)
    den1_sum = jnp.sum(K2 * offdiag, axis=1)
    if d > 1:
        mask_d = jnp.ones((d,)).at[target_dim].set(0.0)
        diff = x[:, None, :] - x[None, :, :]
        sq_mean = jnp.sum((diff**2) * mask_d[None, None, :], axis=2) / jnp.maximum(d - 1, 1)
        K_other = jnp.exp(-sq_mean / T_eff)
        den2_sum = jnp.sum(K_other * same_age, axis=1)
    else:
        den2_sum = jnp.zeros((b,), x.dtype)

    denom = lam1 * den1_sum + lam2 * den2_sum + eps
    frac = num_sum / denom
    if clamp_ratio:
        frac = jnp.clip(frac, 1e-12, 1.0 - 1e-7)
    has_pos = jnp.any(same_age, axis=1)
    loss = -jnp.sum(jnp.log(frac) * has_pos) / jnp.maximum(jnp.sum(has_pos), 1)
    return jnp.where(jnp.any(has_pos), loss, 0.0)


def snn_loss(x, y, T: float, valid=None):
    """Legacy SNNL: dim-0 similarity vs same-class pairs, other dims in the
    denominator (ref: deep_sdf/loss.py:543-583)."""
    b, d = x.shape
    m = _mask_or_ones(b, valid)
    y = y.reshape(-1)
    pair_valid = m[:, None] & m[None, :]
    no_diag = (1.0 - jnp.eye(b)) * pair_valid
    same = (y[:, None] == y[None, :]) & pair_valid

    def exp_d(col):
        sq = (col[:, None] - col[None, :]) ** 2
        return jnp.exp(-sq / T) * no_diag

    e0 = exp_d(x[:, 0])
    numerator = e0 * same
    denominator = e0
    rest = jnp.zeros_like(e0)
    for i in range(1, d):
        rest = rest + exp_d(x[:, i]) * same
    denominator1 = rest / float(max(d - 1, 1))
    frac = numerator.sum(axis=1) / (
        STABILITY_EPS + 0.5 * denominator.sum(axis=1) + 0.5 * denominator1.sum(axis=1)
    )
    per_row = -jnp.log(STABILITY_EPS + frac)
    return _masked_mean(per_row, m)


def snn_reg_loss(x, y, T: float, threshold: float, valid=None):
    """Legacy regression SNNL on dim 1 (ref: deep_sdf/loss.py:675-722)."""
    b, d = x.shape
    m = _mask_or_ones(b, valid)
    y = y.reshape(-1).astype(x.dtype)
    pair_valid = m[:, None] & m[None, :]
    no_diag = (1.0 - jnp.eye(b)) * pair_valid
    same = (jnp.abs(y[:, None] - y[None, :]) <= threshold) & pair_valid

    def exp_d(col):
        sq = (col[:, None] - col[None, :]) ** 2
        return jnp.exp(-sq / T) * no_diag

    e1 = exp_d(x[:, 1])
    numerator = e1 * same
    denominator = e1
    rest = exp_d(x[:, 0]) * same
    for i in range(2, d):
        rest = rest + exp_d(x[:, i]) * same
    denominator1 = rest / float(max(d - 1, 1))
    frac = numerator.sum(axis=1) / (
        STABILITY_EPS + 0.5 * denominator.sum(axis=1) + 0.5 * denominator1.sum(axis=1)
    )
    per_row = -jnp.log(STABILITY_EPS + frac)
    return _masked_mean(per_row, m)


# ---------------------------------------------------------------------------
# attribute / correlation losses (ref: deep_sdf/loss.py:833-974)


def attribute_loss(latent_code, attribute, factor: float = 1.0, valid=None):
    """tanh latent-distance vs sign of attribute-distance, L1
    (ref: loss.py:833-857). latent_code: [B] (one dim)."""
    lc = latent_code.reshape(-1)
    b = lc.shape[0]
    m = _mask_or_ones(b, valid)
    attr = attribute.reshape(-1).astype(lc.dtype)
    lc_dist = lc[:, None] - lc[None, :]
    at_dist = attr[:, None] - attr[None, :]
    pair = (m[:, None] & m[None, :]).astype(lc.dtype)
    diff = jnp.abs(jnp.tanh(lc_dist * factor) - jnp.sign(at_dist))
    return jnp.sum(diff * pair) / jnp.maximum(jnp.sum(pair), 1.0)


def cls_correlation_loss(z_batch, y_batch, valid=None):
    """Point-biserial correlation loss (ref: loss.py:889-923)."""
    b, d = z_batch.shape
    m = _mask_or_ones(b, valid)
    y = y_batch.reshape(-1)
    m1 = m & (y == 1.0)
    m0 = m & (y == 0.0)
    n1 = jnp.sum(m1)
    n0 = jnp.sum(m0)
    n = n1 + n0
    mean1 = _masked_mean(z_batch, m1)  # [D]
    mean0 = _masked_mean(z_batch, m0)
    mlt = jnp.sqrt((n1 * n0) / jnp.maximum(n**2, 1))
    stds = jnp.maximum(_masked_std(z_batch, m), 1e-12)
    r = (mean1 - mean0) / stds * mlt  # [D]
    ncc_loss = 1.0 - jnp.abs(r[0])
    # parity quirk: the reference accumulates the D-1 other-dim corrs into a
    # BATCH-length zero buffer and takes its mean, so the divisor is the
    # (valid) batch size, not D-1 (ref: deep_sdf/loss.py:912-918)
    other_loss = jnp.sum(jnp.abs(r[1:])) / jnp.maximum(jnp.sum(m), 1)
    return ncc_loss + other_loss


def reg_correlation_loss(z_batch, y_batch, valid=None):
    """Pearson correlation loss, target dim 1 (ref: loss.py:927-974)."""
    b, d = z_batch.shape
    m = _mask_or_ones(b, valid)
    y = y_batch.reshape(-1).astype(z_batch.dtype)

    def corr(col):
        my = _masked_mean(y, m)
        mz = _masked_mean(col, m)
        dz = (col - mz) * m
        dy = (y - my) * m
        return jnp.sum(dz * dy) / jnp.maximum(
            jnp.sqrt(jnp.sum(dz**2) * jnp.sum(dy**2)), 1e-12
        )

    r_target = corr(z_batch[:, 1])
    others = jnp.stack([corr(z_batch[:, i]) for i in range(d) if i != 1])
    ncc_loss = 1.0 - jnp.abs(r_target)
    # same batch-length-buffer parity quirk (ref: deep_sdf/loss.py:953-969)
    other_loss = jnp.sum(jnp.abs(others)) / jnp.maximum(jnp.sum(m), 1)
    return ncc_loss + other_loss


def wasserstein_loss(key, x, delta: float = 1.0):
    """Sliced-permutation Wasserstein with Hungarian matching
    (ref: loss.py:862-886). NOT jittable — uses scipy on host; call outside
    the jitted step."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment
    from scipy.spatial.distance import cdist

    x_np = np.asarray(jax.lax.stop_gradient(x))
    bsize, dim = x_np.shape
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    u = np.stack([x_np[rng.permutation(bsize), i] for i in range(dim)], axis=1)
    ind = linear_sum_assignment(cdist(x_np, u))[1]
    u_matched = jnp.asarray(u[ind])
    diff = x - u_matched
    abs_d = jnp.abs(diff)
    huber = jnp.where(abs_d <= delta, 0.5 * diff**2, delta * (abs_d - 0.5 * delta))
    return jnp.mean(huber)


# ---------------------------------------------------------------------------
# SNNL cross-entropy (ref: deep_sdf/loss.py:976-1076)


def pairwise_euclid_distance(A, B):
    sqr_a = jnp.sum(A**2, axis=1)[None, :]
    sqr_b = jnp.sum(B**2, axis=1)[:, None]
    inner = B @ A.T
    return sqr_a + sqr_b - 2 * inner


def pairwise_cos_distance(A, B):
    a = A / jnp.maximum(jnp.linalg.norm(A, axis=1, keepdims=True), 1e-12)
    b = B / jnp.maximum(jnp.linalg.norm(B, axis=1, keepdims=True), 1e-12)
    return 1 - a @ b.T


def snnl_cross_entropy(x, y, temp: float = 100.0, cos_distance: bool = True):
    """ref: deep_sdf/loss.py:1065-1076."""
    dm = pairwise_cos_distance(x, x) if cos_distance else pairwise_euclid_distance(x, x)
    f = jnp.exp(-(dm / temp)) - jnp.eye(x.shape[0])
    pick = f / (STABILITY_EPS + jnp.sum(f, axis=1, keepdims=True))
    same = (y.reshape(-1)[None, :] == y.reshape(-1)[:, None]).astype(x.dtype)
    summed = jnp.sum(pick * same, axis=1)
    return -jnp.mean(jnp.log(STABILITY_EPS + summed))
