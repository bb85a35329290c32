"""Per-shape latent-code optimization ("reconstruction").

Equivalent of reconstruct.reconstruct (ref: reconstruct.py:16-151), but the
whole optimization — per-iteration balanced resampling of SDF points,
decoder forward, clamped-L1 + regularizers, Adam on the latent, stepped LR
decay, optional hard norm bound — is one jitted `lax.scan`, so an
800-iteration reconstruction is a single device program instead of 800
Python-dispatched steps.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from msd_tpu.utils.optim import project_code_bound


class ReconstructConfig(NamedTuple):
    """Static configuration (hashable -> one jit cache entry per config)."""

    num_iterations: int
    latent_size: int
    clamp_dist: float
    num_samples: int
    lr: float
    l2reg: bool
    code_reg_lambda: Optional[float] = None
    code_reg_type: str = "l2_sq"
    code_bound: Optional[float] = None
    dist_weight: float = 0.0
    dist_type: str = "zscore_l2"
    # bf16 matmuls: ~4x faster on TPU MXU at negligible latent-fit impact
    # (same default as Stage-1 training; see train/stage1.py measurement)
    matmul_precision: str = "bfloat16"


@functools.partial(jax.jit, static_argnums=(0, 1))
def _reconstruct_scan(decoder, cfg: ReconstructConfig, params, pos, pos_count, neg, neg_count, init_latent, dist_mean, dist_std, key):
    """Returns (loss_hist [iters], latent [1, L])."""
    half = cfg.num_samples // 2
    decreased_by = 10.0
    adjust_lr_every = max(1, cfg.num_iterations // 2)

    def sample(k):
        kp, kn = jax.random.split(k)
        ip = jax.random.randint(kp, (half,), 0, pos_count)
        ineg = jax.random.randint(kn, (cfg.num_samples - half,), 0, neg_count)
        return jnp.concatenate([pos[ip], neg[ineg]], axis=0)

    def loss_fn(latent, batch):
        xyz = batch[:, 0:3]
        sdf_gt = jnp.clip(batch[:, 3:4], -cfg.clamp_dist, cfg.clamp_dist)
        latent_inputs = jnp.broadcast_to(latent, (cfg.num_samples, cfg.latent_size))
        inputs = jnp.concatenate([latent_inputs, xyz], axis=1)
        pred = decoder.apply(params, inputs)
        pred = jnp.clip(pred, -cfg.clamp_dist, cfg.clamp_dist)
        loss = jnp.mean(jnp.abs(pred - sdf_gt))
        # latent regularization (ref: reconstruct.py:106-116)
        if cfg.code_reg_lambda is not None and cfg.code_reg_lambda > 0.0:
            t = cfg.code_reg_type.lower()
            if t in ("l2_norm", "l2norm", "norm"):
                loss = loss + cfg.code_reg_lambda * jnp.mean(
                    jnp.sqrt(jnp.maximum(jnp.sum(latent**2, axis=1), 1e-24))
                )
            else:
                loss = loss + cfg.code_reg_lambda * jnp.mean(latent**2)
        elif cfg.l2reg:
            loss = loss + 1e-4 * jnp.mean(latent**2)
        if cfg.dist_weight > 0.0:
            diff = (latent - dist_mean) / dist_std
            if cfg.dist_type.lower() in ("l1", "abs"):
                loss = loss + cfg.dist_weight * jnp.mean(jnp.abs(diff))
            else:
                loss = loss + cfg.dist_weight * jnp.mean(diff**2)
        return loss

    def step(carry, it):
        latent, m, v = carry
        lr = cfg.lr * (1.0 / decreased_by) ** (it // adjust_lr_every)
        batch = sample(jax.random.fold_in(key, it))
        loss, g = jax.value_and_grad(loss_fn)(latent, batch)
        # torch.optim.Adam semantics
        t = (it + 1).astype(jnp.float32)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * (g * g)
        mhat = m / (1 - 0.9**t)
        vhat = v / (1 - 0.999**t)
        latent = latent - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
        if cfg.code_bound is not None and cfg.code_bound > 0:
            latent = project_code_bound(latent, cfg.code_bound)
        return (latent, m, v), loss

    zeros = jnp.zeros_like(init_latent)
    with jax.default_matmul_precision(cfg.matmul_precision):
        (latent, _, _), losses = jax.lax.scan(
            step, (init_latent, zeros, zeros), jnp.arange(cfg.num_iterations)
        )
    return losses, latent


def reconstruct(
    decoder,
    params,
    num_iterations,
    latent_size,
    test_sdf,
    stat,
    clamp_dist,
    num_samples=30000,
    lr=5e-4,
    l2reg=False,
    code_reg_lambda=None,
    code_reg_type="l2_sq",
    code_bound=None,
    return_loss_hist=False,
    dist_mean=None,
    dist_std=None,
    dist_weight=0.0,
    dist_type="zscore_l2",
    key=None,
):
    """Reference-compatible signature (ref: reconstruct.py:16-151).

    test_sdf: (pos [P,4], neg [N,4]) arrays (list/tuple), as produced by
    read_sdf_samples / SdfDataset. Returns (loss or loss_hist, latent [1, L]).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    kinit, kopt = jax.random.split(key)

    def _pad_pow2(arr):
        """Pad sample arrays to a pow2 row count so the jitted scan is
        reused across shapes with different sample counts (each distinct
        shape would otherwise trigger a fresh compile). Sampling stays
        bounded by the true count."""
        arr = np.asarray(arr, np.float32)
        n = arr.shape[0]
        n_pad = 1024
        while n_pad < n:
            n_pad *= 2
        if n_pad != n:
            arr = np.concatenate([arr, np.zeros((n_pad - n, arr.shape[1]), np.float32)], axis=0)
        return arr, n

    pos_np, n_pos = _pad_pow2(test_sdf[0])
    neg_np, n_neg = _pad_pow2(test_sdf[1])
    pos = jnp.asarray(pos_np)
    neg = jnp.asarray(neg_np)

    if isinstance(stat, float):
        init_latent = stat * jax.random.normal(kinit, (1, latent_size))
    else:
        mean, std = stat
        init_latent = jnp.asarray(mean).reshape(1, -1) + jnp.asarray(std).reshape(1, -1) * jax.random.normal(kinit, (1, latent_size))

    dm = jnp.zeros((1, latent_size)) if dist_mean is None else jnp.asarray(dist_mean).reshape(1, -1)
    ds = jnp.ones((1, latent_size)) if dist_std is None else jnp.maximum(jnp.asarray(dist_std).reshape(1, -1), 1e-8)

    cfg = ReconstructConfig(
        num_iterations=int(num_iterations),
        latent_size=int(latent_size),
        clamp_dist=float(clamp_dist),
        num_samples=int(num_samples),
        lr=float(lr),
        l2reg=bool(l2reg),
        code_reg_lambda=None if code_reg_lambda is None else float(code_reg_lambda),
        code_reg_type=str(code_reg_type),
        code_bound=None if code_bound is None else float(code_bound),
        dist_weight=float(dist_weight) if dist_weight else 0.0,
        dist_type=str(dist_type),
    )
    losses, latent = _reconstruct_scan(
        decoder, cfg, params, pos, jnp.int32(n_pos), neg, jnp.int32(n_neg), init_latent, dm, ds, kopt
    )
    losses = np.asarray(losses)
    if return_loss_hist:
        return losses.tolist(), latent
    return float(losses[-1]), latent
