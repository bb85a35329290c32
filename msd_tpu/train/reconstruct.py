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


def _reconstruct_scan_impl(decoder, cfg: ReconstructConfig, params, pos, pos_count, neg, neg_count, init_latent, dist_mean, dist_std, key):
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


_reconstruct_scan = functools.partial(jax.jit, static_argnums=(0, 1))(_reconstruct_scan_impl)


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
    if n_pos == 0 or n_neg == 0:
        # randint(maxval=0) reduces modulo a zero span under jit and would
        # silently fit against the zero padding (torch raises here too)
        raise ValueError(
            f"reconstruct needs both sample signs: got {n_pos} pos / {n_neg} neg"
        )
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


# ---------------------------------------------------------------------------
# Batched reconstruction: many shapes at once, optionally sharded over a
# device mesh. The reference loops shapes one at a time on one GPU
# (ref: reconstruct.py:259-357); latent fits are independent, so on TPU the
# shape axis vmaps into one program and shards across chips (SURVEY §2.6).


@functools.partial(jax.jit, static_argnums=(0, 1))
def _reconstruct_scan_batch(decoder, cfg, params, pos, pos_count, neg, neg_count, init_latent, dist_mean, dist_std, keys):
    """pos/neg [S, P, 4], counts [S], init_latent [S, 1, L], keys [S, 2]
    -> (loss_hist [S, iters], latents [S, 1, L])."""

    def single(p, pc, n, nc, il, k):
        return _reconstruct_scan_impl(
            decoder, cfg, params, p, pc, n, nc, il, dist_mean, dist_std, k
        )

    return jax.vmap(single)(pos, pos_count, neg, neg_count, init_latent, keys)


def reconstruct_batch(
    decoder,
    params,
    num_iterations,
    latent_size,
    test_sdfs,
    stat,
    clamp_dist,
    num_samples=30000,
    lr=5e-4,
    l2reg=False,
    code_reg_lambda=None,
    code_reg_type="l2_sq",
    code_bound=None,
    dist_mean=None,
    dist_std=None,
    dist_weight=0.0,
    dist_type="zscore_l2",
    key=None,
    mesh=None,
):
    """Fit latents for ``len(test_sdfs)`` shapes in ONE device program.

    test_sdfs: list of (pos [Pi,4], neg [Ni,4]) pairs. With ``mesh`` (a 1-D
    jax.sharding.Mesh with a "data" axis) the shape axis is sharded across
    devices — each chip optimizes its slice of shapes, no collectives needed.
    Returns (final_losses [S], latents [S, L]).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    S = len(test_sdfs)
    if S == 0:
        return np.zeros(0, np.float32), np.zeros((0, latent_size), np.float32)

    # common pow2 padding across shapes -> one [S, P, 4] stack, one compile
    def _pad_to(arr, n_pad):
        arr = np.asarray(arr, np.float32)
        n = arr.shape[0]
        out = np.zeros((n_pad, arr.shape[1]), np.float32)
        out[:n] = arr
        return out, n

    def _pow2(n):
        p = 1024
        while p < n:
            p *= 2
        return p

    p_pad = _pow2(max(p.shape[0] for p, _ in test_sdfs))
    n_pad = _pow2(max(n.shape[0] for _, n in test_sdfs))
    pos_list, pos_counts, neg_list, neg_counts = [], [], [], []
    for si, (p, n) in enumerate(test_sdfs):
        if p.shape[0] == 0 or n.shape[0] == 0:
            raise ValueError(
                f"reconstruct_batch shape {si} needs both sample signs: "
                f"got {p.shape[0]} pos / {n.shape[0]} neg"
            )
        pp, pc = _pad_to(p, p_pad)
        nn, nc = _pad_to(n, n_pad)
        pos_list.append(pp)
        pos_counts.append(pc)
        neg_list.append(nn)
        neg_counts.append(nc)

    # pad the shape axis so it divides the mesh (padded rows re-fit shape 0)
    n_dev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    S_pad = ((S + n_dev - 1) // n_dev) * n_dev
    for _ in range(S_pad - S):
        pos_list.append(pos_list[0])
        pos_counts.append(pos_counts[0])
        neg_list.append(neg_list[0])
        neg_counts.append(neg_counts[0])

    kinit, kopt = jax.random.split(key)
    if isinstance(stat, float):
        init = stat * jax.random.normal(kinit, (S_pad, 1, latent_size))
    else:
        mean, std = stat
        init = jnp.asarray(mean).reshape(1, 1, -1) + jnp.asarray(std).reshape(1, 1, -1) * jax.random.normal(
            kinit, (S_pad, 1, latent_size)
        )
    keys = jax.vmap(lambda i: jax.random.fold_in(kopt, i))(jnp.arange(S_pad))

    dm = jnp.zeros((1, latent_size)) if dist_mean is None else jnp.asarray(dist_mean).reshape(1, -1)
    ds = jnp.ones((1, latent_size)) if dist_std is None else jnp.maximum(jnp.asarray(dist_std).reshape(1, -1), 1e-8)

    pos = jnp.asarray(np.stack(pos_list))
    neg = jnp.asarray(np.stack(neg_list))
    pcs = jnp.asarray(np.array(pos_counts, np.int32))
    ncs = jnp.asarray(np.array(neg_counts, np.int32))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        pos = jax.device_put(pos, shard)
        neg = jax.device_put(neg, shard)
        pcs = jax.device_put(pcs, shard)
        ncs = jax.device_put(ncs, shard)
        init = jax.device_put(init, shard)
        keys = jax.device_put(keys, shard)
        params = jax.device_put(params, repl)

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
    losses, latents = _reconstruct_scan_batch(
        decoder, cfg, params, pos, pcs, neg, ncs, init, dm, ds, keys
    )
    losses = np.asarray(losses)[:S]
    latents = np.asarray(latents)[:S, 0, :]
    return losses[:, -1], latents
