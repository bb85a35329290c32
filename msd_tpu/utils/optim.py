"""Adam with per-group dynamic learning rates.

The reference uses one torch Adam over two param groups — decoder params at
lr_schedules[0], {latent table (+ GMM params)} at lr_schedules[1]
(ref: train_deep_sdf.py:445-454). Here that is a pure function: the two
scalar LRs are *arguments* to the jitted train step (recomputed per epoch by
the host-side schedules), so LR changes never trigger recompilation.

Semantics match torch.optim.Adam (b1=0.9, b2=0.999, eps=1e-8, bias
correction, eps added after sqrt) so training dynamics are comparable.
Because the reference's latent Embedding produces *dense* gradients
(sparse=False), dense Adam over the full latent table is exactly
equivalent — untouched rows still receive moment-decay updates of zero
gradients, as in torch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    count: jnp.ndarray  # scalar int32
    mu: dict  # first moments, same structure as params
    nu: dict  # second moments


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree.map(jnp.zeros_like, params))


def adam_update(params, grads, state: AdamState, lr_tree, b1=0.9, b2=0.999, eps=1e-8):
    """One Adam step. ``lr_tree`` is either a scalar LR or a pytree prefix
    (same top-level structure as params) of scalar LRs — this is how the two
    reference param groups get their separate schedules."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t

    mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, grads)

    if isinstance(lr_tree, dict):
        new_params = {}
        for k in params:
            new_params[k] = jax.tree.map(
                lambda p, m, v, _lr=lr_tree[k]: p - _lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
                params[k],
                mu[k],
                nu[k],
            )
    else:
        new_params = jax.tree.map(
            lambda p, m, v: p - lr_tree * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
            params,
            mu,
            nu,
        )
    return new_params, AdamState(count=count, mu=mu, nu=nu)


def fused_clip_adam(params, grads, state: AdamState, lr_tree, max_norm=None,
                    clip_keys=("net",), b1=0.9, b2=0.999, eps=1e-8):
    """Semantically identical to ``clip_grads_by_global_norm`` (on each
    group in ``clip_keys``) followed by ``adam_update``, but executed over
    ONE flattened vector per top-level group.

    Motivation (v5e, flagship 8x512 workload): the pytree update lowers to
    ~100 small elementwise kernels (per-leaf mu/nu/param ops on <=1 MB
    arrays) costing ~5.6 ms of launch overhead per step; flattening turns
    it into a handful of fused passes over ~7 MB vectors (~0.2 ms of
    bandwidth). The AdamState structure (and hence the optimizer
    checkpoint format) is unchanged — moments are split back per leaf.

    Returns (new_params, new_state, {clip_key: pre-clip norm}).
    """
    import numpy as _np

    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t
    new_params, new_mu, new_nu = {}, {}, {}
    norms = {}
    for k in params:
        lr = lr_tree[k] if isinstance(lr_tree, dict) else lr_tree
        leaves, treedef = jax.tree_util.tree_flatten(params[k])
        g_leaves = jax.tree_util.tree_leaves(grads[k])
        m_leaves = jax.tree_util.tree_leaves(state.mu[k])
        v_leaves = jax.tree_util.tree_leaves(state.nu[k])
        sizes = [l.size for l in leaves]
        shapes = [l.shape for l in leaves]
        if len(leaves) == 1:
            fp, fg, fm, fv = leaves[0], g_leaves[0], m_leaves[0], v_leaves[0]
        else:
            fp = jnp.concatenate([l.ravel() for l in leaves])
            fg = jnp.concatenate([l.ravel() for l in g_leaves])
            fm = jnp.concatenate([l.ravel() for l in m_leaves])
            fv = jnp.concatenate([l.ravel() for l in v_leaves])
        if k in clip_keys and max_norm is not None:
            gnorm = jnp.sqrt(jnp.sum(fg.astype(jnp.float32) ** 2))
            fg = fg * jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
            norms[k] = gnorm
        fm = b1 * fm + (1.0 - b1) * fg
        fv = b2 * fv + (1.0 - b2) * (fg * fg)
        fp = fp - lr * (fm / bc1) / (jnp.sqrt(fv / bc2) + eps)
        if len(leaves) == 1:
            new_params[k], new_mu[k], new_nu[k] = fp, fm, fv
        else:
            offs = list(_np.cumsum(sizes)[:-1])

            def unflat(flat):
                parts = [p.reshape(s) for p, s in zip(jnp.split(flat, offs), shapes)]
                return jax.tree_util.tree_unflatten(treedef, parts)

            new_params[k] = unflat(fp)
            new_mu[k] = unflat(fm)
            new_nu[k] = unflat(fv)
    return new_params, AdamState(count=count, mu=new_mu, nu=new_nu), norms


def clip_grads_by_global_norm(grads, max_norm):
    """torch.nn.utils.clip_grad_norm_ equivalent (global L2 norm over the
    subtree; ref: train_deep_sdf.py:780-782 clips decoder params only)."""
    leaves = jax.tree.leaves(grads)
    global_norm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (global_norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), global_norm


def project_code_bound(latents, code_bound):
    """nn.Embedding(max_norm=...) renorm: rescale rows whose L2 norm exceeds
    the bound (ref: train_deep_sdf.py:429; reconstruct.py:134-140)."""
    if code_bound is None:
        return latents
    norms = jnp.linalg.norm(latents, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, code_bound / (norms + 1e-12))
    return latents * scale
