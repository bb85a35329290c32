"""Shared building blocks for functional (pytree-parameter) models.

Models in msd_tpu are plain Python objects holding *static* architecture
config; parameters live in JAX pytrees (nested dicts) created by
``init(key)`` and consumed by pure ``apply(params, ...)`` functions. This is
the TPU-idiomatic replacement for the reference's nn.Module graph — every
trainer jits one pure function of (params, batch).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    """PyTorch nn.Linear default init: weight ~ kaiming_uniform(a=sqrt(5)) =
    U(-1/sqrt(in), 1/sqrt(in)); bias ~ U(-1/sqrt(in), 1/sqrt(in)).

    Matching the reference's init distribution keeps training dynamics
    comparable (ref: networks/deep_sdf_decoder.py uses default Linear init).
    Weights are stored transposed, [in, out], so forward is ``x @ w + b``.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def weight_norm_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    """Explicit weight-norm reparameterization w = g * v / ||v||.

    PyTorch's ``nn.utils.weight_norm(nn.Linear(...))`` (dim=0 over the
    [out, in] weight) computes per-output-row norms; with our [in, out]
    storage that is a norm over axis 0. g is initialized to ||v|| so the
    effective weight at init equals the plain Linear init.
    """
    p = linear_init(key, in_dim, out_dim, dtype)
    v = p["w"]
    g = jnp.linalg.norm(v, axis=0)  # [out]
    return {"v": v, "g": g, "b": p["b"]}


def weight_norm_effective(layer):
    """Effective weight for a weight-norm layer param dict."""
    v = layer["v"]
    norm = jnp.linalg.norm(v, axis=0, keepdims=True)
    return layer["g"][None, :] * v / norm


def apply_linear(layer, x):
    if "v" in layer:
        w = weight_norm_effective(layer)
    else:
        w = layer["w"]
    return x @ w + layer["b"]


def layer_norm(params, x, eps: float = 1e-5):
    """LayerNorm matching torch.nn.LayerNorm (biased variance)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def dropout(key, x, rate: float):
    """Inverted dropout (torch.nn.functional.dropout semantics)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
