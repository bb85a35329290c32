"""SIREN decoder with Fourier-feature encoding and stream-in layers.

Behavioral JAX port of networks/siren_decoder.py:30-237 and
networks/modules.py:4-39:

* optional Gaussian random-Fourier xyz encoding (B ~ N(0, sigma^2) — the
  reference passes sigma**2 as the *std*, modules.py:30 — output
  [sin(2*pi*xB^T), cos(...)], 2m-dim) used when encoding_features > 1.
* separate ``latent_in`` / ``xyz_in`` stream-in layer lists: layer widths
  shrink so dims stay as configured (siren_decoder.py:131-138); layer 0
  always receives [latent || xyz(_encoded)].
* nonlinearities: "sine" (sin 30x), "relu", and learnable blends
  "sine_relu_line" (per-unit scalar, init 0.5) / "sine_relu_plane"
  (per-unit [relu_w, sine_w], init [0, 1]) (:142-147, :218-227).
* SIREN init: U(-sqrt(6/in)/30, sqrt(6/in)/30), first layer U(-1/in, 1/in);
  relu mode uses kaiming-normal fan_in (:8-27).
* optional weight-norm (layers in norm_layers) or BatchNorm1d; tanh only
  when ``use_tanh`` (no unconditional final tanh here, unlike
  deep_sdf_decoder).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from msd_tpu.models.common import (
    apply_linear,
    dropout as dropout_fn,
    linear_init,
    weight_norm_init,
)
from msd_tpu.models.pointnet import batch_norm_apply, batch_norm_init


def _sine(x):
    return jnp.sin(30.0 * x)


class SirenDecoder:
    def __init__(
        self,
        latent_size: int,
        dims: Sequence[int],
        encoding_features: int = 1,
        encoding_sigma: float = 0.0,
        xyz_in: Sequence[int] = (),
        xyz_in_all: bool = False,
        dropout: Optional[Sequence[int]] = None,
        dropout_prob: float = 0.0,
        norm_layers: Sequence[int] = (),
        latent_in: Sequence[int] = (),
        weight_norm: bool = False,
        latent_dropout: bool = False,
        nonlinearity: str = "relu",
        use_tanh: bool = False,
    ):
        self.latent_size = int(latent_size)
        self.encoding_features = int(encoding_features)
        self.encoding_sigma = float(encoding_sigma)
        xyz_dim = 2 * self.encoding_features if self.encoding_features > 1 else 3

        num_layers = len(dims) + 2
        self.num_layers = num_layers
        xyz_in = list(xyz_in) + [0]  # layer 0 always gets xyz (ref: :62-63)
        self.xyz_input_dims = [
            xyz_dim if (xyz_in_all or i in xyz_in) else 0 for i in range(num_layers - 1)
        ] + [0]
        self.xyz_in = list(range(num_layers)) if xyz_in_all else xyz_in

        self.latent_in = list(latent_in) + [0]  # (ref: :132)
        latent_input_dims = [
            latent_size if i in self.latent_in else 0 for i in range(num_layers - 1)
        ] + [0]
        self.latent_input_dims = latent_input_dims
        fc_dims = (
            [0]
            + [dims[i] - self.xyz_input_dims[1:][i] - latent_input_dims[1:][i] for i in range(len(dims))]
            + [1]
        )
        assert all(d > 0 for d in fc_dims[1:]), (
            f"LAYER WIDTH (dims) TOO SMALL FOR INSTREAMING: fc_dims {fc_dims}"
        )
        self.fc_dims = fc_dims
        self.norm_layers = tuple(norm_layers or ())
        self.weight_norm = bool(weight_norm)
        self.dropout = tuple(dropout or ())
        self.dropout_prob = float(dropout_prob)
        self.latent_dropout = bool(latent_dropout)
        self.nonlinearity = nonlinearity
        if nonlinearity not in ("sine", "relu", "sine_relu_line", "sine_relu_plane"):
            raise NotImplementedError(f"Nonlinearity '{nonlinearity}' is not available.")
        self.use_tanh = bool(use_tanh)

        self.layer_shapes = []
        for i in range(num_layers - 1):
            in_dim = fc_dims[i] + self.xyz_input_dims[i] + latent_input_dims[i]
            out_dim = fc_dims[i + 1]
            is_wn = self.weight_norm and i in self.norm_layers
            has_bn = (not self.weight_norm) and bool(self.norm_layers) and i in self.norm_layers
            self.layer_shapes.append((in_dim, out_dim, is_wn, has_bn))

    # ------------------------------------------------------------------
    def init(self, key, dtype=jnp.float32):
        params = {}
        key, k_enc = jax.random.split(key)
        if self.encoding_features > 1:
            # B ~ N(0, sigma^2) with sigma^2 as the std (modules.py:30 quirk)
            params["encoding_B"] = (
                self.encoding_sigma**2
            ) * jax.random.normal(k_enc, (self.encoding_features, 3), dtype)
        keys = jax.random.split(key, self.num_layers - 1)
        for i, (in_dim, out_dim, is_wn, has_bn) in enumerate(self.layer_shapes):
            p = weight_norm_init(keys[i], in_dim, out_dim, dtype) if is_wn else linear_init(keys[i], in_dim, out_dim, dtype)
            # re-initialize weights per the nonlinearity
            kw = jax.random.fold_in(keys[i], 1)
            if self.nonlinearity == "relu":
                std = math.sqrt(2.0 / in_dim)  # kaiming normal fan_in
                w = std * jax.random.normal(kw, (in_dim, out_dim), dtype)
            else:  # sine family
                if i == 0:
                    bound = 1.0 / in_dim
                else:
                    bound = math.sqrt(6.0 / in_dim) / 30.0
                w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
            if is_wn:
                p["v"] = w
                p["g"] = jnp.linalg.norm(w, axis=0)
            else:
                p["w"] = w
            params[f"lin{i}"] = p
            if has_bn:
                params[f"bn{i}"] = batch_norm_init(out_dim)
            if self.nonlinearity == "sine_relu_line" and i < self.num_layers - 2:
                params[f"nl_line{i}"] = 0.5 * jnp.ones((out_dim,), dtype)
            elif self.nonlinearity == "sine_relu_plane" and i < self.num_layers - 2:
                params[f"nl_plane{i}"] = jnp.stack(
                    [jnp.zeros((out_dim,), dtype), jnp.ones((out_dim,), dtype)], axis=1
                )

        return params

    def num_params(self, params):
        return sum(x.size for x in jax.tree.leaves(params))

    # ------------------------------------------------------------------
    def _encode(self, params, xyz):
        proj = 2.0 * jnp.pi * xyz @ params["encoding_B"].T
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def apply(self, params, inputs, *, train: bool = False, rng=None):
        """inputs [N, latent_size+3] = [latent || xyz] -> [N, 1]."""
        xyz = inputs[:, -3:]
        latent_vecs = inputs[:, :-3]
        xyz_encoded = self._encode(params, xyz) if self.encoding_features > 1 else None
        xyz_feat0 = xyz if self.xyz_input_dims[0] == 3 else xyz_encoded

        if self.latent_dropout and train:
            rng, sub = jax.random.split(rng)
            latent_vecs = dropout_fn(sub, latent_vecs, 0.2)

        x = jnp.concatenate([latent_vecs, xyz_feat0], axis=1)
        bn_updates = {}
        for i in range(self.num_layers - 1):
            if i > 0:
                if i in self.latent_in:
                    x = jnp.concatenate([x, latent_vecs], axis=1)
                if i in self.xyz_in:
                    feat = xyz if self.xyz_input_dims[i] == 3 else xyz_encoded
                    x = jnp.concatenate([x, feat], axis=1)
            x = apply_linear(params[f"lin{i}"], x)
            if i < self.num_layers - 2:
                if f"bn{i}" in params:
                    x, stats = batch_norm_apply(params[f"bn{i}"], x, train)
                    bn_updates[f"bn{i}"] = stats
                if self.nonlinearity == "sine_relu_line":
                    blend = params[f"nl_line{i}"]
                    x = blend * _sine(x) + (1 - blend) * jax.nn.relu(x)
                elif self.nonlinearity == "sine_relu_plane":
                    plane = params[f"nl_plane{i}"]
                    x = plane[:, 0] * jax.nn.relu(x) + plane[:, 1] * _sine(x)
                elif self.nonlinearity == "sine":
                    x = _sine(x)
                else:
                    x = jax.nn.relu(x)
                if train and i in self.dropout and self.dropout_prob > 0:
                    rng, sub = jax.random.split(rng)
                    x = dropout_fn(sub, x, self.dropout_prob)

        if self.use_tanh:
            x = jnp.tanh(x)
        return x

    def __call__(self, params, inputs, **kw):
        return self.apply(params, inputs, **kw)
