"""DeepSDF auto-decoder MLP, functionally, with exact reference semantics.

Reference: networks/deep_sdf_decoder.py:9-109. Architecture notes replicated
faithfully:

* layer widths: dims = [latent+3] + hidden_dims + [1]; a layer whose *next*
  layer index is in ``latent_in`` has its output shrunk by dims[0] so the
  full input can be re-concatenated before that next layer (:40-45, :86-87).
* ``xyz_in_all`` re-concatenates xyz before every non-first, non-last layer
  (shrinking outputs by 3) (:45-46, :88-89).
* weight-norm applies only when ``weight_norm`` AND the layer index is in
  ``norm_layers`` (:48-53); LayerNorm applies when not weight_norm and the
  index is in norm_layers (:57-62, :95-101).
* ReLU + per-layer dropout on all but the last layer (:102-104); optional
  latent dropout p=0.2 on the latent slice of the input (:77-80); optional
  tanh on the last linear output when ``use_tanh`` (:92-93); a final tanh is
  ALWAYS applied (self.th, :71,:106-107).

The forward is a chain of 9 matmuls (for the standard 8x512 config) — on TPU
these run on the MXU; the fused Pallas path (msd_tpu/ops/fused_mlp.py) keeps
all weights + activations in VMEM for the inference/grid-eval hot loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from msd_tpu.models.common import (
    apply_linear,
    dropout,
    layer_norm,
    layer_norm_init,
    linear_init,
    weight_norm_init,
)


class DeepSDFDecoder:
    def __init__(
        self,
        latent_size: int,
        dims: Sequence[int],
        dropout: Optional[Sequence[int]] = None,
        dropout_prob: float = 0.0,
        norm_layers: Sequence[int] = (),
        latent_in: Sequence[int] = (),
        weight_norm: bool = False,
        xyz_in_all: Optional[bool] = None,
        use_tanh: bool = False,
        latent_dropout: bool = False,
    ):
        self.latent_size = int(latent_size)
        dims_full = [latent_size + 3] + list(dims) + [1]
        self.dims = dims_full
        self.num_layers = len(dims_full)
        self.norm_layers = tuple(norm_layers or ())
        self.latent_in = tuple(latent_in or ())
        self.latent_dropout = bool(latent_dropout)
        self.xyz_in_all = bool(xyz_in_all) if xyz_in_all is not None else False
        self.weight_norm = bool(weight_norm)
        self.use_tanh = bool(use_tanh)
        self.dropout = tuple(dropout or ())
        self.dropout_prob = float(dropout_prob)

        # Per-layer (in_dim, out_dim, is_weight_norm, has_layernorm).
        self.layer_shapes = []
        for layer in range(self.num_layers - 1):
            if layer + 1 in self.latent_in:
                out_dim = dims_full[layer + 1] - dims_full[0]
            else:
                out_dim = dims_full[layer + 1]
                if self.xyz_in_all and layer != self.num_layers - 2:
                    out_dim -= 3
            in_dim = dims_full[layer]
            is_wn = self.weight_norm and layer in self.norm_layers
            has_ln = (not self.weight_norm) and layer in self.norm_layers
            self.layer_shapes.append((in_dim, out_dim, is_wn, has_ln))

    # ------------------------------------------------------------------
    def init(self, key, dtype=jnp.float32):
        params = {}
        keys = jax.random.split(key, self.num_layers - 1)
        for layer, (in_dim, out_dim, is_wn, has_ln) in enumerate(self.layer_shapes):
            if is_wn:
                params[f"lin{layer}"] = weight_norm_init(keys[layer], in_dim, out_dim, dtype)
            else:
                params[f"lin{layer}"] = linear_init(keys[layer], in_dim, out_dim, dtype)
            if has_ln:
                params[f"bn{layer}"] = layer_norm_init(out_dim, dtype)
        return params

    def num_params(self, params=None):
        if params is None:
            return sum(
                in_dim * out_dim + out_dim + (out_dim if is_wn else 0)
                for in_dim, out_dim, is_wn, _ in self.layer_shapes
            )
        return sum(x.size for x in jax.tree.leaves(params))

    # ------------------------------------------------------------------
    def apply(self, params, inputs, *, train: bool = False, rng=None):
        """Forward pass. inputs: [N, latent_size+3] = [latent || xyz].

        Returns [N, 1] SDF predictions (final tanh always applied,
        ref: networks/deep_sdf_decoder.py:106-107).
        """
        xyz = inputs[:, -3:]
        needs_rng = train and (self.latent_dropout or self.dropout)
        if needs_rng and rng is None:
            raise ValueError("dropout active: apply(..., train=True) needs rng")

        if inputs.shape[1] > 3 and self.latent_dropout and train:
            rng, sub = jax.random.split(rng)
            latent_vecs = dropout(sub, inputs[:, :-3], 0.2)
            x = jnp.concatenate([latent_vecs, xyz], axis=1)
        else:
            x = inputs

        for layer in range(self.num_layers - 1):
            lin = params[f"lin{layer}"]
            if layer in self.latent_in:
                x = jnp.concatenate([x, inputs], axis=1)
            elif layer != 0 and self.xyz_in_all:
                x = jnp.concatenate([x, xyz], axis=1)
            x = apply_linear(lin, x)
            if layer == self.num_layers - 2 and self.use_tanh:
                x = jnp.tanh(x)
            if layer < self.num_layers - 2:
                if f"bn{layer}" in params:
                    x = layer_norm(params[f"bn{layer}"], x)
                x = jax.nn.relu(x)
                if train and layer in self.dropout and self.dropout_prob > 0:
                    rng, sub = jax.random.split(rng)
                    x = dropout(sub, x, self.dropout_prob)

        return jnp.tanh(x)

    def __call__(self, params, inputs, **kw):
        return self.apply(params, inputs, **kw)

    # ------------------------------------------------------------------
    # Checkpoint interop with the reference's torch state_dicts.
    def params_to_torch_state_dict(self, params):
        """Convert a param pytree to a reference-named torch state dict
        (lin<i>.weight / .bias, weight-norm as .weight_g/.weight_v,
        LayerNorm as bn<i>.weight/.bias). Lets reference tooling load our
        checkpoints (ref: deep_sdf/workspace.py:40-80)."""
        import numpy as np
        import torch

        sd = {}
        for layer, (_, _, is_wn, has_ln) in enumerate(self.layer_shapes):
            p = params[f"lin{layer}"]
            if is_wn:
                v = np.asarray(p["v"]).T  # [out, in]
                g = np.asarray(p["g"]).reshape(-1, 1)
                sd[f"lin{layer}.weight_g"] = torch.from_numpy(g.copy())
                sd[f"lin{layer}.weight_v"] = torch.from_numpy(v.copy())
            else:
                sd[f"lin{layer}.weight"] = torch.from_numpy(np.asarray(p["w"]).T.copy())
            sd[f"lin{layer}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())
            if has_ln:
                ln = params[f"bn{layer}"]
                sd[f"bn{layer}.weight"] = torch.from_numpy(np.asarray(ln["scale"]).copy())
                sd[f"bn{layer}.bias"] = torch.from_numpy(np.asarray(ln["bias"]).copy())
        return sd

    def params_from_torch_state_dict(self, state_dict, dtype=jnp.float32):
        """Load reference-trained weights (strips DataParallel 'module.'
        prefixes, handles both weight-norm param names and newer
        parametrizations naming)."""
        import numpy as np

        def get(name):
            for k in (name, "module." + name):
                if k in state_dict:
                    v = state_dict[k]
                    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            # torch >= 2 parametrize naming
            alt = {
                ".weight_g": ".parametrizations.weight.original0",
                ".weight_v": ".parametrizations.weight.original1",
            }
            for suffix, repl in alt.items():
                if name.endswith(suffix):
                    base = name[: -len(suffix)] + repl
                    for k in (base, "module." + base):
                        if k in state_dict:
                            v = state_dict[k]
                            return np.asarray(
                                v.detach().cpu().numpy() if hasattr(v, "detach") else v
                            )
            raise KeyError(name)

        params = {}
        for layer, (_, _, is_wn, has_ln) in enumerate(self.layer_shapes):
            if is_wn:
                params[f"lin{layer}"] = {
                    "v": jnp.asarray(get(f"lin{layer}.weight_v").T, dtype),
                    "g": jnp.asarray(get(f"lin{layer}.weight_g").reshape(-1), dtype),
                    "b": jnp.asarray(get(f"lin{layer}.bias"), dtype),
                }
            else:
                params[f"lin{layer}"] = {
                    "w": jnp.asarray(get(f"lin{layer}.weight").T, dtype),
                    "b": jnp.asarray(get(f"lin{layer}.bias"), dtype),
                }
            if has_ln:
                params[f"bn{layer}"] = {
                    "scale": jnp.asarray(get(f"bn{layer}.weight"), dtype),
                    "bias": jnp.asarray(get(f"bn{layer}.bias"), dtype),
                }
        return params


def decode_sdf(decoder, params, latent_vector, queries):
    """Expand one latent over N query points and run the decoder
    (ref: deep_sdf/utils.py:86-97)."""
    if latent_vector is None:
        inputs = queries
    else:
        latent_repeat = jnp.broadcast_to(
            latent_vector.reshape(1, -1), (queries.shape[0], latent_vector.size)
        )
        inputs = jnp.concatenate([latent_repeat, queries], axis=1)
    return decoder.apply(params, inputs)
