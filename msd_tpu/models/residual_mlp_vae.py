"""Residual MLP-VAE — the Stage-2 workhorse.

Functional JAX port (by behavior) of networks/residual_mlp_vae.py:16-275:
ResidualMLPBlock (fc-act-drop-fc-drop + residual, LayerNorm), stages/stack,
encoder with mu/logvar heads, decoder, and the composed VAE returning
{mu, logvar, z, z_hat}. ``expand_latent_to_points`` broadcasts z_hat over
per-scene point sets for the SDF-consistency loss (ref: :222-230).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msd_tpu.models.common import dropout as dropout_fn
from msd_tpu.models.common import layer_norm, layer_norm_init, linear_init


def _act(name: str):
    name = name.lower()
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"Unsupported activation: {name}")


class ResidualMLPStack:
    """Sequence of stages; each stage = optional projection + act + blocks."""

    def __init__(self, in_dim, hidden_dims, num_blocks=1, activation="gelu", dropout=0.0, use_layernorm=True):
        dims = list(hidden_dims)
        if not dims:
            raise ValueError("hidden_dims must be non-empty")
        self.in_dim = in_dim
        self.dims = dims
        self.num_blocks = int(num_blocks)
        self.activation = activation
        self.act = _act(activation)
        self.dropout = float(dropout)
        self.use_layernorm = bool(use_layernorm)

    def init(self, key):
        params = {"stages": []}
        prev = self.in_dim
        for dim in self.dims:
            key, k_proj = jax.random.split(key)
            stage = {}
            if prev != dim:
                stage["proj"] = linear_init(k_proj, prev, dim)
            blocks = []
            for _ in range(self.num_blocks):
                key, k1, k2 = jax.random.split(key, 3)
                block = {
                    "fc1": linear_init(k1, dim, dim),
                    "fc2": linear_init(k2, dim, dim),
                }
                if self.use_layernorm:
                    block["norm"] = layer_norm_init(dim)
                blocks.append(block)
            stage["blocks"] = blocks
            params["stages"].append(stage)
            prev = dim
        return params

    def apply(self, params, x, *, train=False, rng=None):
        for stage in params["stages"]:
            if "proj" in stage:
                x = x @ stage["proj"]["w"] + stage["proj"]["b"]
            x = self.act(x)
            for block in stage["blocks"]:
                residual = x
                h = x @ block["fc1"]["w"] + block["fc1"]["b"]
                h = self.act(h)
                if train and self.dropout > 0:
                    rng, sub = jax.random.split(rng)
                    h = dropout_fn(sub, h, self.dropout)
                h = h @ block["fc2"]["w"] + block["fc2"]["b"]
                if train and self.dropout > 0:
                    rng, sub = jax.random.split(rng)
                    h = dropout_fn(sub, h, self.dropout)
                x = h + residual
                if "norm" in block:
                    x = layer_norm(block["norm"], x)
        return x


class ResidualMLPEncoder:
    """Backbone + mu/logvar heads (ref: residual_mlp_vae.py:109-137)."""

    def __init__(self, input_dim=256, latent_dim=16, hidden_dims=(256, 128), num_blocks=1, activation="gelu", dropout=0.0, use_layernorm=True):
        self.backbone = ResidualMLPStack(input_dim, hidden_dims, num_blocks, activation, dropout, use_layernorm)
        self.latent_dim = latent_dim
        self.final_dim = list(hidden_dims)[-1]

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "backbone": self.backbone.init(k1),
            "mu_head": linear_init(k2, self.final_dim, self.latent_dim),
            "logvar_head": linear_init(k3, self.final_dim, self.latent_dim),
        }

    def apply(self, params, x, *, train=False, rng=None):
        h = self.backbone.apply(params["backbone"], x, train=train, rng=rng)
        mu = h @ params["mu_head"]["w"] + params["mu_head"]["b"]
        logvar = h @ params["logvar_head"]["w"] + params["logvar_head"]["b"]
        return mu, logvar


class ResidualMLPDecoder:
    """Backbone + output projection (ref: residual_mlp_vae.py:140-164)."""

    def __init__(self, latent_dim=16, output_dim=256, hidden_dims=(128, 256, 256), num_blocks=1, activation="gelu", dropout=0.0, use_layernorm=True):
        self.backbone = ResidualMLPStack(latent_dim, hidden_dims, num_blocks, activation, dropout, use_layernorm)
        self.output_dim = output_dim
        self.final_dim = list(hidden_dims)[-1]

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "backbone": self.backbone.init(k1),
            "out": linear_init(k2, self.final_dim, self.output_dim),
        }

    def apply(self, params, z, *, train=False, rng=None):
        h = self.backbone.apply(params["backbone"], z, train=train, rng=rng)
        return h @ params["out"]["w"] + params["out"]["b"]


def reparameterize(key, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(key, std.shape)


class ResidualMLPVAE:
    """Encoder + reparameterization + decoder
    (ref: residual_mlp_vae.py:167-219). apply returns
    {mu, logvar, z, z_hat}."""

    def __init__(
        self,
        input_dim=256,
        latent_dim=16,
        encoder_hidden_dims=(256, 128),
        decoder_hidden_dims=(128, 256, 256),
        num_blocks=1,
        activation="gelu",
        dropout=0.0,
        use_layernorm=True,
        use_kl=True,
    ):
        self.input_dim = input_dim
        self.latent_dim = latent_dim
        self.use_kl = bool(use_kl)
        self.encoder = ResidualMLPEncoder(
            input_dim, latent_dim, encoder_hidden_dims, num_blocks, activation, dropout, use_layernorm
        )
        self.decoder = ResidualMLPDecoder(
            latent_dim, input_dim, decoder_hidden_dims, num_blocks, activation, dropout, use_layernorm
        )

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"encoder": self.encoder.init(k1), "decoder": self.decoder.init(k2)}

    def apply(self, params, x, *, rng, train=False):
        rng, k_enc, k_rep, k_dec = jax.random.split(rng, 4)
        mu, logvar = self.encoder.apply(params["encoder"], x, train=train, rng=k_enc)
        z = reparameterize(k_rep, mu, logvar) if self.use_kl else mu
        z_hat = self.decoder.apply(params["decoder"], z, train=train, rng=k_dec)
        return {"mu": mu, "logvar": logvar, "z": z, "z_hat": z_hat}

    def decode(self, params, z, *, train=False, rng=None):
        return self.decoder.apply(params["decoder"], z, train=train, rng=rng)

    def num_params(self, params):
        return sum(x.size for x in jax.tree.leaves(params))

    # ------------------------------------------------------------------
    # torch state-dict interop (reference module naming:
    # encoder.backbone.stages.{i}.proj / .blocks.{j}.fc1/.fc2/.norm,
    # encoder.mu_head / .logvar_head, decoder.backbone..., decoder.out)
    def _named_linears(self, params):
        out = []

        def walk_stack(prefix, stack_params):
            for i, stage in enumerate(stack_params["stages"]):
                if "proj" in stage:
                    out.append((f"{prefix}.stages.{i}.proj", stage["proj"], "linear"))
                for j, block in enumerate(stage["blocks"]):
                    out.append((f"{prefix}.stages.{i}.blocks.{j}.fc1", block["fc1"], "linear"))
                    out.append((f"{prefix}.stages.{i}.blocks.{j}.fc2", block["fc2"], "linear"))
                    if "norm" in block:
                        out.append((f"{prefix}.stages.{i}.blocks.{j}.norm", block["norm"], "ln"))

        walk_stack("encoder.backbone", params["encoder"]["backbone"])
        out.append(("encoder.mu_head", params["encoder"]["mu_head"], "linear"))
        out.append(("encoder.logvar_head", params["encoder"]["logvar_head"], "linear"))
        walk_stack("decoder.backbone", params["decoder"]["backbone"])
        out.append(("decoder.out", params["decoder"]["out"], "linear"))
        return out

    def params_to_torch_state_dict(self, params):
        import numpy as np
        import torch

        sd = {}
        for name, p, kind in self._named_linears(params):
            if kind == "linear":
                sd[name + ".weight"] = torch.from_numpy(np.asarray(p["w"]).T.copy())
                sd[name + ".bias"] = torch.from_numpy(np.asarray(p["b"]).copy())
            else:
                sd[name + ".weight"] = torch.from_numpy(np.asarray(p["scale"]).copy())
                sd[name + ".bias"] = torch.from_numpy(np.asarray(p["bias"]).copy())
        return sd

    def params_from_torch_state_dict(self, state_dict, dtype=jnp.float32):
        import numpy as np

        def get(name):
            for k in (name, "module." + name):
                if k in state_dict:
                    v = state_dict[k]
                    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            raise KeyError(name)

        params = self.init(jax.random.PRNGKey(0))
        for name, p, kind in self._named_linears(params):
            if kind == "linear":
                p["w"] = jnp.asarray(get(name + ".weight").T, dtype)
                p["b"] = jnp.asarray(get(name + ".bias"), dtype)
            else:
                p["scale"] = jnp.asarray(get(name + ".weight"), dtype)
                p["bias"] = jnp.asarray(get(name + ".bias"), dtype)
        return params


def expand_latent_to_points(latent, xyz):
    """Broadcast per-scene latents over their point sets
    (ref: residual_mlp_vae.py:222-230).

    latent [B, L], xyz [B, P, 3] -> ([B*P, L], [B*P, 3]); or latent [1, L],
    xyz [N, 3] -> ([N, L], xyz).
    """
    if xyz.ndim == 3 and latent.ndim == 2:
        b, p, _ = xyz.shape
        lat = jnp.broadcast_to(latent[:, None, :], (b, p, latent.shape[-1])).reshape(-1, latent.shape[-1])
        return lat, xyz.reshape(-1, 3)
    if xyz.ndim == 2 and latent.ndim == 2 and latent.shape[0] == 1:
        return jnp.broadcast_to(latent, (xyz.shape[0], latent.shape[-1])), xyz
    return latent, xyz
