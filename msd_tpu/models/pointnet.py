"""PointNet-family encoders.

Behavioral JAX ports of networks/pointnet_encoder.py:
* PointNetEncoder — per-point conv1d MLP (64-128-256-512) with BatchNorm +
  global average pool (the reference's ``max_pool`` attribute is actually
  AdaptiveAvgPool1d, :33) + mu/logvar/z heads (:10-68).
* ResnetPointnet — Occupancy-Networks-style 5-block pooled-concat encoder
  (:102-157), no BatchNorm.

BatchNorm is functional: ``apply(..., train=True)`` normalizes with batch
statistics and returns updated running stats through the output dict
(torch momentum=0.1 semantics); ``train=False`` uses the stored running
stats. Running stats live in ``params[...]["bn..."]["mean"/"var"]`` but
must be updated from the returned ``bn_updates`` pytree, not by gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msd_tpu.models.common import linear_init


def batch_norm_init(dim):
    return {
        "scale": jnp.ones((dim,)),
        "bias": jnp.zeros((dim,)),
        "mean": jnp.zeros((dim,)),
        "var": jnp.ones((dim,)),
    }


def batch_norm_apply(p, x, train, momentum=0.1, eps=1e-5):
    """x [..., C]; normalizes over all leading axes (matches torch BN1d/2d
    over (N, L) / (N, H, W)). Returns (y, new_stats or None)."""
    axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            "mean": (1 - momentum) * p["mean"] + momentum * mean,
            "var": (1 - momentum) * p["var"] + momentum * unbiased,
        }
    else:
        mean, var = p["mean"], p["var"]
        new_stats = None
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"], new_stats


def _linear(p, x):
    return x @ p["w"] + p["b"]


class PointNetEncoder:
    """ref: networks/pointnet_encoder.py:10-68. Input [B, N, C]."""

    def __init__(self, latent_size, input_channels=3, kl_div_loss=False):
        self.latent_size = latent_size
        self.input_channels = input_channels
        self.kl_div_loss = bool(kl_div_loss)
        self.widths = [(input_channels, 64), (64, 128), (128, 256), (256, 512)]

    def init(self, key):
        keys = jax.random.split(key, 4 + 6)
        params = {"convs": [], "bns": []}
        for i, (ci, co) in enumerate(self.widths):
            params["convs"].append(linear_init(keys[i], ci, co))
            params["bns"].append(batch_norm_init(co))
        for hi, head in enumerate(("mu", "logvar", "z")):
            k1, k2 = jax.random.split(keys[4 + hi])
            params[f"fc_{head}"] = {
                "l1": linear_init(k1, 512, 256),
                "bn": batch_norm_init(256),
                "l2": linear_init(k2, 256, self.latent_size),
            }
        return params

    def apply(self, params, x, *, train=False):
        """Returns ((mu, logvar) or z, bn_updates)."""
        bn_updates = {"convs": [], "heads": {}}
        h = x.astype(jnp.float32)
        for conv, bn in zip(params["convs"], params["bns"]):
            h = _linear(conv, h)
            h, stats = batch_norm_apply(bn, h, train)
            bn_updates["convs"].append(stats)
            h = jax.nn.relu(h)
        pooled = jnp.mean(h, axis=1)  # AdaptiveAvgPool1d(1) (ref: :33,:61)

        def head(name):
            p = params[f"fc_{name}"]
            y = _linear(p["l1"], pooled)
            y, stats = batch_norm_apply(p["bn"], y, train)
            bn_updates["heads"][name] = stats
            return _linear(p["l2"], jax.nn.relu(y))

        if self.kl_div_loss:
            return (head("mu"), head("logvar")), bn_updates
        return head("z"), bn_updates

    @staticmethod
    def update_bn_stats(params, bn_updates):
        """Functionally fold running-stat updates back into the params."""
        params = dict(params, bns=list(params["bns"]))
        for i, stats in enumerate(bn_updates.get("convs", [])):
            if stats is not None:
                params["bns"][i] = dict(params["bns"][i], **stats)
        for name, stats in bn_updates.get("heads", {}).items():
            if stats is not None:
                head = dict(params[f"fc_{name}"])
                head["bn"] = dict(head["bn"], **stats)
                params[f"fc_{name}"] = head
        return params


class ResnetPointnet:
    """ref: networks/pointnet_encoder.py:102-157. Input [B, N, 3]."""

    def __init__(self, latent_size=16, kl_div_loss=False, dim=3, hidden_dim=128):
        self.latent_size = latent_size
        self.kl_div_loss = bool(kl_div_loss)
        self.dim = dim
        self.hidden_dim = hidden_dim

    def _resnet_block_init(self, key, size_in, size_out):
        size_h = min(size_in, size_out)
        k0, k1, k2 = jax.random.split(key, 3)
        p = {
            "fc_0": linear_init(k0, size_in, size_h),
            "fc_1": linear_init(k1, size_h, size_out),
        }
        p["fc_1"]["w"] = jnp.zeros_like(p["fc_1"]["w"])  # nn.init.zeros_ (ref: :90)
        if size_in != size_out:
            sc = linear_init(k2, size_in, size_out)
            p["shortcut"] = {"w": sc["w"]}  # bias=False
        return p

    @staticmethod
    def _resnet_block_apply(p, x):
        net = _linear(p["fc_0"], jax.nn.relu(x))
        dx = _linear(p["fc_1"], jax.nn.relu(net))
        x_s = x @ p["shortcut"]["w"] if "shortcut" in p else x
        return x_s + dx

    def init(self, key):
        h = self.hidden_dim
        keys = jax.random.split(key, 10)
        params = {"fc_pos": linear_init(keys[0], self.dim, 2 * h)}
        for i in range(5):
            params[f"block_{i}"] = self._resnet_block_init(keys[1 + i], 2 * h, h)
        # heads with the reference's explicit inits (ref: :122-127)
        kc, km, kl = keys[6], keys[7], keys[8]
        params["fc_c"] = {
            "w": jax.random.normal(kc, (h, self.latent_size)),
            "b": jnp.zeros((self.latent_size,)),
        }
        params["fc_mu"] = {
            "w": jax.random.normal(km, (h, self.latent_size)),
            "b": jnp.zeros((self.latent_size,)),
        }
        params["fc_logvar"] = {
            "w": 0.01 * jax.random.normal(kl, (h, self.latent_size)),
            "b": jnp.zeros((self.latent_size,)),
        }
        return params

    def apply(self, params, p, *, train=False):
        """Returns ((mu, logvar) or z, bn_updates={} — no BN here)."""
        net = _linear(params["fc_pos"], p.astype(jnp.float32))  # [B, N, 2h]
        for i in range(5):
            net = self._resnet_block_apply(params[f"block_{i}"], net)
            if i < 4:
                pooled = jnp.max(net, axis=1, keepdims=True)
                net = jnp.concatenate([net, jnp.broadcast_to(pooled, net.shape)], axis=2)
        net = jnp.max(net, axis=1)  # [B, h]
        act = jax.nn.relu(net)
        if self.kl_div_loss:
            return (_linear(params["fc_mu"], act), _linear(params["fc_logvar"], act)), {}
        return _linear(params["fc_c"], act), {}

    @staticmethod
    def update_bn_stats(params, bn_updates):
        return params  # no BatchNorm in ResnetPointnet
