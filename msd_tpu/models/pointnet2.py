"""PointNet++ set-abstraction encoder.

Behavioral JAX port of networks/pointnet2_encoder.py:6-173: farthest-point
sampling, radius ball query, grouped conv2d MLPs with BatchNorm, and max
pooling, ending in a global set abstraction and mu/logvar/z heads.

FPS is a `lax.fori_loop` (the reference's python loop, :25-39, is also
sequential — FPS is inherently iterative); ball query uses the reference's
sort trick (:42-53) with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msd_tpu.models.common import linear_init
from msd_tpu.models.pointnet import batch_norm_apply, batch_norm_init, _linear


def square_distance(src, dst):
    """[B, S, 3] x [B, N, 3] -> [B, S, N] (ref: :6-11)."""
    return (
        jnp.sum(src**2, axis=-1, keepdims=True)
        + jnp.sum(dst**2, axis=-1)[:, None, :]
        - 2.0 * src @ dst.transpose(0, 2, 1)
    )


def farthest_point_sample(key, xyz, npoint):
    """[B, N, 3] -> [B, npoint] indices (ref: :25-39)."""
    b, n, _ = xyz.shape
    start = jax.random.randint(key, (b,), 0, n)

    def body(i, carry):
        centroids, distance, farthest = carry
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # [B,1,3]
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)  # [B, N]
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1)
        return centroids, distance, farthest

    centroids = jnp.zeros((b, npoint), jnp.int32)
    distance = jnp.full((b, n), 1e10)
    centroids, _, _ = jax.lax.fori_loop(0, npoint, body, (centroids, distance, start))
    return centroids


def index_points(points, idx):
    """points [B, N, C], idx [B, ...] -> [B, ..., C] (ref: :14-22)."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


def query_ball_point(radius, nsample, xyz, new_xyz):
    """[B, S] centers -> [B, S, nsample] neighbor indices (ref: :42-53)."""
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    sqrdists = square_distance(new_xyz, xyz)  # [B, S, N]
    group_idx = jnp.broadcast_to(jnp.arange(n)[None, None, :], (b, s, n))
    group_idx = jnp.where(sqrdists > radius * radius, n, group_idx)
    group_idx = jnp.sort(group_idx, axis=-1)[:, :, :nsample]
    group_first = jnp.broadcast_to(group_idx[:, :, :1], group_idx.shape)
    group_idx = jnp.where(group_idx == n, group_first, group_idx)
    # if even the first is n (no neighbors), clamp to 0
    return jnp.minimum(group_idx, n - 1)


def sample_and_group(key, npoint, radius, nsample, xyz, points):
    """(ref: :56-67)."""
    fps_idx = farthest_point_sample(key, xyz, npoint)
    new_xyz = jax.vmap(lambda p, i: p[i])(xyz, fps_idx)  # [B, S, 3]
    idx = query_ball_point(radius, nsample, xyz, new_xyz)  # [B, S, K]
    grouped_xyz = jax.vmap(lambda p, i: p[i])(xyz, idx)  # [B, S, K, 3]
    grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = jax.vmap(lambda p, i: p[i])(points, idx)
        new_points = jnp.concatenate([grouped_xyz, grouped_points], axis=-1)
    else:
        new_points = grouped_xyz
    return new_xyz, new_points


class PointNet2Encoder:
    """ref: networks/pointnet2_encoder.py:119-173. Input [B, N, >=3]."""

    SA_CONFIG = [
        dict(npoint=512, radius=0.2, nsample=32, mlp=[64, 64, 128]),
        dict(npoint=128, radius=0.4, nsample=64, mlp=[128, 128, 256]),
        dict(npoint=None, radius=None, nsample=None, mlp=[256, 512, 1024]),
    ]

    def __init__(self, latent_size, input_channels=3, kl_div_loss=False):
        self.latent_size = latent_size
        self.input_channels = input_channels
        self.kl_div_loss = bool(kl_div_loss)

    def init(self, key):
        params = {"sa": []}
        in_ch = self.input_channels
        keys = jax.random.split(key, 8)
        for si, cfg in enumerate(self.SA_CONFIG):
            layer = {"convs": [], "bns": []}
            last = in_ch if si == 0 else self.SA_CONFIG[si - 1]["mlp"][-1] + 3
            kk = jax.random.split(keys[si], len(cfg["mlp"]))
            for ci, co in enumerate(cfg["mlp"]):
                layer["convs"].append(linear_init(kk[ci], last, co))
                layer["bns"].append(batch_norm_init(co))
                last = co
            params["sa"].append(layer)
        for hi, head in enumerate(("mu", "logvar", "z")):
            k1, k2 = jax.random.split(keys[3 + hi])
            params[f"fc_{head}"] = {
                "l1": linear_init(k1, 1024, 512),
                "bn": batch_norm_init(512),
                "l2": linear_init(k2, 512, self.latent_size),
            }
        return params

    def _sa_apply(self, layer, new_points, train, bn_updates):
        """new_points [B, S, K, C] -> pooled [B, S, C_out]."""
        h = new_points
        stats_list = []
        for conv, bn in zip(layer["convs"], layer["bns"]):
            h = _linear(conv, h)
            h, stats = batch_norm_apply(bn, h, train)
            stats_list.append(stats)
            h = jax.nn.relu(h)
        bn_updates.append(stats_list)
        return jnp.max(h, axis=2)  # max over the K group dim

    def apply(self, params, x, *, train=False, rng=None):
        """Returns ((mu, logvar) or z, bn_updates)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x = x.astype(jnp.float32)
        xyz = x[:, :, :3]
        points = x[:, :, 3:] if x.shape[2] > 3 else None
        bn_updates = {"sa": [], "heads": {}}

        k1, k2 = jax.random.split(rng)
        # SA1
        cfg = self.SA_CONFIG[0]
        new_xyz, new_points = sample_and_group(k1, cfg["npoint"], cfg["radius"], cfg["nsample"], xyz, points)
        l1_points = self._sa_apply(params["sa"][0], new_points, train, bn_updates["sa"])
        # SA2
        cfg = self.SA_CONFIG[1]
        new_xyz2, new_points2 = sample_and_group(k2, cfg["npoint"], cfg["radius"], cfg["nsample"], new_xyz, l1_points)
        l2_points = self._sa_apply(params["sa"][1], new_points2, train, bn_updates["sa"])
        # SA3 (group all, ref: :70-80)
        grouped = jnp.concatenate(
            [new_xyz2[:, None, :, :], l2_points[:, None, :, :]], axis=-1
        )  # [B, 1, S, 3+C]
        l3 = self._sa_apply(params["sa"][2], grouped, train, bn_updates["sa"])  # [B, 1, 1024]
        global_feat = l3[:, 0, :]

        def head(name):
            p = params[f"fc_{name}"]
            y = _linear(p["l1"], global_feat)
            y, stats = batch_norm_apply(p["bn"], y, train)
            bn_updates["heads"][name] = stats
            return _linear(p["l2"], jax.nn.relu(y))

        if self.kl_div_loss:
            return (head("mu"), head("logvar")), bn_updates
        return head("z"), bn_updates

    @staticmethod
    def update_bn_stats(params, bn_updates):
        """Functionally fold running-stat updates back into the params."""
        params = dict(params, sa=[dict(l, bns=list(l["bns"])) for l in params["sa"]])
        for si, stats_list in enumerate(bn_updates.get("sa", [])):
            for bi, stats in enumerate(stats_list):
                if stats is not None:
                    params["sa"][si]["bns"][bi] = dict(params["sa"][si]["bns"][bi], **stats)
        for name, stats in bn_updates.get("heads", {}).items():
            if stats is not None:
                head = dict(params[f"fc_{name}"])
                head["bn"] = dict(head["bn"], **stats)
                params[f"fc_{name}"] = head
        return params
