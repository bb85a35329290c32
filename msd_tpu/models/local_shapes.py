"""Deep-Local-Shapes-style decoder: grid of local codes + global code.

Behavioral JAX port of networks/local_decoder.py: an 8^3 grid of local
latent codes per shape, trilinearly interpolated at query positions
(:86-165), concatenated with a global code and xyz, fed to a DeepSDF MLP
(:167-234). The per-shape Python loop of the reference's forward (:181-203)
is replaced by direct batched gathers — queries carry their shape index.

Forward signature differs from the standard decoders (as in the reference):
apply(params, xyz, global_codes, all_local_codes, indices).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from msd_tpu.models.deepsdf import DeepSDFDecoder


class LocalShapesDecoder:
    def __init__(
        self,
        latent_size: int,
        dims: Sequence[int],
        grid_size: int = 8,
        global_latent_size: int = 256,
        encoding_features: int = 1,
        encoding_sigma: float = 0.0,
        xyz_in: Sequence[int] = (),
        xyz_in_all: bool = False,
        **siren_decoder_kwargs,
    ):
        self.latent_size = int(latent_size)  # local code dim
        self.global_latent_size = int(global_latent_size)
        self.grid_size = int(grid_size)
        self.num_local_codes = self.grid_size**3
        combined = self.global_latent_size + self.latent_size
        self.decoder = DeepSDFDecoder(
            latent_size=combined,
            dims=list(dims),
            dropout=siren_decoder_kwargs.get("dropout", None),
            dropout_prob=siren_decoder_kwargs.get("dropout_prob", 0.0),
            norm_layers=siren_decoder_kwargs.get("norm_layers", ()),
            latent_in=siren_decoder_kwargs.get("latent_in", []),
            weight_norm=siren_decoder_kwargs.get("weight_norm", False),
            xyz_in_all=xyz_in_all,
            use_tanh=siren_decoder_kwargs.get("use_tanh", False),
            latent_dropout=siren_decoder_kwargs.get("latent_dropout", False),
        )

    def init(self, key):
        return self.decoder.init(key)

    def init_local_codes(self, key, num_shapes: int, std: float = 0.01):
        return std * jax.random.normal(
            key, (num_shapes, self.num_local_codes, self.latent_size)
        )

    def num_params(self, params):
        return self.decoder.num_params(params)

    # ------------------------------------------------------------------
    def trilinear_interpolate(self, xyz, grid_codes):
        """xyz [N, 3] in [-1,1]; grid_codes [G, G, G, L] -> [N, L]
        (ref: local_decoder.py:86-165)."""
        g = self.grid_size
        coords = (xyz + 1.0) * (g - 1) / 2.0
        floor = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, g - 2)
        frac = coords - floor.astype(coords.dtype)
        x0, y0, z0 = floor[:, 0], floor[:, 1], floor[:, 2]
        x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1
        xd, yd, zd = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]

        c000 = grid_codes[x0, y0, z0]
        c001 = grid_codes[x0, y0, z1]
        c010 = grid_codes[x0, y1, z0]
        c011 = grid_codes[x0, y1, z1]
        c100 = grid_codes[x1, y0, z0]
        c101 = grid_codes[x1, y0, z1]
        c110 = grid_codes[x1, y1, z0]
        c111 = grid_codes[x1, y1, z1]

        c00 = c000 * (1 - xd) + c100 * xd
        c01 = c001 * (1 - xd) + c101 * xd
        c10 = c010 * (1 - xd) + c110 * xd
        c11 = c011 * (1 - xd) + c111 * xd
        c0 = c00 * (1 - yd) + c10 * yd
        c1 = c01 * (1 - yd) + c11 * yd
        return c0 * (1 - zd) + c1 * zd

    def apply(self, params, xyz, global_codes, all_local_codes, indices, *, train=False, rng=None):
        """xyz [N,3]; global_codes [N, G_lat]; all_local_codes
        [num_shapes, grid^3, L]; indices [N] shape ids -> [N, 1]."""
        g = self.grid_size
        grids = all_local_codes.reshape(-1, g, g, g, self.latent_size)
        per_point_grids = grids[indices]  # [N, G, G, G, L]
        local = jax.vmap(lambda q, gc: self.trilinear_interpolate(q[None], gc)[0])(
            xyz, per_point_grids
        )
        combined = jnp.concatenate([global_codes, local, xyz], axis=1)
        return self.decoder.apply(params, combined, train=train, rng=rng)

    def __call__(self, params, *args, **kw):
        return self.apply(params, *args, **kw)
