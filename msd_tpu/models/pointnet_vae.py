"""Point-cloud VAE over Stage-1 latents.

Behavioral port of networks/pointnet_vae.py:9-65: a selectable point-cloud
encoder (resnet_pointnet / pointnet2 / pointnet_encoder) producing
(mu, logvar), reparameterization, and a ResidualMLPDecoder back to the
teacher-latent space. apply returns {mu, logvar, z, z_hat} (+ "bn_updates"
for encoders with BatchNorm running stats).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msd_tpu.models.pointnet import PointNetEncoder, ResnetPointnet
from msd_tpu.models.pointnet2 import PointNet2Encoder
from msd_tpu.models.residual_mlp_vae import ResidualMLPDecoder, reparameterize


class PointNetLatentVAE:
    def __init__(
        self,
        latent_dim=16,
        output_dim=256,
        encoder_type="pointnet2",
        decoder_hidden_dims=(128, 256, 256),
        decoder_blocks=1,
        decoder_activation="gelu",
        decoder_dropout=0.0,
        decoder_layernorm=True,
        use_kl=True,
    ):
        self.latent_dim = latent_dim
        self.use_kl = bool(use_kl)
        encoder_type = encoder_type.lower()
        self.encoder_type = encoder_type
        if encoder_type in ("resnet_pointnet", "pointnet"):
            self.encoder = ResnetPointnet(latent_size=latent_dim, kl_div_loss=self.use_kl)
        elif encoder_type in ("pointnet2", "pointnet++"):
            self.encoder = PointNet2Encoder(latent_size=latent_dim, kl_div_loss=self.use_kl)
        elif encoder_type == "pointnet_encoder":
            self.encoder = PointNetEncoder(latent_size=latent_dim, kl_div_loss=self.use_kl)
        else:
            raise ValueError(f"Unsupported encoder_type: {encoder_type}")
        self.decoder = ResidualMLPDecoder(
            latent_dim=latent_dim,
            output_dim=output_dim,
            hidden_dims=decoder_hidden_dims,
            num_blocks=decoder_blocks,
            activation=decoder_activation,
            dropout=decoder_dropout,
            use_layernorm=decoder_layernorm,
        )

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"encoder": self.encoder.init(k1), "decoder": self.decoder.init(k2)}

    def apply(self, params, points, *, rng, train=False):
        rng, k_enc, k_rep, k_dec = jax.random.split(rng, 4)
        enc_kwargs = {"train": train}
        if isinstance(self.encoder, PointNet2Encoder):
            enc_kwargs["rng"] = k_enc
        out, bn_updates = self.encoder.apply(params["encoder"], points, **enc_kwargs)
        if self.use_kl:
            mu, logvar = out
            z = reparameterize(k_rep, mu, logvar)
        else:
            mu = out
            logvar = jnp.zeros_like(mu)
            z = mu
        z_hat = self.decoder.apply(params["decoder"], z, train=train, rng=k_dec)
        return {"mu": mu, "logvar": logvar, "z": z, "z_hat": z_hat, "bn_updates": bn_updates}

    def decode(self, params, z, *, train=False, rng=None):
        return self.decoder.apply(params["decoder"], z, train=train, rng=rng)

    def update_bn_stats(self, params, bn_updates):
        if not bn_updates:
            return params
        return dict(
            params, encoder=self.encoder.update_bn_stats(params["encoder"], bn_updates)
        )

    def num_params(self, params):
        return sum(x.size for x in jax.tree.leaves(params))
