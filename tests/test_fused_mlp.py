"""Fused Pallas decoder kernel — exactness vs the XLA decoder (interpreter
mode on CPU; the real-TPU path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msd_tpu.models.deepsdf import DeepSDFDecoder
from msd_tpu.ops.fused_mlp import FusedDecoderSpec, fused_eval_points


CONFIGS = [
    # standard flagship: weight-norm (none active: norm_layers empty), latent_in
    dict(dims=[64] * 8, latent_in=[4], weight_norm=True, norm_layers=[]),
    # weight-norm active on all layers
    dict(dims=[32, 32, 32], latent_in=[2], weight_norm=True, norm_layers=[0, 1, 2]),
    # LayerNorm path
    dict(dims=[32, 32], latent_in=[], weight_norm=False, norm_layers=[0, 1]),
    # use_tanh on last linear
    dict(dims=[32, 32], latent_in=[1], weight_norm=False, norm_layers=[], use_tanh=True),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_fused_matches_xla(cfg):
    latent_size = 16
    dec = DeepSDFDecoder(latent_size, **cfg)
    params = dec.init(jax.random.PRNGKey(0))
    latent = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (latent_size,))
    xyz = jax.random.uniform(jax.random.PRNGKey(2), (300, 3), minval=-1, maxval=1)

    out = fused_eval_points(
        dec, params, latent, xyz, dtype=jnp.float32, tile=256, interpret=True
    )
    assert out is not None
    inputs = jnp.concatenate([jnp.broadcast_to(latent, (300, latent_size)), xyz], axis=1)
    ref = dec.apply(params, inputs)[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_unsupported_configs_return_none():
    dec = DeepSDFDecoder(8, dims=[16, 16], latent_in=[], weight_norm=False, norm_layers=[], xyz_in_all=True)
    params = dec.init(jax.random.PRNGKey(0))
    spec_fails = False
    try:
        FusedDecoderSpec(dec, params)
    except ValueError:
        spec_fails = True
    assert spec_fails
    out = fused_eval_points(dec, params, jnp.zeros(8), jnp.zeros((4, 3)), interpret=True)
    assert out is None


def test_latent_consts_shapes():
    dec = DeepSDFDecoder(8, dims=[32] * 4, latent_in=[2], weight_norm=True, norm_layers=[])
    params = dec.init(jax.random.PRNGKey(0))
    spec = FusedDecoderSpec(dec, params, jnp.float32)
    consts = spec.latent_consts(jnp.ones(8))
    assert len(consts) == 5
    assert consts[0].shape == (32, 1)
    # layer 2 (latent_in) gets a latent contribution; layer 1 is bias-only
    np.testing.assert_allclose(
        np.asarray(consts[1]).ravel(), np.asarray(params["lin1"]["b"]), atol=1e-6
    )
