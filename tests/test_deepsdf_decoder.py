"""DeepSDF decoder parity vs the reference torch implementation.

The reference decoder (networks/deep_sdf_decoder.py) is imported as a test
oracle (not copied) — we convert our JAX params into its state_dict format
and require identical outputs.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msd_tpu.models import build_decoder
from msd_tpu.models.deepsdf import DeepSDFDecoder, decode_sdf

REF = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "networks")), reason="reference repo not mounted"
)


def _torch_decoder(latent_size, **kw):
    sys.path.insert(0, REF)
    try:
        import importlib

        mod = importlib.import_module("networks.deep_sdf_decoder")
        return mod.Decoder(latent_size, **kw)
    finally:
        sys.path.pop(0)


CONFIGS = [
    # standard DeepSDF: weight-norm on all layers, latent_in skip
    dict(
        dims=[64, 64, 64, 64, 64, 64, 64, 64],
        dropout=[0, 1, 2, 3, 4, 5, 6, 7],
        dropout_prob=0.2,
        norm_layers=[0, 1, 2, 3, 4, 5, 6, 7],
        latent_in=[4],
        weight_norm=True,
        xyz_in_all=False,
        use_tanh=False,
        latent_dropout=True,
    ),
    # the repo's minimal_eikonal config: weight_norm=true but norm_layers=[]
    dict(
        dims=[32, 32, 32],
        dropout=[],
        dropout_prob=0.2,
        norm_layers=[],
        latent_in=[2],
        weight_norm=True,
        xyz_in_all=False,
        use_tanh=False,
        latent_dropout=False,
    ),
    # LayerNorm path + xyz_in_all + use_tanh
    dict(
        dims=[48, 48, 48, 48],
        dropout=None,
        dropout_prob=0.0,
        norm_layers=[0, 1, 2],
        latent_in=[],
        weight_norm=False,
        xyz_in_all=True,
        use_tanh=True,
        latent_dropout=False,
    ),
]


@pytest.mark.slow
@needs_reference
@pytest.mark.parametrize("cfg", CONFIGS)
def test_forward_parity_vs_reference(cfg):
    import torch

    latent_size = 16
    dec = DeepSDFDecoder(latent_size, **cfg)
    params = dec.init(jax.random.PRNGKey(0))

    tdec = _torch_decoder(latent_size, **cfg)
    sd = dec.params_to_torch_state_dict(params)
    missing, unexpected = tdec.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # weight-norm modules keep a derived .weight buffer in state_dict; it is
    # recomputed from weight_g/weight_v so 'missing' entries must only be those
    assert all(".weight" in m for m in missing), missing
    tdec.eval()

    x = np.random.default_rng(1).normal(size=(64, latent_size + 3)).astype(np.float32)
    ours = np.asarray(dec.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tdec(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6, rtol=2e-5)


@needs_reference
def test_roundtrip_from_torch_state_dict():
    import torch

    cfg = CONFIGS[0]
    latent_size = 16
    tdec = _torch_decoder(latent_size, **cfg)
    tdec.eval()
    dec = DeepSDFDecoder(latent_size, **cfg)
    params = dec.params_from_torch_state_dict(tdec.state_dict())
    x = np.random.default_rng(2).normal(size=(32, latent_size + 3)).astype(np.float32)
    ours = np.asarray(dec.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tdec(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6, rtol=2e-5)


def test_registry_and_shapes():
    dec = build_decoder(
        "deep_sdf_decoder",
        8,
        dict(dims=[32, 32], latent_in=[1], weight_norm=True, norm_layers=[0, 1]),
    )
    params = dec.init(jax.random.PRNGKey(0))
    out = dec.apply(params, jnp.zeros((5, 11)))
    assert out.shape == (5, 1)
    # output in [-1, 1] because of the final tanh
    assert np.all(np.abs(np.asarray(out)) <= 1.0)


def test_latent_in_dimension_bookkeeping():
    # dims[4] - dims[0] output shrink before the latent_in layer
    dec = DeepSDFDecoder(256, dims=[512] * 8, latent_in=[4], weight_norm=True, norm_layers=list(range(8)))
    in_dim, out_dim, _, _ = dec.layer_shapes[3]
    assert out_dim == 512 - 259
    in_dim4, _, _, _ = dec.layer_shapes[4]
    assert in_dim4 == 512


def test_dropout_only_in_train_mode():
    cfg = dict(dims=[32, 32], dropout=[0, 1], dropout_prob=0.5, latent_in=[], weight_norm=False, norm_layers=[])
    dec = DeepSDFDecoder(8, **cfg)
    params = dec.init(jax.random.PRNGKey(0))
    x = jnp.ones((16, 11))
    eval1 = dec.apply(params, x)
    eval2 = dec.apply(params, x)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))
    tr1 = dec.apply(params, x, train=True, rng=jax.random.PRNGKey(1))
    tr2 = dec.apply(params, x, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))


def test_decode_sdf_expansion():
    dec = DeepSDFDecoder(4, dims=[16, 16], latent_in=[], weight_norm=False, norm_layers=[])
    params = dec.init(jax.random.PRNGKey(0))
    latent = jnp.arange(4.0)
    queries = jnp.zeros((7, 3))
    out = decode_sdf(dec, params, latent, queries)
    assert out.shape == (7, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out)[0:1].repeat(7, 0), atol=1e-6)
