"""SIREN / LocalShapes / PointNet-family networks: shape checks and torch
parity where feasible."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msd_tpu.models import build_decoder
from msd_tpu.models.local_shapes import LocalShapesDecoder
from msd_tpu.models.pointnet import PointNetEncoder, ResnetPointnet
from msd_tpu.models.pointnet2 import PointNet2Encoder, farthest_point_sample, query_ball_point
from msd_tpu.models.pointnet_vae import PointNetLatentVAE
from msd_tpu.models.siren import SirenDecoder

REF = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


SIREN_CFG = dict(
    dims=[64, 64, 64, 64],
    encoding_features=1,
    encoding_sigma=0.0,
    dropout=[],
    dropout_prob=0.0,
    norm_layers=[],
    latent_in=[2],
    weight_norm=False,
    xyz_in=[2],
    xyz_in_all=False,
    latent_dropout=False,
    nonlinearity="sine",
)


@pytest.mark.parametrize("nl", ["sine", "relu", "sine_relu_line", "sine_relu_plane"])
def test_siren_shapes_and_nonlinearities(nl):
    cfg = dict(SIREN_CFG, nonlinearity=nl)
    dec = SirenDecoder(10, **cfg)
    params = dec.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 13)).astype(np.float32))
    out = dec.apply(params, x)
    assert out.shape == (32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_siren_fourier_encoding():
    cfg = dict(SIREN_CFG, encoding_features=16, encoding_sigma=2.0, xyz_in_all=True)
    dec = SirenDecoder(10, **cfg)
    params = dec.init(jax.random.PRNGKey(0))
    assert params["encoding_B"].shape == (16, 3)
    x = jnp.ones((8, 13))
    out = dec.apply(params, x)
    assert out.shape == (8, 1)


@needs_reference
def test_siren_parity_vs_reference():
    import torch

    sys.path.insert(0, REF)
    try:
        import importlib

        mod = importlib.import_module("networks.siren_decoder")
    finally:
        sys.path.pop(0)

    cfg = dict(SIREN_CFG)
    tdec = mod.Decoder(latent_size=10, **cfg)
    tdec.eval()

    dec = SirenDecoder(10, **cfg)
    params = dec.init(jax.random.PRNGKey(0))
    # copy torch weights into our params (plain linear layers)
    sd = tdec.state_dict()
    for i in range(dec.num_layers - 1):
        params[f"lin{i}"]["w"] = jnp.asarray(sd[f"decoder.lin{i}.weight"].numpy().T)
        params[f"lin{i}"]["b"] = jnp.asarray(sd[f"decoder.lin{i}.bias"].numpy())

    x = np.random.default_rng(1).normal(size=(40, 13)).astype(np.float32)
    ours = np.asarray(dec.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tdec(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6, rtol=1e-4)


def test_registry_siren_and_local():
    dec = build_decoder("siren_decoder", 8, dict(dims=[32, 32], latent_in=[1], xyz_in=[1], nonlinearity="relu"))
    params = dec.init(jax.random.PRNGKey(0))
    assert dec.apply(params, jnp.ones((4, 11))).shape == (4, 1)

    ldec = build_decoder(
        "local_decoder", 8,
        dict(dims=[64, 64], grid_size=4, global_latent_size=16, latent_in=[]),
    )
    assert isinstance(ldec, LocalShapesDecoder)


def test_local_shapes_decoder_interpolation():
    dec = LocalShapesDecoder(8, dims=[32, 32], grid_size=4, global_latent_size=16, latent_in=[])
    params = dec.init(jax.random.PRNGKey(0))
    locals_ = dec.init_local_codes(jax.random.PRNGKey(1), num_shapes=3)
    assert locals_.shape == (3, 64, 8)
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (20, 3)).astype(np.float32))
    gc = jnp.zeros((20, 16))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 3, 20))
    out = dec.apply(params, xyz, gc, locals_, idx)
    assert out.shape == (20, 1)
    # interpolation at a grid corner returns exactly that corner's code
    g = 4
    corner_xyz = jnp.asarray([[-1.0, -1.0, -1.0]])
    grid = locals_.reshape(3, g, g, g, 8)
    interp = dec.trilinear_interpolate(corner_xyz, grid[0])
    np.testing.assert_allclose(np.asarray(interp[0]), np.asarray(grid[0, 0, 0, 0]), atol=1e-6)


@pytest.mark.slow
def test_pointnet_encoders_shapes():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(4, 256, 3)).astype(np.float32))
    for enc in (
        PointNetEncoder(8, kl_div_loss=True),
        ResnetPointnet(8, kl_div_loss=True),
    ):
        params = enc.init(jax.random.PRNGKey(0))
        (mu, logvar), bn = enc.apply(params, pts, train=True)
        assert mu.shape == (4, 8) and logvar.shape == (4, 8)

    enc2 = PointNet2Encoder(8, kl_div_loss=True)
    params = enc2.init(jax.random.PRNGKey(0))
    (mu, logvar), bn = enc2.apply(params, pts, train=True, rng=jax.random.PRNGKey(1))
    assert mu.shape == (4, 8)
    assert np.isfinite(np.asarray(mu)).all()


def test_fps_and_ball_query():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(2, 128, 3)).astype(np.float32))
    idx = farthest_point_sample(jax.random.PRNGKey(0), xyz, 16)
    assert idx.shape == (2, 16)
    # FPS picks distinct points
    assert len(np.unique(np.asarray(idx[0]))) == 16
    centers = jax.vmap(lambda p, i: p[i])(xyz, idx)
    g = query_ball_point(0.5, 8, xyz, centers)
    assert g.shape == (2, 16, 8)
    # all neighbors within radius (or duplicated nearest fallback)
    nb = jax.vmap(lambda p, i: p[i])(xyz, g.reshape(2, -1)).reshape(2, 16, 8, 3)
    d = np.linalg.norm(np.asarray(nb - centers[:, :, None, :]), axis=-1)
    assert (d <= 0.5 + 1e-5).mean() > 0.9


@pytest.mark.slow
def test_pointnet_latent_vae():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(4, 128, 3)).astype(np.float32))
    for enc_type in ("resnet_pointnet", "pointnet_encoder", "pointnet2"):
        vae = PointNetLatentVAE(latent_dim=6, output_dim=16, encoder_type=enc_type,
                                decoder_hidden_dims=(16, 16))
        params = vae.init(jax.random.PRNGKey(0))
        out = vae.apply(params, pts, rng=jax.random.PRNGKey(1), train=True)
        assert out["mu"].shape == (4, 6)
        assert out["z_hat"].shape == (4, 16)
        assert "bn_updates" in out
