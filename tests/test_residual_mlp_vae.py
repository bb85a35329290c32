import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msd_tpu.models.residual_mlp_vae import (
    ResidualMLPVAE,
    expand_latent_to_points,
)


def test_vae_shapes_and_determinism():
    vae = ResidualMLPVAE(input_dim=32, latent_dim=8, encoder_hidden_dims=(32, 16), decoder_hidden_dims=(16, 32))
    params = vae.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 32)).astype(np.float32))
    out = vae.apply(params, x, rng=jax.random.PRNGKey(1))
    assert out["mu"].shape == (10, 8)
    assert out["logvar"].shape == (10, 8)
    assert out["z"].shape == (10, 8)
    assert out["z_hat"].shape == (10, 32)
    # reparameterization: same rng -> same z; different rng -> different z
    out2 = vae.apply(params, x, rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out["z"]), np.asarray(out2["z"]))
    out3 = vae.apply(params, x, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out["z"]), np.asarray(out3["z"]))
    # mu/logvar are deterministic
    np.testing.assert_allclose(np.asarray(out["mu"]), np.asarray(out3["mu"]))


def test_use_kl_false_passes_mu():
    vae = ResidualMLPVAE(input_dim=16, latent_dim=4, encoder_hidden_dims=(16,), decoder_hidden_dims=(16,), use_kl=False)
    params = vae.init(jax.random.PRNGKey(0))
    x = jnp.ones((3, 16))
    out = vae.apply(params, x, rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["z"]), np.asarray(out["mu"]))


@pytest.mark.slow
def test_vae_trains_autoencoding():
    """The VAE should be able to reconstruct teacher latents."""
    vae = ResidualMLPVAE(input_dim=16, latent_dim=8, encoder_hidden_dims=(64, 32), decoder_hidden_dims=(32, 64), use_kl=True)
    params = vae.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    # teacher latents on a 2-D manifold
    t = rng.normal(size=(128, 2)).astype(np.float32)
    teacher = np.concatenate([t, t * 0.5, np.tanh(t), t**2, t, t * 0.1, np.sin(t), t], axis=1)

    from msd_tpu.losses.vae import vae_loss

    def loss_fn(p, key):
        out = vae.apply(p, jnp.asarray(teacher), rng=key)
        total, recon, kl = vae_loss(out["z_hat"], jnp.asarray(teacher), out["mu"], out["logvar"], 1.0, 1e-4)
        return total, recon

    @jax.jit
    def step(p, opt_m, key):
        (total, recon), g = jax.value_and_grad(loss_fn, has_aux=True)(p, key)
        p = jax.tree.map(lambda a, b: a - 0.005 * b, p, g)
        return p, total, recon

    first = None
    for i in range(200):
        params, total, recon = step(params, None, jax.random.fold_in(jax.random.PRNGKey(1), i))
        if first is None:
            first = float(recon)
    assert float(recon) < first * 0.5, (first, float(recon))


def test_expand_latent_to_points():
    lat = jnp.arange(8.0).reshape(2, 4)
    xyz = jnp.ones((2, 5, 3))
    l2, x2 = expand_latent_to_points(lat, xyz)
    assert l2.shape == (10, 4) and x2.shape == (10, 3)
    np.testing.assert_allclose(np.asarray(l2[:5]), np.tile(np.arange(4.0), (5, 1)))

    lat1 = jnp.ones((1, 4))
    xyzN = jnp.ones((7, 3))
    l3, x3 = expand_latent_to_points(lat1, xyzN)
    assert l3.shape == (7, 4)
