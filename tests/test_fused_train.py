"""Fused training-kernel gradients vs jax.grad of the XLA loss (oracle).

The fused kernel hand-implements reverse-mode through clamped-L1 + eikonal
(including the second-order ū/t chain); these tests check it against an
independently written XLA loss differentiated by jax.grad, in Pallas
interpret mode with float32 weights so tolerances are tight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msd_tpu.losses.sdf import eikonal_loss
from msd_tpu.models import build_decoder
from msd_tpu.ops.fused_train import fused_point_grads, supports_fused_train

CLAMP = 0.1


def make_case(weight_norm=False, latent_in=(2,), seed=0, B=4, P=256, L=16, width=64, nl=5):
    decoder = build_decoder(
        "deep_sdf_decoder",
        L,
        dict(
            dims=[width] * nl,
            dropout=[],
            dropout_prob=0.0,
            norm_layers=list(range(nl)) if weight_norm else [],
            latent_in=list(latent_in),
            xyz_in_all=False,
            use_tanh=False,
            latent_dropout=False,
            weight_norm=weight_norm,
        ),
    )
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    params = decoder.init(k1)
    lat = 0.3 * jax.random.normal(k2, (B, L))
    xyz = jax.random.uniform(k3, (B, P, 3), minval=-1, maxval=1)
    # gt mixing in- and out-of-band values so the clamp mask is exercised
    gt = 0.25 * jax.random.normal(k4, (B, P, 1))
    return decoder, params, lat, xyz, gt


def oracle_loss(decoder, params, lat, xyz, gt, use_eikonal):
    """Replicates Stage1Trainer.point_losses' sdf+eikonal terms."""
    B, P = xyz.shape[:2]
    num_total = B * P
    expanded = jnp.repeat(lat, P, axis=0)
    xyz_flat = xyz.reshape(-1, 3)
    gt_c = jnp.clip(gt.reshape(-1, 1), -CLAMP, CLAMP)

    def pred_from_xyz(x):
        inputs = jnp.concatenate([expanded, x], axis=1)
        return jnp.clip(decoder.apply(params, inputs), -CLAMP, CLAMP)

    if use_eikonal:
        pred, vjp_fn = jax.vjp(pred_from_xyz, xyz_flat)
        (grads_xyz,) = vjp_fn(jnp.ones_like(pred))
        eik = eikonal_loss(grads_xyz)
    else:
        pred = pred_from_xyz(xyz_flat)
        eik = 0.0
    sdf_l = jnp.sum(jnp.abs(pred - gt_c)) / num_total
    return sdf_l + eik, (sdf_l, eik)


@pytest.mark.slow
@pytest.mark.parametrize("use_eikonal", [False, True])
@pytest.mark.parametrize("weight_norm", [False, True])
def test_fused_grads_match_xla(use_eikonal, weight_norm):
    decoder, params, lat, xyz, gt = make_case(weight_norm=weight_norm)
    assert supports_fused_train(decoder, xyz.shape[1])
    B, P = xyz.shape[:2]

    (total, (sdf_o, eik_o)), (g_net_o, g_lat_o) = jax.value_and_grad(
        lambda p, z: oracle_loss(decoder, p, z, xyz, gt, use_eikonal),
        argnums=(0, 1),
        has_aux=True,
    )(params, lat)

    g_net, g_lat, aux = fused_point_grads(
        decoder, params, lat, xyz, gt, CLAMP, use_eikonal, B * P,
        dtype=jnp.float32, interpret=True,
    )

    np.testing.assert_allclose(float(aux["sdf"]), float(sdf_o), rtol=1e-5, atol=1e-7)
    if use_eikonal:
        np.testing.assert_allclose(float(aux["eikonal"]), float(eik_o), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_lat), np.asarray(g_lat_o), rtol=2e-4, atol=1e-7)
    flat_o = jax.tree_util.tree_flatten_with_path(g_net_o)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_net)[0]
    assert len(flat_o) == len(flat_f)
    for (path_o, leaf_o), (path_f, leaf_f) in zip(flat_o, flat_f):
        assert path_o == path_f
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_o), rtol=2e-4, atol=1e-7,
            err_msg=str(path_o),
        )


@pytest.mark.slow
def test_fused_grads_eikonal_subsample():
    """EikonalNumPoints gating: fused kernel with eik_points=E must match an
    oracle that runs eikonal on the first E points of each scene only."""
    decoder, params, lat, xyz, gt = make_case(P=512)
    B, P = xyz.shape[:2]
    E = 256  # one 256-lane tile of the two per scene

    def oracle_sub(p, z):
        num_total = B * P
        expanded = jnp.repeat(z, P, axis=0)
        expanded_e = jnp.repeat(z, E, axis=0)
        xyz_flat = xyz.reshape(-1, 3)
        gt_c = jnp.clip(gt.reshape(-1, 1), -CLAMP, CLAMP)

        def pred_fn(exp, x):
            return jnp.clip(decoder.apply(p, jnp.concatenate([exp, x], axis=1)), -CLAMP, CLAMP)

        pred = pred_fn(expanded, xyz_flat)
        _, vjp_fn = jax.vjp(lambda x: pred_fn(expanded_e, x), xyz[:, :E].reshape(-1, 3))
        (grads_xyz,) = vjp_fn(jnp.ones((B * E, 1)))
        eik = eikonal_loss(grads_xyz)
        sdf_l = jnp.sum(jnp.abs(pred - gt_c)) / num_total
        return sdf_l + eik, (sdf_l, eik)

    (_, (sdf_o, eik_o)), (g_net_o, g_lat_o) = jax.value_and_grad(
        oracle_sub, argnums=(0, 1), has_aux=True
    )(params, lat)

    g_net, g_lat, aux = fused_point_grads(
        decoder, params, lat, xyz, gt, CLAMP, True, B * P,
        dtype=jnp.float32, interpret=True, eik_points=E,
    )
    np.testing.assert_allclose(float(aux["sdf"]), float(sdf_o), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(aux["eikonal"]), float(eik_o), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_lat), np.asarray(g_lat_o), rtol=2e-4, atol=1e-7)
    for (po, lo), (pf, lf) in zip(
        jax.tree_util.tree_flatten_with_path(g_net_o)[0],
        jax.tree_util.tree_flatten_with_path(g_net)[0],
    ):
        assert po == pf
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lo), rtol=2e-4, atol=1e-7, err_msg=str(po)
        )

    # full-eikonal fused run must differ (the gate is actually doing something)
    _, _, aux_full = fused_point_grads(
        decoder, params, lat, xyz, gt, CLAMP, True, B * P,
        dtype=jnp.float32, interpret=True,
    )
    assert abs(float(aux_full["eikonal"]) - float(aux["eikonal"])) > 0


def test_fused_grads_no_latent_in():
    decoder, params, lat, xyz, gt = make_case(latent_in=())
    assert supports_fused_train(decoder, xyz.shape[1])
    B, P = xyz.shape[:2]
    (_, (sdf_o, eik_o)), (g_net_o, g_lat_o) = jax.value_and_grad(
        lambda p, z: oracle_loss(decoder, p, z, xyz, gt, True),
        argnums=(0, 1),
        has_aux=True,
    )(params, lat)
    g_net, g_lat, aux = fused_point_grads(
        decoder, params, lat, xyz, gt, CLAMP, True, B * P,
        dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(float(aux["sdf"]), float(sdf_o), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(aux["eikonal"]), float(eik_o), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_lat), np.asarray(g_lat_o), rtol=2e-4, atol=1e-7)
    for (p_o, leaf_o), (p_f, leaf_f) in zip(
        jax.tree_util.tree_flatten_with_path(g_net_o)[0],
        jax.tree_util.tree_flatten_with_path(g_net)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_o), rtol=2e-4, atol=1e-7, err_msg=str(p_o)
        )


def test_fused_grads_weighted_pad_mask():
    """weights=[1,1,1,0] (pad-and-mask mesh batches): losses and every
    gradient must equal an oracle over the REAL scenes only; the pad
    scene's latent row must receive exactly zero gradient."""
    decoder, params, lat, xyz, gt = make_case(B=4)
    B, P = xyz.shape[:2]
    n_real = 3
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    num_total = n_real * P

    def oracle(p, z):
        zr = z[:n_real]
        expanded = jnp.repeat(zr, P, axis=0)
        xyz_flat = xyz[:n_real].reshape(-1, 3)
        gt_c = jnp.clip(gt[:n_real].reshape(-1, 1), -CLAMP, CLAMP)

        def pred_fn(x):
            return jnp.clip(decoder.apply(p, jnp.concatenate([expanded, x], axis=1)), -CLAMP, CLAMP)

        pred, vjp_fn = jax.vjp(pred_fn, xyz_flat)
        (grads_xyz,) = vjp_fn(jnp.ones_like(pred))
        eik = eikonal_loss(grads_xyz)
        sdf_l = jnp.sum(jnp.abs(pred - gt_c)) / num_total
        return sdf_l + eik, (sdf_l, eik)

    (_, (sdf_o, eik_o)), (g_net_o, g_lat_o) = jax.value_and_grad(
        oracle, argnums=(0, 1), has_aux=True
    )(params, lat)

    from msd_tpu.ops.fused_train import fused_point_grads_t

    xyzgt_t = jnp.concatenate([xyz, gt], axis=2).transpose(2, 0, 1)
    g_net, g_lat, aux = fused_point_grads_t(
        decoder, params, lat, xyzgt_t, CLAMP, True, num_total,
        dtype=jnp.float32, interpret=True, weights=w, n_real=n_real,
    )
    np.testing.assert_allclose(float(aux["sdf"]), float(sdf_o), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(aux["eikonal"]), float(eik_o), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_lat), np.asarray(g_lat_o), rtol=2e-4, atol=1e-7)
    assert float(jnp.max(jnp.abs(g_lat[n_real:]))) == 0.0
    for (po, lo), (pf, lf) in zip(
        jax.tree_util.tree_flatten_with_path(g_net_o)[0],
        jax.tree_util.tree_flatten_with_path(g_net)[0],
    ):
        assert po == pf
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lo), rtol=2e-4, atol=1e-7, err_msg=str(po)
        )


def test_fused_grads_weighted_no_eikonal():
    """Weighted kernel with use_eikonal=False (the default spec): must not
    divide by a zero eikonal count (code-review regression) and must match
    the masked-L1 oracle."""
    decoder, params, lat, xyz, gt = make_case(B=4)
    B, P = xyz.shape[:2]
    n_real = 3
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    num_total = n_real * P

    def oracle(z):
        expanded = jnp.repeat(z[:n_real], P, axis=0)
        pred = jnp.clip(
            decoder.apply(params, jnp.concatenate(
                [expanded, xyz[:n_real].reshape(-1, 3)], axis=1)),
            -CLAMP, CLAMP,
        )
        gt_c = jnp.clip(gt[:n_real].reshape(-1, 1), -CLAMP, CLAMP)
        return jnp.sum(jnp.abs(pred - gt_c)) / num_total

    v_o, g_lat_o = jax.value_and_grad(oracle)(lat)

    from msd_tpu.ops.fused_train import fused_point_grads_t

    xyzgt_t = jnp.concatenate([xyz, gt], axis=2).transpose(2, 0, 1)
    _, g_lat, aux = fused_point_grads_t(
        decoder, params, lat, xyzgt_t, CLAMP, False, num_total,
        dtype=jnp.float32, interpret=True, weights=w, n_real=n_real,
    )
    np.testing.assert_allclose(float(aux["sdf"]), float(v_o), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_lat), np.asarray(g_lat_o), rtol=2e-4, atol=1e-7)
    assert float(jnp.max(jnp.abs(g_lat[n_real:]))) == 0.0


@pytest.mark.slow
def test_fused_grads_sharded_matches_single():
    """shard_map'd fused kernel over the 8-device CPU mesh == the
    single-device kernel (decoder grads psum'ed, latent rows sharded),
    including a padded batch masked via per-scene weights."""
    import jax as _jax
    from jax.sharding import Mesh

    from msd_tpu.ops.fused_train import fused_point_grads_sharded, fused_point_grads_t

    decoder, params, lat, xyz, gt = make_case(B=8)
    B, P = xyz.shape[:2]
    mesh = Mesh(np.array(_jax.devices()[:8]), ("data",))
    xyzgt_t = jnp.concatenate([xyz, gt], axis=2).transpose(2, 0, 1)

    # unweighted
    g1, d1, a1 = fused_point_grads_t(
        decoder, params, lat, xyzgt_t, CLAMP, True, B * P,
        dtype=jnp.float32, interpret=True,
    )
    g8, d8, a8 = fused_point_grads_sharded(
        decoder, params, lat, xyzgt_t, CLAMP, True, B * P, mesh,
        dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(float(a8["sdf"]), float(a1["sdf"]), rtol=1e-6)
    np.testing.assert_allclose(float(a8["eikonal"]), float(a1["eikonal"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d1), rtol=1e-5, atol=1e-8)
    for l1_, l8_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(np.asarray(l8_), np.asarray(l1_), rtol=1e-5, atol=1e-8)

    # padded: 6 real + 2 pad scenes == single-device over the 6 real
    n_real = 6
    w = (jnp.arange(B) < n_real).astype(jnp.float32)
    num_total = n_real * P
    g1p, d1p, a1p = fused_point_grads_t(
        decoder, params, lat[:n_real],
        jnp.concatenate([xyz[:n_real], gt[:n_real]], axis=2).transpose(2, 0, 1),
        CLAMP, True, num_total, dtype=jnp.float32, interpret=True,
    )
    g8p, d8p, a8p = fused_point_grads_sharded(
        decoder, params, lat, xyzgt_t, CLAMP, True, num_total, mesh,
        dtype=jnp.float32, interpret=True, weights=w, n_real=n_real,
    )
    np.testing.assert_allclose(float(a8p["sdf"]), float(a1p["sdf"]), rtol=1e-6)
    np.testing.assert_allclose(float(a8p["eikonal"]), float(a1p["eikonal"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d8p[:n_real]), np.asarray(d1p), rtol=1e-5, atol=1e-8)
    assert float(jnp.max(jnp.abs(d8p[n_real:]))) == 0.0
    for l1_, l8_ in zip(jax.tree.leaves(g1p), jax.tree.leaves(g8p)):
        np.testing.assert_allclose(np.asarray(l8_), np.asarray(l1_), rtol=1e-5, atol=1e-8)


def test_supports_gating():
    decoder, *_ = make_case()
    assert supports_fused_train(decoder, 256)
    assert not supports_fused_train(decoder, 100)  # tile divisibility
    dec_ln = build_decoder(
        "deep_sdf_decoder", 16,
        dict(dims=[64] * 5, dropout=[], dropout_prob=0.0, norm_layers=[1],
             latent_in=[2], xyz_in_all=False, use_tanh=False,
             latent_dropout=False, weight_norm=False),
    )
    assert not supports_fused_train(dec_ln, 256)  # LayerNorm in chain


def test_fused_point_grads_t_matches_rows_layout():
    """The SoA entry point (xyzgt_t [4, B, P]) must produce identical
    losses and gradients to the AoS one."""
    from msd_tpu.ops.fused_train import fused_point_grads_t

    decoder, params, lat, xyz, gt = make_case(weight_norm=True)
    B, P = xyz.shape[:2]
    g_net_a, g_lat_a, aux_a = fused_point_grads(
        decoder, params, lat, xyz, gt, CLAMP, True, B * P,
        dtype=jnp.float32, interpret=True,
    )
    xyzgt_t = jnp.concatenate([xyz, gt], axis=2).transpose(2, 0, 1)  # [4, B, P]
    g_net_b, g_lat_b, aux_b = fused_point_grads_t(
        decoder, params, lat, xyzgt_t, CLAMP, True, B * P,
        dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(float(aux_a["sdf"]), float(aux_b["sdf"]), rtol=1e-6)
    np.testing.assert_allclose(float(aux_a["eikonal"]), float(aux_b["eikonal"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_lat_a), np.asarray(g_lat_b), rtol=1e-6)
    for la, lb in zip(jax.tree.leaves(g_net_a), jax.tree.leaves(g_net_b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6)


def test_fused_sdf_l1_stage2_consistency():
    """make_fused_sdf_l1 (the Stage-2 SDF-consistency custom_vjp) must
    match the XLA formulation Stage2Trainer uses — value AND gradients
    w.r.t. both z_hat (flows into the VAE) and the decoder params
    (TrainSDFDecoder case) — including through a downstream chain."""
    from msd_tpu.ops.fused_train import make_fused_sdf_l1

    decoder, params, lat, xyz, gt = make_case(weight_norm=True)
    B, P = xyz.shape[:2]
    gt_c = jnp.clip(gt, -CLAMP, CLAMP)

    def xla_term(p, z):
        expanded = jnp.repeat(z, P, axis=0)
        pred = decoder.apply(p, jnp.concatenate([expanded, xyz.reshape(-1, 3)], axis=1))
        pred = jnp.clip(pred, -CLAMP, CLAMP)
        return jnp.sum(jnp.abs(pred - gt_c.reshape(-1, 1))) / (B * P)

    fused = make_fused_sdf_l1(decoder, CLAMP, dtype=jnp.float32, interpret=True)

    # chain a nonlinear consumer so the custom_vjp cotangent is not 1.0
    def chained(fn):
        return lambda p, z: jnp.tanh(3.0 * fn(p, z)) * 2.0

    (v_o, (g_net_o, g_lat_o)) = jax.value_and_grad(
        chained(xla_term), argnums=(0, 1))(params, lat)
    (v_f, (g_net_f, g_lat_f)) = jax.value_and_grad(
        chained(lambda p, z: fused(p, z, xyz, gt)), argnums=(0, 1))(params, lat)

    np.testing.assert_allclose(float(v_f), float(v_o), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_lat_f), np.asarray(g_lat_o), rtol=2e-4, atol=1e-7)
    flat_o = jax.tree_util.tree_flatten_with_path(g_net_o)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_net_f)[0]
    assert len(flat_o) == len(flat_f)
    for (path_o, leaf_o), (path_f, leaf_f) in zip(flat_o, flat_f):
        assert path_o == path_f
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_o), rtol=2e-4, atol=1e-7,
            err_msg=str(path_o),
        )


def test_fused_sdf_l1_frozen_decoder():
    """train_net=False (TrainSDFDecoder=false, the flagship Stage-2 config):
    loss and dlat must still match the XLA oracle exactly while the decoder
    cotangents come back as exact zeros (frozen — never consumed)."""
    from msd_tpu.ops.fused_train import make_fused_sdf_l1

    decoder, params, lat, xyz, gt = make_case(weight_norm=True)
    B, P = xyz.shape[:2]
    gt_c = jnp.clip(gt, -CLAMP, CLAMP)

    def xla_term(z):
        expanded = jnp.repeat(z, P, axis=0)
        pred = decoder.apply(params, jnp.concatenate([expanded, xyz.reshape(-1, 3)], axis=1))
        pred = jnp.clip(pred, -CLAMP, CLAMP)
        return jnp.sum(jnp.abs(pred - gt_c.reshape(-1, 1))) / (B * P)

    fused = make_fused_sdf_l1(
        decoder, CLAMP, dtype=jnp.float32, interpret=True, train_net=False
    )

    def chained(fn):
        return lambda z: jnp.tanh(3.0 * fn(z)) * 2.0

    v_o, g_lat_o = jax.value_and_grad(chained(xla_term))(lat)

    def chained_fused(p, z):
        return jnp.tanh(3.0 * fused(p, z, xyz, gt)) * 2.0

    v_f, (g_net_f, g_lat_f) = jax.value_and_grad(
        chained_fused, argnums=(0, 1)
    )(params, lat)

    np.testing.assert_allclose(float(v_f), float(v_o), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_lat_f), np.asarray(g_lat_o), rtol=2e-4, atol=1e-7)
    for leaf in jax.tree.leaves(g_net_f):
        assert float(jnp.max(jnp.abs(leaf))) == 0.0
