import json
import os
import subprocess
import sys

import numpy as np
import pytest

from msd_tpu.utils import geometry as geo

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rotations():
    x = np.array([1.0, 0.0, 0.0, 1.0])
    y = geo.rotate(x, gamma=np.pi / 2)
    np.testing.assert_allclose(y[:3], [0, 1, 0], atol=1e-12)
    y = geo.rotate(x, beta=np.pi / 2)
    np.testing.assert_allclose(y[:3], [0, 0, -1], atol=1e-12)


def test_scaling_helpers(rng):
    v = rng.normal(size=(200, 3)) * 3 + 7
    (vs, _), centroid, scale = geo.scale_to_unit_sphere(v, None, return_stats=True)
    assert np.linalg.norm(vs, axis=1).max() == pytest.approx(1.0, rel=1e-5)
    vr, _ = geo.rescale_unit_mesh(vs, None, shift=centroid, scale=scale)
    np.testing.assert_allclose(vr, v, atol=1e-4)

    (vc, _), centroid2, half_extent = geo.scale_to_unit_cube(v, None, return_stats=True)
    extents = vc.max(axis=0) - vc.min(axis=0)
    assert extents.max() == pytest.approx(2.0, rel=1e-5)


def test_psnr():
    assert geo.psnr(0.01) == pytest.approx(20.0)


def test_workspace_loaders(tmp_path):
    import jax

    import msd_tpu.workspace as ws
    from msd_tpu.models.deepsdf import DeepSDFDecoder
    from msd_tpu.utils import checkpoint as ckpt

    specs = {
        "NetworkArch": "deep_sdf_decoder",
        "CodeLength": 8,
        "NetworkSpecs": {"dims": [16, 16], "latent_in": [1], "weight_norm": True, "norm_layers": [0]},
    }
    exp = str(tmp_path)
    ws.save_experiment_specifications(exp, specs)
    dec = ws.build_decoder(exp)
    params = dec.init(jax.random.PRNGKey(0))
    ckpt.save_model(exp, "latest.pth", dec, params, 7)
    ckpt.save_latent_vectors(exp, "latest.pth", np.zeros((5, 8), np.float32), 7)

    dec2, params2, epoch = ws.load_decoder(exp, "latest")
    assert epoch == 7
    import jax.numpy as jnp

    x = jnp.ones((3, 11))
    np.testing.assert_allclose(
        np.asarray(dec.apply(params, x)), np.asarray(dec2.apply(params2, x)), atol=1e-6
    )
    lat = ws.load_latent_vectors(exp, "latest")
    assert lat.shape == (5, 8)


def test_label_creation_cli(tmp_path):
    csv_path = tmp_path / "meta.csv"
    csv_path.write_text(
        "id,diagnosis,age\nshape_a,1,72\nshape_b,0,65\nshape_c,,80\n"
    )
    out = tmp_path / "labels.pt"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "utils", "label_creation.py"),
         "--csv", str(csv_path), "--columns", "diagnosis", "age",
         "--normalize", "age", "--out", str(out)],
        capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    from msd_tpu.data.labels import load_labels

    labels = load_labels(str(out))
    assert set(labels) == {"shape_a", "shape_b", "shape_c"}
    np.testing.assert_allclose(labels["shape_a"], [1.0, (72 - 65) / 15])
    assert np.isnan(labels["shape_c"][0])  # missing diagnosis -> NaN


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from msd_tpu.utils import checkpoint as ckpt
    from msd_tpu.utils.optim import adam_init

    state = {"net": {"lin0": {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}}, "lat": jnp.ones((3, 2))}
    opt = adam_init(state)
    ckpt.save_orbax(str(tmp_path), "latest", state, opt, 12)
    s2, o2, epoch = ckpt.load_orbax(str(tmp_path), "latest", state, opt)
    assert epoch == 12
    np.testing.assert_allclose(np.asarray(s2["lat"]), np.ones((3, 2)))
    assert jax.tree.structure(o2) == jax.tree.structure(opt)


@pytest.mark.slow
def test_profile_epochs_hook(tmp_path):
    import jax

    from test_stage1_trainer import _specs
    from msd_tpu.train.stage1 import Stage1Trainer

    exp_dir, specs = _specs(tmp_path, NumEpochs=1, ProfileEpochs=[1])
    tr = Stage1Trainer(exp_dir)
    tr.train(num_epochs=1, eval_hooks=False)
    prof_dir = os.path.join(exp_dir, "TensorBoard", "profile")
    assert os.path.isdir(prof_dir) and len(os.listdir(prof_dir)) > 0


def test_fused_clip_adam_matches_pytree_path():
    """fused_clip_adam (one flattened pass per group) must be numerically
    identical to clip_grads_by_global_norm + adam_update, including after
    several steps (moment state round-trips through the flatten/split)."""
    import jax
    import jax.numpy as jnp

    from msd_tpu.utils.optim import (
        adam_init, adam_update, clip_grads_by_global_norm, fused_clip_adam,
    )

    rng = np.random.default_rng(0)

    def tree(scale=1.0):
        return {
            "net": {
                "lin0": {"v": jnp.asarray(rng.normal(size=(7, 5)) * scale, jnp.float32),
                          "g": jnp.asarray(rng.normal(size=(5,)) * scale, jnp.float32),
                          "b": jnp.asarray(rng.normal(size=(5,)) * scale, jnp.float32)},
                "lin1": {"w": jnp.asarray(rng.normal(size=(5, 1)) * scale, jnp.float32),
                          "b": jnp.asarray(rng.normal(size=(1,)) * scale, jnp.float32)},
            },
            "lat": jnp.asarray(rng.normal(size=(6, 4)) * scale, jnp.float32),
        }

    params_a = tree()
    params_b = jax.tree.map(lambda x: x, params_a)
    opt_a = adam_init(params_a)
    opt_b = adam_init(params_b)
    lr = {"net": 1e-3, "lat": 5e-3}
    for step in range(4):
        grads = tree(scale=3.0)  # large so the clip actually engages
        ng, norm_a = clip_grads_by_global_norm(grads["net"], 1.0)
        params_a, opt_a = adam_update(params_a, dict(grads, net=ng), opt_a, lr)
        params_b, opt_b, norms = fused_clip_adam(params_b, grads, opt_b, lr, max_norm=1.0)
        assert float(norm_a) == pytest.approx(float(norms["net"]), rel=1e-6)
    for pa, pb in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-6, atol=1e-7)
    for ma, mb in zip(jax.tree.leaves(opt_a.mu), jax.tree.leaves(opt_b.mu)):
        np.testing.assert_allclose(np.asarray(ma), np.asarray(mb), rtol=1e-6, atol=1e-7)
    # no-clip path returns empty norms and still matches
    params_a2, opt_a2 = adam_update(params_a, tree(), opt_a, lr)
    params_b2, opt_b2, norms2 = fused_clip_adam(params_b, tree(), opt_b, lr, max_norm=None)
    assert norms2 == {}
