"""Closes the train -> create_mesh -> chamfer -> reconstruct loop on the
synthetic sphere dataset (SURVEY §7 minimum slice)."""

import os

import jax
import numpy as np
import pytest

from msd_tpu import mesh as mesh_mod
from msd_tpu.data.mesh_io import load_ply
from msd_tpu.metrics.chamfer import compute_mesh_chamfer
from msd_tpu.train.reconstruct import reconstruct
from msd_tpu.train.stage1 import Stage1Trainer
from test_stage1_trainer import _specs
from conftest import make_sphere_mesh


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("trained")
    exp_dir, specs = _specs(tmp, NumEpochs=60, SamplesPerScene=1024)
    trainer = Stage1Trainer(exp_dir)
    for e in range(1, 61):
        m = trainer.train_epoch(e)
    return trainer, m


@pytest.mark.slow
def test_create_mesh_dense_and_sparse(trained, tmp_path):
    trainer, m = trained
    assert m["sdf"] < 0.03, m  # trained to a reasonable fit
    latent = trainer.state["lat"][2]  # sphere r=0.5

    out = str(tmp_path / "mesh_dense")
    res = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, filename=out, N=193,
        return_mesh=True, sparse=False,
    )
    assert res is not None and res is not False
    dv, df = res
    assert os.path.isfile(out + ".ply")

    out2 = str(tmp_path / "mesh_sparse")
    res2 = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, filename=out2, N=193,
        return_mesh=True, sparse=True,
    )
    sv, sf = res2

    # sparse and dense must produce identical surfaces (same MT vertices)
    from scipy.spatial import cKDTree

    assert sv.shape == dv.shape, (sv.shape, dv.shape)
    d, _ = cKDTree(dv).query(sv)
    assert d.max() < 1e-4, d.max()  # <1% of a voxel: f32 fusion-order noise

    # and the surface should be close to the analytic sphere r=0.5
    gt_v, gt_f = make_sphere_mesh(radius=0.5)
    cd_gt, _ = compute_mesh_chamfer((gt_v, gt_f), (dv, df), num_mesh_samples=10000)
    assert cd_gt < 5e-3, cd_gt

    # the saved ply round-trips
    pv, pf = load_ply(out + ".ply")
    assert pv.shape == dv.shape and pf.shape == df.shape


def test_sparse_eval_skips_most_queries(trained):
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    grid, stats = mesh_mod.eval_grid_sparse(
        trainer.decoder, trainer.state["net"], latent, N=193, clamp_dist=0.1
    )
    assert grid.shape == (193, 193, 193)
    assert stats["block"] > 1, stats
    assert stats["evaluated"] < 0.5 * stats["total"], stats
    dense = mesh_mod.eval_grid_dense(trainer.decoder, trainer.state["net"], latent, N=193)
    # identical zero-crossing structure: grids agree wherever |sdf| is small
    mask = np.abs(dense) < 0.02
    np.testing.assert_allclose(grid[mask], dense[mask], atol=1e-5)
    assert ((grid < 0) == (dense < 0)).mean() > 0.9999


def test_reconstruct_latent_optimization(trained):
    trainer, _ = trained
    ds = trainer.dataset
    idx = 3
    pos = ds.pos[idx, : ds.pos_counts[idx]]
    neg = ds.neg[idx, : ds.neg_counts[idx]]
    loss_hist, latent = reconstruct(
        trainer.decoder,
        trainer.state["net"],
        num_iterations=120,
        latent_size=trainer.latent_size,
        test_sdf=[pos, neg],
        stat=0.01,
        clamp_dist=0.1,
        num_samples=512,
        lr=5e-3,
        l2reg=True,
        return_loss_hist=True,
    )
    assert len(loss_hist) == 120
    assert loss_hist[-1] < loss_hist[0] * 0.7
    assert latent.shape == (1, trainer.latent_size)
    # reconstructed latent should be close in decode: mesh it and compare
    res = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=64, return_mesh=True
    )
    assert res is not None and res is not False


def test_reconstruct_code_bound_and_dist_penalty(trained):
    trainer, _ = trained
    ds = trainer.dataset
    pos = ds.pos[0, : ds.pos_counts[0]]
    neg = ds.neg[0, : ds.neg_counts[0]]
    _, latent = reconstruct(
        trainer.decoder, trainer.state["net"], 30, trainer.latent_size,
        [pos, neg], 0.01, 0.1, num_samples=256, lr=5e-3,
        code_bound=0.05,
        dist_mean=np.zeros(trainer.latent_size), dist_std=np.ones(trainer.latent_size),
        dist_weight=0.1,
    )
    assert float(np.linalg.norm(np.asarray(latent))) <= 0.05 + 1e-5


@pytest.mark.slow
def test_reconstruct_batch_matches_single_and_shards(trained):
    """reconstruct_batch fits all shapes in one program; sharded over a
    virtual 8-device mesh it produces working latents for every shape."""
    from jax.sharding import Mesh

    from msd_tpu.train.reconstruct import reconstruct_batch

    trainer, _ = trained
    ds = trainer.dataset
    shapes = [
        (ds.pos[i, : ds.pos_counts[i]], ds.neg[i, : ds.neg_counts[i]])
        for i in range(3)
    ]
    losses, latents = reconstruct_batch(
        trainer.decoder, trainer.state["net"], 120, trainer.latent_size,
        shapes, 0.01, 0.1, num_samples=512, lr=5e-3, l2reg=True,
    )
    assert losses.shape == (3,) and latents.shape == (3, trainer.latent_size)
    # each fitted latent decodes to a near-zero SDF loss on its own samples
    single_losses = []
    for (pos, neg), lat in zip(shapes, latents):
        hist, _ = reconstruct(
            trainer.decoder, trainer.state["net"], 120, trainer.latent_size,
            [pos, neg], 0.01, 0.1, num_samples=512, lr=5e-3, l2reg=True,
            return_loss_hist=True,
        )
        single_losses.append(hist[-1])
    # batched fits reach the same quality as the sequential reference path
    assert np.all(losses < np.array(single_losses) * 1.5 + 5e-3), (losses, single_losses)

    # sharded: 3 shapes pad to 8 across the virtual device mesh
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    losses_sh, latents_sh = reconstruct_batch(
        trainer.decoder, trainer.state["net"], 60, trainer.latent_size,
        shapes, 0.01, 0.1, num_samples=512, lr=5e-3, l2reg=True, mesh=mesh,
    )
    assert losses_sh.shape == (3,) and latents_sh.shape == (3, trainer.latent_size)
    assert np.isfinite(latents_sh).all()
    assert np.all(losses_sh < 0.1)


def test_interactive_html_export(trained, tmp_path):
    """The HTML latent explorer (interactive_visualization_latent_to_shape
    notebook parity) is a single self-contained file with decodable frame
    payloads for every requested dim/step."""
    import json as _json
    import re

    from msd_tpu.explorer import export_interactive_html

    trainer, _ = trained
    out = str(tmp_path / "explorer.html")
    export_interactive_html(
        trainer.decoder, trainer.state["net"], trainer.state["lat"][2], out,
        dims=[0, 1], steps=3, delta=0.05, N=49,
    )
    text = open(out).read()
    assert "__PAYLOAD__" not in text and "__TITLE__" not in text
    data = _json.loads(re.search(r"const DATA = (.*?);\n", text).group(1))
    assert data["dims"] == [0, 1]
    assert set(data["frames"]) == {"0", "1"}
    assert len(data["frames"]["0"]) == 3
    # base + center frames carry real meshes (trained sphere decoder)
    assert data["base"] is not None and data["base"]["nv"] > 0
    assert data["frames"]["1"][1]["nv"] == data["base"]["nv"]
    # quantized payload decodes to the advertised sizes
    import base64

    import numpy as _np

    q = _np.frombuffer(base64.b64decode(data["base"]["v"]), dtype="<u2")
    assert q.shape[0] == data["base"]["nv"] * 3
