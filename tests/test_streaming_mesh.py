"""Streaming (two-level + C++) mesh path vs the plain sparse path."""

import os

import numpy as np
import pytest
from scipy.spatial import cKDTree

from msd_tpu import mesh as mesh_mod
from msd_tpu.native import load_native
from test_reconstruct_and_mesh import trained  # noqa: F401  (fixture)

needs_native = pytest.mark.skipif(load_native() is None, reason="no C++ toolchain")


@pytest.mark.slow
@needs_native
def test_streaming_matches_sparse(trained, tmp_path):  # noqa: F811
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])

    res_plain = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=193, return_mesh=True,
        evaluator=None, sparse=True,
    )
    pv, pf = res_plain
    res_stream = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=193, return_mesh=True,
        evaluator=ev, sparse=True, value_codec="f16",
    )
    sv, sf = res_stream
    # same surface: every streamed vertex has an identical twin (f16 transfer
    # perturbs interpolation by ~1e-3 voxel)
    d, _ = cKDTree(pv).query(sv)
    h = 2.0 / 192
    assert d.max() < 0.05 * h, d.max()
    assert abs(len(sv) - len(pv)) <= max(3, 0.001 * len(pv))
    # watertight + oriented
    edges = np.sort(np.concatenate([sf[:, [0, 1]], sf[:, [1, 2]], sf[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()

    # int8 value codec: vertices may slide tangentially on
    # shallow edges (ill-conditioned t), but must stay ON the zero surface:
    # the decoded-field residual at each vertex is bounded by half the
    # quantization step, and the mesh stays watertight (the global linear
    # codec is sign-consistent across blocks by construction).
    qv, qf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=193, return_mesh=True,
        evaluator=ev, sparse=True, value_codec="int8",
    )
    from msd_tpu.models.deepsdf import decode_sdf

    sub = qv[:: max(1, len(qv) // 4096)]
    resid = np.abs(np.asarray(decode_sdf(trainer.decoder, trainer.state["net"],
                                         trainer.state["lat"][2], sub)))
    # residual bound: quantization (3h/127 = 0.024h per lattice value) can
    # roughly double through edge interpolation; 0.08h leaves headroom while
    # staying far below a voxel
    assert resid.max() < 0.08 * h, resid.max()
    assert abs(len(qv) - len(pv)) <= 0.02 * len(pv), (len(qv), len(pv))
    edges = np.sort(np.concatenate([qf[:, [0, 1]], qf[:, [1, 2]], qf[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


@pytest.mark.slow
@needs_native
def test_two_level_prefilter_engages(trained):  # noqa: F811
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    # two-level engages once the stride-16 half-diagonal bound fits the
    # clamp band: 16h*sqrt(3)/2*1.3 < 0.1 needs N >= ~450 -> use N=513
    abi4, evaluated = mesh_mod._sparse_active4(latent, 513, ev, 1.3, 0.1)
    n_corner_single = (512 // 4 + 1) ** 3  # 2.1M
    # the hierarchical path must evaluate far fewer prefilter points than
    # the full stride-4 lattice
    assert evaluated < 0.5 * n_corner_single, (evaluated, n_corner_single)
    assert abi4.shape[0] > 0
    # and the resulting active set must cover the surface: mesh it
    res = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=513, return_mesh=True, evaluator=ev,
    )
    assert res is not None and res is not False
    radii = np.linalg.norm(res[0], axis=1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.06)  # tiny-model bias


@needs_native
def test_crossing_block_filter_exact(trained):  # noqa: F811
    """crossing_blocks keeps exactly the blocks whose corner lattice has
    mixed signs — the only ones that can emit marching-tets geometry."""
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    N = 193
    abi4, _ = mesh_mod._sparse_active4(latent, N, ev, 1.3, 0.1)
    assert abi4.shape[0] > 0
    abi_x = ev.crossing_blocks(latent, abi4, N)
    # reference: full block values, host-side sign check
    vals = ev.eval_blocks(latent, abi4, mesh_mod.SPARSE_BLOCK, N)
    neg = (vals < 0).reshape(abi4.shape[0], -1)
    expected = neg.any(axis=1) & ~neg.all(axis=1)
    np.testing.assert_array_equal(abi_x, abi4[expected])
    # the filter must actually prune something on a thick threshold shell
    assert abi_x.shape[0] < abi4.shape[0]


def test_sharded_point_evaluator(trained):  # noqa: F811
    """PointEvaluator(mesh=...) shards point batches over the device mesh;
    results match single-device evaluation exactly (same f32 XLA ops)."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    trainer, _ = trained
    latent = trainer.state["lat"][1]
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    ev_single = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    ev_mesh = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"], mesh=mesh)

    rng = np.random.default_rng(0)
    # odd count exercises the padding path
    pts = rng.uniform(-1, 1, size=(5003, 3)).astype(np.float32)
    a = np.asarray(ev_single.eval_points(latent, pts))
    b = np.asarray(ev_mesh.eval_points(latent, pts))
    np.testing.assert_allclose(a, b, atol=1e-6)
    # sharded evaluator drives create_mesh end-to-end
    res = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=129,
        return_mesh=True, evaluator=ev_mesh,
    )
    assert res is not None and res is not False


@needs_native
def test_streaming_ply_spill_matches_memory(trained, tmp_path):  # noqa: F811
    """The incrementally-spilled .ply must byte-equal the in-memory mesh
    written by save_ply (same header, same f32 payload)."""
    from msd_tpu.data.mesh_io import load_ply, save_ply

    trainer, _ = trained
    latent = trainer.state["lat"][2]
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    out = str(tmp_path / "spilled")
    res = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=129,
        filename=out, return_mesh=True, evaluator=ev, value_codec="f16",
    )
    assert res is not None and res is not False
    verts, faces = res
    assert os.path.isfile(out + ".ply")
    # temp spill files cleaned up
    assert not os.path.exists(out + ".ply.verts.tmp")
    assert not os.path.exists(out + ".ply.faces.tmp")
    v2, f2 = load_ply(out + ".ply")
    np.testing.assert_array_equal(np.asarray(v2, np.float32), verts)
    np.testing.assert_array_equal(f2, faces)
    # byte-identical to the post-hoc writer
    ref = str(tmp_path / "posthoc.ply")
    save_ply(ref, verts, faces)
    assert open(ref, "rb").read() == open(out + ".ply", "rb").read()


@pytest.mark.slow
@needs_native
def test_compact_cap_overflow_fallback(trained):  # noqa: F811
    """A slab whose crossing count exceeds the device-side compaction cap
    falls back to the exact two-phase path — the mesh must be identical to
    an uncapped run."""
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    ref = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=129, return_mesh=True,
        evaluator=ev, value_codec="f16",
    )
    ev_capped = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    # force the capped path at test resolution, with cap=0 so that every
    # slab overflows into the exact fallback
    ev_capped.compact_cap_min_blocks = 0
    ev_capped.compact_cap_ratio = 0.0
    got = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=129, return_mesh=True,
        evaluator=ev_capped, value_codec="f16",
    )
    np.testing.assert_array_equal(ref[0], got[0])
    np.testing.assert_array_equal(ref[1], got[1])


@pytest.mark.slow
@needs_native
def test_device_refine_matches_host(trained):  # noqa: F811
    """The fused on-device two-level refinement returns exactly the host
    path's active set (same rows, same order), and its overflow guard falls
    back cleanly."""
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    N = 513
    host_abi4, host_ev = mesh_mod._sparse_active4(latent, N, ev, 1.3, 0.1)
    dev = ev.refine_active4_device(latent, N, 1.3, 0.1)
    assert dev is not None
    dev_abi4, dev_ev = dev
    np.testing.assert_array_equal(dev_abi4, host_abi4)
    assert dev_ev == host_ev
    # overflow in either level falls back to None
    assert ev.refine_active4_device(latent, N, 1.3, 0.1, cap16=64) is None
    # small N: the single-level device program, exact parity with the host
    # single-level branch
    h_abi4, h_ev = mesh_mod._sparse_active4(latent, 129, ev, 1.3, 0.1)
    d1 = ev.refine_active4_device(latent, 129, 1.3, 0.1)
    assert d1 is not None
    np.testing.assert_array_equal(d1[0], h_abi4)
    assert d1[1] == h_ev
    # sparse criterion not met at all -> None
    assert ev.refine_active4_device(latent, 129, 1.3, 0.01) is None


@pytest.mark.slow
@needs_native
def test_packed_codec_quality(trained):  # noqa: F811
    """"packed" value codec (sign+small bitmaps + u8 magnitudes): vertices
    stay on the zero surface within the (finer-than-int8) quantization
    bound, the mesh stays watertight, and the topology matches f16."""
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    N = 193
    h = 2.0 / (N - 1)
    pv, pf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev, value_codec="f16",
    )
    qv, qf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev, value_codec="packed",
    )
    from msd_tpu.models.deepsdf import decode_sdf

    sub = qv[:: max(1, len(qv) // 4096)]
    resid = np.abs(np.asarray(decode_sdf(trainer.decoder, trainer.state["net"],
                                         trainer.state["lat"][2], sub)))
    # quantum 2.5h/255 ~ 0.0098h; shallow/saturated edges amplify it a few x
    # (still well under int8's 0.08h bound)
    assert resid.max() < 0.06 * h, resid.max()
    # same topology as f16 (sign pattern preserved by construction)
    assert len(qf) == len(pf) and abs(len(qv) - len(pv)) <= max(3, 0.001 * len(pv))
    edges = np.sort(np.concatenate([qf[:, [0, 1]], qf[:, [1, 2]], qf[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    # wire-byte accounting (bench attribution input): v2 ships 16 B sign
    # bitmap + [0, 125] needed-magnitude bytes per crossing row
    st = mesh_mod.LAST_STREAMING_STATS
    K = st["crossing_blocks"]
    assert 16 * K < st["bytes_fetched"] <= (16 + 125) * K, (st["bytes_fetched"], K)
    # magnitude-budget overflow falls back exactly
    ev2 = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    ev2.compact_cap_min_blocks = 0
    ev2.packed_mag_bytes_per_block = 1  # force Km > capM
    rv, rf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev2, value_codec="packed",
    )
    # fallback is exact f16 -> identical to the f16 mesh
    np.testing.assert_array_equal(rv, pv)
    np.testing.assert_array_equal(rf, pf)


def test_fetch_parallel_parts(trained):  # noqa: F811
    """fetch_parallel returns exactly dev[:n] for part boundaries around n."""
    import jax.numpy as jnp

    trainer, _ = trained
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    data = np.arange(10000 * 4, dtype=np.int32).reshape(10000, 4)
    dev = jnp.asarray(data)
    for n in (0, 1, 2048, 2049, 4096, 9999, 10000):
        out = ev.fetch_parallel(dev, n, part=2048)
        np.testing.assert_array_equal(out, data[:n])


@needs_native
def test_sharded_create_mesh_matches_single_device(trained, tmp_path):  # noqa: F811
    """create_mesh through a PointEvaluator sharded over an 8-device mesh
    must reproduce the single-device mesh (grid-eval scaling correctness,
    SURVEY §2.6 / VERDICT r2 weak-item 4)."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    ev_single = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    mesh8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    ev_mesh = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"], mesh=mesh8)

    res_s = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=129, return_mesh=True,
        evaluator=ev_single, sparse=True,
    )
    res_m = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=129, return_mesh=True,
        evaluator=ev_mesh, sparse=True,
    )
    sv, sf = res_s
    mv, mf = res_m
    # per-point evaluation is device-local (no cross-point reductions), so
    # the sharded grid values — and the extracted mesh — match exactly
    assert sv.shape == mv.shape and sf.shape == mf.shape
    np.testing.assert_allclose(mv, sv, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(mf, sf)


@pytest.mark.slow
@needs_native
def test_corner_dedup_matches_plain(trained, monkeypatch):  # noqa: F811
    """The corner-deduplicated slab programs (low corners + orphan list,
    rows reconstructed by gathers) must produce the IDENTICAL mesh to the
    plain 125-corner slab path: lattice coordinates are the same integers,
    so the decoder values — and every crossing edge — match bitwise."""
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    N = 129
    monkeypatch.setenv("MSD_STREAM_DEDUP", "off")
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    pv, pf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev, value_codec="packed",
    )
    ev_plain = int(mesh_mod.LAST_STREAMING_STATS["evaluated"])
    monkeypatch.setenv("MSD_STREAM_DEDUP", "on")
    ev2 = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    dv, df = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev2, value_codec="packed",
    )
    ev_dedup = int(mesh_mod.LAST_STREAMING_STATS["evaluated"])
    np.testing.assert_array_equal(pv, dv)
    np.testing.assert_array_equal(pf, df)
    # and it must actually evaluate fewer lattice points
    assert ev_dedup < 0.8 * ev_plain, (ev_dedup, ev_plain)


@pytest.mark.slow
@needs_native
def test_corner_dedup_orphan_overflow_fallback(trained, monkeypatch):  # noqa: F811
    """An orphan list larger than the cap sets the header flag and the
    consumer retries the slab with the non-dedup device program (same
    codec, compaction intact) — identical output to a non-dedup run."""
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    N = 129
    monkeypatch.setenv("MSD_STREAM_DEDUP", "off")
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    pv, pf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev, value_codec="packed",
    )
    monkeypatch.setenv("MSD_STREAM_DEDUP", "on")
    # 1 orphan slot per block cannot hold the ~9/block real orphan load,
    # so every slab's header flags and the consumer re-dispatches it
    # through the non-dedup compact program
    monkeypatch.setenv("MSD_ORPHAN_SHIFT_CAP_MILLI", "0")
    ev2 = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    dv, df = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev2, value_codec="packed",
    )
    np.testing.assert_array_equal(pv, dv)
    np.testing.assert_array_equal(pf, df)


@needs_native
def test_optimistic_single_level_matches(trained, monkeypatch):  # noqa: F811
    """The optimistic single-level path (refine count stays on device,
    slabs dispatch against the static cap bucket with device-scalar
    validity) must produce the IDENTICAL mesh to the synchronous path:
    same lattice coordinates, same decoder values, same codec."""
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    N = 129
    monkeypatch.setenv("MSD_STREAM_OPT", "off")
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    pv, pf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev, value_codec="packed",
    )
    monkeypatch.setenv("MSD_STREAM_OPT", "on")
    ev2 = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    ov, of = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev2, value_codec="packed",
    )
    # the true refined count (not the bucket) must land in the stats
    assert mesh_mod.LAST_STREAMING_STATS["active_blocks"] < 32 ** 3
    np.testing.assert_array_equal(pv, ov)
    np.testing.assert_array_equal(pf, of)
    # the fused refine+slab0 dispatch (default on above) must also match
    # the unfused optimistic path exactly
    monkeypatch.setenv("MSD_OPT_FUSE_SLAB0", "off")
    ev3 = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    uv, uf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev3, value_codec="packed",
    )
    np.testing.assert_array_equal(uv, ov)
    np.testing.assert_array_equal(uf, of)


@pytest.mark.slow
@needs_native
def test_hybrid_two_level_matches(trained, monkeypatch):  # noqa: F811
    """The hybrid two-level path (refine counts stay on device, first slab
    dispatches against the cap bucket with device-scalar validity, the
    rest sized from the resolved count — with corner dedup, the 512-class
    TPU combination) must produce the IDENTICAL mesh to the synchronous
    two-level path: same lattice coordinates, same decoder values."""
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    N = 513
    monkeypatch.setenv("MSD_STREAM_HYBRID", "off")
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    pv, pf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev, value_codec="packed",
    )
    assert mesh_mod.LAST_STREAMING_STATS["hybrid"] is False
    monkeypatch.setenv("MSD_STREAM_HYBRID", "on")
    monkeypatch.setenv("MSD_STREAM_DEDUP", "on")
    ev2 = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    hv, hf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev2, value_codec="packed",
    )
    assert mesh_mod.LAST_STREAMING_STATS["hybrid"] is True
    # the true refined count (not the 131072 bucket) must land in stats
    assert mesh_mod.LAST_STREAMING_STATS["active_blocks"] < 131072
    np.testing.assert_array_equal(pv, hv)
    np.testing.assert_array_equal(pf, hf)


@pytest.mark.slow
@needs_native
def test_optimistic_bucket_overflow_fallback(trained, monkeypatch):  # noqa: F811
    """A refine count above the optimistic DISPATCH bucket has two cells,
    both byte-identical to the non-optimistic path:

    * count <= the 2x STORAGE bucket: tail slabs dispatch over the stored
      rows (no exact re-refine) — ``overflow_tail_slabs`` lands in stats;
    * count above the storage bucket too: exact host-refined fallback.
    """
    trainer, _ = trained
    latent = trainer.state["lat"][2]
    N = 193
    monkeypatch.setenv("MSD_STREAM_OPT", "off")
    ev = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    pv, pf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev, value_codec="packed",
    )
    active = int(mesh_mod.LAST_STREAMING_STATS["active_blocks"])
    monkeypatch.setenv("MSD_STREAM_OPT", "on")
    # shrink the bucket below the real active count to force the fallback
    # (2048 * 125 pts stays tile-aligned)
    monkeypatch.setattr(mesh_mod.PointEvaluator, "A_CHUNK", 2048)
    monkeypatch.setenv("MSD_OPT_CAP_RATIO_MILLI", "1")
    assert active > 4096, "fixture too small to force overflow past the storage bucket"
    ev2 = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    ov, of = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev2, value_codec="packed",
    )
    # cap4 = 2048, storage = 4096 < active: the exact-fallback cell
    assert "overflow_tail_slabs" not in mesh_mod.LAST_STREAMING_STATS
    np.testing.assert_array_equal(pv, ov)
    np.testing.assert_array_equal(pf, of)

    # --- tail-slab cell: dispatch bucket < active <= storage bucket ---
    nb4 = (N - 1) // 4
    # pick the ratio so cap4 lands in [active/2, active): ceil-to-2048 of
    # ~0.6*active (the fixture guard above ensures 0.4*active > 2048 so the
    # rounding cannot push cap4 past active)
    target = -(-int(0.6 * active) // 2048) * 2048
    r_milli = max(1, (target * 1000) // nb4**3)
    cap4 = max(2048, -(-(nb4**3 * r_milli // 1000) // 2048) * 2048)
    assert cap4 < active <= 2 * cap4, (cap4, active)
    monkeypatch.setenv("MSD_OPT_CAP_RATIO_MILLI", str(r_milli))
    ev3 = mesh_mod.PointEvaluator(trainer.decoder, trainer.state["net"])
    tv, tf = mesh_mod.create_mesh(
        trainer.decoder, trainer.state["net"], latent, N=N, return_mesh=True,
        evaluator=ev3, value_codec="packed",
    )
    assert mesh_mod.LAST_STREAMING_STATS.get("overflow_tail_slabs", 0) >= 1
    assert mesh_mod.LAST_STREAMING_STATS["active_blocks"] == active
    np.testing.assert_array_equal(pv, tv)
    np.testing.assert_array_equal(pf, tf)


# "auto" codec resolution (and every other streaming-knob default) is
# pinned per-cell in tests/test_stream_knobs.py against the central
# decision table (msd_tpu/stream_knobs.py).
