"""Per-cell tests for the streaming-knob decision table
(msd_tpu/stream_knobs.py). Every host-dependent default is pinned here
across the full {facts} x {env} matrix so a default flip (like round 4's
codec change, which broke the old host-aware test) must update exactly one
table and one test."""

import os

import pytest

from msd_tpu import stream_knobs
from msd_tpu.stream_knobs import HostFacts


def facts(cores=1, cpu=True, native=False, simd=False):
    return HostFacts(cores=cores, cpu_backend=cpu, native_decode=native,
                     simd_decode=simd)


# --- MSD_VALUE_CODEC -------------------------------------------------------

CODEC_MATRIX = [
    # (cores, native, simd) -> expected "auto" resolution
    ((1, False, False), "int8"),    # 1 core, numpy decode: round-4 A/B loss
    ((1, True, False), "int8"),     # scalar native decode: unbenchmarked
    ((1, True, True), "packed"),    # SIMD native decode: round-4 native A/B
    ((2, False, False), "packed"),  # decode thread has its own core
    ((8, False, False), "packed"),
    ((8, True, True), "packed"),
]


@pytest.mark.parametrize("cell,expected", CODEC_MATRIX)
def test_value_codec_auto_matrix(cell, expected, monkeypatch):
    monkeypatch.delenv("MSD_VALUE_CODEC", raising=False)
    cores, native, simd = cell
    f = facts(cores=cores, native=native, simd=simd)
    assert stream_knobs.resolve_value_codec("auto", f) == expected


def test_value_codec_explicit_and_env_override(monkeypatch):
    monkeypatch.delenv("MSD_VALUE_CODEC", raising=False)
    f = facts()
    # explicit codecs pass through untouched regardless of host
    for codec in ("packed", "int8", "f16"):
        assert stream_knobs.resolve_value_codec(codec, f) == codec
    # env override beats both the request and the host facts
    monkeypatch.setenv("MSD_VALUE_CODEC", "f16")
    assert stream_knobs.resolve_value_codec("auto", f) == "f16"
    assert stream_knobs.resolve_value_codec("packed", f) == "f16"
    monkeypatch.setenv("MSD_VALUE_CODEC", "auto")
    assert stream_knobs.resolve_value_codec("int8", f) == "int8"


def test_mesh_resolve_value_codec_delegates(monkeypatch):
    """mesh._resolve_value_codec is a shim over the table + real host
    facts; pin the delegation (not the host-specific outcome)."""
    from msd_tpu import mesh as mesh_mod

    monkeypatch.delenv("MSD_VALUE_CODEC", raising=False)
    monkeypatch.setattr(
        stream_knobs, "host_facts",
        lambda: facts(cores=1, native=True, simd=True),
    )
    assert mesh_mod._resolve_value_codec("auto") == "packed"
    monkeypatch.setattr(
        stream_knobs, "host_facts",
        lambda: facts(cores=1, native=False, simd=False),
    )
    assert mesh_mod._resolve_value_codec("auto") == "int8"
    assert mesh_mod._resolve_value_codec("f16") == "f16"


def test_host_facts_real():
    """host_facts() measures the actual host without blowing up, and the
    SIMD flag is consistent with the native library's own capability
    export."""
    f = stream_knobs.host_facts()
    assert f.cores >= 1
    if f.simd_decode:
        assert f.native_decode
    from msd_tpu.native import load_native

    lib = load_native()
    if lib is not None and hasattr(lib, "msd_codec_simd"):
        assert f.simd_decode == bool(lib.msd_codec_simd())
    else:
        assert not f.simd_decode


# --- MSD_STREAM_HYBRID -----------------------------------------------------

def test_hybrid_default_off(monkeypatch):
    monkeypatch.delenv("MSD_STREAM_HYBRID", raising=False)
    assert stream_knobs.hybrid_dispatch() is False
    monkeypatch.setenv("MSD_STREAM_HYBRID", "on")
    assert stream_knobs.hybrid_dispatch() is True
    monkeypatch.setenv("MSD_STREAM_HYBRID", "off")
    assert stream_knobs.hybrid_dispatch() is False


# --- MSD_OPT_FUSE_SLAB0 ----------------------------------------------------

def test_fuse_slab0_default_on(monkeypatch):
    monkeypatch.delenv("MSD_OPT_FUSE_SLAB0", raising=False)
    assert stream_knobs.fuse_slab0() is True
    monkeypatch.setenv("MSD_OPT_FUSE_SLAB0", "off")
    assert stream_knobs.fuse_slab0() is False
    monkeypatch.setenv("MSD_OPT_FUSE_SLAB0", "on")
    assert stream_knobs.fuse_slab0() is True


# --- MSD_STREAM_OPT --------------------------------------------------------

def test_opt_streaming_matrix(monkeypatch):
    monkeypatch.delenv("MSD_STREAM_OPT", raising=False)
    assert stream_knobs.opt_streaming(facts(cpu=True)) is False
    assert stream_knobs.opt_streaming(facts(cpu=False)) is True
    monkeypatch.setenv("MSD_STREAM_OPT", "on")
    assert stream_knobs.opt_streaming(facts(cpu=True)) is True
    monkeypatch.setenv("MSD_STREAM_OPT", "off")
    assert stream_knobs.opt_streaming(facts(cpu=False)) is False


# --- MSD_STREAM_DEDUP ------------------------------------------------------

DEDUP_MATRIX = [
    # (cores, cpu_backend, active_blocks) -> auto resolution
    ((8, False, 20000), True),    # the round-2 multi-core win
    ((8, False, 1000), False),    # small active set: not worth the plumbing
    ((8, True, 20000), False),    # host XLA: no MXU to starve
    ((1, False, 20000), False),   # 1-core host: round-4 A/B loss
]


@pytest.mark.parametrize("cell,expected", DEDUP_MATRIX)
def test_dedup_auto_matrix(cell, expected, monkeypatch):
    monkeypatch.delenv("MSD_STREAM_DEDUP", raising=False)
    cores, cpu, blocks = cell
    assert stream_knobs.dedup_streaming(facts(cores=cores, cpu=cpu), blocks) is expected


def test_dedup_forced(monkeypatch):
    monkeypatch.setenv("MSD_STREAM_DEDUP", "on")
    assert stream_knobs.dedup_streaming(facts(cores=1, cpu=True), 10) is True
    monkeypatch.setenv("MSD_STREAM_DEDUP", "off")
    assert stream_knobs.dedup_streaming(facts(cores=8, cpu=False), 10**6) is False


# --- MSD_OPT_SLABS ---------------------------------------------------------


def test_opt_slab_count_default_one(monkeypatch):
    """Default 1 primary slab: the whole optimistic bucket dispatches as a
    single (refine-fused) program — opt_slabs_ab.json (0.226 vs 0.273 s)."""
    monkeypatch.delenv("MSD_OPT_SLABS", raising=False)
    assert stream_knobs.opt_slab_count() == 1
    monkeypatch.setenv("MSD_OPT_SLABS", "8")
    assert stream_knobs.opt_slab_count() == 8
    monkeypatch.setenv("MSD_OPT_SLABS", "0")  # clamped
    assert stream_knobs.opt_slab_count() == 1


def test_opt_slab_granule_single_slab(monkeypatch):
    """granule(A) covers the whole bucket at the default slab count and
    the tail granule stays 8-way regardless."""
    from msd_tpu.mesh import PointEvaluator

    monkeypatch.delenv("MSD_OPT_SLABS", raising=False)
    assert PointEvaluator._opt_slab_granule(24576) >= 24576
    assert PointEvaluator._tail_slab_granule(24576) == 4096
    monkeypatch.setenv("MSD_OPT_SLABS", "8")
    assert PointEvaluator._opt_slab_granule(24576) == 4096
