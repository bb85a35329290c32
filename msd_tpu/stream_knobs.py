"""Central decision table for the streaming-mesher env knobs.

The streaming extraction path (msd_tpu/mesh.py) grew five interacting env
knobs whose defaults are HOST-dependent (core count, JAX backend, native
decoder availability), each justified by a separate same-window A/B.  Every
host-dependent default is decided HERE — one pure function per knob over an
explicit :class:`HostFacts` — so the contract lives in one place and is
unit-tested per cell (tests/test_stream_knobs.py).  Structural, per-call
conditions (cap fits, device-sourced active set, resolution class) stay at
the call sites in mesh.py; only the host/env policy lives here.

Knob -> default -> evidence (all A/Bs same-window on the measurement host;
JSONs at the repo root, discussion in PERF.md "knob -> evidence" table):

=====================  =======================================  =========================================
env var                default                                  evidence
=====================  =======================================  =========================================
MSD_VALUE_CODEC        auto: "packed" when the SIMD native
                       decoder is present or >= 2 cores;
                       else "int8"                              grid512_codec_ab.json (packed loses 1-core
                                                                numpy decode), grid512_codec_native_ab.json
                                                                (native AVX-512 decode flips it back),
                                                                grid512_codec_v2_ab.json (derived-needed
                                                                wire: -19.5% bytes, wall 0.686 -> 0.61-0.66)
MSD_STREAM_HYBRID      off                                      grid512_ab.json (hybrid 0.915 vs 0.787 s
                                                                median on the 1-core host)
MSD_STREAM_DEDUP       auto: on only for >= 16384-block
                       active sets off-CPU with >= 2 cores      grid512_dedup_ab.json (0.865 vs 0.760 s
                                                                on 1 core; round-2 win was multi-core)
MSD_STREAM_OPT         auto: on off-CPU (any core count)        fuse_slab0_ab.json context; the optimistic
                                                                path removes relay RTs, not host work
MSD_OPT_FUSE_SLAB0     on                                       fuse_slab0_ab.json (0.258 -> 0.246 s median)
MSD_OPT_SLABS          1 (single fused slab; whole N~256
                       extraction = ONE device program)         opt_slabs_ab.json (0.226 vs 0.273 s median)
MSD_EPOCH_BLOCK        8 (see train/epoch_blocks.py)            stage2_step_ab.json (46.3 -> 30.3 ms)
=====================  =======================================  =========================================
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class HostFacts:
    """The host properties the knob defaults condition on."""

    cores: int            # os.cpu_count() (0/None -> 1)
    cpu_backend: bool     # jax.default_backend() == "cpu"
    native_decode: bool   # native lib loads and exports msd_decode_packed
    simd_decode: bool     # ... and its AVX-512 row decoder compiled in


def host_facts() -> HostFacts:
    """Measure the real host. Import-light: jax/native load lazily."""
    import jax

    from msd_tpu.native import load_native

    lib = load_native()
    native = lib is not None and hasattr(lib, "msd_decode_packed")
    simd = False
    if native and hasattr(lib, "msd_codec_simd"):
        simd = bool(lib.msd_codec_simd())
    return HostFacts(
        cores=os.cpu_count() or 1,
        cpu_backend=jax.default_backend() == "cpu",
        native_decode=native,
        simd_decode=simd,
    )


def resolve_value_codec(requested: str, facts: HostFacts) -> str:
    """Streaming value wire format after the MSD_VALUE_CODEC env override
    and the host-aware "auto" default.

    "packed" (v2: sign bitmap + u8 magnitudes over the derived needed
    set, grid512_codec_v2_ab.json) ships ~1.9x fewer
    bytes than "int8" but costs a host-side decode. The decode is ~4 ms
    with the native AVX-512 decoder (grid512_codec_native_ab.json) vs
    130-290 ms with numpy — on a 1-core host the numpy decode serializes
    with the mesher thread and loses the byte advantage
    (grid512_codec_ab.json), so:

    * >= 2 cores: packed (decode thread has its own core; round-2 A/B).
    * 1 core + SIMD native decoder: packed (the round-4 native-decode A/B).
    * 1 core + scalar-only native decoder: int8 — the scalar C++ loop is
      untested territory (ADVICE r4: all packed-wins evidence is from the
      VEXPANDPS path), so the benchmarked default stands until a
      scalar-decode A/B exists.
    * 1 core, no native: int8.
    """
    requested = os.environ.get("MSD_VALUE_CODEC", requested)
    if requested != "auto":
        return requested
    if facts.cores >= 2:
        return "packed"
    return "packed" if (facts.native_decode and facts.simd_decode) else "int8"


def hybrid_dispatch() -> bool:
    """Two-level optimistic (hybrid) dispatch for the 512-class.
    DEFAULT OFF: same-window A/B on the 1-core host measured it slower at
    the median (0.915 vs 0.787 s) and far noisier at p90 (grid512_ab.json)
    — the fixed first slab saves the refine round trip but serializes the
    remaining slab sizing behind a count fetch the relay can stall. Kept
    behind the knob for relay conditions where the trade reverses."""
    return os.environ.get("MSD_STREAM_HYBRID", "off") == "on"


def fuse_slab0() -> bool:
    """Fuse the first streaming slab into the optimistic refine dispatch
    (N~256 class). DEFAULT ON: removes one relay program-serialization
    slot; same-window A/B 0.258 -> 0.246 s median (fuse_slab0_ab.json)."""
    return os.environ.get("MSD_OPT_FUSE_SLAB0", "on") != "off"


def opt_streaming(facts: HostFacts) -> bool:
    """Optimistic (no count round trip) streaming for the single-level
    class. "auto" engages off-CPU only: the point is hiding relay round
    trips, which the in-process CPU backend doesn't have, while the cap
    bucket's padded evals cost real time there. on/off force."""
    mode = os.environ.get("MSD_STREAM_OPT", "auto")
    if mode == "off":
        return False
    if mode == "on":
        return True
    return not facts.cpu_backend


def opt_slab_count() -> int:
    """Primary slab count for the optimistic single-level (N~256) class.
    DEFAULT 1: the whole cap bucket is one slab, which (with
    MSD_OPT_FUSE_SLAB0 on) fuses the ENTIRE extraction — refine + eval +
    crossing filter + encode — into one device program. Same-window ABBA
    on the bench field (opt_slabs_ab.json): median 0.226 vs 0.273 s,
    min 0.217 vs 0.232, identical output. Each extra slab costs ~20 ms of
    relay dispatch serialization; the mesher overlap finer slabs buy is
    ~2 ms at this class's crossing counts. Storage-bucket overflow tails
    keep the 8-way granule regardless (mesh.py _tail_slab_granule)."""
    return max(1, int(os.environ.get("MSD_OPT_SLABS", 1)))


def dedup_streaming(facts: HostFacts, active_blocks: int) -> bool:
    """Corner dedup across adjacent blocks (per-shift slab programs;
    512-class two-level path only — structural gates stay in mesh.py).
    "auto" engages only for large active sets off-CPU with >= 2 cores:
    on host XLA the gather/scatter reassembly is a wash-to-loss (no MXU
    to starve), and on the 1-core host the tripled result plumbing
    serializes with the mesher thread (grid512_dedup_ab.json: median
    0.865 vs 0.760 s). "on" always forces, "off" always disables."""
    mode = os.environ.get("MSD_STREAM_DEDUP", "auto")
    if mode == "off":
        return False
    if mode == "on":
        return True
    return active_blocks >= 16384 and not facts.cpu_backend and facts.cores >= 2
