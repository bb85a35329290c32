"""Dense-grid SDF evaluation + mesh extraction (create_mesh).

Equivalent of deep_sdf/mesh.py:21-165, redesigned for TPU:

* The grid query coordinates are generated *on device* from linear indices
  (no host->device coordinate transfers; the reference uploads 2^18-point
  chunks per iteration, deep_sdf/mesh.py:59-68).
* `eval_grid_dense` runs the whole N^3 evaluation as a jitted lax.map over
  fixed-size chunks.
* `eval_grid_sparse` is the TPU-first fast path: evaluate a coarse corner
  lattice, then refine only blocks that can contain the zero level-set
  (|sdf| at some corner below the block diagonal — sound for 1-Lipschitz
  clamped SDFs, with a safety factor for imperfect networks). This skips
  ~98% of queries for typical shapes while producing an identical surface
  (validated in tests by Chamfer between sparse- and dense-extracted
  meshes).
* Marching tetrahedra + PLY write on host (replaces skimage + plyfile).
"""

from __future__ import annotations

import functools
import logging
import math
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msd_tpu.data.mesh_io import save_ply
from msd_tpu.ops.marching_cubes import marching_tetrahedra, marching_tetrahedra_blocks


def _packed_needed_mask(sign: np.ndarray) -> np.ndarray:
    """[K, 125] bool: corners incident to a sign change within their
    CLIPPED 3^3 lattice window — needed = dilate(neg) & dilate(pos),
    separable axis dilations. Bit-exact numpy mirror of the encoder's
    window-adjacency matmul (`_encode_compact_body`) and of the native
    decoder's u64 dilation (codec.cpp)."""
    K = sign.shape[0]
    s = sign.reshape(K, 5, 5, 5)

    def dil3(x):
        for ax in (1, 2, 3):
            y = x.copy()
            sl_lo = [slice(None)] * 4
            sl_hi = [slice(None)] * 4
            sl_lo[ax] = slice(1, None)
            sl_hi[ax] = slice(None, -1)
            y[tuple(sl_lo)] |= x[tuple(sl_hi)]
            y[tuple(sl_hi)] |= x[tuple(sl_lo)]
            x = y
        return x

    return (dil3(s) & dil3(~s)).reshape(K, 125)


def _decode_packed_host(bitmaps: np.ndarray, mags: np.ndarray, K: int, q: float,
                        pts: int = 125) -> np.ndarray:
    """Expand the "packed" wire codec v2 (16-byte sign bitmap per row +
    dense u8 magnitudes over the row's NEEDED corners, see
    `_encode_compact_body`) to the [K, pts] float32 corner grid. The
    needed set — corners incident to a sign change within their 3^3
    window — is re-derived here from the sign bitmap, so it never ships.
    Corners outside it decode to the codec cap q*255: their magnitude is
    never read by crossing-edge interpolation. (v1 shipped an explicit
    16-byte present bitmap per row; it measured identical to the derived
    needed set on trained fields and was dropped in round 5 — 19% of the
    wire bytes.)

    Uses the native C++ decoder when available (AVX-512 path: ~4 ms vs
    numpy's 130-290 ms for the 28 625 crossing rows of the converged N=513
    bench field — the ~72.8k-"block shell" figures elsewhere count ACTIVE
    blocks of the same field; decode only ever sees the crossing rows.
    That decode cost is what made the packed codec lose its round-4
    1-core A/B); falls back to numpy.
    """
    import ctypes

    from msd_tpu.native import load_native

    if bitmaps.shape[0] < K:
        # current call sites fetch exactly K rows; a shorter buffer must be
        # a Python-level error, not an out-of-bounds read inside C++
        raise ValueError(
            f"packed codec: {bitmaps.shape[0]} bitmap rows for K={K} blocks"
        )
    bitmaps = np.ascontiguousarray(bitmaps[:K], np.uint8)
    mags = np.ascontiguousarray(mags, np.uint8)
    lib = load_native()
    if pts == 125 and lib is not None and hasattr(lib, "msd_decode_packed"):
        out = np.empty((K, pts), np.float32)
        used = lib.msd_decode_packed(
            bitmaps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            mags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(K),
            ctypes.c_int64(mags.size),
            ctypes.c_int32(pts),
            ctypes.c_float(q),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if used != mags.size:
            # derived needed sets and the magnitude stream disagree —
            # corrupt transfer; surface it rather than mesh garbage
            raise ValueError(
                f"packed codec stream mismatch: {used} magnitudes consumed, "
                f"{mags.size} shipped"
            )
        return out
    if pts != 125:
        raise ValueError(f"packed codec requires 125-corner blocks, got {pts}")
    sign = np.unpackbits(
        np.ascontiguousarray(bitmaps[:, :16]), axis=1, bitorder="little"
    )[:, :pts].astype(bool)
    present = _packed_needed_mask(sign)
    if int(present.sum()) != mags.size:
        raise ValueError(
            f"packed codec stream mismatch: {int(present.sum())} magnitudes "
            f"consumed, {mags.size} shipped"
        )
    vals = np.full((K, pts), q * np.float32(255.0), np.float32)
    vals[present] = mags.astype(np.float32) * q
    return np.where(sign, -vals, vals)


def _linear_to_coords(linear_idx, N):
    """Linear index -> xyz coordinate in [-1, 1], index ordering matching
    the reference (x slowest, z fastest; deep_sdf/mesh.py:38-51)."""
    voxel_size = 2.0 / (N - 1)
    z = linear_idx % N
    y = (linear_idx // N) % N
    x = (linear_idx // (N * N)) % N
    coords = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)
    return coords * voxel_size - 1.0


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _eval_grid_chunks(decoder, params, latent, N, max_batch):
    """All-device dense grid evaluation; returns flat padded sdf [C*max_batch]."""
    total = N * N * N
    num_chunks = (total + max_batch - 1) // max_batch

    def eval_chunk(chunk_idx):
        base = chunk_idx * max_batch
        linear = base + jnp.arange(max_batch)
        xyz = _linear_to_coords(linear, N)
        latent_rep = jnp.broadcast_to(latent.reshape(1, -1), (max_batch, latent.size))
        inputs = jnp.concatenate([latent_rep, xyz], axis=1)
        return decoder.apply(params, inputs)[:, 0]

    sdf = jax.lax.map(eval_chunk, jnp.arange(num_chunks))
    return sdf.reshape(-1)


def _refine_class(N: int, safety: float, clamp_dist: float):
    """Resolution class for block refinement: (h, nb4, two_level), or None
    when block refinement doesn't apply at this N (non-divisible lattice,
    or a block diagonal too large for the Lipschitz bound). The single
    shared predicate keeps refine1_optimistic and refine_active4_device
    routing the same resolutions to the same path."""
    b = SPARSE_BLOCK
    h = 2.0 / (N - 1)
    s3 = math.sqrt(3.0) / 2.0
    if (N - 1) % b != 0 or b * h * s3 * safety >= clamp_dist:
        return None
    nb4 = (N - 1) // b
    two_level = (
        (N - 1) % (4 * b) == 0
        and (4 * b) * h * s3 * safety < clamp_dist
        and nb4 % 4 == 0
    )
    return h, nb4, two_level


@functools.partial(jax.jit, static_argnums=(0,))
def _eval_points(decoder, params, latent, pts):
    latent_rep = jnp.broadcast_to(latent.reshape(1, -1), (pts.shape[0], latent.size))
    inputs = jnp.concatenate([latent_rep, pts], axis=1)
    return decoder.apply(params, inputs)[:, 0]


class PointEvaluator:
    """Latent-conditioned SDF point evaluator.

    On TPU, uses the Pallas fused-MLP kernel (msd_tpu/ops/fused_mlp.py) —
    all weights VMEM-resident, ~6x the unfused XLA path. Falls back to the
    plain XLA path on CPU or for unsupported decoder configs.
    """

    def __init__(self, decoder, params, dtype=None, tile: int = 2048, mesh=None):
        """``mesh``: optional jax.sharding.Mesh with a "data" axis — point
        batches shard over it via shard_map (each device runs the fused
        kernel / XLA eval on its slice), so eval_points and the refinement
        stages of create_mesh scale with chips (SURVEY §5.7: query points
        are embarrassingly parallel under a replicated decoder)."""
        self.decoder = decoder
        self.params = params
        self.tile = tile
        self.mesh = mesh
        if mesh is not None:
            from msd_tpu.parallel import mesh_size

            self._ndev = mesh_size(mesh)
        else:
            self._ndev = 1
        self._sharded_eval = None
        self._fused = None
        self._block_fns = {}
        self._corner_fns = {}
        self._fetch_pool = None
        self._decode_pool_obj = None
        if jax.default_backend() == "tpu":
            # Only unsupported-config errors fall back (xyz_in_all, VMEM
            # overflow, missing Pallas support); a genuine kernel regression
            # should raise, not silently degrade to the slow XLA path.
            try:
                from msd_tpu.ops.fused_mlp import build_fused_eval

                if dtype is None:
                    dtype = jnp.bfloat16
                self._fused = build_fused_eval(decoder, params, dtype=dtype, tile=tile)
            except (ImportError, ValueError, NotImplementedError) as e:
                logging.warning("fused kernel unavailable, using XLA path: %s", e)

    @property
    def fused(self) -> bool:
        return self._fused is not None

    def _eval_t(self, latent, xyz_t):
        """[3, n] transposed coords (n multiple of tile) -> [n] sdf, device."""
        if self._fused is not None:
            return self._fused(latent, xyz_t)
        return _eval_points(self.decoder, self.params, latent, xyz_t.T)

    def _get_sharded_eval(self):
        if self._sharded_eval is None:
            from jax.sharding import PartitionSpec as P

            self._sharded_eval = jax.jit(
                jax.shard_map(
                    lambda lat, x: self._eval_t(lat, x),
                    mesh=self.mesh,
                    in_specs=(P(), P(None, "data")),
                    out_specs=P("data"),
                    check_vma=False,
                )
            )
        return self._sharded_eval

    def eval_points(self, latent, pts):
        """pts [N, 3] (device or host) -> sdf [N] device array.

        Pads to a pow2 multiple of the tile so only O(log N) kernel shapes
        ever compile (remote compiles are expensive through the relay).
        With a device mesh, pads to a tile multiple PER DEVICE and runs the
        evaluation shard_mapped over the point axis.
        """
        latent = jnp.asarray(latent).reshape(-1)
        pts = jnp.asarray(pts)
        n = pts.shape[0]
        unit = self.tile * self._ndev
        n_pad = unit
        while n_pad < n:
            n_pad *= 2
        xyz_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(pts.T)
        if self.mesh is not None:
            return self._get_sharded_eval()(latent, xyz_t)[:n]
        return self._eval_t(latent, xyz_t)[:n]

    def _pool(self):
        """Shared fetch pool: the axon relay multiplexes device->host
        streams, so N concurrent fetches sustain ~Nx the serial bandwidth
        (measured 2.5 MB/s serial vs 13.6 MB/s with 4 streams on the same
        link). All large D2H transfers split into parts fetched here."""
        if self._fetch_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._fetch_pool = ThreadPoolExecutor(max_workers=8)
        return self._fetch_pool

    def _decode_pool(self):
        """Separate (small) pool for host-side row decoding, so decode tasks
        can block on fetch futures without starving the fetch pool."""
        if self._decode_pool_obj is None:
            from concurrent.futures import ThreadPoolExecutor

            self._decode_pool_obj = ThreadPoolExecutor(max_workers=2)
        return self._decode_pool_obj

    def fetch_parallel_submit(self, dev_array, n_rows: int, part: int = 2048):
        """Enqueue dev_array[:ceil(n_rows/part)*part] as concurrent part
        fetches; returns a resolver that yields the host array clipped to
        n_rows. Splitting work across streams matters most when the relay
        is in a slow phase (single-stream bandwidth drops ~5x; aggregate
        holds up)."""
        if n_rows <= 0:
            return lambda: np.asarray(dev_array[:0])
        nparts = -(-n_rows // part)
        # slice on the dispatching thread (device ops), fetch on the pool
        parts = [dev_array[i * part : (i + 1) * part] for i in range(nparts)]
        futs = [self._pool().submit(np.asarray, p) for p in parts]
        if nparts == 1:
            return lambda: futs[0].result()[:n_rows]
        return lambda: np.concatenate([f.result() for f in futs], axis=0)[:n_rows]

    def fetch_parallel(self, dev_array, n_rows: int, part: int = 2048):
        """Fetch dev_array[:n_rows] as concurrent part streams."""
        return self.fetch_parallel_submit(dev_array, n_rows, part)()

    # ------------------------------------------------------------------
    # Device-side block evaluation. ONE compiled program for every grid
    # resolution and shape: the block size is fixed (SPARSE_BLOCK=4), block
    # indices arrive in fixed-size chunks, and the grid spacing h is a
    # runtime scalar. Remote compiles through the axon relay cost tens of
    # seconds, so shape-stable programs matter more than per-call waste.
    A_CHUNK = 8192  # blocks per dispatch: 8192 * 125 pts = 1,024,000 (= 500 tiles)
    # device-side compaction cap: slabs under the min stream uncapped (bytes
    # are cheap there); larger slabs cap at ratio * slab with exact fallback
    # on overflow. Instance attrs so tests can force the overflow path.
    compact_cap_min_blocks = 24576
    compact_cap_ratio = 0.55
    # "packed" codec magnitude budget per crossing block (the small-corner
    # fraction runs ~0.45 of 125; 80 leaves headroom, overflow falls back)
    packed_mag_bytes_per_block = 80

    @staticmethod
    def _codec_q(codec: str, h: float) -> np.float32:
        """Value-quantization step per codec (shared by the streaming and
        fused refine+slab dispatch paths so they can never diverge)."""
        if codec == "packed":
            # finer quantum than int8 (thresh/255 = ~0.0098 h vs 0.024 h)
            return np.float32(2.5 * h / 255.0)
        return np.float32(3.0 * h / 127.0)

    def _slab_cap(self, n_pad: int) -> int:
        """Compaction cap for a slab of ``n_pad`` blocks: crossing/active
        runs ~0.4 for large active sets; small sets skip the cap entirely
        (bytes are cheap, overflow impossible)."""
        if n_pad < self.compact_cap_min_blocks:
            return n_pad
        return -(-int(n_pad * self.compact_cap_ratio) // 2048) * 2048

    @staticmethod
    def _opt_slab_granule(A: int) -> int:
        """Primary-slab granule for optimistic-mode streaming over an
        ``A``-block cap bucket (2048-aligned, >= 4096 rows).

        ``MSD_OPT_SLABS`` sets the target slab count. At 1 the whole bucket
        is one slab — and with MSD_OPT_FUSE_SLAB0 on, that slab fuses INTO
        the refine dispatch: the entire N~256 extraction (refine + eval +
        crossing filter + encode) is ONE device program. On the axon relay
        each extra program costs ~20 ms of dispatch serialization while the
        mesher overlap finer slabs buy is ~2 ms at this class's crossing
        counts (see the MSD_OPT_SLABS A/B, PERF.md round-5)."""
        from msd_tpu import stream_knobs

        n = stream_knobs.opt_slab_count()
        return max(4096, -(-A // n // 2048) * 2048)

    @staticmethod
    def _tail_slab_granule(A: int) -> int:
        """Granule for storage-bucket overflow tail slabs: always 8-way —
        a single-slab tail would evaluate the whole second half of the
        storage bucket even when the overflow is a few hundred rows."""
        return max(4096, -(-A // 8 // 2048) * 2048)

    def _get_block_fn(self):
        """One compiled program evaluates the (b+1)^3 lattice of stride-scale
        points for chunks of blocks, for ANY resolution/scale: grid spacing
        ``h`` and lattice ``scale`` are runtime scalars. Values return as
        float16 to halve the (slow) device->host transfer; interpolation
        error from f16 is ~1e-3 of a voxel."""
        if "fn" not in self._block_fns:
            bsz = SPARSE_BLOCK
            pts_per = (bsz + 1) ** 3
            total = self.A_CHUNK * pts_per
            assert total % self.tile == 0
            local = np.arange(bsz + 1)
            lx, ly, lz = np.meshgrid(local, local, local, indexing="ij")
            offs = jnp.asarray(np.stack([lx, ly, lz], axis=-1).reshape(-1, 3).astype(np.int32))

            @jax.jit
            def f(latent, abi_chunk, h, scale):
                fine = (abi_chunk * (bsz * scale))[:, None, :] + offs[None, :, :] * scale
                xyz_t = fine.reshape(-1, 3).T.astype(jnp.float32) * h - 1.0
                out = self._eval_t(latent, xyz_t).reshape(self.A_CHUNK, pts_per)
                return out.astype(jnp.float16)

            self._block_fns["fn"] = f
        return self._block_fns["fn"]

    def _get_mask_fn(self):
        """Block program fused with a per-block sign-crossing reduction:
        returns [A_CHUNK] bool, True iff the block's (b+1)^3 corner lattice
        has mixed signs. Only 1 byte/block crosses the (slow) relay."""
        if "mask" not in self._block_fns:
            fn = self._get_block_fn()

            @jax.jit
            def m(latent, abi_chunk, h, scale):
                vals = fn(latent, abi_chunk, h, scale)
                neg = vals < 0
                return jnp.any(neg, axis=1) & ~jnp.all(neg, axis=1)

            self._block_fns["mask"] = m
        return self._block_fns["mask"]

    def _get_vals_mask_fn(self):
        """Block program returning (values f16 [A_CHUNK, 125], crossing mask
        [A_CHUNK]) in one dispatch — values stay device-resident so the
        streaming path never evaluates a block twice."""
        if "vals_mask" not in self._block_fns:
            fn = self._get_block_fn()

            @jax.jit
            def vm(latent, abi_chunk, h, scale):
                vals = fn(latent, abi_chunk, h, scale)
                neg = vals < 0
                return vals, jnp.any(neg, axis=1) & ~jnp.all(neg, axis=1)

            self._block_fns["vals_mask"] = vm
        return self._block_fns["vals_mask"]

    def _get_slab_fn(self, n_blocks: int):
        """Whole-slab variant of the vals+mask program: ONE dispatch (and one
        coordinate upload) evaluates ``n_blocks`` blocks. Sizes are bucketed
        to multiples of A_CHUNK by the caller so only a handful of programs
        ever compile; on the axon relay every dispatch/upload costs a ~20 ms
        round trip, which dominated the chunked streaming path."""
        key = ("slab", n_blocks)
        if key not in self._block_fns:
            bsz = SPARSE_BLOCK
            pts_per = (bsz + 1) ** 3
            assert (n_blocks * pts_per) % self.tile == 0
            local = np.arange(bsz + 1)
            lx, ly, lz = np.meshgrid(local, local, local, indexing="ij")
            offs = jnp.asarray(np.stack([lx, ly, lz], axis=-1).reshape(-1, 3).astype(np.int32))

            @jax.jit
            def f(latent, abi_slab, h, scale):
                fine = (abi_slab * (bsz * scale))[:, None, :] + offs[None, :, :] * scale
                xyz_t = fine.reshape(-1, 3).T.astype(jnp.float32) * h - 1.0
                vals = self._eval_t(latent, xyz_t).reshape(n_blocks, pts_per).astype(jnp.float16)
                neg = vals < 0
                return vals, jnp.any(neg, axis=1) & ~jnp.all(neg, axis=1)

            self._block_fns[key] = f
        return self._block_fns[key]

    def _get_slab_compact_fn(self, n_blocks: int, cap: int, codec: str):
        """Eval + crossing filter + ON-DEVICE compaction in one program.

        Evaluates the (b+1)^3 lattice of ``n_blocks`` blocks, selects the
        sign-crossing blocks, and scatters their encoded value rows into a
        dense [cap, 125] buffer — so the host never sits in the dependency
        chain (no mask fetch, no index upload): every slab is dispatched up
        front and the device runs back-to-back while the host streams
        results. Returns (idx_and_count [cap+1] i32, packed [cap, 125]):
        idx_and_count[0] is the crossing count (> cap signals overflow; the
        caller falls back to the exact two-phase path for that slab),
        idx_and_count[1:1+count] are crossing-row positions within the slab.
        """
        key = ("slab_compact", n_blocks, cap, codec)
        if key not in self._block_fns:
            bsz = SPARSE_BLOCK
            pts_per = (bsz + 1) ** 3
            assert (n_blocks * pts_per) % self.tile == 0
            # u16 idx stream (half the bytes) whenever slab row indices fit;
            # the consumer dispatches on the fetched dtype
            use_u16 = n_blocks <= 60000
            local = np.arange(bsz + 1)
            lx, ly, lz = np.meshgrid(local, local, local, indexing="ij")
            offs = jnp.asarray(np.stack([lx, ly, lz], axis=-1).reshape(-1, 3).astype(np.int32))

            @jax.jit
            def f(latent, abi_slab, valid_n, h, scale, q):
                fine = (abi_slab * (bsz * scale))[:, None, :] + offs[None, :, :] * scale
                xyz_t = fine.reshape(-1, 3).T.astype(jnp.float32) * h - 1.0
                vals = self._eval_t(latent, xyz_t).reshape(n_blocks, pts_per).astype(jnp.float16)
                return self._encode_compact_body(vals, valid_n, cap, codec, q, use_u16)

            self._block_fns[key] = f
        return self._block_fns[key]

    def _encode_compact_body(self, vals, valid_n, cap, codec, q, use_u16, extra=None):
        """Shared tail of the slab programs (traced, inlined into the
        callers' jits): crossing filter + on-device compaction + value
        codec. ``extra``: optional uint16 scalar stored in header slot 3 of
        u16 index streams (the dedup programs' orphan-overflow flag)."""
        n_blocks, pts_per = vals.shape
        neg = vals < 0
        mask = jnp.any(neg, axis=1) & ~jnp.all(neg, axis=1)
        # bucket-padding rows repeat block (0,0,0) — exclude them
        mask = mask & (jnp.arange(n_blocks) < valid_n)
        count = jnp.sum(mask.astype(jnp.int32))
        # crossing rows scatter to a contiguous prefix; everything
        # else (and overflow beyond cap) drops into a slop row
        dest = jnp.where(mask, jnp.cumsum(mask.astype(jnp.int32)) - 1, cap)
        dest = jnp.minimum(dest, cap)
        idx = jnp.zeros((cap + 1,), jnp.int32).at[dest].set(
            jnp.arange(n_blocks, dtype=jnp.int32), mode="drop"
        )
        flag16 = (
            jnp.zeros((1,), jnp.uint16) if extra is None else extra.reshape(1).astype(jnp.uint16)
        )
        if codec == "packed":
            # Wire v2 (round 5): sign bitmap (16 B) + u8 magnitudes for
            # every corner incident to a sign change within its 3^3
            # lattice window ("needed"). Every marching-tets edge
            # connects 26-neighbors, so a corner whose whole window is
            # single-signed can never be an endpoint of a crossing edge
            # — its magnitude is never read by vertex interpolation and
            # doesn't ship, and the DECODER re-derives the needed set
            # from the sign bitmap (needed = dilate(neg) & dilate(pos),
            # separable clipped 3^3 dilation — codec.cpp), so no present
            # bitmap ships either (v1 spent 16 B/row on it; measured
            # needed == present exactly on the bench field). Needed
            # corners whose |v| exceeds the codec range (thresh = 255*q,
            # q = thresh/255) ship the saturated byte 255 and decode to
            # sign*thresh exactly like v1's absent-non-small corners: a
            # ~1-Lipschitz field can't put a crossing edge there anyway.
            rowsf = vals.astype(jnp.float32)
            w8 = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)

            def pack_bits(bits):
                bitsp = jnp.pad(bits, ((0, 0), (0, 128 - pts_per)))
                return jnp.sum(
                    bitsp.reshape(-1, 16, 8).astype(jnp.uint8) * w8, axis=-1
                ).astype(jnp.uint8)

            sign_neg = rowsf < 0
            # nonzero values never round to 0, so decoded signs match
            # the f16 signs the crossing selection used
            magc = jnp.where(
                rowsf == 0, 0, jnp.clip(jnp.round(jnp.abs(rowsf) / q), 1, 255)
            ).astype(jnp.uint8)
            # sign change within the 3^3 window, exact at the lattice
            # boundary: the window-neighbor count rides the MXU as a
            # [n,125]@[125,125] adjacency matmul (counts <= 27 are
            # exact in bf16 with f32 accumulation) — 5-wide window
            # ops on the lane axis crawl on the VPU. Host XLA emulates
            # bf16 dots ~50x slower than sgemm, so CPU runs f32 (exact).
            mm_dt = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
            s = jax.lax.dot(
                sign_neg.astype(mm_dt),
                self._window_adj(pts_per).astype(mm_dt),
                preferred_element_type=jnp.float32,
            )
            any3 = s > 0.5
            all3 = s > self._window_size(pts_per) - 0.5
            needed = any3 & ~all3
            bitmaps = jnp.zeros((cap + 1, 16), jnp.uint8).at[dest].set(
                pack_bits(sign_neg), mode="drop"
            )[:cap]
            mag_rows = jnp.zeros((cap + 1, pts_per), jnp.uint8).at[dest].set(
                magc, mode="drop"
            )[:cap]
            # the decoder re-derives "needed" from the sign bitmap, so the
            # magnitude stream MUST cover exactly the needed corners —
            # scatter the mask itself (a 255 magnitude is a legal shipped
            # value for saturated needed corners, so it can't double as
            # the not-needed sentinel the v1 format used)
            need_rows = jnp.zeros((cap + 1, pts_per), jnp.bool_).at[dest].set(
                needed, mode="drop"
            )[:cap]
            capM = cap * self.packed_mag_bytes_per_block
            # unscattered padding rows are zeros (needed=False) — mask them
            valid_row = jnp.arange(cap) < count
            small_rows = need_rows & valid_row[:, None]
            # two-level prefix sum: the within-row inclusive prefix is
            # an upper-triangular MXU matmul (x @ triu; exact: counts
            # <= 125), leaving only a [cap]-long scan on the row axis
            within = jax.lax.dot(
                small_rows.astype(mm_dt),
                self._tri_le(pts_per).astype(mm_dt),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            row_counts = within[:, -1]
            row_off = jnp.cumsum(row_counts) - row_counts
            mag_count = row_off[-1] + row_counts[-1]
            mdest = jnp.where(
                small_rows, row_off[:, None] + within - 1, capM
            )
            mdest = jnp.minimum(mdest, capM).reshape(-1)
            mags = jnp.zeros((capM + 1,), jnp.uint8).at[mdest].set(
                mag_rows.reshape(-1), mode="drop"
            )[:capM]
            if use_u16:
                # halve the (latency-critical) idx fetch: u16 header
                # [count, Km_lo, Km_hi, flag] + u16 indices
                ic = jnp.concatenate([
                    count.astype(jnp.uint16)[None],
                    (mag_count & 0xFFFF).astype(jnp.uint16)[None],
                    (mag_count >> 16).astype(jnp.uint16)[None],
                    flag16,
                    idx[:cap].astype(jnp.uint16),
                ])
            else:
                ic = jnp.concatenate([count[None], mag_count[None], idx[:cap]])
            return ic, bitmaps, mags
        if codec == "int8":
            rows = vals.astype(jnp.float32)
            mag = jnp.clip(jnp.round(jnp.abs(rows) / q), 1, 127)
            code = jnp.where(rows == 0, 0.0, jnp.sign(rows) * mag).astype(jnp.int8)
        else:
            code = vals.view(jnp.int8).reshape(n_blocks, 2 * pts_per)
        packed = jnp.zeros((cap + 1, code.shape[1]), jnp.int8).at[dest].set(
            code, mode="drop"
        )
        if use_u16:
            idx_and_count = jnp.concatenate([
                count.astype(jnp.uint16)[None],
                jnp.zeros((2,), jnp.uint16),
                flag16,
                idx[:cap].astype(jnp.uint16),
            ])
        else:
            idx_and_count = jnp.concatenate([count[None], idx[:cap]])
        return idx_and_count, packed[:cap]

    def _get_slab_compact_dev_fn(self, n_pad: int, cap: int, codec: str):
        """Device-sourced variant: the slab's block coordinates come from a
        dynamic_slice of the (device-resident) refined active set instead of
        a host upload — so streaming needs NO host copy of the active set on
        its critical path (it downloads asynchronously for the mesher)."""
        key = ("slab_compact_dev", n_pad, cap, codec)
        if key not in self._block_fns:
            inner = self._get_slab_compact_fn(n_pad, cap, codec)

            @jax.jit
            def f(latent, abi_dev, start, valid_n, h, scale, q):
                abi_slab = jax.lax.dynamic_slice(abi_dev, (start, 0), (n_pad, 3))
                return inner(latent, abi_slab, valid_n, h, scale, q)

            self._block_fns[key] = f
        return self._block_fns[key]

    # dense owner-row map edge: block coordinates must fit [0, MAP_N) per
    # axis (nb4 = (N-1)/4 <= 128 covers every resolution up to 513^3; the
    # map is 128^3 * 4 B = 8.4 MB of HBM, built once per extraction)
    MAP_N = 128

    def _get_block_map_fn(self, nrows: int):
        """jit: (abi_dev [nrows, 3] i32 block coords, count) -> dense
        [MAP_N^3] i32 map, map[x,y,z] = global row index of that block in
        the active set, -1 elsewhere. Rows >= count (scatter padding) and
        coordinates outside the map are dropped."""
        key = ("block_map", nrows)
        if key not in self._block_fns:
            M = self.MAP_N

            @jax.jit
            def f(abi_dev, count):
                rows = jnp.arange(nrows, dtype=jnp.int32)
                x = jnp.where(rows < count, abi_dev[:, 0], M)  # OOB -> dropped
                m = jnp.full((M, M, M), -1, jnp.int32)
                return m.at[x, abi_dev[:, 1], abi_dev[:, 2]].set(rows, mode="drop")

            self._block_fns[key] = f
        return self._block_fns[key]

    @staticmethod
    def _dedup_shift_caps(n_pad: int, rho: float):
        """Per-shift orphan row caps (rows, not corners): each of the 7
        neighbor shifts gets ceil(rho * n_pad) rows rounded to 1024. The
        measured absent-neighbor rate at 512^3 is ~0.13/axis, so the
        default rho=0.25 is ~2x headroom; overflow falls back exactly."""
        return -(-int(n_pad * rho) // 1024) * 1024

    def _get_slab_compact_dedup_fn(self, n_pad: int, cap: int, codec: str, rho_m: int):
        """Corner-deduplicated slab program (device-sourced active set).

        Adjacent active blocks share lattice corners: of each block's
        (b+1)^3 = 125 corners, the 61 on the +x/+y/+z faces are low
        (4^3-lattice) corners of the 7 positive-shift neighbor blocks. The
        program evaluates the 64 low corners per block, plus — per shift —
        a compacted list of absent-neighbor ("orphan") corner groups, then
        reassembles the exact 125-value rows from 7 row-gathers and 7
        small static-column scatters before the usual crossing filter +
        codec. Everything irregular is PER SHIFT (7 x [n] map lookups and
        row-gathers), not per corner (61 x [n]): element-wise gathers on
        the corner axis measured ~2.5x the matmul FLOPs they saved.
        Lattice coordinates are bit-identical to the plain slab program
        (owner*4 + low_off == base*4 + top_off in int32), so values — and
        the mesh — match exactly. Any per-shift cap overflow sets header
        flag slot 3; the consumer falls back to the exact two-phase path.
        ``rho_m``: per-shift cap ratio in milli-units (250 = 0.25 * n_pad
        rows per shift)."""
        key = ("slab_compact_dedup", n_pad, cap, codec, rho_m)
        if key not in self._block_fns:
            bsz = SPARSE_BLOCK
            n1 = bsz + 1
            pts_per = n1 ** 3
            low_per = bsz ** 3
            assert n_pad <= 60000  # u16 headers only
            # the 7 positive neighbor shifts; class size = 4^(zeros in sh):
            # face 16, edge 4, corner 1
            shifts = [(1, 0, 0), (0, 1, 0), (0, 0, 1),
                      (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
            lowrange = np.arange(bsz)
            # per shift: the owner-local low offsets covering this block's
            # top corners of that class, their low positions in the owner's
            # 64-row, and their positions in this block's 125-row
            own_offs, own_pos, pos125 = [], [], []
            for sh in shifts:
                axes = [np.array([0]) if s else lowrange for s in sh]
                gi, gj, gk = np.meshgrid(*axes, indexing="ij")
                offs = np.stack([gi, gj, gk], axis=-1).reshape(-1, 3)
                own_offs.append(jnp.asarray(offs.astype(np.int32)))
                own_pos.append(jnp.asarray(
                    (offs[:, 0] * bsz * bsz + offs[:, 1] * bsz + offs[:, 2]).astype(np.int32)
                ))
                top = offs + np.asarray(sh) * bsz  # this block's corner offs
                pos125.append(
                    (top[:, 0] * n1 * n1 + top[:, 1] * n1 + top[:, 2]).astype(np.int32)
                )
            ii, jj, kk = np.meshgrid(lowrange, lowrange, lowrange, indexing="ij")
            low_offs = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
            lowpos125 = (low_offs[:, 0] * n1 * n1 + low_offs[:, 1] * n1
                         + low_offs[:, 2]).astype(np.int32)
            low_offs = jnp.asarray(low_offs.astype(np.int32))
            capS = self._dedup_shift_caps(n_pad, rho_m / 1000.0)
            sizes = [o.shape[0] for o in own_offs]
            total_pts = n_pad * low_per + capS * sum(sizes)
            total_pad = -(-total_pts // self.tile) * self.tile

            @jax.jit
            def f(latent, abi_dev, map_dev, start, valid_n, h, scale, q):
                abi_slab = jax.lax.dynamic_slice(abi_dev, (start, 0), (n_pad, 3))
                rows = jnp.arange(n_pad, dtype=jnp.int32)
                valid = rows < valid_n
                locals_, absents = [], []
                for sh in shifts:
                    owner = abi_slab + jnp.asarray(sh, jnp.int32)[None, :]
                    orow = map_dev.at[owner[:, 0], owner[:, 1], owner[:, 2]].get(
                        mode="fill", fill_value=-1
                    )
                    in_slab = (orow >= start) & (orow < start + valid_n)
                    # absent neighbors row-gather the appended zero row; the
                    # orphan scatter below overwrites those positions
                    locals_.append(jnp.where(in_slab, orow - start, n_pad))
                    absents.append((~in_slab) & valid)
                # per-shift orphan compaction ([n]-length cumsums) + the one
                # concatenated eval batch: low corners, then shift groups
                pts_parts = [
                    ((abi_slab * (bsz * scale))[:, None, :]
                     + low_offs[None, :, :] * scale).reshape(-1, 3)
                ]
                orphan_rows, over = [], jnp.zeros((), jnp.int32)
                for si, sh in enumerate(shifts):
                    a = absents[si]
                    c = jnp.cumsum(a.astype(jnp.int32))
                    cnt = c[-1]
                    over = over + (cnt > capS).astype(jnp.int32)
                    odest = jnp.where(a, jnp.minimum(c - 1, capS), capS)
                    orows = jnp.zeros((capS + 1,), jnp.int32).at[odest].set(rows)[:capS]
                    orphan_rows.append(orows)
                    base = jnp.take(abi_slab, orows, axis=0) + jnp.asarray(
                        sh, jnp.int32
                    )[None, :]
                    pts_parts.append(
                        ((base * (bsz * scale))[:, None, :]
                         + own_offs[si][None, :, :] * scale).reshape(-1, 3)
                    )
                all_pts = jnp.concatenate(pts_parts, axis=0)
                all_pts = jnp.pad(all_pts, ((0, total_pad - total_pts), (0, 0)))
                xyz_t = all_pts.T.astype(jnp.float32) * h - 1.0
                vals_flat = self._eval_t(latent, xyz_t)
                low = vals_flat[: n_pad * low_per].reshape(n_pad, low_per)
                low_ext = jnp.concatenate([low, jnp.zeros((1, low_per), low.dtype)], axis=0)
                # reassemble [n, 125]: static column placement of the low
                # block + 7 row-gathers (owners) + 7 small orphan scatters
                vals125 = jnp.zeros((n_pad, pts_per), vals_flat.dtype)
                vals125 = vals125.at[:, lowpos125].set(low)
                off = n_pad * low_per
                for si in range(len(shifts)):
                    gath = jnp.take(low_ext, locals_[si], axis=0)      # [n, 64]
                    vals125 = vals125.at[:, pos125[si]].set(gath[:, own_pos[si]])
                    sz = sizes[si]
                    ovals = vals_flat[off : off + capS * sz].reshape(capS, sz)
                    off += capS * sz
                    vals125 = vals125.at[
                        jnp.minimum(orphan_rows[si], n_pad - 1)[:, None], pos125[si][None, :]
                    ].set(ovals)
                    # unused orphan slots hold row 0: re-assert row 0's true
                    # values are not clobbered by re-scattering its own data
                    # — slot rows default to 0, whose gathered values equal
                    # the evaluated ones only if block 0's neighbor is
                    # absent; guard by scattering row 0's correct values
                    # last is unnecessary because unused slots evaluated
                    # block (abi_slab[0]+sh)'s true corners — identical
                    # values to whatever source row 0 uses when present.
                vals = vals125.astype(jnp.float16)
                flag = (over > 0).astype(jnp.uint16)
                return self._encode_compact_body(
                    vals, valid_n, cap, codec, q, use_u16=True, extra=flag
                )

            self._block_fns[key] = f
        return self._block_fns[key]

    def _window_adj(self, pts_per):
        """[125, 125] bf16 adjacency: Adj[c', c] = 1 iff lattice corner c'
        lies in the 3^3 window of c. (neg @ Adj)[c] then counts negative
        window corners — one MXU matmul replaces 3-D window reductions."""
        key = ("window_adj", pts_per)
        if key not in self._block_fns:
            b = SPARSE_BLOCK
            n1 = b + 1
            coords = np.stack(
                np.meshgrid(np.arange(n1), np.arange(n1), np.arange(n1), indexing="ij"),
                axis=-1,
            ).reshape(-1, 3)
            d = np.abs(coords[:, None, :] - coords[None, :, :]).max(axis=-1)
            adj = (d <= 1).astype(np.float32)
            # plain numpy (lifted as a constant per trace): building device
            # arrays here would capture a tracer when first hit inside a jit
            import ml_dtypes

            self._block_fns[key] = adj.astype(ml_dtypes.bfloat16)
            self._block_fns[("window_size", pts_per)] = adj.sum(axis=0).astype(np.float32)
        return self._block_fns[key]

    def _window_size(self, pts_per):
        self._window_adj(pts_per)
        return self._block_fns[("window_size", pts_per)]

    def _tri_le(self, pts_per):
        """[125, 125] bf16 UPPER-triangular ones (T[k, c] = 1 iff k <= c):
        (x @ T)[c] = inclusive prefix sum of x along the corner axis, on
        the MXU. (Right-multiplication needs triu, not tril — switching
        to tril would reverse the prefix direction and corrupt the packed
        magnitude offsets.)"""
        key = ("tri_le", pts_per)
        if key not in self._block_fns:
            import ml_dtypes

            self._block_fns[key] = np.triu(
                np.ones((pts_per, pts_per), np.float32)
            ).astype(ml_dtypes.bfloat16)
        return self._block_fns[key]

    def _get_gather_fn(self, codec: str):
        """jit: (vals_all [M, 125] f16, idx [C_CHUNK], q) -> encoded rows.

        codec "int8": linear quantization code = round(v/q) clipped to
        +-127 (q = 3h/127 covers the +-3h band every crossing edge of a
        ~1-Lipschitz field lives in; quantum ~0.024 h). Sign is preserved,
        so cell classification matches f16; vertex interpolation error is
        <~0.02 h. codec "f16": raw rows.
        """
        key = f"gather_{codec}"
        if key not in self._block_fns:
            if codec == "int8":

                @jax.jit
                def g(vals_all, idx, q):
                    rows = vals_all[idx].astype(jnp.float32)
                    # sign-preserving: nonzero values never round to code 0,
                    # so decoded signs match the f16 signs the crossing-block
                    # selection used (else excluded blocks could leave holes)
                    mag = jnp.clip(jnp.round(jnp.abs(rows) / q), 1, 127)
                    code = jnp.where(rows == 0, 0.0, jnp.sign(rows) * mag)
                    return code.astype(jnp.int8)

            else:

                @jax.jit
                def g(vals_all, idx, q):
                    return vals_all[idx]

            self._block_fns[key] = g
        return self._block_fns[key]

    def stream_crossing_values(
        self, latent, abi, N: int, codec: str = "int8",
        n_slabs: int | None = None, stats: dict | None = None,
        abi_dev=None, abi_resolver=None, num_blocks: int | None = None,
        counts_dev=None, count_resolver=None, refine_fallback=None,
        hybrid: bool = False, preslab=None,
    ):
        """Slab-pipelined streaming evaluation of the active set.

        The active set is processed in ``n_slabs`` slabs, EVERY slab
        dispatched up front as one device program (eval + crossing filter +
        on-device compaction of the encoded value rows) so the host never
        gates the device queue. Crossing counts/indices stream back as the
        programs land; value rows fetch as concurrent part streams (the
        relay multiplexes streams). With ``abi_dev`` (+ ``abi_resolver`` /
        ``num_blocks``) the slab coordinates are dynamic-sliced from the
        device-resident refined active set and the host copy resolves
        lazily (it is only needed for the mesher's base coordinates).

        Yields decoded (values f32 [n, 125], abi_rows [n, 3]) chunks.
        ``stats`` (optional dict) receives ``crossing_blocks`` (accumulated),
        ``t_mask`` (seconds blocked on count/index fetches) and ``t_fetch``
        (seconds blocked on value-row fetches).

        Optimistic mode (``counts_dev`` + ``count_resolver``, from
        ``refine1_optimistic``): ``num_blocks`` is the static cap bucket,
        the true active count lives on device — per-slab validity is the
        device scalar clip(count - lo, 0, n_pad), so slabs dispatch with NO
        host knowledge of the count. The resolver supplies the count for
        mesher bases/stats; a count above the bucket falls back to the
        exact host path inside the iterator. ``preslab`` (optional, from
        ``refine1_optimistic``'s fused refine+slab dispatch): (n_pad, cap,
        header_dev, value_devs) for slab [0, n_pad) — already on the device
        queue; consumed in place of dispatching the first slab when the
        slab bounds agree (they are derived from the same shared helpers).

        Hybrid mode (``hybrid=True``, from ``refine2_optimistic``; implies
        the optimistic inputs): the 512-class two-level variant. The cap
        bucket is ~1.8x the typical active count, so carving granule slabs
        over the whole bucket (single-level optimistic style) would waste
        ~45% of the decoder evals on masked rows. Instead ONE fixed-size
        first slab dispatches immediately (device-scalar validity) — its
        device time covers the count fetch round trip — and the remaining
        slabs are sized from the then-resolved true count, so padding waste
        stays under one 2048-row granule per slab. Corner dedup stays
        enabled (two-level shells are fine-grained, unlike the coarse
        single-level shells that overflow its orphan caps).

        Returns (max_blocks upper bound, iterator).
        """
        A = abi.shape[0] if abi is not None else int(num_blocks)
        latent = jnp.asarray(latent).reshape(-1)
        h = 2.0 / (N - 1)
        h_d = jnp.float32(h)
        scale_d = jnp.int32(1)
        q = self._codec_q(codec, h)
        q_d = jnp.float32(q)
        C = self.A_CHUNK
        n_chunks = -(-A // C) if A else 0
        if n_chunks == 0:
            return 0, iter(())
        if hybrid:
            assert counts_dev is not None and count_resolver is not None
            # hybrid two-level: ONE fixed first slab dispatches now; the
            # remaining slabs are sized inside the iterator once the count
            # fetch (riding the pool) resolves under this slab's device time
            first = min(
                max(2048, -(-int(os.environ.get("MSD_HYBRID_FIRST_SLAB", 16384)) // 2048) * 2048),
                A,
            )
            bounds = np.unique(np.array([0, first]))
        elif counts_dev is not None and n_slabs is None:
            # optimistic mode: headers enqueue up front (their waits are
            # concurrent, not serial round trips), so finer slabs are cheap
            # and start the C++ mesher overlapping far earlier. Orphan-cap
            # padding in the dedup programs is ratio-proportional, so 6x4096
            # costs the same evals as 3x8192. Up to 8 slabs at >=4096 rows.
            granule = self._opt_slab_granule(A)
            bounds = np.arange(0, A + granule, granule).clip(max=A)
            bounds = np.unique(bounds)
        else:
            if n_slabs is None:
                # each extra slab costs one mask-fetch round trip (~20 ms on
                # the relay) and buys overlap of ~1/n of the eval compute;
                # MSD_STREAM_SLABS overrides for tuning/measurement
                n_slabs = min(int(os.environ.get("MSD_STREAM_SLABS", 3)), n_chunks)
            if n_slabs > 1 and A > 3 * C:
                # ramped: a small first slab lands its program (and so the
                # first fetches) ~2x sooner; the rest split evenly
                rest = np.linspace(C, A, n_slabs).astype(int)
                bounds = np.concatenate([[0], rest])
            else:
                bounds = np.linspace(0, A, n_slabs + 1).astype(int)
        slabs = [
            (int(bounds[s]), int(bounds[s + 1]))
            for s in range(len(bounds) - 1)
            if bounds[s] < bounds[s + 1]
        ]
        # compacted/gathered rows are padded to this granularity: coarse
        # enough that only a handful of program shapes ever compile, fine
        # enough that padding waste stays under ~0.25 MB of int8 on the relay
        G = 2048
        # with a device-resident active set the host copy resolves lazily
        # (it's only needed for mesher bases, after all dispatches)
        abi_box = {"abi": abi}
        tail_box: dict = {}  # overflow-tail rows [A, c4) fetched on the pool

        def get_abi():
            if abi_box["abi"] is None:
                abi_full = abi_resolver()
                if count_resolver is not None:
                    c = count_resolver()
                    if c > abi_full.shape[0] and "rows" in tail_box:
                        # dispatch-bucket fetch + overflow tail (the
                        # storage bucket rows past the dispatch bucket)
                        abi_full = np.concatenate(
                            [abi_full, tail_box["rows"].result()]
                        )
                    # optimistic fetch pulled the whole cap bucket; clip
                    # padding rows (zeros) once the true count resolves
                    abi_full = abi_full[: min(c, abi_full.shape[0])]
                abi_box["abi"] = abi_full
            return abi_box["abi"]

        def exact_slab(lo, hi):
            """Two-phase fallback for a cap overflow: eval + host mask fetch
            + indexed gather (exact, no cap)."""
            abi = get_abi()
            hi = min(hi, abi.shape[0])
            n = hi - lo
            if n <= 0:
                return None, abi[:0]
            n_pad = -(-n // C) * C
            buf = np.zeros((n_pad, 3), np.int32)
            buf[:n] = abi[lo:hi]
            vals_dev, mask_dev = self._get_slab_fn(n_pad)(latent, jnp.asarray(buf), h_d, scale_d)
            mask = np.asarray(mask_dev)[:n]
            idx = np.nonzero(mask)[0].astype(np.int32)
            K = idx.shape[0]
            if not K:
                return None, abi[lo:hi][mask]
            K_pad = -(-K // G) * G
            ibuf = np.zeros(K_pad, np.int32)
            ibuf[:K] = idx
            # "packed" has no gather program: fall back to the exact f16 rows
            gcodec = "f16" if codec == "packed" else codec
            rows = np.asarray(self._get_gather_fn(gcodec)(vals_dev, jnp.asarray(ibuf), q_d))[:K]
            if gcodec == "f16":
                rows = rows.view(np.float16) if rows.dtype == np.int8 else rows
                rows = np.asarray(rows, np.float32)
            else:
                rows = rows.astype(np.float32) * q
            return rows, abi[lo:hi][mask]

        def it():
            # dispatch EVERY slab up front: compaction happens on device, so
            # the host never gates the device queue — the chip runs slabs
            # back-to-back while the host streams results in order. The
            # idx/count fetches also enqueue up front (they complete as each
            # slab's eval lands), and value rows fetch as concurrent part
            # streams (the relay multiplexes streams; see fetch_parallel).
            pend = []
            # corner dedup across adjacent blocks: a dense owner-row map
            # lets slab programs evaluate only low corners + orphans (~64%
            # of the decoder FLOPs at 512^3). Engaged for large dev-sourced
            # active sets whose block coords fit the map.
            rho_m = int(os.environ.get("MSD_ORPHAN_SHIFT_CAP_MILLI", 250))
            # host/env policy lives in stream_knobs.dedup_streaming; the
            # structural gates stay here: dedup needs a device-sourced
            # active set whose coords fit the owner map, and it is a
            # two-level-path (512-class) feature — optimistic single-level
            # shells (N~256 class) are coarse enough that >25% of active
            # blocks lack an active +1 neighbor, so the per-shift orphan
            # caps overflow and every slab would bounce to a fallback.
            from msd_tpu import stream_knobs

            dedup = (
                abi_dev is not None
                # hybrid (two-level) keeps dedup; plain optimistic
                # (coarse single-level shells) does not — orphan caps
                and (counts_dev is None or hybrid)
                and (N - 1) // SPARSE_BLOCK <= self.MAP_N
                and stream_knobs.dedup_streaming(stream_knobs.host_facts(), A)
            )
            count_d = counts_dev[0] if counts_dev is not None else None
            map_dev = (
                self._get_block_map_fn(abi_dev.shape[0])(
                    abi_dev, count_d if count_d is not None else jnp.int32(A)
                )
                if dedup
                else None
            )
            def dispatch_slab(lo, hi, use_dedup):
                """One device program for slab [lo, hi): eval + crossing
                filter + on-device compaction. Returns (cap, header-future,
                value device buffers)."""
                n = hi - lo
                # optimistic slabs already tile the cap bucket on a 2048
                # granule: pad-free, so every slab dynamic-slices the device
                # active set in bounds (C-rounding would push the last slab
                # past the bucket and into the host path)
                n_pad = n if counts_dev is not None else -(-n // C) * C
                # optimistic: validity is a device scalar — rows past the
                # (still unfetched) refine count mask out inside the program
                valid_d = (
                    jnp.minimum(jnp.maximum(count_d - lo, 0), n_pad).astype(jnp.int32)
                    if count_d is not None
                    else jnp.int32(n)
                )
                cap = self._slab_cap(n_pad)
                dev_ok = abi_dev is not None and lo + n_pad <= abi_dev.shape[0]
                if dev_ok and use_dedup and n_pad <= 60000:
                    out = self._get_slab_compact_dedup_fn(n_pad, cap, codec, rho_m)(
                        latent, abi_dev, map_dev, jnp.int32(lo), valid_d,
                        h_d, scale_d, q_d,
                    )
                    # 64 low + per-shift orphan groups (3 faces of 16, 3
                    # edges of 4, 1 corner of 1 => 61 corners per cap row)
                    n_evals = n_pad * (SPARSE_BLOCK ** 3) + self._dedup_shift_caps(
                        n_pad, rho_m / 1000.0
                    ) * 61
                elif dev_ok:
                    # slab coordinates come straight from the device-resident
                    # refined active set — no host round trip at all
                    out = self._get_slab_compact_dev_fn(n_pad, cap, codec)(
                        latent, abi_dev, jnp.int32(lo), valid_d, h_d, scale_d, q_d
                    )
                    n_evals = n_pad * (SPARSE_BLOCK + 1) ** 3
                else:
                    buf = np.zeros((n_pad, 3), np.int32)
                    buf[:n] = get_abi()[lo:hi]
                    out = self._get_slab_compact_fn(n_pad, cap, codec)(
                        latent, jnp.asarray(buf), jnp.int32(n), h_d, scale_d, q_d
                    )
                    n_evals = n_pad * (SPARSE_BLOCK + 1) ** 3
                if stats is not None:
                    stats["evaluated_stream"] = stats.get("evaluated_stream", 0) + n_evals
                return cap, self._pool().submit(np.asarray, out[0]), out[1:]

            for i, (lo, hi) in enumerate(slabs):
                if i == 0 and preslab is not None and (lo, hi) == (0, preslab[0]):
                    # slab 0 was fused into the refine dispatch: submit its
                    # header fetch here (same point the unfused path would)
                    n_pad0, cap0, hdr_dev, devs0 = preslab
                    if stats is not None:
                        stats["evaluated_stream"] = (
                            stats.get("evaluated_stream", 0)
                            + n_pad0 * (SPARSE_BLOCK + 1) ** 3
                        )
                    pend.append((lo, hi, cap0,
                                 self._pool().submit(np.asarray, hdr_dev), devs0))
                    continue
                pend.append((lo, hi, *dispatch_slab(lo, hi, dedup)))
            if count_resolver is not None:
                # the count fetch was enqueued before any slab program
                # finished, so this wait is off the critical path (slab
                # headers land later); bucket overflow re-runs the exact
                # host-refined path (rare — the bucket has ~1.3x headroom)
                t0 = time.time()
                c4 = count_resolver()
                if stats is not None:
                    stats["t_mask"] = stats.get("t_mask", 0.0) + time.time() - t0
                    stats["active_blocks"] = int(c4)
                store = abi_dev.shape[0] if abi_dev is not None else A
                if A < c4 <= store and abi_dev is not None and not hybrid:
                    # dispatch bucket overflowed but the 2x STORAGE bucket
                    # (refine1_optimistic) holds the whole active set:
                    # dispatch tail slabs over the stored rows. All tails
                    # share one program shape (full granule; the device
                    # count masks rows past c4), and the mesher's base
                    # coordinates for the tail fetch on the pool.
                    logging.info(
                        "optimistic bucket overflow (%d > %d): tail slabs from the "
                        "storage bucket", c4, A,
                    )
                    qx = self._tail_slab_granule(A)
                    hi_max = min(A + (-(-(c4 - A) // qx)) * qx, store)
                    lo = A
                    n_tails = 0
                    while lo < hi_max:
                        hi = min(lo + qx, hi_max)
                        pend.append((lo, hi, *dispatch_slab(lo, hi, False)))
                        lo = hi
                        n_tails += 1
                    if stats is not None:
                        stats["overflow_tail_slabs"] = n_tails
                    tail_box["rows"] = self._pool().submit(
                        lambda: np.asarray(abi_dev[A:c4]).astype(np.int64)
                    )
                elif c4 > A:
                    logging.warning(
                        "optimistic refine bucket overflow (%d > %d); exact fallback", c4, A
                    )
                    if stats is not None:
                        stats["evaluated_stream"] = 0
                    abi_host, _ = refine_fallback()
                    if stats is not None:
                        stats["active_blocks"] = int(abi_host.shape[0])
                    _, sub = self.stream_crossing_values(
                        latent, abi_host, N, codec=codec, n_slabs=n_slabs, stats=stats
                    )
                    yield from sub
                    return
                if hybrid and c4 > slabs[-1][1]:
                    # count resolved (under slab 0's device time): size the
                    # remaining slabs to the TRUE active count — padding
                    # waste is bounded by one quantum per slab, unlike
                    # granule-slabbing the whole ~1.8x bucket. Slab sizes
                    # quantize to a coarse fixed grid so the per-shape slab
                    # programs stay cache-hot across meshes with different
                    # active counts (c4 varies per latent).
                    start = slabs[-1][1]
                    quantum = 4096
                    ns = max(
                        1, min(int(os.environ.get("MSD_STREAM_SLABS", 3)) - 1,
                               -(-(c4 - start) // C))
                    )
                    per = -(-(c4 - start) // ns)
                    size = -(-per // quantum) * quantum
                    lo = start
                    while lo < min(c4, A):
                        hi = min(lo + size, A)
                        pend.append((lo, hi, *dispatch_slab(lo, hi, dedup)))
                        lo = hi
            # resolve every slab's count and enqueue ALL part fetches before
            # consuming any rows: the pool then keeps the maximum number of
            # streams in flight across slab boundaries. Each job's resolver
            # returns the final decoded f32 [K, 125] rows.
            def parse_header(icn):
                """-> (K, Km, bad, idx0). u16 stream: 4-entry header
                [count, Km_lo, Km_hi, flag] + idx (flag = dedup orphan-cap
                overflow); i32 stream (huge slabs): [count(, Km)] + idx."""
                K = int(icn[0])
                if icn.dtype == np.uint16:
                    Km = int(icn[1]) | (int(icn[2]) << 16) if codec == "packed" else 0
                    return K, Km, int(icn[3]), 4
                Km = int(icn[1]) if codec == "packed" else 0
                return K, Km, 0, 2 if codec == "packed" else 1

            # first pass — resolve original headers and RE-DISPATCH every
            # orphan-flagged slab immediately (their non-dedup retry
            # programs overlap on device; collecting a retry header here
            # would serialize them and stall later slabs' value fetches)
            resolved = []
            for lo, hi, cap, ic_fut, devs in pend:
                t0 = time.time()
                icn = ic_fut.result()
                if stats is not None:
                    stats["t_mask"] = stats.get("t_mask", 0.0) + time.time() - t0
                K, Km, bad, idx0 = parse_header(icn)
                overflow = K > cap or bad != 0
                if codec == "packed" and not overflow:
                    overflow = Km > cap * self.packed_mag_bytes_per_block
                if overflow and bad != 0:
                    # orphan-cap overflow is a dedup artifact: one non-dedup
                    # device program (compaction intact) re-runs the slab —
                    # far cheaper than the exact two-phase host path below
                    resolved.append((lo, hi, *dispatch_slab(lo, hi, False), None))
                else:
                    resolved.append((lo, hi, cap, icn, devs, overflow))

            jobs = []
            for lo, hi, cap, icn, devs, overflow in resolved:
                if overflow is None:  # retry header still in flight
                    t0 = time.time()
                    icn = icn.result()
                    if stats is not None:
                        stats["t_mask"] = stats.get("t_mask", 0.0) + time.time() - t0
                    K, Km, bad, idx0 = parse_header(icn)
                    overflow = K > cap
                    if codec == "packed" and not overflow:
                        overflow = Km > cap * self.packed_mag_bytes_per_block
                else:
                    K, Km, bad, idx0 = parse_header(icn)
                if overflow:
                    # rare: crossing (or magnitude or dedup-orphan) fraction
                    # above a cap
                    logging.debug("slab compaction overflow (K=%d cap=%d bad=%d); exact fallback",
                                  K, cap, bad)
                    if stats is not None:
                        stats["evaluated_stream"] = (
                            stats.get("evaluated_stream", 0)
                            + (-(-(hi - lo) // C) * C) * (SPARSE_BLOCK + 1) ** 3
                        )
                    rows, abi_x_s = exact_slab(lo, hi)
                    jobs.append((rows.shape[0] if rows is not None else 0,
                                 (lambda r=rows: r), abi_x_s))
                elif codec == "packed":
                    # 16 B/row sign bitmaps -> 16384-row parts keep
                    # per-stream chunks ~256 KB
                    bitmaps_res = self.fetch_parallel_submit(devs[0], K, part=16384)
                    mags_res = self.fetch_parallel_submit(devs[1], Km, part=262144)
                    if stats is not None:
                        stats["bytes_fetched"] = (
                            stats.get("bytes_fetched", 0) + K * 16 + Km
                        )

                    def decode_packed(_b=bitmaps_res, _m=mags_res, _K=K, _Km=Km):
                        return _decode_packed_host(_b(), _m(), _K, q)

                    jobs.append((K, self._decode_pool().submit(decode_packed).result,
                                 get_abi()[lo:hi][icn[idx0 : idx0 + K]]))
                else:
                    rows_res = self.fetch_parallel_submit(devs[0], K)
                    if stats is not None:
                        stats["bytes_fetched"] = (
                            stats.get("bytes_fetched", 0)
                            + K * 125 * (1 if codec == "int8" else 2)
                        )
                    if codec == "int8":
                        decode = lambda _r=rows_res: _r().astype(np.float32) * q
                    else:
                        decode = lambda _r=rows_res: _r().view(np.float16).astype(np.float32)
                    jobs.append((K, self._decode_pool().submit(decode).result,
                                 get_abi()[lo:hi][icn[idx0 : idx0 + K]]))
            for K, resolve, abi_x_s in jobs:
                if stats is not None:
                    stats["crossing_blocks"] = stats.get("crossing_blocks", 0) + int(K)
                if not K:
                    continue
                t0 = time.time()
                vals = resolve()
                if stats is not None:
                    stats["t_fetch"] = stats.get("t_fetch", 0.0) + time.time() - t0
                yield vals, abi_x_s

        return A, it()

    def crossing_blocks(self, latent, abi: np.ndarray, N: int) -> np.ndarray:
        """Subset of ``abi`` whose blocks contain a sign change.

        Blocks whose corner lattice is single-signed emit no marching-tets
        geometry, and in the Lipschitz-threshold active set they are the
        large majority (the threshold shell is several blocks thick but the
        crossing shell is ~1 block thick) — filtering them on device cuts
        the value transfer ~4-5x with a bit-exact identical mesh.
        """
        A = abi.shape[0]
        fn = self._get_mask_fn()
        latent = jnp.asarray(latent).reshape(-1)
        h = jnp.float32(2.0 / (N - 1))
        scale_d = jnp.int32(1)
        pending = []
        for start in range(0, A, self.A_CHUNK):
            chunk = np.zeros((self.A_CHUNK, 3), np.int32)
            end = min(A, start + self.A_CHUNK)
            chunk[: end - start] = abi[start:end]
            pending.append(fn(latent, jnp.asarray(chunk), h, scale_d))
        if not pending:
            return abi[:0]
        # ONE device->host fetch for all chunks: per-chunk fetches each pay
        # a full relay round trip (~20-500 ms under load), which dominates
        # the 1-byte/block payload
        mask = np.asarray(jnp.concatenate(pending))[:A]
        return abi[mask]

    def _get_submask_fn(self):
        """Superblock program fused with the per-sub-block activity
        criterion (min |corner| below the Lipschitz half-diagonal, or corner
        sign change): returns the b^3 sub-block flags bit-packed to
        [A_CHUNK, b^3/8] uint8 — 8 bytes/superblock instead of 250 value
        bytes crossing the relay."""
        if "submask" not in self._block_fns:
            fn = self._get_block_fn()
            b = SPARSE_BLOCK

            @jax.jit
            def sm(latent, abi_chunk, h, scale, diag):
                vals = fn(latent, abi_chunk, h, scale).astype(jnp.float32)
                v = vals.reshape(-1, b + 1, b + 1, b + 1)
                cmin = jnp.full(v.shape[:1] + (b, b, b), jnp.inf)
                s_any = jnp.zeros(v.shape[:1] + (b, b, b), bool)
                s_all = jnp.ones(v.shape[:1] + (b, b, b), bool)
                for dx in (0, 1):
                    for dy in (0, 1):
                        for dz in (0, 1):
                            sub = v[:, dx : b + dx, dy : b + dy, dz : b + dz]
                            cmin = jnp.minimum(cmin, jnp.abs(sub))
                            neg = sub < 0
                            s_any = s_any | neg
                            s_all = s_all & neg
                act = (cmin < diag) | (s_any & ~s_all)
                bits = act.reshape(act.shape[0], -1, 8)
                w = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
                return jnp.sum(bits * w, axis=-1).astype(jnp.uint8)

            self._block_fns["submask"] = sm
        return self._block_fns["submask"]

    def _get_refine_fn(self, nb16: int, cap16: int, cap4: int, emit_i16: bool = False):
        """Fused two-level refinement in ONE device program: stride-16
        prefilter lattice (coords generated on device), Lipschitz-active
        superblocks compacted on device, their stride-4 sub-lattices
        evaluated, and the active stride-4 block coordinates compacted to a
        dense [cap4, 3] buffer. Replaces ~4 host round trips + two host
        nonzero passes with one dispatch + one tiny count fetch
        (counts > caps signal overflow; caller falls back to the two-phase
        host path).

        ``emit_i16`` additionally returns ``abi4.astype(int16)`` (valid for
        nb4 < 2^15, i.e. any practical N) so the host coordinate fetch has
        its half-byte wire view WITHOUT the separate ``_get_cast_i16_fn``
        dispatch — on the axon relay every program enqueue costs host-side
        serialization, and the cast sits between the refine and the slab
        dispatches on the extraction critical path."""
        key = ("refine", nb16, cap16, cap4, emit_i16)
        if key not in self._block_fns:
            b = SPARSE_BLOCK
            n1 = nb16 + 1
            M = n1**3
            M_pad = -(-M // self.tile) * self.tile
            pts_per = (b + 1) ** 3
            M2 = cap16 * pts_per
            M2_pad = -(-M2 // self.tile) * self.tile
            # static coordinate tables
            ci = np.arange(n1, dtype=np.int32)
            gx, gy, gz = np.meshgrid(ci[:-1], ci[:-1], ci[:-1], indexing="ij")
            cell_coords = jnp.asarray(
                np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.int32)
            )  # [nb16^3, 3] superblock indices, row-major like np.nonzero
            lat_idx = np.stack(
                np.meshgrid(ci, ci, ci, indexing="ij"), axis=-1
            ).reshape(-1, 3).astype(np.float32)
            lat_pts = jnp.asarray(lat_idx)  # corner lattice in units of 16h
            local = np.arange(b + 1)
            lx, ly, lz = np.meshgrid(local, local, local, indexing="ij")
            offs = jnp.asarray(np.stack([lx, ly, lz], axis=-1).reshape(-1, 3).astype(np.int32))
            si = np.arange(b, dtype=np.int32)
            sx, sy, sz = np.meshgrid(si, si, si, indexing="ij")
            sub_offs = jnp.asarray(np.stack([sx, sy, sz], axis=-1).reshape(-1, 3).astype(np.int32))

            def corner_active(v, diag):
                """8-corner min-|v| / sign-change cell criterion."""
                n = v.shape[1] - 1
                cmin = jnp.full(v.shape[:1] + (n, n, n), jnp.inf)
                s_any = jnp.zeros(v.shape[:1] + (n, n, n), bool)
                s_all = jnp.ones(v.shape[:1] + (n, n, n), bool)
                for dx in (0, 1):
                    for dy in (0, 1):
                        for dz in (0, 1):
                            sub = v[:, dx : n + dx, dy : n + dy, dz : n + dz]
                            cmin = jnp.minimum(cmin, jnp.abs(sub))
                            neg = sub < 0
                            s_any = s_any | neg
                            s_all = s_all & neg
                return (cmin < diag) | (s_any & ~s_all)

            @jax.jit
            def f(latent, h, diag16, diag4):
                # ---- level 1: stride-16 corner lattice ----
                xyz_t = jnp.zeros((3, M_pad), jnp.float32).at[:, :M].set(
                    (lat_pts * (4.0 * b)).T * h - 1.0
                )
                v16 = self._eval_t(latent, xyz_t)[:M].astype(jnp.float32).reshape(1, n1, n1, n1)
                act16 = corner_active(v16, diag16).reshape(-1)
                count16 = jnp.sum(act16.astype(jnp.int32))
                dest16 = jnp.minimum(jnp.where(act16, jnp.cumsum(act16) - 1, cap16), cap16)
                abi16 = jnp.zeros((cap16 + 1, 3), jnp.int32).at[dest16].set(
                    cell_coords, mode="drop"
                )[:cap16]
                # ---- level 2: stride-4 sub-lattices of active superblocks ----
                fine = (abi16 * (4 * b))[:, None, :] + offs[None, :, :] * b
                xyz2 = jnp.zeros((3, M2_pad), jnp.float32).at[:, :M2].set(
                    fine.reshape(-1, 3).T.astype(jnp.float32) * h - 1.0
                )
                # f16 round-trip matches the two-phase host path, whose L2
                # criterion reads the f16 block program's values
                v4 = self._eval_t(latent, xyz2)[:M2].astype(jnp.float16).astype(jnp.float32)
                v4 = v4.reshape(cap16, b + 1, b + 1, b + 1)
                act4 = corner_active(v4, diag4).reshape(cap16, b * b * b)
                act4 = act4 & (jnp.arange(cap16)[:, None] < count16)
                abi4_all = (abi16 * 4)[:, None, :] + sub_offs[None, :, :]
                flat = act4.reshape(-1)
                count4 = jnp.sum(flat.astype(jnp.int32))
                dest4 = jnp.minimum(jnp.where(flat, jnp.cumsum(flat) - 1, cap4), cap4)
                abi4 = jnp.zeros((cap4 + 1, 3), jnp.int32).at[dest4].set(
                    abi4_all.reshape(-1, 3), mode="drop"
                )[:cap4]
                if emit_i16:
                    return jnp.stack([count16, count4]), abi4, abi4.astype(jnp.int16)
                return jnp.stack([count16, count4]), abi4

            self._block_fns[key] = f
        return self._block_fns[key]

    def _get_refine1_fn(self, nb4: int, cap4: int, emit_i16: bool = False):
        """Single-level variant of the fused refinement for resolutions
        where the stride-16 prefilter bound doesn't fit the clamp band:
        the full stride-4 corner lattice evaluates in one program and the
        active blocks compact on device. Matches ``_sparse_active4``'s
        single-level branch exactly (f32 criterion, same row order).
        ``emit_i16`` appends the half-byte ``abi4.astype(int16)`` fetch
        view (see ``_get_refine_fn``)."""
        key = ("refine1", nb4, cap4, emit_i16)
        if key not in self._block_fns:
            b = SPARSE_BLOCK
            n1 = nb4 + 1
            M = n1**3
            M_pad = -(-M // self.tile) * self.tile
            ci = np.arange(n1, dtype=np.int32)
            gx, gy, gz = np.meshgrid(ci[:-1], ci[:-1], ci[:-1], indexing="ij")
            cell_coords = jnp.asarray(
                np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.int32)
            )
            lat_pts = jnp.asarray(
                np.stack(np.meshgrid(ci, ci, ci, indexing="ij"), axis=-1)
                .reshape(-1, 3).astype(np.float32)
            )

            @jax.jit
            def f(latent, h, diag4):
                xyz_t = jnp.zeros((3, M_pad), jnp.float32).at[:, :M].set(
                    (lat_pts * float(b)).T * h - 1.0
                )
                v = self._eval_t(latent, xyz_t)[:M].astype(jnp.float32).reshape(1, n1, n1, n1)
                cmin = jnp.full((1, nb4, nb4, nb4), jnp.inf)
                s_any = jnp.zeros((1, nb4, nb4, nb4), bool)
                s_all = jnp.ones((1, nb4, nb4, nb4), bool)
                for dx in (0, 1):
                    for dy in (0, 1):
                        for dz in (0, 1):
                            sub = v[:, dx : nb4 + dx, dy : nb4 + dy, dz : nb4 + dz]
                            cmin = jnp.minimum(cmin, jnp.abs(sub))
                            neg = sub < 0
                            s_any = s_any | neg
                            s_all = s_all & neg
                act = ((cmin < diag4) | (s_any & ~s_all)).reshape(-1)
                count = jnp.sum(act.astype(jnp.int32))
                dest = jnp.minimum(jnp.where(act, jnp.cumsum(act) - 1, cap4), cap4)
                abi4 = jnp.zeros((cap4 + 1, 3), jnp.int32).at[dest].set(
                    cell_coords, mode="drop"
                )[:cap4]
                if emit_i16:
                    return count[None], abi4, abi4.astype(jnp.int16)
                return count[None], abi4

            self._block_fns[key] = f
        return self._block_fns[key]

    def _get_refine1_slab0_fn(self, nb4: int, cap4: int, n_pad: int, cap: int, codec: str):
        """Refine + FIRST STREAMING SLAB fused into one device program for
        the optimistic single-level class: the stride-4 lattice refine, the
        active-set compaction, and slab [0, n_pad)'s eval + crossing filter
        + encode all run in one dispatch — on the axon relay every program
        dispatch costs ~20 ms of host-side serialization, and the N~256
        class only runs a handful of them, so merging two is a measurable
        slice of the whole extraction. The slab reads the refine output's
        first ``n_pad`` rows directly on device (validity = the refine
        count, clipped); padding rows past the count evaluate block (0,0,0)
        redundantly and mask out in the compaction, exactly like the
        unfused optimistic slabs."""
        key = ("refine1_slab0", nb4, cap4, n_pad, cap, codec)
        if key not in self._block_fns:
            refine1 = self._get_refine1_fn(nb4, cap4, emit_i16=True)
            slab = self._get_slab_compact_fn(n_pad, cap, codec)

            @jax.jit
            def f(latent, h, diag4, scale, q):
                count, abi4, abi4_i16 = refine1(latent, h, diag4)
                valid = jnp.minimum(count[0], n_pad).astype(jnp.int32)
                out = slab(latent, abi4[:n_pad], valid, h, scale, q)
                return (count, abi4, abi4_i16, *out)

            self._block_fns[key] = f
        return self._block_fns[key]

    def refine1_optimistic(self, latent, N: int, safety: float, clamp_dist: float,
                           codec: str | None = None):
        """Latency-fused refinement for the single-level (reconstruct-time
        N~256) class: the stride-4 lattice refine result STAYS on device —
        no count round trip — and streaming slabs dispatch immediately
        against a static cap bucket, masking validity with the
        device-resident count. Saves ~1-2 relay round trips (~40-60 ms)
        vs ``refine_active4_device``; a count above the bucket (rare: the
        bucket is ~1.3x the measured active fraction) is detected from the
        concurrent count fetch and falls back to the exact two-phase path.

        With ``codec`` set (and MSD_OPT_FUSE_SLAB0 != off) the FIRST
        streaming slab fuses into the refine dispatch itself
        (``_get_refine1_slab0_fn``) — one fewer device program on the
        extraction's critical path; ``stream_crossing_values`` consumes the
        pre-dispatched slab via ``preslab``.

        Returns (counts_dev [1] i32, abi4_dev [cap4, 3] i32,
        abi4_i16_dev [cap4, 3] i16 — the half-byte host-fetch view, cast
        inside the refine program so no separate cast dispatch is needed —
        cap4, prefilter_evals, preslab) or None when the class doesn't
        apply (two-level resolutions keep the pipelined path; "auto"
        engages off-CPU only, MSD_STREAM_OPT=on/off overrides). ``preslab``
        is (n_pad, cap, header_dev, value_devs) for slab [0, n_pad), or
        None when the fusion is off."""
        cls = _refine_class(N, safety, clamp_dist)
        if cls is None:
            return None
        b = SPARSE_BLOCK
        h, nb4, two_level = cls
        s3 = math.sqrt(3.0) / 2.0
        if two_level or nb4 > 80:
            return None
        from msd_tpu import stream_knobs

        if not stream_knobs.opt_streaming(stream_knobs.host_facts()):
            return None
        ratio = int(os.environ.get("MSD_OPT_CAP_RATIO_MILLI", 90)) / 1000.0
        cap4 = min(nb4 ** 3, max(self.A_CHUNK, -(-int(nb4 ** 3 * ratio) // self.A_CHUNK) * self.A_CHUNK))
        # STORAGE bucket = 2x the dispatch bucket: the refine program keeps
        # up to 2*cap4 active rows on device while slabs only pre-dispatch
        # against cap4. A count in (cap4, 2*cap4] — undertrained fat shells
        # sat RIGHT above the 0.09 ratio and bounced every extraction to
        # the exact two-phase path (~2x wall) — now just dispatches tail
        # slabs over the stored rows (stream_crossing_values), costing the
        # tail's evals instead of a full re-refine + re-eval.
        # The store is deliberately NOT clamped to nb4**3: cap4 and the
        # tail granule are 2048-aligned, so an aligned store keeps every
        # tail slab's n_pad * 125 tile-aligned (a min(nb4**3, ...) clamp
        # would make the last tail slab trip the slab program's tile
        # assert for non-aligned lattices, e.g. nb4=25). Rows past nb4**3
        # are plain padding — the true count can never reach them.
        cap4_store = 2 * cap4
        latent = jnp.asarray(latent).reshape(-1)
        fuse = codec is not None and stream_knobs.fuse_slab0()
        if fuse:
            n_pad = min(self._opt_slab_granule(cap4), cap4)
            cap = self._slab_cap(n_pad)
            out = self._get_refine1_slab0_fn(nb4, cap4_store, n_pad, cap, codec)(
                latent, jnp.float32(h), jnp.float32(b * h * s3 * safety),
                jnp.int32(1), jnp.float32(self._codec_q(codec, h)),
            )
            counts_dev, abi4_dev, abi4_i16_dev = out[0], out[1], out[2]
            return (counts_dev, abi4_dev, abi4_i16_dev, cap4, (nb4 + 1) ** 3,
                    (n_pad, cap, out[3], tuple(out[4:])))
        counts_dev, abi4_dev, abi4_i16_dev = self._get_refine1_fn(
            nb4, cap4_store, emit_i16=True
        )(latent, jnp.float32(h), jnp.float32(b * h * s3 * safety))
        return counts_dev, abi4_dev, abi4_i16_dev, cap4, (nb4 + 1) ** 3, None

    def refine2_optimistic(self, latent, N: int, safety: float, clamp_dist: float,
                           cap16: int = 8192, cap4: int = 131072):
        """Latency-fused TWO-level refinement — the 512-class analog of
        ``refine1_optimistic``. The fused 16->4 refine result stays on
        device and nothing blocks: the [count16, count4] fetch rides the
        pool and resolves while the first streaming slab (dispatched
        immediately against the cap bucket with a device-scalar validity)
        is already evaluating — removing the refine count round trip from
        the 512^3 critical path. Cap overflow (either level) is detected
        from the concurrent fetch and falls back to the exact host path
        inside the stream iterator.

        Returns (counts_dev [2] i32, abi4_dev [cap4, 3], abi4_i16_dev
        [cap4, 3] i16 host-fetch view, cap4, cap16, prefilter_evals) or
        None when the two-level criterion doesn't hold.
        Gate: MSD_STREAM_HYBRID=on|off, DEFAULT OFF — a same-window A/B on
        the 1-core host (benchmarks/grid512_ab.py, round 4) measured the
        hybrid dispatch SLOWER at the median (0.915 vs 0.787 s) and far
        noisier at p90 (1.14 vs 0.81 s): the fixed first slab saves the
        ~40 ms refine round trip but serializes the remaining slab sizing
        behind the count fetch, which the relay occasionally stalls. Kept
        behind the knob for relay conditions where the trade reverses."""
        cls = _refine_class(N, safety, clamp_dist)
        if cls is None:
            return None
        b = SPARSE_BLOCK
        h, nb4, two_level = cls
        if not two_level:
            return None
        from msd_tpu import stream_knobs

        if not stream_knobs.hybrid_dispatch():
            return None
        s3 = math.sqrt(3.0) / 2.0
        nb16 = nb4 // 4
        latent = jnp.asarray(latent).reshape(-1)
        counts_dev, abi4_dev, abi4_i16_dev = self._get_refine_fn(
            nb16, cap16, cap4, emit_i16=True
        )(
            latent, jnp.float32(h),
            jnp.float32((4 * b) * h * s3 * safety), jnp.float32(b * h * s3 * safety),
        )
        return counts_dev, abi4_dev, abi4_i16_dev, cap4, cap16, (nb16 + 1) ** 3

    def refine_active4_device(self, latent, N: int, safety: float, clamp_dist: float,
                              cap16: int = 8192, cap4: int = 131072, async_fetch: bool = False):
        """Fused on-device two-level refinement. Returns (abi4 [A, 3] int64
        host array, evaluated) matching ``_sparse_active4``'s two-level
        output exactly (same row order), or None when the two-level
        criterion doesn't hold at this N or a compaction cap overflows.

        With ``async_fetch`` returns (abi4_resolver, count4, evaluated,
        abi4_dev) instead: the host copy downloads on the fetch pool while
        the caller dispatches device work against ``abi4_dev`` directly."""
        cls = _refine_class(N, safety, clamp_dist)
        if cls is None:
            return None
        b = SPARSE_BLOCK
        h, nb4, two_level = cls
        s3 = math.sqrt(3.0) / 2.0
        latent = jnp.asarray(latent).reshape(-1)
        # block coords fit int16 for any practical N (nb4 < 2^15) — the
        # refine program emits the half-byte fetch view itself, so no
        # separate cast dispatch sits between the count fetch and the
        # coordinate download
        emit_i16 = nb4 < 2**15
        if two_level:
            nb16 = nb4 // 4
            fn = self._get_refine_fn(nb16, cap16, cap4, emit_i16=emit_i16)
            out = fn(
                latent, jnp.float32(h),
                jnp.float32((4 * b) * h * s3 * safety), jnp.float32(b * h * s3 * safety),
            )
            counts, abi4_dev = out[0], out[1]
            count16, count4 = (int(c) for c in np.asarray(counts))  # ONE tiny fetch
            if count16 > cap16 or count4 > cap4:
                logging.debug("device refine overflow (%d/%d, %d/%d)", count16, cap16, count4, cap4)
                return None
            evaluated = (nb16 + 1) ** 3 + count16 * (b + 1) ** 3
        else:
            # single level: the full stride-b corner lattice in one program
            cap4 = min(nb4**3, cap4 // 2)
            fn = self._get_refine1_fn(nb4, cap4, emit_i16=emit_i16)
            out = fn(latent, jnp.float32(h), jnp.float32(b * h * s3 * safety))
            counts, abi4_dev = out[0], out[1]
            count4 = int(np.asarray(counts)[0])  # ONE tiny fetch
            if count4 > cap4:
                logging.debug("device refine1 overflow (%d/%d)", count4, cap4)
                return None
            evaluated = (nb4 + 1) ** 3
        if count4 == 0:
            if async_fetch:
                empty = np.zeros((0, 3), np.int64)
                return (lambda: empty), 0, evaluated, abi4_dev
            return np.zeros((0, 3), np.int64), evaluated
        # concurrent part streams keep fetched bytes ~= the real active set
        # at the relay's multiplexed (not serial) bandwidth
        if emit_i16:
            fetch_src = out[2]
            part = 32768
        else:
            fetch_src = abi4_dev
            part = 16384
        resolver = self.fetch_parallel_submit(fetch_src, count4, part=part)
        if async_fetch:
            return (lambda: resolver().astype(np.int64)), count4, evaluated, abi4_dev
        return resolver().astype(np.int64), evaluated

    def subblock_active(self, latent, abi: np.ndarray, N: int, scale: int, diag: float) -> np.ndarray:
        """[A, b, b, b] bool: active flags for the stride-``scale``/b
        sub-blocks of each superblock, computed on device."""
        b = SPARSE_BLOCK
        A = abi.shape[0]
        fn = self._get_submask_fn()
        latent = jnp.asarray(latent).reshape(-1)
        h_d = jnp.float32(2.0 / (N - 1))
        pending = []
        for start in range(0, A, self.A_CHUNK):
            chunk = np.zeros((self.A_CHUNK, 3), np.int32)
            end = min(A, start + self.A_CHUNK)
            chunk[: end - start] = abi[start:end]
            pending.append(fn(latent, jnp.asarray(chunk), h_d, jnp.int32(scale), jnp.float32(diag)))
        if not pending:
            return np.zeros((0, b, b, b), bool)
        packed = np.asarray(jnp.concatenate(pending))[:A]  # ONE fetch
        flags = np.unpackbits(packed, axis=1, bitorder="little")[:, : b * b * b]
        return flags.astype(bool).reshape(A, b, b, b)

    def iter_block_values(self, latent, abi: np.ndarray, N: int, scale: int = 1):
        """Yield (values [Ac, (b+1)^3] f32, abi_chunk [Ac, 3]) chunks.

        Dispatches the NEXT chunk to the device before synchronizing the
        current one, so host-side consumers (the C++ mesher) overlap with
        device evaluation.
        """
        A = abi.shape[0]
        fn = self._get_block_fn()
        latent = jnp.asarray(latent).reshape(-1)
        h = jnp.float32(2.0 / (N - 1))
        scale_d = jnp.int32(scale)
        pending = None
        for start in range(0, A, self.A_CHUNK):
            chunk = np.zeros((self.A_CHUNK, 3), np.int32)
            end = min(A, start + self.A_CHUNK)
            chunk[: end - start] = abi[start:end]
            dev = fn(latent, jnp.asarray(chunk), h, scale_d)  # async dispatch
            if pending is not None:
                p_dev, p_np, p_n = pending
                yield np.asarray(p_dev[:p_n]).astype(np.float32), p_np[:p_n]
            pending = (dev, chunk, end - start)
        if pending is not None:
            p_dev, p_np, p_n = pending
            yield np.asarray(p_dev[:p_n]).astype(np.float32), p_np[:p_n]

    def eval_blocks(self, latent, abi: np.ndarray, b: int, N: int, scale: int = 1) -> np.ndarray:
        """SDF at every stride-``scale`` lattice point of the given blocks
        (b must equal SPARSE_BLOCK). Returns [A, b+1, b+1, b+1]."""
        assert b == SPARSE_BLOCK, "fixed-size sparse blocks"
        outs = [v for v, _ in self.iter_block_values(latent, abi, N, scale)]
        vals = np.concatenate(outs, axis=0) if outs else np.zeros((0, (b + 1) ** 3), np.float32)
        return vals.reshape(abi.shape[0], b + 1, b + 1, b + 1)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _coords_chunk_t(start, size, N):
    """Transposed [3, size] fine-grid coords for linear indices start..start+size."""
    linear = start + jnp.arange(size)
    return _linear_to_coords(linear, N).T


def eval_grid_dense(
    decoder, params, latent, N: int, max_batch: int = 2**18, evaluator: Optional[PointEvaluator] = None
) -> np.ndarray:
    """[N, N, N] SDF grid over [-1, 1]^3 (dense, every point evaluated)."""
    latent = jnp.asarray(latent).reshape(-1)
    if evaluator is not None and evaluator.fused:
        total = N**3
        chunk = max(max_batch, 2**22)
        out = np.empty(total, np.float32)
        for start in range(0, total, chunk):
            size = min(chunk, total - start)
            size_pad = ((size + evaluator.tile - 1) // evaluator.tile) * evaluator.tile
            xyz_t = _coords_chunk_t(start, size_pad, N)
            out[start : start + size] = np.asarray(evaluator._fused(latent, xyz_t)[:size])
        return out.reshape(N, N, N)
    sdf = _eval_grid_chunks(decoder, params, latent, N, max_batch)
    return np.asarray(sdf[: N**3]).reshape(N, N, N)


# stats of the most recent streaming create_mesh (read by bench.py)
LAST_STREAMING_STATS: dict = {}


def _streaming_available() -> bool:
    from msd_tpu.native import load_native

    return load_native() is not None


def _spill_tmp_base(ply_path: str) -> str:
    """Base path for the PLY spill temp files: tmpfs when available
    (MSD_SPILL_TMP overrides), else next to the output file. Unique per
    process so concurrent extractions never collide."""
    scratch = os.environ.get("MSD_SPILL_TMP")
    if scratch is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        scratch = "/dev/shm"
    if scratch is None:
        return ply_path
    return os.path.join(scratch, f"msd_spill_{os.getpid()}_{os.path.basename(ply_path)}")


def _resolve_value_codec(value_codec: str) -> str:
    """Streaming value wire format, after the env override and host-aware
    "auto" default. The decision table lives in
    :mod:`msd_tpu.stream_knobs` (one function per knob, unit-tested per
    cell); this is a thin shim that feeds it the real host facts."""
    from msd_tpu import stream_knobs

    return stream_knobs.resolve_value_codec(value_codec, stream_knobs.host_facts())


def _create_mesh_streaming(latent, N, evaluator, safety, clamp_dist, voxel_size,
                           value_codec="auto", ply_path=None, want_mesh=True):
    """See ``_create_mesh_streaming_impl``. One-shot resilience wrapper:
    if the hybrid two-level dispatch (round-4, MSD_STREAM_HYBRID) blows up
    for any non-semantic reason, disable it for the rest of the process and
    retry once through the synchronous path — a hybrid-specific failure
    must never sink an extraction the classic path can serve."""
    value_codec = _resolve_value_codec(value_codec)
    try:
        return _create_mesh_streaming_impl(
            latent, N, evaluator, safety, clamp_dist, voxel_size,
            value_codec=value_codec, ply_path=ply_path, want_mesh=want_mesh,
        )
    except ValueError:
        raise  # "surface level not in range" — real, caller-handled
    except Exception:
        from msd_tpu import stream_knobs

        if not stream_knobs.hybrid_dispatch():
            raise
        logging.exception(
            "streaming extraction failed with hybrid dispatch enabled; "
            "disabling MSD_STREAM_HYBRID for this process and retrying"
        )
        os.environ["MSD_STREAM_HYBRID"] = "off"
        return _create_mesh_streaming_impl(
            latent, N, evaluator, safety, clamp_dist, voxel_size,
            value_codec=value_codec, ply_path=ply_path, want_mesh=want_mesh,
        )


def _create_mesh_streaming_impl(latent, N, evaluator, safety, clamp_dist, voxel_size,
                                value_codec="packed", ply_path=None, want_mesh=True):
    """Hierarchical active-block discovery + streamed C++ marching
    tetrahedra. The active set is evaluated ONCE on device (values stay
    device-resident), the crossing mask crosses the relay as 1 bit/block,
    and only crossing-block values transfer — int8-encoded by default
    (default codec "packed": sign+small bitmaps + u8 magnitudes, quantum
    ~0.0098 voxel; "int8" is the coarser single-byte stream and
    ``value_codec="f16"`` restores the half-float
    stream). Host meshing runs in a worker thread overlapped with
    transfers (ctypes releases the GIL around mt_add_blocks, and relay
    transfers release it while blocked on IO)."""
    import ctypes
    from concurrent.futures import ThreadPoolExecutor

    from msd_tpu.native import load_native
    from msd_tpu.ops.marching_cubes import _FLIP_TABLE

    lib = load_native()
    t0 = time.time()
    # fused on-device refinement when the two-level criterion holds (one
    # dispatch + one tiny count fetch); the active set STAYS on device for
    # the streaming slabs and its host copy (mesher bases) downloads
    # asynchronously. Falls back to the host two-phase path on cap overflow
    # or small N.
    abi4 = abi4_dev = abi4_resolver = None
    counts_dev = count_resolver = None
    hybrid = False
    preslab = None
    hybrid_box: dict = {}
    opt = evaluator.refine1_optimistic(latent, N, safety, clamp_dist, codec=value_codec)
    hyb = None if opt is not None else evaluator.refine2_optimistic(
        latent, N, safety, clamp_dist
    )
    if opt is not None:
        # single-level class: refine count stays on device; slabs dispatch
        # against the cap bucket immediately (slab 0 fused INTO the refine
        # program when MSD_OPT_FUSE_SLAB0 allows). The count fetch and the
        # (bucket-sized) i16 active-set fetch ride the pool concurrently.
        counts_dev, abi4_dev, abi4_i16_dev, A4, evaluated, preslab = opt
        count_fut = evaluator._pool().submit(np.asarray, counts_dev)
        count_resolver = lambda: int(count_fut.result()[0])  # noqa: E731
        raw_res = evaluator.fetch_parallel_submit(abi4_i16_dev, A4, part=32768)
        abi4_resolver = lambda: raw_res().astype(np.int64)  # noqa: E731
    elif hyb is not None:
        # two-level hybrid (512-class): the [count16, count4] fetch rides
        # the pool; the first streaming slab dispatches immediately and its
        # device time hides the count round trip. An overflow at either
        # level surfaces as "count above bucket" -> exact fallback in the
        # stream iterator.
        counts2_dev, abi4_dev, abi4_i16_dev, A4, cap16, evaluated = hyb
        hybrid = True
        counts_dev = counts2_dev[1:2]  # device scalar view: count4
        count_fut = evaluator._pool().submit(np.asarray, counts2_dev)

        def count_resolver():
            c16, c4 = (int(x) for x in count_fut.result())
            hybrid_box["c16"] = c16
            return A4 + 1 if c16 > cap16 else c4

        raw_res = evaluator.fetch_parallel_submit(abi4_i16_dev, A4, part=32768)
        abi4_resolver = lambda: raw_res().astype(np.int64)  # noqa: E731
    else:
        refined = evaluator.refine_active4_device(latent, N, safety, clamp_dist, async_fetch=True)
        if refined is not None:
            abi4_resolver, A4, evaluated, abi4_dev = refined
        else:
            abi4, evaluated = _sparse_active4(latent, N, evaluator, safety, clamp_dist)
            A4 = abi4.shape[0]
        if A4 == 0:
            raise ValueError("Surface level must be within volume data range.")
    t_refine = time.time() - t0
    # slab-pipelined eval of the active set: values stay on device, crossing
    # masks come back as 1 bit/block per slab, and only crossing rows are
    # gathered and streamed (only those produce marching-tets geometry)
    # while the device evaluates the next slab
    stream_stats: dict = {}
    max_blocks, value_iter = evaluator.stream_crossing_values(
        latent, abi4, N, codec=value_codec, stats=stream_stats,
        abi_dev=abi4_dev, abi_resolver=abi4_resolver, num_blocks=A4,
        counts_dev=counts_dev, count_resolver=count_resolver,
        refine_fallback=lambda: _sparse_active4(latent, N, evaluator, safety, clamp_dist),
        hybrid=hybrid, preslab=preslab,
    )
    total_evals = evaluated + A4 * (SPARSE_BLOCK + 1) ** 3
    LAST_STREAMING_STATS.update(
        active_blocks=int(A4),  # optimistic: bucket bound, refined below
        evaluated=int(total_evals),
        total=int(N**3),
        t_refine=round(t_refine, 3),
        hybrid=bool(hybrid),
    )
    flips = np.ascontiguousarray(_FLIP_TABLE.astype(np.uint8))
    # reserve for the active-set upper bound (crossing count isn't known
    # until the last slab's mask lands) — oversizing only pads the global
    # edge map, it never rehashes
    handle = lib.mt_create(
        ctypes.c_int64(N),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(max_blocks),
    )
    spill_ply = False
    spill_base = None
    # One try/finally owns the native Builder and its spill temps: any
    # exception out of the streaming consumer (fetch/decode, exact_slab,
    # mt_add_blocks) or the finish phase must still free the handle and
    # unlink the tmpfs spill files. Both cleanups are idempotent.
    try:
        if ply_path is not None:
            # incremental PLY spill: vertex/face payloads written by the C++
            # mesher as blocks complete (overlapped with relay transfers); the
            # final write is header + two page-cache file copies. Temps live on
            # tmpfs when available: spilling ~50 MB/mesh to disk trips dirty-page
            # throttling, stalling the finish phase by up to ~1 s.
            spill_base = _spill_tmp_base(ply_path)
            rc = lib.mt_ply_stream_begin(
                ctypes.c_void_p(handle),
                (spill_base + ".verts.tmp").encode(), (spill_base + ".faces.tmp").encode(),
                ctypes.c_float(voxel_size), ctypes.c_float(-1.0),
            )
            spill_ply = rc == 0
            if not spill_ply:
                logging.warning("PLY spill unavailable; falling back to post-hoc write")
        b = SPARSE_BLOCK

        def mesh_chunk(vals, bases):
            # vals/bases stay referenced by this closure for the call's duration
            lib.mt_add_blocks(
                ctypes.c_void_p(handle),
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                bases.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int64(vals.shape[0]),
                ctypes.c_int32(b),
            )

        # single worker: mt_add_blocks calls must stay sequential (one Builder)
        t0 = time.time()
        t_mesher = t_prep = 0.0
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = None
            for vals, chunk in value_iter:
                tp = time.time()
                vals = np.ascontiguousarray(vals, np.float32)
                bases = np.ascontiguousarray(chunk.astype(np.int32) * b)
                t_prep += time.time() - tp
                if fut is not None:
                    tm = time.time()
                    fut.result()
                    t_mesher += time.time() - tm
                fut = pool.submit(mesh_chunk, vals, bases)
            if fut is not None:
                tm = time.time()
                fut.result()
                t_mesher += time.time() - tm
        LAST_STREAMING_STATS["t_mesher"] = round(t_mesher, 3)
        LAST_STREAMING_STATS["t_prep"] = round(t_prep, 3)
        LAST_STREAMING_STATS["t_stream"] = round(time.time() - t0, 3)
        crossing = int(stream_stats.get("crossing_blocks", 0))
        LAST_STREAMING_STATS["crossing_blocks"] = crossing
        if "active_blocks" in stream_stats:  # optimistic: true refined count
            LAST_STREAMING_STATS["active_blocks"] = int(stream_stats["active_blocks"])
        if "overflow_tail_slabs" in stream_stats:
            LAST_STREAMING_STATS["overflow_tail_slabs"] = int(
                stream_stats["overflow_tail_slabs"]
            )
        else:
            LAST_STREAMING_STATS.pop("overflow_tail_slabs", None)
        # exact count including dedup savings / padding / exact fallbacks
        LAST_STREAMING_STATS["evaluated"] = int(
            evaluated
            # hybrid: the two-level prefilter's per-superblock evals are
            # known only once the count fetch resolved
            + hybrid_box.get("c16", 0) * (SPARSE_BLOCK + 1) ** 3
            + stream_stats.get("evaluated_stream", A4 * (SPARSE_BLOCK + 1) ** 3)
        )
        LAST_STREAMING_STATS["t_crossing"] = round(stream_stats.get("t_mask", 0.0), 3)
        LAST_STREAMING_STATS["t_fetch"] = round(stream_stats.get("t_fetch", 0.0), 3)
        LAST_STREAMING_STATS["bytes_fetched"] = int(stream_stats.get("bytes_fetched", 0))
        logging.debug(
            "[create_mesh] streaming: %d active blocks, %d crossing, %d prefilter evals",
            A4, crossing, evaluated,
        )
        if crossing == 0:
            raise ValueError("Surface level must be within volume data range.")

        t0 = time.time()
        out_verts = ctypes.POINTER(ctypes.c_float)()
        out_faces = ctypes.POINTER(ctypes.c_int32)()
        nv = ctypes.c_int64()
        nf = ctypes.c_int64()
        ply_written = False
        # zero-copy views into the builder's buffers; the scale/shift below
        # materializes the final arrays, so no intermediate copy is needed
        lib.mt_finish_view(
            ctypes.c_void_p(handle),
            ctypes.byref(out_verts), ctypes.byref(nv),
            ctypes.byref(out_faces), ctypes.byref(nf),
        )
        LAST_STREAMING_STATS["t_fin_view"] = round(time.time() - t0, 3)
        if nv.value == 0:
            raise ValueError("Surface level must be within volume data range.")
        verts = faces = None
        if want_mesh:
            t1 = time.time()
            verts_view = np.ctypeslib.as_array(out_verts, shape=(nv.value, 3))
            verts = verts_view * np.float32(voxel_size) - np.float32(1.0)
            LAST_STREAMING_STATS["t_fin_verts"] = round(time.time() - t1, 3)
            t1 = time.time()
            faces = np.ctypeslib.as_array(out_faces, shape=(nf.value, 3)).copy()
            LAST_STREAMING_STATS["t_fin_faces"] = round(time.time() - t1, 3)
        if spill_ply:
            t_ply = time.time()
            ply_written = (
                lib.mt_ply_stream_finish(ctypes.c_void_p(handle), ply_path.encode()) == 0
            )
            LAST_STREAMING_STATS["t_ply"] = round(time.time() - t_ply, 3)
        LAST_STREAMING_STATS["t_finish"] = round(time.time() - t0, 3)
        LAST_STREAMING_STATS["num_verts"] = int(nv.value)
        LAST_STREAMING_STATS["num_faces"] = int(nf.value)
        if verts is None:
            return None, None, ply_written
        return verts.astype(np.float32, copy=False), faces, ply_written
    finally:
        lib.mt_destroy(ctypes.c_void_p(handle))
        if spill_base is not None:
            for tmp in (spill_base + ".verts.tmp", spill_base + ".faces.tmp"):
                try:
                    os.remove(tmp)
                except OSError:
                    pass


def convert_sdf_samples_to_ply(
    sdf_tensor,
    voxel_grid_origin,
    voxel_size,
    ply_filename_out,
    offset=None,
    scale=None,
) -> bool:
    """[n, n, n] SDF grid -> marching tetrahedra -> .ply
    (ref: deep_sdf/mesh.py:96-165; accepts numpy/jax/torch tensors, uses the
    native marching-tets backend instead of skimage lewiner). Returns False
    on an empty surface like the reference, True on success."""
    sdf = np.asarray(sdf_tensor.numpy() if hasattr(sdf_tensor, "numpy") else sdf_tensor, np.float32)
    try:
        verts, faces = marching_tetrahedra(
            sdf, level=0.0, spacing=(float(voxel_size),) * 3,
            origin=tuple(float(o) for o in voxel_grid_origin),
        )
    except ValueError as e:
        logging.error("[create_mesh] Caught marching cubes error: %s.", e)
        return False
    # apply the inverse normalization like the reference (:139-145)
    if scale is not None:
        verts = verts / scale
    if offset is not None:
        verts = verts - offset
    save_ply(ply_filename_out, verts, faces)
    return True


_EVAL_CACHE: dict = {}


def _cached_evaluator(decoder, params, dtype=None) -> "PointEvaluator":
    """Reuse PointEvaluators (and their compiled fused kernels) across
    create_mesh calls with the same decoder+params objects."""
    key = (id(decoder), id(params), None if dtype is None else jnp.dtype(dtype).name)
    if key not in _EVAL_CACHE:
        if len(_EVAL_CACHE) > 8:
            _EVAL_CACHE.clear()
        _EVAL_CACHE[key] = PointEvaluator(decoder, params, dtype=dtype)
    return _EVAL_CACHE[key]


# Fixed sparse-refinement block size: one compiled block-eval program serves
# every resolution (see PointEvaluator._get_block_fn).
SPARSE_BLOCK = 4


def _snap_n(N: int) -> int:
    """Smallest N' >= N with (N'-1) divisible by SPARSE_BLOCK."""
    r = (N - 1) % SPARSE_BLOCK
    return N if r == 0 else N + (SPARSE_BLOCK - r)


def _pick_block(N: int, clamp_dist: float, safety: float) -> int:
    """SPARSE_BLOCK when the Lipschitz bound can exclude blocks at this
    resolution (half block diagonal below the clamp band), else 1 (dense).

    Soundness: any point inside a block is within half the block diagonal
    of its nearest corner, so a crossing inside implies some corner has
    |sdf| <= b*h*sqrt(3)/2 (for a 1-Lipschitz clamped field).
    """
    h = 2.0 / (N - 1)
    b = SPARSE_BLOCK
    if (N - 1) % b == 0 and b * h * math.sqrt(3.0) / 2.0 * safety < clamp_dist:
        return b
    return 1


def _make_eval_pts(decoder, params, latent, max_batch, evaluator):
    if evaluator is not None:
        def eval_pts(pts_np):
            return np.asarray(evaluator.eval_points(latent, pts_np))
    else:
        def eval_pts(pts_np):
            n = pts_np.shape[0]
            pad = (-n) % max_batch
            padded = np.concatenate([pts_np, np.zeros((pad, 3), np.float32)], axis=0)
            vals = []
            for i in range(0, padded.shape[0], max_batch):
                vals.append(
                    np.asarray(_eval_points(decoder, params, latent, jnp.asarray(padded[i : i + max_batch])))
                )
            return np.concatenate(vals)[:n]
    return eval_pts


def _active_from_lattice(lattice: np.ndarray, diag: float):
    """Blocks of a corner lattice that may contain the zero level
    (min |corner| below ``diag`` or corner sign change)."""
    nb = lattice.shape[0] - 1
    cmin = np.full((nb, nb, nb), np.inf)
    sign_any = np.zeros((nb, nb, nb), dtype=bool)
    sign_all = np.ones((nb, nb, nb), dtype=bool)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                sub = lattice[dx : nb + dx, dy : nb + dy, dz : nb + dz]
                cmin = np.minimum(cmin, np.abs(sub))
                neg = sub < 0
                sign_any |= neg
                sign_all &= neg
    return (cmin < diag) | (sign_any & ~sign_all)


def _sparse_active4(latent, N, evaluator, safety, clamp_dist):
    """Active stride-SPARSE_BLOCK block indices via hierarchical refinement.

    Uses a stride-16 prefilter level when the resolution allows it (the
    half-diagonal Lipschitz bound must stay below the clamp band), which
    skips evaluating most of the stride-4 corner lattice. Returns
    (abi4 [A, 3], evaluated_so_far).
    """
    b = SPARSE_BLOCK
    h = 2.0 / (N - 1)
    s3 = math.sqrt(3.0) / 2.0
    nb4 = (N - 1) // b
    two_level = (
        (N - 1) % (4 * b) == 0
        and (4 * b) * h * s3 * safety < clamp_dist
        and nb4 % 4 == 0
    )
    latent = jnp.asarray(latent).reshape(-1)
    if two_level:
        nb16 = nb4 // 4
        ci = np.arange(nb16 + 1) * (4 * b)
        cx, cy, cz = np.meshgrid(ci, ci, ci, indexing="ij")
        pts = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3).astype(np.float32) * h - 1.0
        lat16 = np.asarray(evaluator.eval_points(latent, pts)).reshape(nb16 + 1, nb16 + 1, nb16 + 1)
        evaluated = pts.shape[0]
        active16 = _active_from_lattice(lat16, (4 * b) * h * s3 * safety)
        abi16 = np.stack(np.nonzero(active16), axis=1).astype(np.int32)
        if abi16.shape[0] == 0:
            return np.zeros((0, 3), np.int64), evaluated
        # stride-b lattice within each active superblock; the per-sub-block
        # activity criterion runs on device and only bit-packed flags cross
        # the relay (PointEvaluator.subblock_active)
        diag4 = b * h * s3 * safety
        sub_active = evaluator.subblock_active(latent, abi16, N, scale=b, diag=diag4)
        evaluated += abi16.shape[0] * (b + 1) ** 3
        aa, ai, aj, ak = np.nonzero(sub_active)
        abi4 = abi16[aa].astype(np.int64) * 4 + np.stack([ai, aj, ak], axis=1)
        return abi4, evaluated
    # single level: full stride-b corner lattice
    ci = np.arange(nb4 + 1) * b
    cx, cy, cz = np.meshgrid(ci, ci, ci, indexing="ij")
    pts = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3).astype(np.float32) * h - 1.0
    lattice = np.asarray(evaluator.eval_points(latent, pts)).reshape(nb4 + 1, nb4 + 1, nb4 + 1)
    active = _active_from_lattice(lattice, b * h * s3 * safety)
    return np.stack(np.nonzero(active), axis=1).astype(np.int64), pts.shape[0]


def _sparse_blocks(decoder, params, latent, N, b, max_batch, safety, clamp_dist, evaluator):
    """Two-stage sparse evaluation. Returns
    (corner_sdf [(nb+1)^3 lattice], abi [A,3] active block indices,
    block_vals [A, b+1, b+1, b+1], stats)."""
    nb = (N - 1) // b
    h = 2.0 / (N - 1)
    diag = b * h * math.sqrt(3.0) / 2.0 * safety
    n_corner = (nb + 1) ** 3

    # ---- stage 1: corner lattice [(nb+1)^3] ----
    eval_pts = _make_eval_pts(decoder, params, latent, max_batch, evaluator)
    ci = np.arange(nb + 1) * b
    cx, cy, cz = np.meshgrid(ci, ci, ci, indexing="ij")
    corner_pts = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3).astype(np.float32) * h - 1.0
    corner_sdf = eval_pts(corner_pts).reshape(nb + 1, nb + 1, nb + 1)

    # ---- stage 2: active blocks (Lipschitz bound or corner sign change) ----
    cmin = np.full((nb, nb, nb), np.inf)
    sign_any = np.zeros((nb, nb, nb), dtype=bool)
    sign_all = np.ones((nb, nb, nb), dtype=bool)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                sub = corner_sdf[dx : nb + dx, dy : nb + dy, dz : nb + dz]
                cmin = np.minimum(cmin, np.abs(sub))
                neg = sub < 0
                sign_any |= neg
                sign_all &= neg
    active = (cmin < diag) | (sign_any & ~sign_all)
    abi = np.stack(np.nonzero(active), axis=1)  # [A, 3]

    # ---- stage 3: evaluate active block interiors ----
    if abi.shape[0] > 0:
        if evaluator is not None:
            block_vals = evaluator.eval_blocks(latent, abi, b, N)
        else:
            local = np.arange(b + 1)
            lx, ly, lz = np.meshgrid(local, local, local, indexing="ij")
            local_offsets = np.stack([lx, ly, lz], axis=-1).reshape(-1, 3)
            fine_idx = ((abi * b)[:, None, :] + local_offsets[None, :, :]).reshape(-1, 3)
            pts = fine_idx.astype(np.float32) * h - 1.0
            block_vals = eval_pts(pts).reshape(abi.shape[0], b + 1, b + 1, b + 1)
        evaluated = n_corner + abi.shape[0] * (b + 1) ** 3
    else:
        block_vals = np.zeros((0, b + 1, b + 1, b + 1), np.float32)
        evaluated = n_corner

    stats = {
        "block": b,
        "active_blocks": int(abi.shape[0]),
        "total_blocks": int(nb**3),
        "evaluated": int(evaluated),
        "total": int(N**3),
    }
    return corner_sdf, abi, block_vals, stats


def eval_grid_sparse(
    decoder,
    params,
    latent,
    N: int,
    max_batch: int = 2**18,
    clamp_dist: float = 0.1,
    safety: float = 1.3,
    evaluator: Optional[PointEvaluator] = None,
) -> Tuple[np.ndarray, dict]:
    """Sparse block-refined SDF grid. Returns (grid [N,N,N], stats).

    Inactive blocks are filled with their corner value (sign-correct by the
    Lipschitz argument), which cannot introduce spurious zero crossings.
    Prefer `create_mesh(sparse=True)` for meshing — it consumes the active
    blocks directly without materializing the N^3 grid.
    """
    latent = jnp.asarray(latent).reshape(-1)
    b = _pick_block(N, clamp_dist, safety)
    if b <= 2:
        grid = eval_grid_dense(decoder, params, latent, N, max_batch, evaluator)
        return grid, {"block": 1, "evaluated": N**3, "total": N**3}

    corner_sdf, abi, block_vals, stats = _sparse_blocks(
        decoder, params, latent, N, b, max_batch, safety, clamp_dist, evaluator
    )
    nb = (N - 1) // b
    grid = np.repeat(np.repeat(np.repeat(corner_sdf[:nb, :nb, :nb], b, 0), b, 1), b, 2)
    grid = np.pad(grid, ((0, 1), (0, 1), (0, 1)), mode="edge")
    if abi.shape[0] > 0:
        local = np.arange(b + 1)
        lx, ly, lz = np.meshgrid(local, local, local, indexing="ij")
        local_offsets = np.stack([lx, ly, lz], axis=-1).reshape(-1, 3)
        fine_idx = ((abi * b)[:, None, :] + local_offsets[None, :, :]).reshape(-1, 3)
        grid[fine_idx[:, 0], fine_idx[:, 1], fine_idx[:, 2]] = block_vals.reshape(-1)
    return grid, stats


def create_mesh(
    decoder,
    params,
    latent_vec,
    filename: Optional[str] = None,
    N: int = 512,
    max_batch: int = 2**18,
    offset=None,
    scale=None,
    return_mesh: bool = False,
    sparse: bool = True,
    clamp_dist: float = 0.1,
    sparse_safety: float = 1.3,
    evaluator: Optional[PointEvaluator] = None,
    value_codec: str = "auto",
    eval_dtype=None,
):
    """Latent -> SDF grid -> marching tetrahedra -> .ply
    (ref: deep_sdf/mesh.py:21-93). Returns (verts, faces) when
    ``return_mesh`` and extraction succeeded, else None; returns False-y on
    empty-surface failure like the reference (:118-124).

    ``eval_dtype`` selects the fused-kernel matmul dtype (default bfloat16;
    pass jnp.float32 with ``value_codec="f16"`` for Chamfer-sensitive evals
    that need the full-precision field). ``value_codec="auto"`` resolves
    through the knob decision table (msd_tpu/stream_knobs.py: packed when
    the SIMD native decoder is present or the host has >= 2 cores, else
    int8 — PERF.md round-5 knob table); "packed"/"int8"/"f16" force a
    wire format."""
    start = time.time()
    if evaluator is None and jax.default_backend() == "tpu":
        evaluator = _cached_evaluator(decoder, params, dtype=eval_dtype)
    latent_vec = jnp.asarray(latent_vec).reshape(-1)
    if sparse:
        # the sparse path needs (N-1) % SPARSE_BLOCK == 0; snap up (equal or
        # finer sampling than requested — a documented deviation from the
        # reference's exact N)
        N = _snap_n(N)
    voxel_size = 2.0 / (N - 1)
    b = _pick_block(N, clamp_dist, sparse_safety) if sparse else 1
    ply_done = False
    try:
        if b > 2 and evaluator is not None and _streaming_available():
            # fastest path: hierarchical refinement + streamed C++ meshing
            # overlapped with device evaluation; when no offset/scale
            # post-transform is needed the PLY payload spills incrementally
            spill_path = None
            if filename and scale is None and offset is None:
                os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
                spill_path = filename + ".ply"
            # when the caller only wants the .ply (the reference's
            # create_mesh contract) and the spill stream can write it, skip
            # materializing verts/faces on the host: the ~50 MB of numpy
            # copies intermittently stall 0.2-1.5 s on allocator page faults
            want_mesh = bool(return_mesh) or spill_path is None
            verts, faces, ply_done = _create_mesh_streaming(
                latent_vec, N, evaluator, sparse_safety, clamp_dist, voxel_size,
                value_codec=value_codec, ply_path=spill_path, want_mesh=want_mesh,
            )
            if not want_mesh and not ply_done:
                # spill failed (e.g. tmpfs full): re-run materializing so
                # the post-hoc save_ply fallback below can write the file
                verts, faces, ply_done = _create_mesh_streaming(
                    latent_vec, N, evaluator, sparse_safety, clamp_dist, voxel_size,
                    value_codec=value_codec, ply_path=None, want_mesh=True,
                )
            logging.debug("[create_mesh] streaming mesh takes: %f", time.time() - start)
        elif b > 2:
            # sparse fast path: mesh directly from active blocks, never
            # materializing the N^3 grid
            corner_sdf, abi, block_vals, stats = _sparse_blocks(
                decoder, params, latent_vec, N, b, max_batch, sparse_safety, clamp_dist, evaluator
            )
            logging.debug("[create_mesh] sparse eval stats: %s", stats)
            logging.debug("[create_mesh] sampling takes: %f", time.time() - start)
            verts, faces = marching_tetrahedra_blocks(
                block_vals, abi * b, N,
                level=0.0, spacing=(voxel_size,) * 3, origin=(-1.0, -1.0, -1.0),
            )
        else:
            sdf_grid = eval_grid_dense(decoder, params, latent_vec, N, max_batch, evaluator)
            logging.debug("[create_mesh] sampling takes: %f", time.time() - start)
            verts, faces = marching_tetrahedra(
                sdf_grid, level=0.0, spacing=(voxel_size,) * 3, origin=(-1.0, -1.0, -1.0)
            )
    except ValueError as e:
        logging.error("[create_mesh] Caught marching cubes error: %s.", e)
        return False

    # apply additional offset and scale (ref: deep_sdf/mesh.py:132-136)
    if scale is not None or offset is not None:
        pts = verts.astype(np.float64)
        if scale is not None:
            pts = pts / scale
        if offset is not None:
            pts = pts - offset
        verts = pts.astype(np.float32)

    if filename and not ply_done:
        t0 = time.time()
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        save_ply(filename + ".ply", verts, faces)
        LAST_STREAMING_STATS["t_ply"] = round(time.time() - t0, 3)
    if return_mesh:
        return verts, faces
    return True
