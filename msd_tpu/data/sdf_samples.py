"""SDF sample data layer.

The on-disk contract is the reference's ``.npz`` with float32 ``pos``/``neg``
arrays of shape [N, 4] = (x, y, z, sdf) (ref: src/PreprocessMesh.cpp:196-226,
deep_sdf/data.py:83-136).

TPU-first redesign of the reference's DataLoader-worker pipeline
(ref: deep_sdf/data.py:145-304): medical datasets fit in memory
(696 shapes x 500k x 4 x f32 ~ 5.6 GB), so all samples are loaded once into
padded device arrays and the per-step balanced pos/neg subsample becomes a
random gather *inside* the jitted train step (`sample_sdf_batch`). This
removes the host->device copy per batch and the contiguous-window sampling
bias of `unpack_sdf_samples_from_ram` (ref: deep_sdf/data.py:112-136) — we
sample uniformly with replacement, matching `unpack_sdf_samples`
(ref: deep_sdf/data.py:91-109).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from msd_tpu.data.splits import get_instance_filenames, split_triples


def remove_nans(arr: np.ndarray) -> np.ndarray:
    """Drop rows whose SDF value is NaN (ref: deep_sdf/data.py:78-80)."""
    return arr[~np.isnan(arr[:, 3]), :]


def read_sdf_samples(filename):
    """Return (pos, neg) float32 arrays from a SdfSamples .npz
    (ref: deep_sdf/data.py:83-88)."""
    npz = np.load(filename)
    return np.asarray(npz["pos"], np.float32), np.asarray(npz["neg"], np.float32)


def unpack_sdf_samples(filename, subsample=None, rng: Optional[np.random.Generator] = None):
    """Balanced half-pos/half-neg random subsample of one shape's samples
    (host-side variant; ref: deep_sdf/data.py:91-109)."""
    pos, neg = read_sdf_samples(filename)
    if subsample is None:
        return np.concatenate([pos, neg], axis=0)
    pos = remove_nans(pos)
    neg = remove_nans(neg)
    rng = rng or np.random.default_rng()
    half = subsample // 2
    ip = rng.integers(0, pos.shape[0], size=half)
    ineg = rng.integers(0, neg.shape[0], size=subsample - half)
    return np.concatenate([pos[ip], neg[ineg]], axis=0)


def _pad_stack(arrays: List[np.ndarray]):
    """Stack variable-length [Ni, 4] arrays into [S, Nmax, 4] + counts [S].

    Padding tiles the scene's own rows cyclically, so every padded row is a
    valid sample row. Chunklet sampling (`sample_sdf_batch`) may read into
    the partial tail chunklet; cyclic padding keeps that draw near-uniform
    over the scene's real rows (exactly uniform when count % r == 0).
    """
    counts = np.array([a.shape[0] for a in arrays], dtype=np.int32)
    if np.any(counts == 0):
        bad = int(np.argmax(counts == 0))
        raise ValueError(f"shape index {bad} has zero SDF samples")
    nmax = -(-int(counts.max()) // _PAD_GRANULARITY) * _PAD_GRANULARITY
    out = np.empty((len(arrays), nmax, 4), dtype=np.float32)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0]] = a
        if a.shape[0] < nmax:
            reps = -(-(nmax - a.shape[0]) // a.shape[0])
            out[i, a.shape[0] :] = np.tile(a, (reps, 1))[: nmax - a.shape[0]]
    return out, counts


# Padded scene slabs are rounded up to a multiple of this, so any chunklet
# size dividing it tiles the slab exactly (no unreachable tail rows).
_PAD_GRANULARITY = 128


def _chunklet_size(half: int, chunk: int) -> int:
    """gcd(half, chunk): divides the per-scene draw count exactly AND (for
    the default chunk=128) divides _PAD_GRANULARITY, so chunklets tile the
    padded slab with no truncated tail. Power-of-two halves keep r=chunk."""
    import math

    return max(math.gcd(half, chunk), 1)


def sample_sdf_batch(pos, pos_counts, neg, neg_counts, scene_indices, subsample, key,
                     chunk: int = 128, layout: str = "rows"):
    """Device-side balanced subsample for a batch of scenes.

    TPU gathers are row-granularity bound: 524k random 16-byte rows cost
    ~120 ms/step. Instead we draw random pre-shuffled *chunklets* of
    ``chunk`` rows (2 KB units, ~128x fewer gathers; 64-row chunklets still hit
    the slow gather path on v5e — 128 is the knee). Sample rows are
    shuffled once at load (like the reference's load_ram path,
    deep_sdf/data.py:199-206), so each chunklet is a uniform random subset;
    only the within-chunklet co-occurrence is fixed across epochs — far
    less correlated than the reference's contiguous-window sampling
    (deep_sdf/data.py:112-136). ``chunk=1`` recovers exact iid sampling.

    Args:
        pos: [4, S, Pmax] padded positive samples in SoA component-major
          layout (pre-shuffled along Pmax; see SdfDataset.device_arrays —
          SoA keeps the 128-point chunklets lane-contiguous per component,
          so neither this gather nor the fused kernel's [components, n]
          input needs a lane-shuffling transpose).
        pos_counts: [S] valid counts.
        neg, neg_counts: same for negatives.
        scene_indices: [B] int32 scene ids.
        subsample: static int, points per scene (half pos / half neg,
          ref: deep_sdf/data.py:98-107).
        key: PRNG key.
        layout: "rows" -> [B, subsample, 4] float32 (AoS, for paths that
          feed points as matmul rows); "t" -> [4, B, subsample] (SoA,
          transpose-free path into the fused train kernel).

    Returns:
        [B, subsample, 4] or [4, B, subsample] float32 samples.
    """
    half = subsample // 2
    other = subsample - half
    kp, kn = jax.random.split(key)
    b = scene_indices.shape[0]

    def draw(arr, counts, n_rows, k):
        r = _chunklet_size(n_rows, chunk)
        n_draws = n_rows // r
        pmax = arr.shape[2]
        n_chunklets = pmax // r
        # ceil-div so the partial tail chunklet is reachable (its pad rows
        # are cyclic copies of real rows — see _pad_stack); scenes with
        # count < r sample their rows near-uniformly from chunklet 0.
        cc = jnp.clip((counts[scene_indices] + r - 1) // r, 1, n_chunklets)  # [B]
        ic = jax.random.randint(k, (b, n_draws), 0, cc[:, None])
        flat_ids = (scene_indices[:, None] * n_chunklets + ic).reshape(-1)
        chunked = arr[:, :, : n_chunklets * r].reshape(4, -1, r)
        rows = jnp.take(chunked, flat_ids, axis=1)  # [4, B*n_draws, r]
        return rows.reshape(4, b, n_rows)

    pos_rows = draw(pos, pos_counts, half, kp)
    neg_rows = draw(neg, neg_counts, other, kn)
    out_t = jnp.concatenate([pos_rows, neg_rows], axis=2)  # [4, B, subsample]
    if layout == "t":
        return out_t
    return out_t.transpose(1, 2, 0)


@dataclass
class SdfDataset:
    """All SDF samples for a split, held as padded arrays.

    Equivalent of the reference's `SDFSamples(load_ram=True)` dataset
    (ref: deep_sdf/data.py:145-304) minus the DataLoader: batches are drawn
    on-device via `sample_sdf_batch`.
    """

    npyfiles: List[str]
    instance_ids: List[str]
    pos: np.ndarray  # [S, Pmax, 4]
    pos_counts: np.ndarray  # [S]
    neg: np.ndarray  # [S, Nmax, 4]
    neg_counts: np.ndarray  # [S]
    subsample: int
    labels: Optional[np.ndarray] = None  # [S, L] with NaN fill for missing
    surface_points: Optional[np.ndarray] = None  # [S, P, 3] for point encoders
    _device_arrays: Optional[tuple] = field(default=None, repr=False)

    @classmethod
    def from_split(
        cls,
        data_source: str,
        split,
        subsample: int,
        labels: Optional[dict] = None,
        warn_missing_labels: bool = True,
        data_source_mesh: Optional[str] = None,
        return_surface_points: bool = False,
        surface_point_count: int = 2048,
    ) -> "SdfDataset":
        npyfiles = get_instance_filenames(data_source, split)
        instance_ids = [t[2] for t in split_triples(split)]
        pos_list, neg_list, keep_files, keep_ids = [], [], [], []
        shuffle_rng = np.random.default_rng(0)
        for f, iid in zip(npyfiles, instance_ids):
            try:
                p, n = read_sdf_samples(f)
            except (FileNotFoundError, OSError):
                logging.warning("skipping missing sample file '%s'", f)
                continue
            p, n = remove_nans(p), remove_nans(n)
            # pre-shuffle rows once so chunklet draws are uniform subsets
            # (ref: deep_sdf/data.py:199-206 shuffles on load)
            pos_list.append(p[shuffle_rng.permutation(p.shape[0])])
            neg_list.append(n[shuffle_rng.permutation(n.shape[0])])
            keep_files.append(f)
            keep_ids.append(iid)
        if not pos_list:
            raise RuntimeError(f"no sample files found under {data_source}")
        pos, pos_counts = _pad_stack(pos_list)
        neg, neg_counts = _pad_stack(neg_list)

        label_arr = None
        if labels is not None:
            label_arr = _labels_for_instances(
                labels, keep_ids, warn_missing=warn_missing_labels
            )

        # surface point clouds for point-based encoders
        # (ref: deep_sdf/data.py:139-142, :209-217)
        surface_points = None
        if return_surface_points:
            if not data_source_mesh:
                raise RuntimeError("data_source_mesh must be set when return_surface_points=True")
            from msd_tpu.data.mesh_io import load_mesh
            from msd_tpu.ops.sampling import sample_mesh_surface

            rng = np.random.default_rng(0)
            pts = []
            for iid in keep_ids:
                mesh_path = None
                for cand in (iid + ".obj", iid + ".ply", iid):
                    p = os.path.join(data_source_mesh, cand)
                    if os.path.isfile(p):
                        mesh_path = p
                        break
                if mesh_path is None:
                    logging.warning("Requested non-existent mesh file for '%s'", iid)
                    pts.append(np.zeros((surface_point_count, 3), np.float32))
                    continue
                v, f = load_mesh(mesh_path)
                pts.append(sample_mesh_surface(v, f, surface_point_count, rng)[0])
            surface_points = np.stack(pts)
        return cls(
            npyfiles=keep_files,
            instance_ids=keep_ids,
            pos=pos,
            pos_counts=pos_counts,
            neg=neg,
            neg_counts=neg_counts,
            subsample=subsample,
            labels=label_arr,
            surface_points=surface_points,
        )

    def __len__(self):
        return len(self.npyfiles)

    @property
    def num_scenes(self):
        return len(self.npyfiles)

    def device_arrays(self):
        """(pos, pos_counts, neg, neg_counts) device arrays, cached.

        pos/neg upload in SoA component-major layout [4, S, Pmax] (host
        arrays stay AoS [S, Pmax, 4]): chunklet gathers then produce the
        fused train kernel's [components, n] input directly — the AoS
        layout forced a [n,3]->[3,n] lane-shuffle transpose worth ~2.5 ms
        per step at the flagship workload."""
        if self._device_arrays is None:
            self._device_arrays = (
                jnp.asarray(np.ascontiguousarray(self.pos.transpose(2, 0, 1))),
                jnp.asarray(self.pos_counts),
                jnp.asarray(np.ascontiguousarray(self.neg.transpose(2, 0, 1))),
                jnp.asarray(self.neg_counts),
            )
        return self._device_arrays

    def sample_batch(self, scene_indices, key):
        pos, pc, neg, nc = self.device_arrays()
        return sample_sdf_batch(pos, pc, neg, nc, scene_indices, self.subsample, key)

    def all_samples(self, idx: int) -> np.ndarray:
        """Un-padded [Npos+Nneg, 4] samples for one shape (host)."""
        p = self.pos[idx, : self.pos_counts[idx]]
        n = self.neg[idx, : self.neg_counts[idx]]
        return np.concatenate([p, n], axis=0)


def _labels_for_instances(label_map: dict, instance_ids, warn_missing=True):
    """Build [S, L] label matrix with the reference's ``_femur`` suffix
    fallback and NaN fill for missing ids (ref: deep_sdf/data.py:239-283)."""
    first = np.asarray(next(iter(label_map.values()))).reshape(-1)
    label_len = first.shape[0]
    out = np.full((len(instance_ids), label_len), np.nan, dtype=np.float32)
    for i, iid in enumerate(instance_ids):
        key = iid
        if key not in label_map and key.endswith("_femur"):
            key = key[:-6]
        if key in label_map:
            out[i] = np.asarray(label_map[key], np.float32).reshape(-1)
        elif warn_missing:
            logging.warning("Missing label for %s", iid)
    return out
