"""Mesh -> SDF training samples, TPU-native.

Replaces the reference's C++/OpenGL PreprocessMesh binary
(ref: src/PreprocessMesh.cpp). Faithful sampling semantics:

* mesh centered at its bounding-box center (scale untouched —
  BoundingCubeNormalization centers only, ref: src/Utils.cpp:170-244).
* near-surface base points: area-weighted CDF triangle sampling
  (ref: PreprocessMesh.cpp:23-85), each emitted twice with Gaussian jitter
  at variance and variance/10 (test mode: variance=0.05, /100)
  (ref: :113-126, :310-319).
* the rest uniform in the [-1, 1] bounding cube (ref: :127-132).
* per-sample sign by an 11-nearest-neighbor normal vote with all-or-nothing
  rejection; magnitude = distance to nearest surface point, or
  |normal . ray| point-plane distance when closer than sqrt(variance)
  (ref: SampleSDFNearSurface :87-174).

The kNN + vote runs on TPU as a tiled jnp program: query chunks stream
against surface-point tiles with a running top-k, so the full
[500k x 235k] distance matrix never materializes and the inner products
run on the MXU.

Visibility difference (documented): the reference builds its vote set from
multi-view *rendered visible* surface points to tolerate broken meshes
(ref: :443-494); medical meshes from the grooming pipeline are watertight,
so we vote with area-sampled surface points + face normals and apply the
same all-or-nothing rejection. A per-mesh quality check
(`fraction rejected`) replaces the render-based observation-ratio test.
"""

from __future__ import annotations

import functools
import logging
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msd_tpu.ops.sampling import bounding_cube_normalization, sample_mesh_surface


def signed_volume(verts, faces) -> float:
    """Signed volume via the divergence theorem — positive for outward-wound
    closed meshes."""
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    return float(np.sum(np.einsum("ij,ij->i", a, np.cross(b, c))) / 6.0)


def mesh_quality(verts, faces) -> dict:
    """Per-mesh quality ratios — the render-free analog of the reference's
    observation-ratio rejection test (ref: src/PreprocessMesh.cpp:496-512,
    thresholds 0.02 wrong-normal obs / 0.03 double-sided triangles):

    * ``inconsistent_winding_ratio``: interior edges whose two adjacent
      faces traverse them in the SAME direction (the geometric cause of the
      reference's wrong-normal observations).
    * ``boundary_edge_ratio``: edges with exactly one face (holes —
      non-watertight, the reference's unobservable/double-sided source).
    * ``nonmanifold_edge_ratio``: edges with >2 faces.
    * ``rejected``: reference-like thresholds applied to the analogous
      defect classes.
    """
    f = np.asarray(faces, np.int64)
    de = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])  # directed
    ue = np.sort(de, axis=1)
    uniq, inv, counts = np.unique(ue, axis=0, return_inverse=True, return_counts=True)
    n_edges = uniq.shape[0]
    boundary_ratio = float(np.mean(counts == 1)) if n_edges else 1.0
    nonmanifold_ratio = float(np.mean(counts > 2)) if n_edges else 0.0
    # direction bit of each directed occurrence; a consistently wound
    # interior edge is traversed once in each direction -> bit sum == 1
    bit = (de[:, 0] < de[:, 1]).astype(np.int64)
    bit_sum = np.bincount(inv, weights=bit, minlength=n_edges)
    interior = counts == 2
    inconsistent = interior & (bit_sum != 1)
    inconsistent_ratio = (
        float(inconsistent.sum() / max(1, interior.sum())) if n_edges else 0.0
    )
    rejected = inconsistent_ratio > 0.02 or (boundary_ratio + nonmanifold_ratio) > 0.03
    return {
        "inconsistent_winding_ratio": inconsistent_ratio,
        "boundary_edge_ratio": boundary_ratio,
        "nonmanifold_edge_ratio": nonmanifold_ratio,
        "rejected": bool(rejected),
    }


def repair_mesh_winding(verts, faces):
    """Consistently orient faces (BFS over edge adjacency, flipping faces
    that traverse a shared edge in the same direction as their neighbor),
    then flip whole components to outward via per-component signed volume.

    The reference never needs this — its multi-view render pass observes
    outward normals directly regardless of winding (ref:
    src/PreprocessMesh.cpp:443-494); this is the geometric equivalent for
    the render-free pipeline. Returns (faces, num_flipped)."""
    f = np.asarray(faces, np.int64).copy()
    nf = f.shape[0]
    # undirected edge id per face slot
    de = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    ue = np.sort(de, axis=1)
    uniq, inv = np.unique(ue, axis=0, return_inverse=True)
    # adjacency: faces sharing each undirected edge
    edge_faces = {}
    for slot in range(3 * nf):
        edge_faces.setdefault(inv[slot], []).append(slot % nf)

    flipped = np.zeros(nf, bool)
    visited = np.zeros(nf, bool)
    total_flipped = 0

    def edge_dir(face_idx, eid):
        """+1 / -1 direction of edge eid in face face_idx (with its current
        flip state applied); 0 if absent."""
        tri = f[face_idx]
        if flipped[face_idx]:
            tri = tri[::-1]
        a, b = uniq[eid]
        for i in range(3):
            u, v = tri[i], tri[(i + 1) % 3]
            if u == a and v == b:
                return 1
            if u == b and v == a:
                return -1
        return 0

    comp_label = np.full(nf, -1, np.int64)
    n_comp = 0
    for seed_face in range(nf):
        if visited[seed_face]:
            continue
        stack = [seed_face]
        visited[seed_face] = True
        comp_label[seed_face] = n_comp
        while stack:
            cur = stack.pop()
            for slot_eid in inv[[cur, cur + nf, cur + 2 * nf]]:
                for nb in edge_faces[slot_eid]:
                    if nb == cur or visited[nb]:
                        continue
                    # consistent orientation = opposite traversal directions
                    if edge_dir(cur, slot_eid) == edge_dir(nb, slot_eid):
                        flipped[nb] = True
                        total_flipped += 1
                    visited[nb] = True
                    comp_label[nb] = n_comp
                    stack.append(nb)
        n_comp += 1

    f[flipped] = f[flipped][:, ::-1]
    # outward orientation per component
    v = np.asarray(verts, np.float64)
    for c in range(n_comp):
        sel = comp_label == c
        if signed_volume(v, f[sel]) < 0:
            f[sel] = f[sel][:, ::-1]
            total_flipped += int(sel.sum())
    return f.astype(faces.dtype, copy=False), total_flipped


def sample_surface_points(verts, faces, num_points, rng=None, orient_outward=True):
    """Area-weighted surface samples with face normals (host).

    The reference gets orientation-free outward normals from its multi-view
    render pass (view-corrected, ref: src/ShaderProgram.cpp); for watertight
    meshes the signed-volume test recovers global outward orientation for
    either winding convention.
    """
    pts, normals, _ = sample_mesh_surface(verts, faces, num_points, rng, return_normals=True)
    if orient_outward and signed_volume(verts, faces) < 0:
        normals = -normals
    return pts, normals


# ---------------------------------------------------------------------------
# tiled kNN + normal vote (device)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _knn_chunk(queries, surf_pts, surf_norms, k, s_tile, use_approx=True):
    """For one query chunk [Qc, 3]: k nearest surface points + vote stats.

    Distances run as one MXU matmul against all surface points; on TPU,
    `jax.lax.approx_min_k` (hardware-accelerated approximate top-k,
    recall ~0.98 at rank k) extracts the neighbors — ~1000x the
    scan-with-running-top-k formulation this replaces. The all-or-nothing
    vote is robust to near-tie neighbor swaps; the magnitude uses the
    returned nearest distance. On CPU (tests) exact top_k is used instead
    (approx_min_k lowers to a very slow path there).
    Returns (num_pos, nearest_dist, plane_dist).
    """
    q_sq = jnp.sum(queries**2, axis=1, keepdims=True)  # [Qc, 1]
    d2 = q_sq + jnp.sum(surf_pts**2, axis=1)[None, :] - 2.0 * queries @ surf_pts.T
    if use_approx:
        _, idx = jax.lax.approx_min_k(d2, k, recall_target=0.98)
    else:
        _, idx = jax.lax.top_k(-d2, k)

    # votes (ref: PreprocessMesh.cpp:146-160)
    nn_pts = surf_pts[idx]  # [Qc, k, 3]
    nn_norms = surf_norms[idx]
    ray = queries[:, None, :] - nn_pts  # [Qc, k, 3]
    ray_len2 = jnp.sum(ray**2, axis=2)
    ray_len = jnp.sqrt(jnp.maximum(ray_len2, 1e-24))
    d = jnp.sum(nn_norms * ray, axis=2) / ray_len
    num_pos = jnp.sum(d > 0, axis=1)

    # the true nearest is the min over the returned k (exact within the set)
    order = jnp.argmin(ray_len2, axis=1)
    nearest_dist = jnp.take_along_axis(ray_len, order[:, None], axis=1)[:, 0]
    near_norm = jnp.take_along_axis(nn_norms, order[:, None, None], axis=1)[:, 0, :]
    near_ray = jnp.take_along_axis(ray, order[:, None, None], axis=1)[:, 0, :]
    plane_dist = jnp.abs(jnp.sum(near_norm * near_ray, axis=1))
    return num_pos, nearest_dist, plane_dist


def _knn_host(queries, surf_pts, surf_norms, k, q_chunk=65536):
    """Exact k-NN normal vote on the host via scipy cKDTree.

    Same vote/magnitude math as the device `_knn_chunk`
    (ref: PreprocessMesh.cpp:146-160).
    Returns (num_pos [Q] int32, nearest_dist [Q] f32, plane_dist [Q] f32).
    """
    from scipy.spatial import cKDTree

    tree = cKDTree(np.asarray(surf_pts, np.float64))
    q = queries.shape[0]
    num_pos = np.empty(q, np.int32)
    nearest = np.empty(q, np.float32)
    plane = np.empty(q, np.float32)
    for start in range(0, q, q_chunk):
        qs = queries[start : start + q_chunk]
        dist, idx = tree.query(qs, k=k)
        # cKDTree.query drops the k axis for k=1; the device path keeps it
        dist = dist.reshape(-1, k)
        idx = idx.reshape(-1, k)
        nn_pts = surf_pts[idx]  # [Qc, k, 3]
        nn_norms = surf_norms[idx]
        ray = qs[:, None, :] - nn_pts
        ray_len = np.sqrt(np.maximum(np.sum(ray**2, axis=2), 1e-24))
        d = np.sum(nn_norms * ray, axis=2) / ray_len
        num_pos[start : start + q_chunk] = np.sum(d > 0, axis=1)
        nearest[start : start + q_chunk] = dist[:, 0]
        plane[start : start + q_chunk] = np.abs(
            np.sum(nn_norms[:, 0, :] * ray[:, 0, :], axis=1)
        )
    return num_pos, nearest, plane


def knn_sign_vote(
    queries: np.ndarray,
    surf_pts: np.ndarray,
    surf_norms: np.ndarray,
    num_votes: int = 11,
    stdv: float = math.sqrt(0.005),
    q_chunk: int = 8192,
    s_tile: int = 8192,
    devices=None,
    force_device: bool | None = None,
):
    """Signed distances with all-or-nothing vote rejection.

    Returns (sdf [Q] float32, keep [Q] bool): ``keep`` is False where the
    vote was split (sample rejected, ref: PreprocessMesh.cpp:162-170).

    Multi-chip: the query axis is sharded over ``devices`` (default: every
    device of the default backend) — surface points are replicated and each
    device runs the identical per-query [q_chunk, S] vote program, so the
    result is byte-identical to the single-device dispatch while each
    round-trip covers ``n_dev * q_chunk`` queries. This is the TPU-native
    analog of the reference's per-shape thread pool
    (ref: preprocess_data.py:252-269): instead of one shape per worker
    (which on TPU would mean per-shape padding buckets and imbalance),
    every chip cooperates on every shape's vote.

    ``force_device``: ``None`` keeps the default routing (device path on
    TPU, host cKDTree elsewhere); ``True``/``False`` force one side —
    tests use ``True`` to exercise the sharded path on CPU meshes.
    """
    q = queries.shape[0]
    s = surf_pts.shape[0]
    use_device = (
        jax.default_backend() == "tpu" if force_device is None else force_device
    )
    if not use_device:
        # Host KD-tree path (the reference's own design: nanoflann,
        # ref PreprocessMesh.cpp:523-525). XLA:CPU lowers top_k over a
        # [Qc, S] distance matrix to full row sorts — minutes on a
        # small host — while a cKDTree query is milliseconds. The TPU
        # path below keeps the MXU matmul + approx_min_k formulation.
        num_pos, nearest, plane = _knn_host(queries, surf_pts, surf_norms, num_votes)
        mag = np.where(nearest < stdv, plane, nearest)
        keep = (num_pos == 0) | (num_pos == num_votes)
        sign = np.where(num_pos <= num_votes // 2, -1.0, 1.0)
        return (sign * mag).astype(np.float32), keep
    s_pad = ((s + s_tile - 1) // s_tile) * s_tile
    # pad surface with far-away sentinels (never in anyone's top-k)
    pts_pad = np.full((s_pad, 3), 1e6, np.float32)
    pts_pad[:s] = surf_pts
    norms_pad = np.zeros((s_pad, 3), np.float32)
    norms_pad[:s] = surf_norms

    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_dev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        mesh = Mesh(np.asarray(devices), ("q",))
        q_sharding = NamedSharding(mesh, PartitionSpec("q"))
        replicated = NamedSharding(mesh, PartitionSpec())
        pts_d = jax.device_put(pts_pad, replicated)
        norms_d = jax.device_put(norms_pad, replicated)
    else:
        q_sharding = None
        pts_d = jax.device_put(pts_pad, devices[0])
        norms_d = jax.device_put(norms_pad, devices[0])

    # each dispatch covers one q_chunk PER DEVICE, query-sharded: the
    # per-device program is the same [q_chunk, s_pad] vote either way
    step = q_chunk * n_dev
    q_pad = ((q + step - 1) // step) * step
    queries_pad = np.zeros((q_pad, 3), np.float32)
    queries_pad[:q] = queries

    use_approx = jax.default_backend() == "tpu"
    num_pos = np.empty(q_pad, np.int32)
    nearest = np.empty(q_pad, np.float32)
    plane = np.empty(q_pad, np.float32)
    for start in range(0, q_pad, step):
        q_block = queries_pad[start : start + step]
        if q_sharding is not None:
            q_block = jax.device_put(q_block, q_sharding)
        else:
            q_block = jax.device_put(q_block, devices[0])
        npos, nd, pd = _knn_chunk(
            q_block, pts_d, norms_d, num_votes, s_tile, use_approx,
        )
        num_pos[start : start + step] = np.asarray(npos)
        nearest[start : start + step] = np.asarray(nd)
        plane[start : start + step] = np.asarray(pd)
    num_pos = num_pos[:q]
    nearest = nearest[:q]
    plane = plane[:q]

    # magnitude: point-plane when close to the surface (ref: :151-156)
    mag = np.where(nearest < stdv, plane, nearest)
    keep = (num_pos == 0) | (num_pos == num_votes)
    sign = np.where(num_pos <= num_votes // 2, -1.0, 1.0)
    return (sign * mag).astype(np.float32), keep


# ---------------------------------------------------------------------------


def preprocess_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    num_samples: int = 500000,
    variance: float = 0.005,
    test: bool = False,
    num_votes: int = 11,
    surface_vote_points: int = 200000,
    seed: int = 0,
    center: bool = True,
    repair: bool = True,
    visibility: str = "auto",
    knn_devices=None,
    knn_force_device: bool | None = None,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Full mesh -> {pos, neg} sample generation
    (ref: src/PreprocessMesh.cpp:282-565).

    Returns (pos [N,4], neg [M,4], info) with float32 (x, y, z, sdf) rows.
    info carries the per-mesh ``quality`` ratios and ``rejected`` flag.
    ``repair=True`` additionally re-winds inconsistently oriented faces
    before sampling so the normal vote sees coherent outward normals.

    ``visibility`` selects how surface points are drawn:
      * "watertight" — area-weighted sampling over ALL faces (valid for the
        watertight volume-corrected medical meshes this pipeline targets);
      * "render" — the reference's multi-view visibility pass
        (ref: PreprocessMesh.cpp:443-494): 100 Fibonacci-sphere cameras
        rasterize face-id buffers (native C++ rasterizer standing in for
        the GL ShaderProgram, src/ShaderProgram.cpp:5-141) and base/vote
        points are sampled from VISIBLE faces only; the per-view
        wrong-normal observation ratio feeds the reference's
        mesh-rejection diagnostic (ref: :496-512, thresholds 0.02/0.03 —
        logged-and-proceed, like the reference);
      * "auto" — "render" when the mesh has boundary edges (non-watertight,
        where all-face sampling would place surface points on interior
        shells) and the native rasterizer is available, else "watertight".
    """
    if test:
        variance = 0.05
        second_variance = variance / 100.0
        near_ratio = 45.0 / 50.0
        num_samples = min(num_samples, 250000)
    else:
        second_variance = variance / 10.0
        near_ratio = 47.0 / 50.0
    stdv = math.sqrt(variance)

    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    if center:
        vmin = verts.min(axis=0)
        vmax = verts.max(axis=0)
        verts = verts - (vmin + vmax) / 2.0

    quality = mesh_quality(verts, faces)
    if quality["rejected"]:
        # ref logs "mesh rejected" but proceeds (PreprocessMesh.cpp:509-512,
        # early return commented out); callers read info["rejected"]
        logging.warning(
            "mesh rejected (winding=%.4f boundary=%.4f nonmanifold=%.4f)",
            quality["inconsistent_winding_ratio"], quality["boundary_edge_ratio"],
            quality["nonmanifold_edge_ratio"],
        )
    if repair and quality["inconsistent_winding_ratio"] > 0:
        faces, n_flipped = repair_mesh_winding(verts, faces)
        logging.info("repaired mesh winding: flipped %d faces", n_flipped)
        quality = dict(quality, repaired_faces=n_flipped)
    elif repair and signed_volume(verts, faces) < 0:
        # consistently wound but inward (negative enclosed volume): flip
        # globally so the orientation-sensitive render pass sees front
        # faces. (repair_mesh_winding only runs on INCONSISTENT meshes;
        # the reference's view-corrected normals, ShaderProgram.cpp:5-141,
        # make its sampling orientation-free, but its wrong-normal
        # rejection stats would flag an inward mesh the same way.)
        faces = np.ascontiguousarray(faces[:, ::-1])
        quality = dict(quality, global_flip=True)

    sample_faces, render_stats = _visibility_faces(verts, faces, visibility, quality)
    if render_stats is not None:
        quality = dict(quality, **render_stats)
        # reference observation-ratio rejection (PreprocessMesh.cpp:496-512):
        # >2-3% of covered pixels seeing a back-facing triangle flags a
        # badly-wound/doubled surface; logged-and-proceed like the reference
        if render_stats["wrong_normal_fraction"] > 0.02:
            logging.warning(
                "mesh rejected (render pass: %.2f%% wrong-normal observations)",
                100 * render_stats["wrong_normal_fraction"],
            )
            quality = dict(quality, rejected=True)

    rng = np.random.default_rng(seed)
    num_near = int(near_ratio * num_samples)
    base_n = num_near // 2

    # base surface points for jittered samples
    base_pts, _ = sample_surface_points(verts, sample_faces, base_n, rng)
    samp1 = base_pts + rng.normal(0.0, stdv, size=base_pts.shape).astype(np.float32)
    samp2 = base_pts + rng.normal(0.0, math.sqrt(second_variance), size=base_pts.shape).astype(np.float32)
    n_uniform = num_samples - 2 * base_n
    uniform = rng.uniform(-1.0, 1.0, size=(n_uniform, 3)).astype(np.float32)
    queries = np.concatenate([samp1, samp2, uniform], axis=0).astype(np.float32)

    # vote set: dense surface sampling with normals
    vote_pts, vote_norms = sample_surface_points(verts, sample_faces, surface_vote_points, rng)

    sdf, keep = knn_sign_vote(
        queries, vote_pts, vote_norms, num_votes=num_votes, stdv=stdv,
        devices=knn_devices, force_device=knn_force_device,
    )
    xyz = queries[keep]
    sdf = sdf[keep]

    pos = np.concatenate([xyz[sdf >= 0], sdf[sdf >= 0][:, None]], axis=1).astype(np.float32)
    neg = np.concatenate([xyz[sdf < 0], sdf[sdf < 0][:, None]], axis=1).astype(np.float32)
    info = {
        "num_queries": int(queries.shape[0]),
        "num_kept": int(xyz.shape[0]),
        "rejected_fraction": float(1.0 - xyz.shape[0] / queries.shape[0]),
        "quality": quality,
        "rejected": quality["rejected"],
    }
    if info["rejected_fraction"] > 0.5:
        logging.warning(
            "mesh quality: %.1f%% of samples rejected by the sign vote "
            "(non-watertight or inconsistent winding?)", 100 * info["rejected_fraction"],
        )
    return pos, neg, info


def _visibility_faces(verts, faces, visibility: str, quality: dict):
    """Resolve the face set surface samples are drawn from.

    Returns (faces_to_sample, render_stats-or-None). "render" restricts to
    the multi-view visible shell (ref: PreprocessMesh.cpp:443-494); "auto"
    uses the render pass only for non-watertight meshes."""
    if visibility not in ("auto", "render", "watertight"):
        raise ValueError(f"unknown visibility mode: {visibility!r}")
    use_render = visibility == "render"
    if visibility == "auto" and quality.get("boundary_edge_ratio", 0.0) > 0.0:
        from msd_tpu.native import load_native

        use_render = load_native() is not None
    if not use_render:
        return faces, None
    from msd_tpu.render import visibility_scan

    # scale a render copy to the camera rig's unit-sphere frame (the mesh
    # is centered but not scaled at this point, like the reference's
    # BoundingCubeNormalization center-only pass, Utils.cpp:170)
    vscale = float(np.linalg.norm(verts, axis=1).max()) or 1.0
    vis, stats = visibility_scan((verts / vscale, faces))
    stats = {f"render_{k}" if k == "visible_fraction" else k: v for k, v in stats.items()}
    if not vis.any():  # degenerate render (e.g. all-degenerate faces)
        return faces, stats
    return faces[vis], stats


def sample_visible_surface(
    verts: np.ndarray, faces: np.ndarray, num_points: int = 30000, seed: int = 0,
    visibility: str = "auto",
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Evaluation surface samples + normalization parameters
    (ref: src/SampleVisibleMeshSurface.cpp:144-324): (points [N,3],
    offset [3], scale) with offset = -bbox_center and
    scale = 1/(max_dist_from_center * 1.03). Points stay in the ORIGINAL
    mesh frame (the reference's normalization call is commented out,
    SampleVisibleMeshSurface.cpp:219); the params map them to the
    normalized frame used during training.

    ``visibility``: like preprocess_mesh — "render" keeps only samples on
    the multi-view visible shell (ref SampleFromSurfaceInside,
    SampleVisibleMeshSurface.cpp:59-142); "auto" renders only for
    non-watertight meshes."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    offset, scale = bounding_cube_normalization(verts, buffer=1.03)
    quality = mesh_quality(verts - verts.mean(axis=0), faces)
    faces_to_sample, _ = _visibility_faces(
        verts - (verts.min(axis=0) + verts.max(axis=0)) / 2.0, faces, visibility, quality
    )
    pts = sample_mesh_surface(verts, faces_to_sample, num_points, np.random.default_rng(seed))[0]
    return pts.astype(np.float32), offset, scale
