"""Figure helpers for TensorBoard and offline analysis.

Behavioral ports of the load-bearing pieces of deep_sdf/plotting.py (799
LoC): training-stat curves (:55-76), Chamfer-distance violin plots with
percentile annotations (:78-126), SDF cross-sections (:359-391), latent
t-SNE manifolds (:672-751), and latent interpolation strips (:753-799).

Offscreen mesh rendering uses matplotlib 3-D trisurf instead of the
reference's pyrender/EGL stack (pyrender is not available; the figures
serve the same diagnostic role).
"""

from __future__ import annotations

import logging
import time
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_train_stats(loss_hists, psnr_hist=None, step_hist=None, labels=None, save_path=""):
    """Loss curves for multiple runs (ref: plotting.py:55-76)."""
    fig, ax = plt.subplots(1, 1)
    ax.set_xlabel("Iterations")
    ax.set_ylabel("Loss")
    for i, hist in enumerate(loss_hists):
        xs = step_hist if step_hist is not None else np.arange(len(hist))
        label = labels[i] if labels else f"run {i}"
        ax.plot(xs[: len(hist)], hist, label=label)
    ax.set_yscale("log")
    ax.legend(loc="upper right", fontsize="small")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    return fig


def plot_dist_violin(data: np.ndarray, percentile_keys=(50, 75, 90, 99)):
    """Violin plot of NN distances with percentile annotations
    (ref: plotting.py:78-126). Returns (fig, {percentile: value})."""
    start = time.time()
    colors = ["lightblue", "green", "orange", "purple", "lime"]
    fig, ax = plt.subplots(1, 1)
    ax.set_ylabel("Distance to NN")
    ax.set_title("Nearest Neighbor Distances (Two-way)")
    ax.set_xticks([])

    vplot = ax.violinplot(data, showmeans=False, showextrema=True)
    percentiles = {k: p for k, p in zip(percentile_keys, np.percentile(data, list(percentile_keys)))}
    for k, p in reversed(list(percentiles.items())):
        name = f"{k}th percentile" if k != 50 else "Median"
        ax.hlines([p], xmin=[0.9], xmax=[1.1], linestyles="--", colors=[colors.pop()], label=name)
        ax.annotate(f"{p:.4f}", xy=[1.1, p], va="center")
    ax.scatter(1, np.mean(data), marker="o", color="red", s=100, zorder=999, label="Mean (CD)")
    ax.legend(loc="upper left")
    for vp in vplot["bodies"]:
        vp.set_facecolor("cornflowerblue")
        vp.set_alpha(1)
    logging.debug("Plotting all chamfer distances took %.3fs", time.time() - start)
    return fig, percentiles


def render_mesh(verts: np.ndarray, faces: np.ndarray, cam_angles=(-np.pi / 7, np.pi / 4, 0), ax=None):
    """Offscreen mesh render via matplotlib trisurf (replaces
    pyrender_helper/render_mesh, ref: plotting.py:127-147, :318-335)."""
    created = ax is None
    if created:
        fig = plt.figure()
        ax = fig.add_subplot(111, projection="3d")
    else:
        fig = ax.figure
    ax.plot_trisurf(
        verts[:, 0], verts[:, 1], faces, verts[:, 2],
        color="lightsteelblue", edgecolor="none", shade=True,
    )
    ax.view_init(elev=np.degrees(cam_angles[0]), azim=np.degrees(cam_angles[1]))
    ax.set_axis_off()
    ax.set_box_aspect((1, 1, 1))
    return fig


def render_sdf(points: np.ndarray, sdf: np.ndarray, cam_angles=(-np.pi / 7, np.pi / 4, 0)):
    """Scatter SDF samples colored by sign (ref: plotting.py:285-316)."""
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    inside = sdf < 0
    ax.scatter(*points[~inside].T, c=sdf[~inside], cmap="Reds_r", s=1, alpha=0.4)
    ax.scatter(*points[inside].T, c=sdf[inside], cmap="Blues", s=1, alpha=0.6)
    ax.view_init(elev=np.degrees(cam_angles[0]), azim=np.degrees(cam_angles[1]))
    return fig


def plot_sdf_cross_section(
    points: np.ndarray,
    sdf: np.ndarray,
    margin: float = 0.05,
    plane_orig=np.array([0.0, 0.0, 0.0]),
    plane_normal=np.array([1.0, 0.0, 0.0]),
    save_filepath: str = "",
    ax=None,
):
    """Scatter the SDF values of samples near a cutting plane
    (ref: plotting.py:359-391)."""
    plane_normal = np.asarray(plane_normal, float)
    plane_normal = plane_normal / np.linalg.norm(plane_normal)
    dist = (points - plane_orig) @ plane_normal
    mask = np.abs(dist) < margin
    # project points onto the two in-plane axes
    helper = np.array([0.0, 0.0, 1.0]) if abs(plane_normal[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    u = np.cross(plane_normal, helper)
    u /= np.linalg.norm(u)
    v = np.cross(plane_normal, u)
    created = ax is None
    if created:
        fig, ax = plt.subplots(1, 1)
    else:
        fig = ax.figure
    p2 = (points[mask] - plane_orig) @ np.stack([u, v], axis=1)
    sc = ax.scatter(p2[:, 0], p2[:, 1], c=sdf[mask], cmap="seismic", vmin=-0.1, vmax=0.1, s=4)
    fig.colorbar(sc, ax=ax)
    ax.set_aspect("equal")
    if save_filepath:
        fig.savefig(save_filepath, bbox_inches="tight")
    return fig


def plot_manifold_tsne(latents: np.ndarray, labels=None, perplexity: float = 30.0, seed: int = 0):
    """2-D t-SNE of latent codes (ref: plotting.py:672-751)."""
    from sklearn.manifold import TSNE

    perplexity = min(perplexity, max(2.0, (latents.shape[0] - 1) / 3.0))
    emb = TSNE(n_components=2, perplexity=perplexity, random_state=seed).fit_transform(latents)
    fig, ax = plt.subplots(1, 1)
    if labels is not None:
        sc = ax.scatter(emb[:, 0], emb[:, 1], c=np.asarray(labels, float), cmap="coolwarm", s=12)
        fig.colorbar(sc, ax=ax)
    else:
        ax.scatter(emb[:, 0], emb[:, 1], s=12)
    ax.set_title("Latent manifold (t-SNE)")
    return fig


def plot_lat_interpolation(
    decoder, params, latent_a, latent_b, steps: int = 5, N: int = 97, create_mesh_fn=None
):
    """Latent lerp -> mesh -> rendered strip (ref: plotting.py:753-799)."""
    from msd_tpu.mesh import create_mesh as _create_mesh

    create_mesh_fn = create_mesh_fn or _create_mesh
    fig = plt.figure(figsize=(3 * steps, 3))
    for i, t in enumerate(np.linspace(0.0, 1.0, steps)):
        lat = (1 - t) * np.asarray(latent_a) + t * np.asarray(latent_b)
        res = create_mesh_fn(decoder, params, lat, N=N, return_mesh=True)
        ax = fig.add_subplot(1, steps, i + 1, projection="3d")
        if res is not None and res is not False:
            render_mesh(res[0], res[1], ax=ax)
        ax.set_title(f"t={t:.2f}")
    return fig
