#!/usr/bin/env python3
"""Latent-space manifold visualization — script equivalent of the
reference's run_HLLE_ICA_latent_space.ipynb (the notebook itself is a
missing blob in the reference history; this covers its advertised role:
HLLE / ICA / t-SNE 2-D embeddings of trained Stage-1 latents, colored by
labels when available).

Usage:
  python latent_manifold.py -e <experiment_dir> [--checkpoint latest]
      [--methods hlle ica tsne] [--labels_path labels.pt] [--label_index 0]
"""

import argparse
import logging
import os

import numpy as np

import msd_tpu.workspace as ws
from msd_tpu.utils import add_common_args, configure_logging


def embed(latents: np.ndarray, method: str, seed: int = 0) -> np.ndarray:
    """[S, L] -> [S, 2] embedding."""
    if method == "hlle":
        from sklearn.manifold import LocallyLinearEmbedding

        # HLLE needs n_neighbors > n_components * (n_components + 3) / 2
        n_neighbors = max(8, min(latents.shape[0] - 1, 12))
        return LocallyLinearEmbedding(
            n_neighbors=n_neighbors, n_components=2, method="hessian",
            random_state=seed,
        ).fit_transform(latents)
    if method == "ica":
        from sklearn.decomposition import FastICA

        return FastICA(n_components=2, random_state=seed, max_iter=1000).fit_transform(latents)
    if method == "tsne":
        from sklearn.manifold import TSNE

        perplexity = min(30.0, max(2.0, latents.shape[0] / 4))
        return TSNE(n_components=2, random_state=seed, perplexity=perplexity).fit_transform(latents)
    if method == "pca":
        from sklearn.decomposition import PCA

        return PCA(n_components=2, random_state=seed).fit_transform(latents)
    raise ValueError(f"unknown embedding method {method!r}")


def main():
    parser = argparse.ArgumentParser(description="latent manifold embeddings")
    parser.add_argument("--experiment", "-e", required=True)
    parser.add_argument("--checkpoint", "-c", default="latest")
    parser.add_argument("--methods", nargs="+", default=["hlle", "ica"],
                        choices=["hlle", "ica", "tsne", "pca"])
    parser.add_argument("--labels_path", default=None,
                        help="labels file (.pt/.npz/.json); colors points by a label")
    parser.add_argument("--label_index", type=int, default=0,
                        help="which label column to color by")
    parser.add_argument("--out_dir", default=None,
                        help="default: <experiment>/Evaluation/Manifold")
    add_common_args(parser)
    args = parser.parse_args()
    configure_logging(args)

    from msd_tpu.utils import checkpoint as ckpt

    latents, epoch = ckpt.load_latent_vectors(args.experiment, args.checkpoint + ".pth")
    latents = np.asarray(latents, np.float64)
    logging.info("loaded %d latents (dim %d) from epoch %s", *latents.shape, epoch)

    colors = None
    if args.labels_path:
        from msd_tpu.data.labels import load_labels
        from msd_tpu.data.splits import load_split, split_instance_ids

        specs = ws.load_experiment_specifications(args.experiment)
        ids = split_instance_ids(load_split(specs["TrainSplit"]))
        labels = load_labels(args.labels_path)
        if len(ids) == latents.shape[0]:
            colors = np.array([
                float(np.asarray(labels.get(iid, [np.nan])).reshape(-1)[args.label_index])
                for iid in ids
            ])
        else:
            logging.warning(
                "split has %d ids but %d latents (missing sample files at "
                "train time?) — skipping label coloring", len(ids), latents.shape[0],
            )

    out_dir = args.out_dir or os.path.join(args.experiment, ws.evaluation_subdir, "Manifold")
    os.makedirs(out_dir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for method in args.methods:
        try:
            emb = embed(latents, method)
        except Exception as e:
            logging.warning("%s embedding failed: %s", method, e)
            continue
        fig, ax = plt.subplots(figsize=(6, 5))
        sc = ax.scatter(emb[:, 0], emb[:, 1], c=colors, cmap="viridis", s=14)
        if colors is not None:
            fig.colorbar(sc, ax=ax, label=f"label[{args.label_index}]")
        ax.set_title(f"{method.upper()} embedding of Stage-1 latents (epoch {epoch})")
        path = os.path.join(out_dir, f"latent_{method}.png")
        fig.tight_layout()
        fig.savefig(path, dpi=150)
        plt.close(fig)
        np.save(os.path.join(out_dir, f"latent_{method}.npy"), emb)
        logging.info("wrote %s", path)


if __name__ == "__main__":
    main()
