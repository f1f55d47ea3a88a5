#!/usr/bin/env python
"""Dimensionality-reduction plots of extracted embeddings
(reference scripts/utils/visualize_embeddings.py).

    python scripts/utils/visualize_embeddings.py --embeddings gtzan-embs --method tsne
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from vampnet_tpu import config as cfglib


def dim_reduce(emb: np.ndarray, labels, save_path: str, n_components: int = 2,
               method: str = "tsne", title: str = ""):
    """t-SNE/PCA projection scatter saved as png/html (reference :48-110)."""
    if method == "tsne":
        from sklearn.manifold import TSNE

        reducer = TSNE(n_components=n_components)
    elif method == "pca":
        from sklearn.decomposition import PCA

        reducer = PCA(n_components=n_components)
    elif method == "umap":  # pragma: no cover - optional dep
        from umap import UMAP

        reducer = UMAP(n_components=n_components)
    else:
        raise ValueError(f"unknown method {method}")

    proj = reducer.fit_transform(emb)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 6))
        uniq = sorted(set(labels))
        for g in uniq:
            idx = [i for i, l in enumerate(labels) if l == g]
            ax.scatter(proj[idx, 0], proj[idx, 1], label=g, s=12)
        ax.legend(fontsize=7)
        ax.set_title(title or f"{method} projection")
        fig.savefig(save_path, dpi=150)
        print(f"wrote {save_path}")
    except Exception as e:  # matplotlib-free environments
        np.save(Path(save_path).with_suffix(".npy"), proj)
        print(f"matplotlib unavailable ({e}); wrote raw projection instead")
    return proj


def main(argv=None):
    args = cfglib.parse_args(argv)
    emb_dir = Path(args["embeddings"])
    emb = np.load(emb_dir / "embeddings.npz")["embeddings"]
    labels = json.loads((emb_dir / "labels.json").read_text())
    return dim_reduce(
        emb, labels,
        save_path=args.get("save_path", str(emb_dir / "projection.png")),
        method=args.get("method", "tsne"),
        title=args.get("title", ""),
    )


if __name__ == "__main__":
    main()
