"""Evaluation plots (reference auto_pose/eval/eval_plots.py, matplotlib).

Subset rebuilt: per-metric error histograms + cumulative error curves,
codebook embedding PCA scatter, and the viewsphere scatter. All figures are
written as PNGs into the eval dir (headless Agg backend).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_error_hist(errors: Sequence[float], error_type: str, out_dir: str) -> str:
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.hist(np.asarray(errors), bins=30, color="#4878d0")
    ax.set_xlabel(f"{error_type} error")
    ax.set_ylabel("count")
    ax.set_title(f"{error_type} error histogram ({len(errors)} estimates)")
    path = os.path.join(out_dir, f"error_hist_{error_type}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    from .tikz import write_hist_tikz

    write_hist_tikz(errors, error_type, out_dir)  # paper-ready .tex twin
    return path


def plot_cumulative_error(
    errors: Sequence[float], error_type: str, out_dir: str, threshold: Optional[float] = None
) -> str:
    plt = _plt()
    errs = np.sort(np.asarray(errors))
    frac = np.arange(1, len(errs) + 1) / len(errs)
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(errs, frac, color="#4878d0")
    if threshold is not None:
        ax.axvline(threshold, color="#d65f5f", linestyle="--", label=f"thresh {threshold:g}")
        ax.legend()
    ax.set_xlabel(f"{error_type} error")
    ax.set_ylabel("recall")
    ax.set_ylim(0, 1)
    ax.set_title(f"cumulative {error_type} error")
    path = os.path.join(out_dir, f"cumulative_{error_type}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    from .tikz import write_cumulative_tikz

    write_cumulative_tikz(errors, error_type, out_dir, threshold=threshold)
    return path


def plot_embedding_pca(
    embedding: np.ndarray, out_dir: str, test_codes: Optional[np.ndarray] = None
) -> str:
    """3-component PCA of the codebook (eval_plots.py:267-289)."""
    plt = _plt()
    x = np.asarray(embedding, np.float64)
    x = x - x.mean(axis=0)
    # PCA via SVD (no sklearn dependency)
    _, _, Vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ Vt[:3].T
    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(proj[:, 0], proj[:, 1], proj[:, 2], s=1, c=np.arange(len(proj)), cmap="viridis")
    if test_codes is not None:
        tc = (np.asarray(test_codes) - np.asarray(embedding).mean(axis=0)) @ Vt[:3].T
        ax.scatter(tc[:, 0], tc[:, 1], tc[:, 2], s=20, c="red", marker="x")
    ax.set_title("codebook embedding PCA-3")
    path = os.path.join(out_dir, "embedding_pca.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_viewsphere(pts: np.ndarray, out_dir: str) -> str:
    plt = _plt()
    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=2)
    ax.set_title(f"viewsphere ({len(pts)} views)")
    path = os.path.join(out_dir, "viewsphere.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_scores_bar(scores: Dict[str, Dict], out_dir: str) -> str:
    plt = _plt()
    names = list(scores.keys())
    recalls = [scores[n]["recall"] for n in names]
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.bar(names, recalls, color="#4878d0")
    ax.set_ylabel("recall")
    ax.set_ylim(0, 1)
    for i, v in enumerate(recalls):
        ax.text(i, v + 0.02, f"{v:.3f}", ha="center")
    path = os.path.join(out_dir, "recall_by_metric.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path
