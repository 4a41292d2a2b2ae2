"""Plotting: training curves, PR/F1 curves, label stats, batch mosaics.

Counterpart of the reference plotting utilities (utils/plotting.py: Colors:20,
plot_images:1008, plot_labels:906, plot_results:1176, metrics.py:556 curve
plots). matplotlib is availability-gated; box drawing uses cv2 (always
present)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER


class Colors:
    """The ultralytics color palette (reference: plotting.py:20)."""

    def __init__(self):
        hexs = (
            "042AFF", "0BDBEB", "F3F3F3", "00DFB7", "111F68", "FF6FDD", "FF444F", "CCED00",
            "00F344", "BD00FF", "00B4FF", "DD00BA", "00FFFF", "26C000", "01FFB3", "7D24FF",
            "7B0068", "FF1B6C", "FC6D2F", "A2FF0B",
        )
        self.palette = [tuple(int(h[i : i + 2], 16) for i in (0, 2, 4)) for h in hexs]
        self.n = len(self.palette)

    def __call__(self, i: int, bgr: bool = False):
        c = self.palette[int(i) % self.n]
        return (c[2], c[1], c[0]) if bgr else c


colors = Colors()


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_results(csv_file: str | Path, save_dir: Optional[Path] = None) -> Optional[Path]:
    """Training curves from results.csv (reference: plotting.py:1176)."""
    import csv as csvmod

    csv_file = Path(csv_file)
    if not csv_file.exists():
        LOGGER.warning(f"plot_results: {csv_file} not found")
        return None
    with open(csv_file) as f:
        rows = list(csvmod.DictReader(f))
    if not rows:
        return None
    plt = _plt()
    keys = [k for k in rows[0] if k != "epoch"]
    n = len(keys)
    ncols = min(5, n)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
    epochs = [float(r["epoch"]) for r in rows]
    for i, k in enumerate(keys):
        ax = axes[i // ncols][i % ncols]
        vals = [float(r[k] or 0) for r in rows]
        ax.plot(epochs, vals, marker=".")
        ax.set_title(k, fontsize=9)
    fig.tight_layout()
    out = (save_dir or csv_file.parent) / "results.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_pr_curve(p_curve: np.ndarray, r_curve: np.ndarray, ap: np.ndarray, names: Dict[int, str],
                  save_dir: Path, x: Optional[np.ndarray] = None) -> Path:
    """PR curves per class (reference: metrics.py:556)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 6))
    for ci in range(p_curve.shape[0]):
        ax.plot(r_curve[ci], p_curve[ci], label=f"{names.get(ci, ci)} {ap[ci, 0]:.3f}" if len(names) < 21 else None)
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    if len(names) < 21:
        ax.legend(fontsize=7)
    save_dir.mkdir(parents=True, exist_ok=True)
    out = save_dir / "PR_curve.png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_labels(cls: np.ndarray, boxes_xywhn: np.ndarray, names: Dict[int, str], save_dir: Path) -> Optional[Path]:
    """Label distribution plots (reference: plotting.py:906)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].hist(cls, bins=max(len(names), 2))
    axes[0].set_title("classes")
    axes[1].scatter(boxes_xywhn[:, 0], boxes_xywhn[:, 1], s=3, alpha=0.4)
    axes[1].set_title("xy centers")
    axes[2].scatter(boxes_xywhn[:, 2], boxes_xywhn[:, 3], s=3, alpha=0.4)
    axes[2].set_title("wh")
    fig.tight_layout()
    save_dir.mkdir(parents=True, exist_ok=True)
    out = save_dir / "labels.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_images(batch: Dict[str, np.ndarray], names: Dict[int, str], save_path: Path, max_imgs: int = 16,
                imgsz_grid: int = 1920) -> Path:
    """Annotated train-batch mosaic (reference: plotting.py:1008)."""
    imgs = batch["img"][:max_imgs]
    n = len(imgs)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    h, w = imgs.shape[1:3]
    canvas = np.full((rows * h, cols * w, 3), 255, np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        tile = np.ascontiguousarray(im[..., ::-1])  # back to BGR for cv2
        m = batch["mask_gt"][i]
        cls = batch["cls"][i][m]
        for b, k in zip(batch["bboxes"][i][m], cls):
            if b.shape[-1] == 5:  # obb
                pts = cv2.boxPoints(((b[0] * w, b[1] * h), (b[2] * w, b[3] * h), float(np.degrees(b[4]))))
                cv2.polylines(tile, [pts.astype(np.int32)], True, colors(int(k), True), 2)
            else:
                x1 = int((b[0] - b[2] / 2) * w)
                y1 = int((b[1] - b[3] / 2) * h)
                x2 = int((b[0] + b[2] / 2) * w)
                y2 = int((b[1] + b[3] / 2) * h)
                cv2.rectangle(tile, (x1, y1), (x2, y2), colors(int(k), True), 2)
        canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = tile
    scale = imgsz_grid / max(canvas.shape[:2])
    if scale < 1:
        canvas = cv2.resize(canvas, (int(canvas.shape[1] * scale), int(canvas.shape[0] * scale)))
    save_path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(save_path), canvas)
    return save_path


def feature_visualization(feats, module_type: str, stage: int, n: int = 32, save_dir: Path = Path("runs/features")):
    """Channel-grid visualization of a feature map (reference: plotting.py:1347)."""
    import math

    f = np.asarray(feats[0] if feats.ndim == 4 else feats)  # (h, w, c)
    c = min(n, f.shape[-1])
    cols = int(math.ceil(math.sqrt(c)))
    h, w = f.shape[:2]
    canvas = np.zeros((cols * h, cols * w), np.float32)
    for i in range(c):
        r, cc = divmod(i, cols)
        ch = f[..., i]
        rng = ch.max() - ch.min()
        canvas[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = (ch - ch.min()) / (rng + 1e-6)
    save_dir.mkdir(parents=True, exist_ok=True)
    out = save_dir / f"stage{stage}_{module_type.split('.')[-1]}.png"
    cv2.imwrite(str(out), (canvas * 255).astype(np.uint8))
    return out


def plot_mc_curve(x: np.ndarray, y: np.ndarray, names: Dict[int, str], save_dir: Path,
                  ylabel: str = "F1", fname: Optional[str] = None) -> Path:
    """Metric-vs-confidence curves per class (reference: metrics.py:583 plot_mc_curve)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 6))
    for ci in range(y.shape[0]):
        ax.plot(x, y[ci], label=str(names.get(ci, ci)) if len(names) < 21 else None, linewidth=1)
    my = y.mean(0)
    ax.plot(x, my, linewidth=3, color="blue", label=f"all classes {my.max():.2f} at {x[my.argmax()]:.3f}")
    ax.set_xlabel("Confidence")
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(fontsize=7)
    save_dir.mkdir(parents=True, exist_ok=True)
    out = save_dir / (fname or f"{ylabel}_curve.png")
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_confusion_matrix(matrix: np.ndarray, names: Dict[int, str], save_dir: Path,
                          normalize: bool = True) -> Path:
    """Confusion-matrix heatmap (reference: metrics.py:394 ConfusionMatrix.plot)."""
    plt = _plt()
    m = matrix.astype(np.float64)
    if normalize:
        m = m / (m.sum(0, keepdims=True) + 1e-9)
    labels = [names.get(i, str(i)) for i in range(matrix.shape[0] - 1)] + ["background"]
    fig, ax = plt.subplots(figsize=(8, 7))
    im = ax.imshow(m, cmap="Blues", vmin=0.0)
    fig.colorbar(im, ax=ax)
    ax.set_xticks(range(len(labels)))
    ax.set_yticks(range(len(labels)))
    ax.set_xticklabels(labels, rotation=90, fontsize=7)
    ax.set_yticklabels(labels, fontsize=7)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    if matrix.shape[0] <= 30:
        for i in range(m.shape[0]):
            for j in range(m.shape[1]):
                if m[i, j] > 0.005:
                    ax.text(j, i, f"{m[i, j]:.2f}", ha="center", va="center", fontsize=6)
    fig.tight_layout()
    save_dir.mkdir(parents=True, exist_ok=True)
    out = save_dir / ("confusion_matrix_normalized.png" if normalize else "confusion_matrix.png")
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_val_curves(metrics, names: Dict[int, str], save_dir: Path) -> list:
    """Emit PR/F1/P/R curve PNGs from a DetMetrics-style object holding
    `curves_results` (the raw ap_per_class dict)."""
    curves = getattr(metrics, "curves_results", None)
    if not curves:
        return []
    x = np.linspace(0, 1, curves["p_curve"].shape[1])
    outs = [
        plot_pr_curve(curves["p_curve"], curves["r_curve"], curves["ap"],
                      {i: names.get(int(c), int(c)) for i, c in enumerate(curves["unique_classes"])}, save_dir),
        plot_mc_curve(x, curves["f1_curve"], names, save_dir, "F1"),
        plot_mc_curve(x, curves["p_curve"], names, save_dir, "Precision", "P_curve.png"),
        plot_mc_curve(x, curves["r_curve"], names, save_dir, "Recall", "R_curve.png"),
    ]
    return outs


def plot_tune_results(csv_file: str | Path = "tune_results.csv") -> Optional[Path]:
    """Scatter grid of each mutated hyperparameter vs fitness (best run
    circled) plus fitness-vs-iteration — reference utils/plotting.py
    plot_tune_results:1142. Saves tune_scatter_plots.png and
    tune_fitness.png next to the CSV; returns the scatter path."""
    import csv as _csv

    csv_file = Path(csv_file)
    if not csv_file.exists():
        return None
    with open(csv_file) as f:
        rows = list(_csv.DictReader(f))
    if not rows:
        return None
    plt = _plt()
    keys = [k for k in rows[0] if k not in ("iteration", "fitness")]
    fit = np.asarray([float(r["fitness"]) for r in rows])
    best_i = int(fit.argmax())

    n = len(keys)
    cols = int(np.ceil(np.sqrt(n)))
    rows_n = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows_n, cols, figsize=(cols * 2.5, rows_n * 2.5), tight_layout=True)
    axes = np.atleast_1d(axes).ravel()
    for ax, k in zip(axes, keys):
        v = np.asarray([float(r[k]) for r in rows])
        ax.scatter(v, fit, c=fit, cmap="viridis", alpha=0.8, edgecolors="none", s=16)
        ax.scatter(v[best_i], fit[best_i], marker="o", s=64, facecolors="none", edgecolors="r")
        ax.set_title(f"{k} = {v[best_i]:.3g}", fontsize=8)
        ax.tick_params(labelsize=6)
    for ax in axes[n:]:
        ax.axis("off")
    scatter_path = csv_file.with_name("tune_scatter_plots.png")
    fig.savefig(scatter_path, dpi=150)
    plt.close(fig)

    fig2, ax2 = plt.subplots(figsize=(6, 4), tight_layout=True)
    it = np.asarray([int(float(r["iteration"])) for r in rows])
    ax2.plot(it, fit, marker="o", ms=3, lw=1, label="fitness")
    ax2.plot(it, np.maximum.accumulate(fit), lw=2, label="best so far")
    ax2.scatter(it[best_i], fit[best_i], marker="*", s=120, c="r", zorder=3)
    ax2.set_xlabel("iteration"), ax2.set_ylabel("fitness"), ax2.legend()
    fig2.savefig(csv_file.with_name("tune_fitness.png"), dpi=150)
    plt.close(fig2)
    return scatter_path
