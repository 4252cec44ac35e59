"""Error plots over analyze_validation_data outputs.

Equivalent of the reference plotting module
(jarvis/analysis/plotting.py:18-194): masked euclidean-mm error histogram +
boxplot (median in the legend), per-keypoint mean bars, and per-keypoint
histograms, each saved as PNGs next to the CSVs.
"""

from __future__ import annotations

import os

import numpy as np


def _load_points(path):
    pointsGT = np.genfromtxt(
        os.path.join(path, "points_GroundTruth.csv"), delimiter=",")
    pointsGT = pointsGT.reshape(-1, pointsGT.shape[1] // 3, 3)
    pointsNet = np.genfromtxt(
        os.path.join(path, "points_HybridNet.csv"), delimiter=",")
    pointsNet = pointsNet.reshape(-1, pointsNet.shape[1] // 3, 3)
    return pointsGT, pointsNet


def _setup_style():
    import seaborn as sns

    sns.set_theme()
    sns.set_style("whitegrid", {"axes.grid": False})
    sns.set_context("paper", font_scale=1.25)
    return sns


def plot_error_histogram(path, additional_data={}, cutoff=-1,
                         interactive=True):
    import matplotlib.pyplot as plt
    import pandas as pd

    sns = _setup_style()
    pointsGT, pointsNet = _load_points(path)
    pointsList = [pointsNet]
    labels = ["JARVIS"]
    for name, csv_path in additional_data.items():
        labels.append(name)
        pts = np.genfromtxt(csv_path, delimiter=",")
        pointsList.append(pts.reshape(-1, pts.shape[1] // 3, 3))

    f, (ax_hist, ax_box) = plt.subplots(
        2, sharex=True, gridspec_kw={"height_ratios": (1, 0.2)},
        figsize=(6.92913, 6.92913 / 1.618),
    )
    plt.suptitle("Euclidean Distance to Ground Truth across all joints")
    distances_l = {}
    for label, points in zip(labels, pointsList):
        distances = np.sqrt(np.sum((points - pointsGT) ** 2, axis=2))
        mask = np.sum(pointsGT, axis=2)
        distances = distances[mask != 0]
        if cutoff != -1:
            distances[distances > cutoff] = cutoff
        distances_l[label] = distances.reshape(-1)
    distances_pd = pd.DataFrame(distances_l)

    sns.boxplot(data=distances_pd, fliersize=0, ax=ax_box, orient="h")
    sns.histplot(data=distances_pd, ax=ax_hist, element="step", alpha=0.1)
    legend = [
        f"{lab} ({np.median(distances_l[lab]):.2f} mm)"
        for lab in reversed(labels)
    ]
    ax_hist.legend(labels=legend, frameon=False)
    plt.xlabel("Deviation from manual annotations [mm]")
    if cutoff != -1:
        step = 2 if cutoff < 15 else 5
        plt.xlim(0, cutoff + 0.1)
        x_labels = [str(i) for i in range(0, cutoff, step)] + [f">{cutoff}"]
        plt.xticks(list(step * np.arange(len(x_labels) - 1)) + [cutoff])
        ax_box.set_xticklabels(x_labels)
    plt.savefig(os.path.join(path, "error_histogram.png"))
    if interactive:
        plt.show()
    return f


def plot_error_per_keypoint(path, project_name, interactive=True):
    import matplotlib.pyplot as plt

    from ..config.project_manager import ProjectManager

    _setup_style()
    pm = ProjectManager()
    pm.load(project_name)
    cfg = pm.get_cfg()

    fig = plt.figure()
    plt.subplots_adjust(left=0.1, right=0.9, top=0.9, bottom=0.3)
    plt.ylabel("Mean Deviation from manual annotations [mm]")
    plt.suptitle("Euclidean Distance to Ground Truth per Joint")

    pointsGT, pointsNet = _load_points(path)
    J = pointsNet.shape[1]
    distances = np.sqrt(np.sum((pointsNet - pointsGT) ** 2, axis=2))
    mask = np.sum(pointsGT, axis=2) == 0
    distances = np.ma.array(distances, mask=mask)
    joint_means = np.ma.mean(distances, axis=0)

    cmap = plt.colormaps.get_cmap("jet")
    for i in range(J):
        plt.bar(i, joint_means[i], width=0.8, color=cmap(i / J))
    plt.xticks([r + 0.1 for r in range(J)],
               [cfg.KEYPOINT_NAMES[i] for i in range(J)], rotation=90)
    plt.savefig(os.path.join(path, "error_per_joint.png"))
    if interactive:
        plt.show()
    return fig


def plot_error_histogram_per_keypoint(path, project_name, cutoff=-1,
                                      interactive=True):
    import matplotlib.pyplot as plt
    import pandas as pd

    from ..config.project_manager import ProjectManager

    sns = _setup_style()
    pm = ProjectManager()
    pm.load(project_name)
    cfg = pm.get_cfg()

    os.makedirs(os.path.join(path, "keypoint_histograms"), exist_ok=True)
    pointsGT, pointsNet = _load_points(path)

    J = len(cfg.KEYPOINT_NAMES)
    grid_h = int(np.sqrt(J))
    grid_w = int(np.ceil(J / grid_h))
    f, axs = plt.subplots(grid_h, grid_w)

    for k in range(J):
        distances = np.sqrt(
            np.sum((pointsNet[:, k] - pointsGT[:, k]) ** 2, axis=1))
        mask = np.sum(pointsGT[:, k], axis=1)
        distances = distances[mask != 0]
        if cutoff != -1:
            distances[distances > cutoff] = cutoff
        distances_pd = pd.DataFrame(
            {cfg.KEYPOINT_NAMES[k]: distances.reshape(-1)})

        sns.histplot(data=distances_pd, ax=axs[k // grid_w, k % grid_w],
                     element="step", alpha=0.1)

        fig, (ax_hist, ax_box) = plt.subplots(
            2, sharex=True, gridspec_kw={"height_ratios": (1, 0.2)},
            figsize=(6.92913, 6.92913 / 1.618),
        )
        sns.boxplot(data=distances_pd, fliersize=0, ax=ax_box, orient="h")
        sns.histplot(data=distances_pd, ax=ax_hist, element="step", alpha=0.1)
        fig.savefig(os.path.join(path, "keypoint_histograms",
                                 f"{cfg.KEYPOINT_NAMES[k]}.png"))
        plt.close(fig)

    if interactive:
        plt.show()
    return f
