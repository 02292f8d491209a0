"""Visualisation of samples and diagnostics.

TPU-native rebuild of the reference plotting module
(reference: inference/plotting.py:19-554): corner ('matrix') plots of 1D/2D
marginals, trace plots, highest-density-interval band plots, and
transition-matrix heatmaps. All functions are host-side matplotlib; density
estimates for the marginal panels come from the device-evaluated
``GaussianKDE`` / ``KDE2D``.
"""

from itertools import product, cycle
from collections.abc import Sequence
from warnings import warn

import numpy as np
import matplotlib.pyplot as plt
from matplotlib.patches import Rectangle
from matplotlib.collections import PatchCollection
from matplotlib import colormaps
import matplotlib.patheffects as path_effects

from .pdf.hdi import sample_hdi
from .pdf.kde import GaussianKDE, KDE2D


def matrix_plot(
    samples,
    labels=None,
    show: bool = True,
    reference: Sequence = None,
    filename: str = None,
    plot_style: str = "contour",
    colormap: str = "Blues",
    show_ticks: bool = None,
    point_colors: Sequence = None,
    hdi_fractions=(0.35, 0.65, 0.95),
    point_size: int = 1,
    label_size: int = 10,
):
    """
    Corner plot of all 1D and 2D marginal distributions for a set of
    parameter samples.

    :param samples: list of per-parameter sample arrays.
    :param labels: axis label per parameter.
    :param show: display the figure.
    :param reference: reference values over-plotted per parameter.
    :param filename: save path (not saved if omitted).
    :param plot_style: 'contour', 'hdi', 'histogram' or 'scatter'.
    :param colormap: matplotlib colormap name.
    :param show_ticks: force tick visibility (default: shown for < 6 params).
    :param point_colors: per-point colour data for the scatter style.
    :param hdi_fractions: probability fractions for 'hdi' contouring.
    :param point_size: marker size for the scatter style.
    :param label_size: axis-label font size.
    """
    N_par = len(samples)
    if labels is None:
        prefix = "p" if N_par >= 10 else "param "
        labels = [f"{prefix}{i}" for i in range(N_par)]
    elif len(labels) != N_par:
        raise ValueError(
            "[ matrix_plot error ] The number of labels given does not match "
            "the number of plotted parameters."
        )

    if reference is not None and len(reference) != N_par:
        raise ValueError(
            "[ matrix_plot error ] The number of reference values given does "
            "not match the number of plotted parameters."
        )

    if plot_style not in ["contour", "hdi", "histogram", "scatter"]:
        plot_style = "contour"
        warn(
            "'plot_style' must be set as either 'contour', 'hdi', 'histogram' "
            "or 'scatter'"
        )

    if not hasattr(hdi_fractions, "__iter__") or not all(
        0 < f < 1 for f in hdi_fractions
    ):
        raise ValueError(
            "[ matrix_plot error ] The 'hdi_fractions' argument must be given "
            "as an iterable of floats, each in the range [0, 1]."
        )

    if show_ticks is None:
        show_ticks = N_par < 6

    L = 200
    if colormap in colormaps:
        cmap = colormaps[colormap]
    else:
        cmap = colormaps["Blues"]
        warn(f"'{colormap}' is not a valid colormap from matplotlib.colormaps")
    marginal_color = sorted([cmap(10), cmap(245)], key=lambda c: sum(c[:-1]))[0]

    # axis arrays and limits from the 98% HDI padded by 30%
    axis_limits = []
    axis_arrays = []
    for sample in samples:
        lwr, upr = sample_hdi(np.asarray(sample), fraction=0.98)
        axis_limits.append([lwr - (upr - lwr) * 0.3, upr + (upr - lwr) * 0.3])
        axis_arrays.append(
            np.linspace(lwr - (upr - lwr) * 0.35, upr + (upr - lwr) * 0.35, L)
        )

    fig = plt.figure(figsize=(8, 8))
    # lower-triangular subplot indices in diagonal-striped order so shared
    # axes exist before they are referenced
    inds_list = [(N_par - 1, 0)]
    for k in range(1, N_par):
        inds_list.extend([(N_par - 1 - i, k - i) for i in range(k + 1)])

    axes = {}
    for i, j in inds_list:
        x_share = axes[(N_par - 1, j)] if i < N_par - 1 else None
        y_share = axes[(i, 0)] if (j > 0 and i != j) else None
        axes[(i, j)] = plt.subplot2grid(
            (N_par, N_par), (i, j), sharex=x_share, sharey=y_share
        )

    for i, j in inds_list:
        ax = axes[(i, j)]
        if i == j:
            sample = np.asarray(samples[i])
            pdf = GaussianKDE(sample)
            estimate = np.asarray(pdf(axis_arrays[i]))
            ax.plot(
                axis_arrays[i],
                0.9 * (estimate / estimate.max()),
                lw=1,
                color=marginal_color,
            )
            ax.fill_between(
                axis_arrays[i],
                0.9 * (estimate / estimate.max()),
                color=marginal_color,
                alpha=0.1,
            )
            if reference is not None:
                ax.plot(
                    [reference[i], reference[i]],
                    [0, 1],
                    lw=1.5,
                    ls="dashed",
                    color="red",
                )
            ax.set_ylim([0, 1])
        else:
            x = np.asarray(samples[j])
            y = np.asarray(samples[i])

            if plot_style == "contour":
                pdf = KDE2D(x=x, y=y)
                x_ax = axis_arrays[j][::4]
                y_ax = axis_arrays[i][::4]
                X, Y = np.meshgrid(x_ax, y_ax)
                prob = np.asarray(pdf(X.flatten(), Y.flatten())).reshape(
                    [L // 4, L // 4]
                )
                ax.set_facecolor(cmap(256 // 20))
                ax.contourf(X, Y, prob, 10, cmap=cmap)

            elif plot_style == "hdi":
                pdf = KDE2D(x=x, y=y)
                sample_probs = np.asarray(pdf(x, y))
                pcts = [100 * (1 - f) for f in hdi_fractions]
                levels = list(np.percentile(sample_probs, pcts))

                x_ax = axis_arrays[j][::4]
                y_ax = axis_arrays[i][::4]
                X, Y = np.meshgrid(x_ax, y_ax)
                prob = np.asarray(pdf(X.flatten(), Y.flatten())).reshape(
                    [L // 4, L // 4]
                )
                levels.append(prob.max())
                levels = sorted(levels)
                ax.contourf(X, Y, prob, levels=levels, cmap=cmap)
                ax.contour(X, Y, prob, levels=levels, alpha=0.2)

            elif plot_style == "histogram":
                ax.set_facecolor(cmap(0))
                ax.hexbin(x, y, gridsize=35, cmap=cmap)

            else:
                if point_colors is None:
                    ax.scatter(x, y, color=marginal_color, s=point_size)
                else:
                    ax.scatter(x, y, c=point_colors, s=point_size, cmap=cmap)

            if reference is not None:
                for edge, width in [("white", 3.5), ("red", 2)]:
                    ax.plot(
                        reference[j],
                        reference[i],
                        marker="o",
                        markersize=7,
                        markerfacecolor="none",
                        markeredgecolor=edge,
                        markeredgewidth=width,
                    )

        if i == N_par - 1:
            ax.set_xlabel(labels[j], fontsize=label_size)
            ax.set_xlim(axis_limits[j])
        if j == 0 and i != 0:
            ax.set_ylabel(labels[i], fontsize=label_size)
            ax.set_ylim(axis_limits[i])

        if show_ticks:
            if i < N_par - 1:
                plt.setp(ax.get_xticklabels(), visible=False)
            if j > 0:
                plt.setp(ax.get_yticklabels(), visible=False)
            if i == j:
                ax.set_yticks([])
        else:
            ax.set_xticks([])
            ax.set_yticks([])

    fig.tight_layout()
    fig.subplots_adjust(wspace=0.0, hspace=0.0)
    if filename is not None:
        plt.savefig(filename)
    if show:
        plt.show()

    return fig


def trace_plot(samples, labels=None, show=True, filename=None):
    """
    Grid of per-parameter value-vs-step-number traces.

    :param samples: list of per-parameter sample arrays.
    :param labels: axis label per parameter.
    :param show: display the figure.
    :param filename: save path (not saved if omitted).
    """
    N_par = len(samples)
    if labels is None:
        prefix = "p" if N_par >= 10 else "param "
        labels = [f"{prefix}{i}" for i in range(N_par)]
    elif len(labels) != N_par:
        raise ValueError(
            "number of labels must match the number of plotted parameters"
        )

    # grid shape: allow up to twice as many rows as columns
    n = int(np.ceil(np.sqrt(0.5 * N_par)))
    m = int(np.ceil(float(N_par) / float(n)))

    fig = plt.figure(figsize=(12, 8))
    grid_inds = product(range(m), range(n))
    colors = cycle(["C0", "C1", "C2", "C3", "C4"])
    axes = {}
    for s, label, coords, col in zip(samples, labels, grid_inds, colors):
        i, j = coords
        if i == 0 and j == 0:
            axes[(i, j)] = plt.subplot2grid((m, n), (i, j))
        else:
            axes[(i, j)] = plt.subplot2grid((m, n), (i, j), sharex=axes[(0, 0)])

        s = np.asarray(s)
        axes[(i, j)].plot(s, ".", markersize=4, alpha=0.15, c=col)
        axes[(i, j)].set_ylabel(label)
        lwr, upr = sample_hdi(s, fraction=0.99)
        mid = 0.5 * sum(sample_hdi(s, fraction=0.10))
        axes[(i, j)].set_ylim([lwr - (mid - lwr) * 0.7, upr + (upr - mid) * 0.7])
        axes[(i, j)].set_yticks(
            [lwr - (mid - lwr) * 0.5, mid, upr + (upr - mid) * 0.5]
        )
        if i < m - 1:
            plt.setp(axes[(i, j)].get_xticklabels(), visible=False)
        else:
            axes[(i, j)].set_xlabel("chain step #")
    fig.tight_layout()
    if filename is not None:
        plt.savefig(filename)
    if show:
        plt.show()
    return fig


def hdi_plot(
    x,
    sample,
    intervals: Sequence = (0.65, 0.95),
    colormap: str = "Blues",
    axis=None,
    label_intervals=True,
    color_levels=None,
):
    """
    Filled highest-density-interval bands over ``x`` from a set of model
    realisations.

    :param x: x-axis locations, shape (len(x),).
    :param sample: realisations, shape (n, len(x)).
    :param intervals: probability fractions per band.
    :param colormap: matplotlib colormap name.
    :param axis: existing matplotlib axis to draw on.
    :param label_intervals: add legend labels per band.
    :param color_levels: explicit colormap levels (0-255) per band.
    """
    intervals = np.sort(np.array(intervals))[::-1]

    if not all((intervals > 0.0) & (intervals < 1.0)):
        raise ValueError("All intervals must be greater than 0 and less than 1")

    s = np.array(sample)
    if s.shape[1] != len(x):
        if s.shape[0] == len(x):
            s = s.T
        else:
            raise ValueError('"x" and "sample" have incompatible dimensions')

    s.sort(axis=0)

    if colormap in colormaps:
        cmap = colormaps[colormap]
    else:
        cmap = colormaps["Blues"]
        warn(f"'{colormap}' is not a valid colormap from matplotlib.colormaps")

    if color_levels is None:
        lwr, upr = 0.20, 1.0
        color_levels = 255 * ((upr - lwr) * (1 - intervals) + lwr)

    colors = [cmap(int(c)) for c in color_levels]

    if axis is None:
        _, axis = plt.subplots()

    for frac, col in zip(intervals, colors):
        lwr, upr = sample_hdi(s, fraction=frac)
        lab = f"{int(100 * frac)}% HDI" if label_intervals else None
        axis.fill_between(x, lwr, upr, color=col, label=lab)

    return axis


def transition_matrix_plot(
    axis=None,
    matrix=None,
    colormap: str = "viridis",
    exclude_diagonal: bool = False,
    upper_triangular=False,
):
    """
    Rectangle-patch heatmap of a Markov-chain transition (or swap-rate)
    matrix with percentage text overlays.

    :param axis: existing matplotlib axis to draw on.
    :param matrix: 2D square array of probabilities in [0, 1].
    :param colormap: matplotlib colormap name.
    :param exclude_diagonal: omit the diagonal cells.
    :param upper_triangular: plot only the upper triangle.
    """
    if not isinstance(matrix, np.ndarray):
        raise TypeError("given matrix must be a numpy.ndarray")
    if matrix.ndim != 2:
        raise ValueError("given matrix must have exactly two dimensions")
    if matrix.shape[0] != matrix.shape[1]:
        raise ValueError("given matrix must be square")
    if matrix.shape[0] == 1:
        raise ValueError("given matrix must be at least of size 2x2")

    N = matrix.shape[0]

    if upper_triangular:
        inds = [(i, j) for i in range(N) for j in range(N) if i <= j]
    else:
        inds = [(i, j) for i in range(N) for j in range(N)]
    if exclude_diagonal:
        inds = [(i, j) for i, j in inds if i != j]

    rectangles = [Rectangle((i + 0.5, j + 0.5), 1, 1) for i, j in inds]

    x_sorted = sorted(i[0] for i in inds)
    y_sorted = sorted(i[1] for i in inds)
    x_limits = [x_sorted[0] + 0.5, x_sorted[-1] + 1.5]
    y_limits = [y_sorted[0] + 0.5, y_sorted[-1] + 1.5]

    if colormap in colormaps:
        cmap = colormaps[colormap]
    else:
        cmap = colormaps["viridis"]
        warn(f"'{colormap}' is not a valid colormap from matplotlib.colormaps")

    rectangle_colors = [cmap(matrix[i, j] / matrix.max()) for i, j in inds]
    pc = PatchCollection(
        rectangles, facecolors=rectangle_colors, edgecolors=["black"] * N
    )

    if axis is None:
        _, axis = plt.subplots()

    axis.add_collection(pc)
    axis.set_xlim(x_limits)
    axis.set_ylim(y_limits)

    if N < 11:
        fsize = 20 - N
        for i, j in inds:
            axis.text(
                i + 1,
                j + 1,
                f"{int(matrix[i, j] * 100)}%",
                horizontalalignment="center",
                verticalalignment="center",
                color="white",
                fontsize=fsize,
            ).set_path_effects(
                [
                    path_effects.Stroke(linewidth=1.5, foreground="black"),
                    path_effects.Normal(),
                ]
            )

    return axis
