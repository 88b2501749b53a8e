"""Result rendering (reference: src/trainer/utils/plot.py, src/utils/viz.py).

Matplotlib-only (pyvista is an optional extra in the reference too); 4-panel
3D scatter: input geometry / ground truth / prediction / absolute difference
(plot.py:120-204 plot_3d_comparison_matplotlib).
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def plot_3d_comparison_pyvista(
    coords: np.ndarray,
    u_gtr: np.ndarray,
    u_prd: np.ndarray,
    save_path: str,
    variable_name: str = "u",
    point_size: float = 3.0,
) -> bool:
    """3-panel off-screen PyVista render (reference: plot.py:9-117). Optional:
    returns False (and logs) when pyvista is not installed."""
    try:
        import pyvista as pv
    except ImportError:
        logger.info("pyvista not installed; skipping pyvista render")
        return False
    coords = np.asarray(coords)
    cloud = pv.PolyData(coords)
    pl = pv.Plotter(off_screen=True, shape=(1, 3), window_size=(1800, 600))
    for i, (title, vals) in enumerate(
        [(f"GT {variable_name}", u_gtr), (f"Pred {variable_name}", u_prd),
         ("abs error", np.abs(np.asarray(u_gtr) - np.asarray(u_prd)))]
    ):
        pl.subplot(0, i)
        c = cloud.copy()
        c["v"] = np.asarray(vals).reshape(-1)
        pl.add_mesh(c, scalars="v", cmap="jet", point_size=point_size)
        pl.add_title(title, font_size=10)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    pl.screenshot(save_path)
    pl.close()
    return True


def plot_3d_comparison(
    coords: np.ndarray,
    u_gtr: np.ndarray,
    u_prd: np.ndarray,
    save_path: str,
    variable_name: str = "u",
    point_size: float = 2.0,
    view_angle=(25, -135),
    hide_grid: bool = True,
    show_diff: bool = True,
    max_points: int = 50000,
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    coords = np.asarray(coords)
    u_gtr = np.asarray(u_gtr).reshape(-1)
    u_prd = np.asarray(u_prd).reshape(-1)
    if coords.shape[0] > max_points:
        sel = np.random.default_rng(0).choice(coords.shape[0], max_points, replace=False)
        coords, u_gtr, u_prd = coords[sel], u_gtr[sel], u_prd[sel]

    vmin = min(u_gtr.min(), u_prd.min())
    vmax = max(u_gtr.max(), u_prd.max())
    npanels = 4 if show_diff else 3
    fig = plt.figure(figsize=(4 * npanels, 4.2))
    panels = [
        ("input geometry", None, None, None),
        (f"ground truth {variable_name}", u_gtr, vmin, vmax),
        (f"prediction {variable_name}", u_prd, vmin, vmax),
    ]
    if show_diff:
        diff = np.abs(u_gtr - u_prd)
        panels.append(("abs error", diff, 0.0, diff.max() if diff.size else 1.0))

    for i, (title, vals, lo, hi) in enumerate(panels):
        ax = fig.add_subplot(1, npanels, i + 1, projection="3d")
        if vals is None:
            ax.scatter(coords[:, 0], coords[:, 1], coords[:, 2], s=point_size, c="gray")
        else:
            sc = ax.scatter(
                coords[:, 0], coords[:, 1], coords[:, 2],
                s=point_size, c=vals, cmap="jet", vmin=lo, vmax=hi,
            )
            fig.colorbar(sc, ax=ax, shrink=0.6)
        ax.set_title(title)
        ax.view_init(*view_angle)
        if hide_grid:
            ax.set_axis_off()
        ax.set_box_aspect(
            (np.ptp(coords[:, 0]) or 1, np.ptp(coords[:, 1]) or 1, np.ptp(coords[:, 2]) or 1)
        )
    fig.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    logger.info("Saved 3D comparison plot to %s", save_path)
