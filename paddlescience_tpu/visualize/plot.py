"""Matplotlib plot savers (reference ``ppsci/visualize/plot.py``)."""

from __future__ import annotations

import os
from typing import Dict, Sequence

import numpy as np

__all__ = ["save_plot_from_1d_dict", "save_plot_from_2d_dict", "save_plot_from_3d_dict"]


def _ensure_dir(filename):
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)


def save_plot_from_1d_dict(filename, data_dict, coord_keys, value_keys, num_timestamps: int = 1):
    """Line plots value(coord) (reference plot.py save_plot_from_1d_dict)."""
    import matplotlib.pyplot as plt

    _ensure_dir(filename)
    x = np.asarray(data_dict[coord_keys[-1]]).flatten()
    n_per = len(x) // num_timestamps
    for ts in range(num_timestamps):
        sl = slice(ts * n_per, (ts + 1) * n_per)
        fig, ax = plt.subplots()
        order = np.argsort(x[sl])
        for key in value_keys:
            y = np.asarray(data_dict[key]).flatten()[sl]
            ax.plot(x[sl][order], y[order], label=key)
        ax.set_xlabel(coord_keys[-1])
        ax.legend()
        out = f"{filename}.png" if num_timestamps == 1 else f"{filename}_t-{ts}.png"
        fig.savefig(out, dpi=150, bbox_inches="tight")
        plt.close(fig)


def save_plot_from_2d_dict(filename, data_dict, coord_keys, value_keys, num_timestamps: int = 1):
    """Scatter/contour value(x, y) (reference plot.py save_plot_from_2d_dict)."""
    import matplotlib.pyplot as plt

    _ensure_dir(filename)
    xk, yk = [k for k in coord_keys if k != "t"][:2]
    x = np.asarray(data_dict[xk]).flatten()
    y = np.asarray(data_dict[yk]).flatten()
    n_per = len(x) // num_timestamps
    for ts in range(num_timestamps):
        sl = slice(ts * n_per, (ts + 1) * n_per)
        fig, axes = plt.subplots(1, len(value_keys), figsize=(6 * len(value_keys), 5), squeeze=False)
        for ax, key in zip(axes[0], value_keys):
            v = np.asarray(data_dict[key]).flatten()[sl]
            sc = ax.scatter(x[sl], y[sl], c=v, cmap="jet", s=2)
            fig.colorbar(sc, ax=ax)
            ax.set_xlabel(xk)
            ax.set_ylabel(yk)
            ax.set_title(key)
        out = f"{filename}.png" if num_timestamps == 1 else f"{filename}_t-{ts}.png"
        fig.savefig(out, dpi=150, bbox_inches="tight")
        plt.close(fig)


def save_plot_from_3d_dict(filename, data_dict, coord_keys, value_keys, num_timestamps: int = 1):
    import matplotlib.pyplot as plt

    _ensure_dir(filename)
    xk, yk, zk = [k for k in coord_keys if k != "t"][:3]
    x = np.asarray(data_dict[xk]).flatten()
    y = np.asarray(data_dict[yk]).flatten()
    z = np.asarray(data_dict[zk]).flatten()
    n_per = len(x) // num_timestamps
    for ts in range(num_timestamps):
        sl = slice(ts * n_per, (ts + 1) * n_per)
        fig = plt.figure(figsize=(6 * len(value_keys), 5))
        for i, key in enumerate(value_keys):
            ax = fig.add_subplot(1, len(value_keys), i + 1, projection="3d")
            v = np.asarray(data_dict[key]).flatten()[sl]
            sc = ax.scatter(x[sl], y[sl], z[sl], c=v, cmap="jet", s=2)
            fig.colorbar(sc, ax=ax)
            ax.set_title(key)
        out = f"{filename}.png" if num_timestamps == 1 else f"{filename}_t-{ts}.png"
        fig.savefig(out, dpi=150, bbox_inches="tight")
        plt.close(fig)
