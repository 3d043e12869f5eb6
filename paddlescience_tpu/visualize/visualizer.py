"""Visualizer classes (reference ``ppsci/visualize/visualizer.py:30-390``):
hold input points + output expressions + batch size; Solver.visualize()
predicts then calls ``save(prefix, data_dict)``."""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from paddlescience_tpu.visualize import plot as plot_mod
from paddlescience_tpu.visualize import vtu as vtu_mod

__all__ = [
    "Visualizer",
    "VisualizerVtu",
    "Visualizer1D",
    "Visualizer2D",
    "Visualizer2DPlot",
    "Visualizer3D",
    "VisualizerScatter1D",
    "VisualizerScatter3D",
    "VisualizerWeather",
    "VisualizerRadar",
]


class Visualizer:
    def __init__(
        self,
        input_dict: Dict[str, np.ndarray],
        output_expr: Dict[str, Callable],
        batch_size: int = 64,
        num_timestamps: int = 1,
        prefix: str = "vtu",
    ):
        self.input_dict = input_dict
        self.input_keys = tuple(input_dict.keys())
        self.output_expr = output_expr
        self.output_keys = tuple(output_expr.keys())
        self.batch_size = batch_size
        self.num_timestamps = num_timestamps
        self.prefix = prefix

    def save(self, filename: str, data_dict: Dict[str, np.ndarray]):
        raise NotImplementedError

    def __str__(self):
        return ", ".join(
            [
                self.__class__.__name__,
                f"input_keys = {self.input_keys}",
                f"output_keys = {self.output_keys}",
                f"prefix = {self.prefix}",
            ]
        )


class VisualizerVtu(Visualizer):
    """Point-cloud VTU export (reference visualizer.py:125)."""

    def save(self, filename: str, data_dict):
        vtu_mod.save_vtu_from_dict(filename, data_dict, self.input_keys, self.output_keys, self.num_timestamps)


class Visualizer1D(Visualizer):
    def save(self, filename: str, data_dict):
        plot_mod.save_plot_from_1d_dict(filename, data_dict, self.input_keys, self.output_keys, self.num_timestamps)


VisualizerScatter1D = Visualizer1D


class Visualizer2D(Visualizer):
    def save(self, filename: str, data_dict):
        plot_mod.save_plot_from_2d_dict(filename, data_dict, self.input_keys, self.output_keys, self.num_timestamps)


class Visualizer2DPlot(Visualizer2D):
    """reference visualizer.py:204 (adds stride/bounds; plot variant)."""


class Visualizer3D(Visualizer):
    """reference visualizer.py:286."""

    def save(self, filename: str, data_dict):
        plot_mod.save_plot_from_3d_dict(filename, data_dict, self.input_keys, self.output_keys, self.num_timestamps)


VisualizerScatter3D = Visualizer3D


class VisualizerWeather(Visualizer):
    """Side-by-side (prediction, target) global-field images per timestamp
    (reference visualizer.py:323-390: pcolormesh pairs with shared colormap,
    optional LogNorm for precipitation)."""

    def __init__(
        self,
        input_dict,
        output_expr,
        xticks=None,
        xticklabels=None,
        yticks=None,
        yticklabels=None,
        vmin: float = 0.0,
        vmax: float = 1.0,
        colorbar_label: str = "",
        log_norm: bool = False,
        batch_size: int = 1,
        num_timestamps: int = 1,
        prefix: str = "plot_weather",
    ):
        super().__init__(input_dict, output_expr, batch_size, num_timestamps, prefix)
        self.xticks, self.xticklabels = xticks, xticklabels
        self.yticks, self.yticklabels = yticks, yticklabels
        self.vmin, self.vmax = vmin, vmax
        self.colorbar_label = colorbar_label
        self.log_norm = log_norm

    def save(self, filename: str, data_dict):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib import colors

        keys = list(self.output_keys)
        norm = colors.LogNorm(max(self.vmin, 1e-6), self.vmax) if self.log_norm else None
        for t in range(self.num_timestamps):
            fig, axes = plt.subplots(1, len(keys), figsize=(5 * len(keys), 4), squeeze=False)
            for ax, k in zip(axes[0], keys):
                field = np.asarray(data_dict[k])
                img = field[t] if field.ndim >= 3 else field
                img = np.squeeze(img)
                m = ax.imshow(img, vmin=None if norm else self.vmin,
                              vmax=None if norm else self.vmax, norm=norm, cmap="viridis")
                ax.set_title(k)
                if self.xticks is not None:
                    ax.set_xticks(self.xticks)
                    ax.set_xticklabels(self.xticklabels or self.xticks)
                if self.yticks is not None:
                    ax.set_yticks(self.yticks)
                    ax.set_yticklabels(self.yticklabels or self.yticks)
                fig.colorbar(m, ax=ax, label=self.colorbar_label)
            import os

            os.makedirs(os.path.dirname(os.path.abspath(filename)) or ".", exist_ok=True)
            fig.savefig(f"{filename}_t{t}.png", dpi=100, bbox_inches="tight")
            plt.close(fig)


class VisualizerRadar(Visualizer):
    """Radar echo frame strips (reference radar.py: one row of frames per
    field, NowcastNet precipitation colormap simplified to 'turbo')."""

    def __init__(self, input_dict, output_expr, batch_size: int = 1,
                 num_timestamps: int = 1, prefix: str = "plot_radar", **kwargs):
        super().__init__(input_dict, output_expr, batch_size, num_timestamps, prefix)

    def save(self, filename: str, data_dict):
        import os

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        keys = list(self.output_keys)
        for k in keys:
            frames = np.asarray(data_dict[k])
            frames = np.squeeze(frames)
            if frames.ndim == 2:
                frames = frames[None]
            T = frames.shape[0]
            fig, axes = plt.subplots(1, T, figsize=(2 * T, 2.2), squeeze=False)
            for t in range(T):
                axes[0][t].imshow(frames[t], cmap="turbo", vmin=0)
                axes[0][t].set_axis_off()
                axes[0][t].set_title(f"t={t}", fontsize=8)
            os.makedirs(os.path.dirname(os.path.abspath(filename)) or ".", exist_ok=True)
            fig.savefig(f"{filename}_{k}.png", dpi=100, bbox_inches="tight")
            plt.close(fig)
