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
