"""Visualization (reference ``ppsci/visualize``)."""

from paddlescience_tpu.visualize.plot import (  # noqa: F401
    save_plot_from_1d_dict,
    save_plot_from_2d_dict,
    save_plot_from_3d_dict,
)
from paddlescience_tpu.visualize.visualizer import (  # noqa: F401
    Visualizer,
    Visualizer1D,
    Visualizer2D,
    Visualizer2DPlot,
    Visualizer3D,
    VisualizerScatter1D,
    VisualizerScatter3D,
    VisualizerVtu,
)
from paddlescience_tpu.visualize.vtu import save_vtu_from_dict  # noqa: F401

__all__ = [
    "Visualizer",
    "VisualizerVtu",
    "Visualizer1D",
    "Visualizer2D",
    "Visualizer2DPlot",
    "Visualizer3D",
    "VisualizerScatter1D",
    "VisualizerScatter3D",
    "save_vtu_from_dict",
    "save_plot_from_1d_dict",
    "save_plot_from_2d_dict",
    "save_plot_from_3d_dict",
]
