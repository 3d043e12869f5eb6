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
    VisualizerRadar,
    VisualizerScatter1D,
    VisualizerScatter3D,
    VisualizerVtu,
    VisualizerWeather,
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
    "VisualizerWeather",
    "VisualizerRadar",
    "save_plot_from_3d_dict",
    "build_visualizer",
]


def build_visualizer(cfg):
    """Build visualizers from {"content": [{ClassName: kwargs}, ...]}
    (reference ``ppsci/visualize/__init__.py`` build_visualizer)."""
    import copy as _copy

    if cfg is None:
        return None
    cfg = _copy.deepcopy(dict(cfg))
    out = {}
    for item in cfg["content"]:
        cls_name = next(iter(item.keys()))
        c = dict(item[cls_name])
        name = c.pop("name", cls_name)
        out[name] = globals()[cls_name](**c)
    return out
