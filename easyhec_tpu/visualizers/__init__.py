from .visualizers import HoverMaskVisualizer, build_visualizer

__all__ = ["build_visualizer", "HoverMaskVisualizer"]
