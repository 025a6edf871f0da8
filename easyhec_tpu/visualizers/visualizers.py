"""Result visualizers.

The reference's visualizers package registers nothing concrete (its
rbsolver_hover_mask module only imports the registry, SURVEY.md §2); the
intended behavior — hover the solved-pose rendered mask over each RGB frame —
lives in tools/validate.py:41-48. Here it is a first-class registered
visualizer used by both the CLI validate tool and the offline trainer.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..registry import VISUALIZERS
from ..utils.imaging import hover_masks_on_imgs, image_grid, save_image, vis_mask

__all__ = ["build_visualizer", "HoverMaskVisualizer"]


@VISUALIZERS.register("hover_mask")
class HoverMaskVisualizer:
    """Write per-frame mask-over-RGB overlays + one grid panel."""

    def __init__(self, output_dir: str | Path):
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)

    def __call__(self, rgbs: np.ndarray, masks: np.ndarray, tag: str = "overlay") -> Path:
        overlays = hover_masks_on_imgs(rgbs, masks)
        for i, ov in enumerate(overlays):
            save_image(self.output_dir / f"{tag}_{i:04d}.png", ov)
        panel = image_grid(overlays)
        panel_path = self.output_dir / f"{tag}_grid.png"
        save_image(panel_path, panel)
        return panel_path


@VISUALIZERS.register("error_mask")
class ErrorMaskVisualizer:
    """Rendered / reference / |error| triptych per frame."""

    def __init__(self, output_dir: str | Path):
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)

    def __call__(self, outputs: dict, tag: str = "error") -> Path:
        rend = np.asarray(outputs["rendered_masks"])
        ref = np.asarray(outputs["ref_masks"])
        err = np.abs(rend - ref)
        rows = []
        for i in range(rend.shape[0]):
            rows += [rend[i], ref[i], err[i]]
        panel = image_grid(rows, cols=3)
        path = self.output_dir / f"{tag}_grid.png"
        save_image(path, panel)
        return path


def build_visualizer(name: str, output_dir: str | Path):
    return VISUALIZERS.build(name, output_dir)
