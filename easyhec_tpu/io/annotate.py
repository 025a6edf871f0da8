"""Prompt-based mask annotation — interactive and programmatic.

Capability match for the reference's SAM annotation stack
(easyhec/utils/prompt_drawer.py:27-253 — an OpenCV UI with box/point
prompts, pos/neg labels, undo/reset, mask union/subtraction, plus a
standalone CLI for offline labeling — and utils/point_drawer.py). The
reference needs a GPU SAM checkpoint; here prompting is **model-pluggable**:

- `PromptMasker`: programmatic box/point prompting. Default backend is
  classical (GrabCut color model seeded by the prompts) so it runs with zero
  checkpoints; a `MaskSource`-style model (e.g. the flax U-Net in
  models/segmentation.py) can be passed to gate its prediction by the same
  prompts instead.
- `PromptDrawer`: the interactive OpenCV window (box drag, left/right click
  = pos/neg point, u undo, r reset, space/enter accept) — same keybinding
  roles as the reference UI. Requires a display; everything else is
  headless.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = ["PromptMasker", "PromptDrawer", "Prompts"]


@dataclass
class Prompts:
    boxes: list[tuple[int, int, int, int]] = field(default_factory=list)  # x0,y0,x1,y1
    points: list[tuple[int, int]] = field(default_factory=list)
    labels: list[int] = field(default_factory=list)  # 1 pos / 0 neg

    def add_box(self, x0, y0, x1, y1):
        self.boxes.append((min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1)))

    def add_point(self, x, y, label=1):
        self.points.append((int(x), int(y)))
        self.labels.append(int(label))

    def undo(self):
        if self.points:
            self.points.pop()
            self.labels.pop()
        elif self.boxes:
            self.boxes.pop()

    def reset(self):
        self.boxes.clear()
        self.points.clear()
        self.labels.clear()


class PromptMasker:
    """Turn prompts into a mask.

    backend=None: GrabCut seeded from boxes/points (no checkpoints needed).
    backend=MaskSource-like (has .predict(rgb)): the model's mask is
    restricted to the prompted boxes and grown/cut by the point labels.
    """

    def __init__(self, backend=None, grabcut_iters: int = 5):
        self.backend = backend
        self.grabcut_iters = grabcut_iters

    def predict(self, rgb: np.ndarray, prompts: Prompts) -> np.ndarray:
        if self.backend is not None:
            return self._model_mask(rgb, prompts)
        return self._grabcut_mask(rgb, prompts)

    # -- classical backend ----------------------------------------------------
    def _grabcut_mask(self, rgb: np.ndarray, prompts: Prompts) -> np.ndarray:
        import cv2

        H, W = rgb.shape[:2]
        out = np.zeros((H, W), np.float32)
        boxes = prompts.boxes or ([(0, 0, W - 1, H - 1)] if prompts.points else [])
        for box in boxes:
            x0, y0, x1, y1 = box
            x1 = min(x1, W - 1)
            y1 = min(y1, H - 1)
            if x1 - x0 < 2 or y1 - y0 < 2:
                continue
            gmask = np.full((H, W), cv2.GC_BGD, np.uint8)
            gmask[y0 : y1 + 1, x0 : x1 + 1] = cv2.GC_PR_FGD
            for (px, py), lab in zip(prompts.points, prompts.labels):
                if 0 <= py < H and 0 <= px < W:
                    cv2.circle(gmask, (px, py), 3,
                               int(cv2.GC_FGD if lab else cv2.GC_BGD), -1)
            bgd = np.zeros((1, 65), np.float64)
            fgd = np.zeros((1, 65), np.float64)
            try:
                cv2.grabCut(rgb[..., :3].astype(np.uint8), gmask, None, bgd, fgd,
                            self.grabcut_iters, cv2.GC_INIT_WITH_MASK)
                m = ((gmask == cv2.GC_FGD) | (gmask == cv2.GC_PR_FGD)).astype(np.float32)
            except cv2.error:  # degenerate color models
                m = np.zeros((H, W), np.float32)
                m[y0 : y1 + 1, x0 : x1 + 1] = 1.0
            out = np.maximum(out, m)
        # negative points always punch holes (mask subtraction, reference
        # prompt_drawer.py mask-subtract mode)
        out = self._apply_negative_points(out, prompts)
        return out

    def _model_mask(self, rgb: np.ndarray, prompts: Prompts) -> np.ndarray:
        mask = np.asarray(self.backend.predict(rgb), np.float32)
        H, W = mask.shape
        if prompts.boxes:
            keep = np.zeros((H, W), bool)
            for x0, y0, x1, y1 in prompts.boxes:
                keep[y0 : y1 + 1, x0 : x1 + 1] = True
            mask = mask * keep
        # positive points grow: add the connected component under each point
        comp = _connected_components(mask > 0.5)
        full = np.asarray(self.backend.predict(rgb), np.float32) > 0.5
        comp_full = _connected_components(full)
        for (px, py), lab in zip(prompts.points, prompts.labels):
            if not (0 <= py < H and 0 <= px < W):
                continue
            if lab == 1 and full[py, px] and mask[py, px] < 0.5:
                mask = np.maximum(mask, (comp_full == comp_full[py, px]).astype(np.float32))
        mask = self._apply_negative_points(mask, prompts)
        return mask

    @staticmethod
    def _apply_negative_points(mask: np.ndarray, prompts: Prompts) -> np.ndarray:
        neg = [(p, l) for p, l in zip(prompts.points, prompts.labels) if l == 0]
        if not neg:
            return mask
        comp = _connected_components(mask > 0.5)
        for (px, py), _ in neg:
            if 0 <= py < mask.shape[0] and 0 <= px < mask.shape[1] and mask[py, px] > 0.5:
                mask = mask * (comp != comp[py, px])
        return mask


def _connected_components(binary: np.ndarray) -> np.ndarray:
    """4-connected labeling (cv2 if present, else a BFS fallback)."""
    try:
        import cv2

        _, labels = cv2.connectedComponents(binary.astype(np.uint8), connectivity=4)
        return labels
    except ImportError:  # pragma: no cover - cv2 is in the image
        from collections import deque

        labels = np.zeros(binary.shape, np.int32)
        nxt = 1
        for sy, sx in zip(*np.nonzero(binary)):
            if labels[sy, sx]:
                continue
            q = deque([(sy, sx)])
            labels[sy, sx] = nxt
            while q:
                y, x = q.popleft()
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx_ = y + dy, x + dx
                    if (0 <= ny < binary.shape[0] and 0 <= nx_ < binary.shape[1]
                            and binary[ny, nx_] and not labels[ny, nx_]):
                        labels[ny, nx_] = nxt
                        q.append((ny, nx_))
            nxt += 1
        return labels


class PromptDrawer:  # pragma: no cover - needs a display
    """Interactive annotation window (the reference PromptDrawer UI role).

    Controls: drag = box prompt; left click = positive point; right click =
    negative point; u = undo; r = reset; space/enter = accept; q/esc = skip.
    """

    def __init__(self, masker: PromptMasker | None = None, window: str = "annotate"):
        self.masker = masker or PromptMasker()
        self.window = window

    def run(self, rgb: np.ndarray) -> np.ndarray | None:
        import cv2

        prompts = Prompts()
        mask = np.zeros(rgb.shape[:2], np.float32)
        drag = {"active": False, "x0": 0, "y0": 0}

        def redraw():
            from ..utils.imaging import vis_mask

            disp = vis_mask(rgb, mask, color=(0, 255, 0), alpha=0.45)
            cv2.imshow(self.window, cv2.cvtColor(disp, cv2.COLOR_RGB2BGR))

        def on_mouse(event, x, y, flags, _):
            nonlocal mask
            if event == cv2.EVENT_LBUTTONDOWN:
                drag.update(active=True, x0=x, y0=y)
            elif event == cv2.EVENT_LBUTTONUP and drag["active"]:
                drag["active"] = False
                if abs(x - drag["x0"]) > 4 and abs(y - drag["y0"]) > 4:
                    prompts.add_box(drag["x0"], drag["y0"], x, y)
                else:
                    prompts.add_point(x, y, 1)
                mask = self.masker.predict(rgb, prompts)
                redraw()
            elif event == cv2.EVENT_RBUTTONDOWN:
                prompts.add_point(x, y, 0)
                mask = self.masker.predict(rgb, prompts)
                redraw()

        cv2.namedWindow(self.window)
        cv2.setMouseCallback(self.window, on_mouse)
        redraw()
        while True:
            k = cv2.waitKey(50) & 0xFF
            if k in (ord(" "), 13):
                cv2.destroyWindow(self.window)
                return mask
            if k in (ord("q"), 27):
                cv2.destroyWindow(self.window)
                return None
            if k == ord("u"):
                prompts.undo()
                mask = self.masker.predict(rgb, prompts)
                redraw()
            if k == ord("r"):
                prompts.reset()
                mask[:] = 0
                redraw()
