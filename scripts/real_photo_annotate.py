"""Build the hand-annotated reference mask for the real xArm7 photo.

The photo (docs/real_photo_eval/real_xarm7.png) is the "Initial arm joint
pose" panel of the reference's pipeline figure
(/root/reference/docs/pipeline_v5.png) — a genuine real capture of the
xArm7 in front of a black curtain, i.e. exactly the scene the reference's
PointRend mask predictor serves (easyhec/utils/pointrend_api.py:73-99).

The reference mask is constructed semi-manually and committed for
reproducibility:
  1. brightness threshold (the arm is white/silver on a dark curtain),
  2. remove table / clamp / border regions (manual exclusion boxes, read
     off the photo),
  3. add the dark gripper finger + cable (manual inclusion boxes — too
     dark for any threshold, but unambiguous to a human),
  4. morphological closing + largest-connected-component cleanup.
The result was verified visually (overlay committed alongside).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

ROOT = Path(__file__).resolve().parent.parent
EVAL = ROOT / "docs" / "real_photo_eval"

# -- Photo B: the "Next arm joint pose" panel of the same pipeline figure
# (folded arm, gripper raised — a second genuine capture; cropped at
# pipeline_v5.png[64:394, 2380:2709]). Same construction conventions as
# photo A: blue mounting clamp / c-clamp hardware / table excluded, the
# dark gripper prongs and wrist cable included manually.
EXCLUDE_B = [
    (0, 0, 329, 10),      # top figure-border bleed
    (0, 295, 329, 330),   # table surface + column reflection bottom strip
    (30, 255, 100, 295),  # c-clamp hardware left of the base column
    (140, 262, 190, 295),  # blue clamp (occludes the base plate right side)
    (92, 285, 150, 295),  # clamp-occluded base plate strip (ambiguous)
]
INCLUDE_B = [
    (222, 46, 236, 72),   # left gripper finger prong (dark)
    (258, 44, 276, 72),   # right gripper finger prong (dark)
    (269, 73, 289, 118),  # right-side cable/bracket of the gripper body
    (212, 75, 222, 88),   # dark connector nub left of the gripper body
]

# Manual exclusion boxes (x0, y0, x1, y1) — table top, clamp, photo edges.
EXCLUDE = [
    (0, 300, 331, 329),    # bottom strip: table front edge highlights
    (0, 255, 60, 300),     # table surface left of the base
    (196, 262, 331, 310),  # table surface + clamp right of the base
    (0, 0, 12, 329),       # left border bleed
    (60, 266, 110, 310),   # clamp hardware left of the base column
    (158, 264, 196, 310),  # blue clamp highlights right of the base column
    (100, 288, 200, 310),  # clamp-occluded strip at the base foot (ambiguous)
]
# Manual inclusion boxes — the dark gripper finger and the wrist cable,
# clearly part of the arm to a human annotator but darker than the curtain
# threshold (boundary ambiguity here is a few px; see the eval doc).
INCLUDE = [
    (218, 252, 236, 290),  # dark gripper finger (down-right of the wrist)
    (236, 226, 246, 244),  # curved cable loop right of the gripper body
]


def _close(m: np.ndarray, it: int = 2) -> np.ndarray:
    """Binary closing with a 3x3 structuring element (numpy-only)."""
    from numpy.lib.stride_tricks import sliding_window_view

    def dilate(x):
        p = np.pad(x, 1)
        return sliding_window_view(p, (3, 3)).any(axis=(2, 3))

    def erode(x):
        p = np.pad(x, 1, constant_values=True)
        return sliding_window_view(p, (3, 3)).all(axis=(2, 3))

    for _ in range(it):
        m = dilate(m)
    for _ in range(it):
        m = erode(m)
    return m


def _largest_component(m: np.ndarray) -> np.ndarray:
    """Keep the largest 4-connected component (BFS, numpy/deque only)."""
    from collections import deque

    H, W = m.shape
    seen = np.zeros_like(m, dtype=bool)
    best: list[tuple[int, int]] = []
    for sy, sx in zip(*np.nonzero(m)):
        if seen[sy, sx]:
            continue
        comp = []
        q = deque([(int(sy), int(sx))])
        seen[sy, sx] = True
        while q:
            y, x = q.popleft()
            comp.append((y, x))
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ny, nx = y + dy, x + dx
                if 0 <= ny < H and 0 <= nx < W and m[ny, nx] and not seen[ny, nx]:
                    seen[ny, nx] = True
                    q.append((ny, nx))
        if len(comp) > len(best):
            best = comp
    out = np.zeros_like(m)
    for y, x in best:
        out[y, x] = True
    return out


def build_handmask(
    photo: str = "real_xarm7.png", exclude=EXCLUDE, include=INCLUDE
) -> np.ndarray:
    rgb = np.asarray(Image.open(EVAL / photo).convert("RGB")).astype(np.float32)
    bright = rgb.mean(axis=2)
    m = bright > 110
    for x0, y0, x1, y1 in exclude:
        m[y0:y1, x0:x1] = False
    m = _close(m, it=2)
    m = _largest_component(m)
    for x0, y0, x1, y1 in include:
        m[y0:y1, x0:x1] = True
    m = _close(m, it=1)
    return m


def main() -> None:
    for photo, mask_name, exc, inc in (
        ("real_xarm7.png", "handmask", EXCLUDE, INCLUDE),
        ("real_xarm7_b.png", "handmask_b", EXCLUDE_B, INCLUDE_B),
    ):
        m = build_handmask(photo, exc, inc)
        Image.fromarray((m * 255).astype(np.uint8)).save(EVAL / f"{mask_name}.png")
        rgb = np.asarray(Image.open(EVAL / photo).convert("RGB")).astype(np.float32)
        ov = rgb.copy()
        ov[m] = 0.5 * ov[m] + 0.5 * np.array([255.0, 40.0, 40.0])
        Image.fromarray(ov.astype(np.uint8)).save(EVAL / f"{mask_name}_overlay.png")
        print(photo, "mask fraction:", round(float(m.mean()), 4))


if __name__ == "__main__":
    main()
