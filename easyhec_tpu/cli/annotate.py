"""Offline mask annotation CLI.

Replacement for the reference's standalone PromptDrawer CLI
(easyhec/utils/prompt_drawer.py:217-252: label every color/*.png of a
capture dir into mask/). Modes:

- --auto: run the trained U-Net segmenter (models/segmentation.py) over
  every frame (the pointrend_api role, easyhec/utils/pointrend_api.py:73-99).
- --box x0 y0 x1 y1 [--point x y l ...]: programmatic prompts applied to
  every frame (headless).
- --repl: terminal-driven INTERACTIVE session per frame (add/remove
  prompts, re-segment, ASCII/PNG preview, accept/skip — io/annotate.
  annotate_repl); works over ssh with no display.
- default: interactive window per frame (needs a display).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="annotate masks for a capture dir")
    ap.add_argument("--data-dir", required=True, help="dir with color/*.png")
    ap.add_argument("--auto", action="store_true", help="use the U-Net segmenter")
    ap.add_argument("--weights", default=None, help="segmenter params (.npz)")
    ap.add_argument("--box", type=int, nargs=4, action="append", default=None)
    ap.add_argument("--point", type=int, nargs=3, action="append", default=None,
                    help="x y label (1 pos / 0 neg)")
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--repl", action="store_true",
                    help="terminal-driven interactive annotation (headless)")
    args = ap.parse_args(argv)

    from PIL import Image

    from ..io.annotate import (
        PromptDrawer,
        PromptMasker,
        Prompts,
        annotate_repl,
    )

    data = Path(args.data_dir)
    color_dir = data / "color"
    mask_dir = data / "mask"
    mask_dir.mkdir(parents=True, exist_ok=True)
    frames = sorted(color_dir.glob("*.png")) + sorted(color_dir.glob("*.jpg"))
    if not frames:
        raise SystemExit(f"no frames under {color_dir}")

    backend = None
    if args.auto:
        if not args.weights:
            raise SystemExit("--auto needs --weights (train via cli.train_segmenter)")
        from ..models.segmentation import SegmenterMaskSource, load_params

        backend = SegmenterMaskSource(load_params(args.weights))

    prompts = Prompts()
    for b in args.box or []:
        prompts.add_box(*b)
    for p in args.point or []:
        prompts.add_point(p[0], p[1], p[2])
    headless = args.auto or prompts.boxes or prompts.points
    masker = PromptMasker(backend=backend)

    n_done = 0
    for f in frames:
        out = mask_dir / f.name
        if out.exists() and not args.overwrite:
            continue
        rgb = np.asarray(Image.open(f).convert("RGB"))
        if args.repl:  # pragma: no cover - interactive terminal
            print(f"--- frame {f.name} ---")
            mask = annotate_repl(
                rgb, masker,
                overlay_path=str(mask_dir / f"{f.stem}_overlay.png"),
            )
            if mask is None:
                continue
        elif headless:
            if args.auto and not (prompts.boxes or prompts.points):
                mask = backend.predict(rgb)
            else:
                mask = masker.predict(rgb, prompts)
        else:  # pragma: no cover - interactive
            mask = PromptDrawer(masker).run(rgb)
            if mask is None:
                continue
        Image.fromarray((np.asarray(mask) > 0.5).astype(np.uint8) * 255).save(out)
        n_done += 1
    print(f"wrote {n_done} masks to {mask_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
