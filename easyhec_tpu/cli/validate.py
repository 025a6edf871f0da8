"""Validation tool: overlay solved-pose renders on captured images.

Replacement for tools/validate.py (reference: loads last ckpt dof, renders
each frame's arm mask, overlays into Wis3D — tools/validate.py:13-52). Here
overlays are written as PNGs plus per-frame IoU stats printed as JSON.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="overlay solved-pose renders")
    ap.add_argument("-c", "--config-file", required=True)
    ap.add_argument("--ckpt", default=None, help="checkpoint (.npz); default: latest in output_dir")
    ap.add_argument("--out", default=None, help="overlay output dir")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..config import load_config
    from ..data import load_calib_dataset
    from ..geometry import se3
    from ..models.calib import render_outputs
    from ..trainer import build_runtime
    from ..utils.checkpoint import latest_checkpoint, load_checkpoint

    cfg = load_config(args.config_file, args.opts)
    rt = build_runtime(cfg)
    batch = load_calib_dataset(cfg.dataset.data_dir, rt.chain, rt.link_names)

    ckpt = args.ckpt or latest_checkpoint(Path(cfg.output_dir) / "checkpoints")
    if ckpt is None:
        raise SystemExit(f"no checkpoint under {cfg.output_dir}/checkpoints")
    arrays, _ = load_checkpoint(ckpt)
    dof = arrays["dof"]

    outputs = render_outputs(dof, rt.renderer, batch.link_poses, batch.K, batch.masks)
    rendered = outputs["rendered_masks"]
    out_dir = Path(args.out or (Path(cfg.output_dir) / "validate"))

    from ..evaluators import build_evaluators
    from ..visualizers import build_visualizer

    build_visualizer("hover_mask", out_dir)(batch.rgb, rendered)
    stats = []
    iou_eval = build_evaluators(["mask_iou"])[0]
    for i in range(batch.n_frames):
        per = iou_eval(
            {"rendered_masks": rendered[i : i + 1], "ref_masks": batch.masks[i : i + 1]}
        )
        stats.append({"frame": i, "iou": round(per["mask_iou"], 4)})
    Tc = np.asarray(se3.exp(jnp.asarray(dof)))
    report = {
        "checkpoint": str(ckpt),
        "Tc_c2b": Tc.tolist(),
        "mean_iou": round(float(np.mean([s["iou"] for s in stats])), 4),
        "frames": stats,
    }
    (out_dir / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
