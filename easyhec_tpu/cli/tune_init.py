"""Initial-pose tuning tool.

Replacement for the reference's tools/manual_tune_franka_init.py:1-35
(interactive matplotlib overlay + manual offsets -> printed init_Tc_c2b).
Headless-friendly: given a look-at guess plus optional xyz/rpy offsets it
renders the arm over the first dataset frame, writes the overlay PNG, scores
IoU, and prints the yaml snippet to paste into the config. With
--global-search it instead runs the render-and-score initializer
(models/pose_init.py) and reports its best pose.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="tune/solve the initial Tc_c2b")
    ap.add_argument("-c", "--config-file", required=True)
    ap.add_argument("--eye", type=float, nargs=3, default=None)
    ap.add_argument("--target", type=float, nargs=3, default=None)
    ap.add_argument("--offset-xyz", type=float, nargs=3, default=(0, 0, 0))
    ap.add_argument("--offset-rpy", type=float, nargs=3, default=(0, 0, 0),
                    help="extra rotation (rad), applied in camera frame")
    ap.add_argument("--global-search", action="store_true")
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..config import load_config
    from ..data import load_calib_dataset
    from ..geometry import se3, so3
    from ..models.pose_init import global_search_init, lookat_init
    from ..trainer import build_runtime
    from ..utils.imaging import save_image, vis_mask

    cfg = load_config(args.config_file, args.opts)
    rt = build_runtime(cfg)
    batch = load_calib_dataset(cfg.dataset.data_dir, rt.chain, rt.link_names)
    i = args.frame
    out_dir = Path(args.out or (Path(cfg.output_dir) / "tune_init"))
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.global_search:
        res = global_search_init(
            rt.renderer, batch.link_poses[i], batch.K, batch.masks[i]
        )
        T = res.Tc_c2b
        extra = {"search_iou": round(res.score, 4)}
    else:
        if args.eye is None or args.target is None:
            raise SystemExit("--eye/--target required (or use --global-search)")
        T = lookat_init(args.eye, args.target)
        # manual nudging in the camera frame (the reference's manual offsets)
        dR = np.asarray(
            so3.exp(jnp.asarray(args.offset_rpy, jnp.float32))
        )
        T[:3, :3] = dR @ T[:3, :3]
        T[:3, 3] = T[:3, 3] + np.asarray(args.offset_xyz, np.float32)
        extra = {}

    sil = np.asarray(
        rt.renderer.silhouette(
            jnp.asarray(T, jnp.float32),
            jnp.asarray(batch.link_poses[i]),
            jnp.asarray(batch.K),
        )
    )
    ref = batch.masks[i] > 0.5
    pred = sil > 0.5
    iou = float((pred & ref).sum() / max((pred | ref).sum(), 1))
    overlay = vis_mask(batch.rgb[i], sil, color=(0, 255, 0), alpha=0.5)
    overlay = vis_mask(overlay, batch.masks[i], color=(255, 0, 0), alpha=0.25)
    save_image(out_dir / "tune_overlay.png", overlay)

    print(json.dumps({"overlay_iou": round(iou, 4), **extra}))
    print("# paste into the config:")
    print("model:")
    print("  init_Tc_c2b:")
    for row in T.tolist():
        print(f"  - {row}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
