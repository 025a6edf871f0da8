"""Segmenter training CLI: synthetic multi-view data -> U-Net -> weights.

Replacement for the reference's mask-training workflow (SURVEY.md §2.2:
tools/simulate/gen_data_for_mask_training.py ring-camera SAPIEN renders +
split_mask_training_data.py 80/20 split + a detectron2 PointRend fine-tune).
Here the whole loop is one command: render a ring of camera viewpoints with
the framework's own rasterizer, split train/val, train the flax U-Net
(models/segmentation.py), report val IoU, save params.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="train the robot mask segmenter")
    ap.add_argument("-c", "--config-file", required=True)
    ap.add_argument("--out", required=True, help="weights output (.pkl)")
    ap.add_argument("--data-out", default=None, help="also keep the synthetic data here")
    ap.add_argument("--n-cams", type=int, default=6)
    ap.add_argument("--frames-per-cam", type=int, default=8)
    ap.add_argument("--radius", type=float, default=1.5)
    ap.add_argument("--height", type=float, default=0.8)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--val-fraction", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-dir", default=None,
                    help="reference-format capture dir with REAL photos + "
                    "masks: report the sim-to-real IoU after training")
    ap.add_argument("--eval-overlays", default=None,
                    help="with --eval-dir: write prediction overlays here")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..config import load_config
    from ..data.synthetic import generate_dataset
    from ..geometry import camera, se3
    from ..models.segmentation import (
        SegmenterMaskSource,
        save_params,
        train_segmenter,
    )
    from ..trainer import build_runtime

    cfg = load_config(args.config_file, args.opts)
    rt = build_runtime(cfg)
    fx = 1.2 * max(cfg.model.H, cfg.model.W)
    K = np.array(
        [[fx, 0, cfg.model.W / 2], [0, fx, cfg.model.H / 2], [0, 0, 1]], np.float32
    )

    # ring of camera poses (the reference's ring sampler role,
    # render_api.py:195-219) — one synthetic capture set per viewpoint
    rings = camera.ring_poses(
        args.n_cams, args.radius, args.height,
        target=jnp.asarray([0.0, 0.0, 0.25]),
    )
    rgbs, masks = [], []
    base_dir = Path(args.data_out) if args.data_out else None
    for ci in range(args.n_cams):
        Tc = np.asarray(se3.inverse(rings[ci]))
        out_dir = (base_dir / f"cam{ci:02d}") if base_dir else f"/tmp/_seg_cam{ci}"
        data = generate_dataset(
            out_dir, rt.chain, rt.renderer, rt.link_names, Tc, K,
            n_frames=args.frames_per_cam, seed=args.seed + ci,
        )
        rgbs.append(data["rgb"])
        masks.append((data["masks"] > 0.5).astype(np.float32))
    rgb = np.concatenate(rgbs)
    mask = np.concatenate(masks)

    # deterministic split (the split_mask_training_data role)
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(rgb))
    n_val = max(1, int(len(rgb) * args.val_fraction))
    val_idx, train_idx = order[:n_val], order[n_val:]

    params, loss = train_segmenter(
        rgb[train_idx], mask[train_idx], steps=args.steps, seed=args.seed
    )
    save_params(args.out, params)

    seg = SegmenterMaskSource(params)
    ious = []
    for i in val_idx:
        pred = seg.predict(rgb[i]) > 0.5
        ref = mask[i] > 0.5
        ious.append(float((pred & ref).sum() / max((pred | ref).sum(), 1)))
    report = {
        "train_frames": int(len(train_idx)),
        "val_frames": int(len(val_idx)),
        "final_loss": round(loss, 5),
        "val_iou_mean": round(float(np.mean(ious)), 4),
        "val_iou_min": round(float(np.min(ious)), 4),
        "weights": str(args.out),
    }

    if args.eval_dir:
        # Real-capture domain-gap check (the PointRend role is production
        # masks on REAL RGB, reference easyhec/utils/pointrend_api.py:73-99
        # — a synthetic-only validation can hide the sim-to-real gap):
        # predict on a reference-format capture dir and score against its
        # hand masks.
        from ..data.dataset import load_calib_dataset

        batch = load_calib_dataset(args.eval_dir, rt.chain, rt.link_names)
        real = []
        for i in range(batch.rgb.shape[0]):
            pred = seg.predict(batch.rgb[i]) > 0.5
            ref = batch.masks[i] > 0.5
            real.append(
                float((pred & ref).sum() / max((pred | ref).sum(), 1))
            )
        report["real_eval"] = {
            "dir": str(args.eval_dir),
            "per_frame_iou": [round(v, 4) for v in real],
            "mean_iou": round(float(np.mean(real)), 4),
        }
        if args.eval_overlays:
            from ..utils.imaging import save_image, vis_mask

            out = Path(args.eval_overlays)
            out.mkdir(parents=True, exist_ok=True)
            for i in range(batch.rgb.shape[0]):
                pred = (seg.predict(batch.rgb[i]) > 0.5).astype(np.float32)
                save_image(
                    out / f"real_{i:03d}.png",
                    vis_mask(batch.rgb[i], pred, color=(0, 255, 0)),
                )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
