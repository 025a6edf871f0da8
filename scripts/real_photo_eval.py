"""Evaluate the U-Net segmenter on a REAL xArm7 photograph (VERDICT item 9).

The reference ships PointRend as its production mask predictor on real RGB
(easyhec/utils/pointrend_api.py:73-99), fine-tuned on SAPIEN ray-traced
synthetic data (tools/simulate/gen_data_for_mask_training.py). Our
capability replacement is a first-party flax U-Net trained on our own
rasterizer's synthetic renders (easyhec_tpu/models/segmentation.py). Until
now it was only evaluated on synthetic frames — this script closes the loop
on one real image:

  photo: docs/real_photo_eval/real_xarm7.png — the "Initial arm joint pose"
  panel of the reference's own pipeline figure (docs/pipeline_v5.png), a
  genuine lab capture of the xArm7 on a black curtain.
  reference mask: docs/real_photo_eval/handmask.png — hand-annotated
  (scripts/real_photo_annotate.py; construction + ambiguities documented
  there).

Training data: flat-shaded renders of the real xArm7 URDF meshes at random
qposes and random ring camera poses, composited over randomized backgrounds
(uniform gray levels + noise + soft gradients) with brightness/contrast
jitter — the augmentation plan whose effect this eval measures.

Outputs docs/real_photo_eval/report.md + prediction overlays and prints the
IoU numbers.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
from PIL import Image

ROOT = pathlib.Path(__file__).resolve().parent.parent
EVAL = ROOT / "docs" / "real_photo_eval"
REFERENCE_ASSETS = pathlib.Path("/root/reference/assets")

import os

RES = 320  # train/infer resolution (U-Net is fully convolutional; 320 = 2^6*5)
N_FRAMES = 48
STEPS = int(os.environ.get("SEG_STEPS", "1200"))
# Ablation knobs (docs/real_photo_eval/report.md records all variants):
ALBEDO = os.environ.get("SEG_ALBEDO", "0") == "1"  # per-link albedo jitter
ALL_LINKS = os.environ.get("SEG_ALL_LINKS", "1") == "1"  # + base/gripper


def build_xarm_scene(H: int, W: int):
    import jax.numpy as jnp

    from easyhec_tpu.render import RobotRenderer, TileConfig
    from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
    from easyhec_tpu.robot.mesh import decimate_vertex_clustering

    urdf = REFERENCE_ASSETS / "xarm7_with_gripper_reduced_dof.urdf"
    model = parse_urdf(urdf)
    chain = build_chain(model)
    # ALL mesh-bearing links incl. base + gripper (the photo shows them;
    # the bench scene's link1-7 subset left the gripper unlearned: first
    # eval run scored IoU 0.826 with the gripper as the main FN region)
    if ALL_LINKS:
        names = ["link_base"] + [f"link{i}" for i in range(1, 8)] + [
            "xarm_gripper_base_link", "left_finger", "right_finger",
        ]
    else:
        names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    mesh_list = [decimate_vertex_clustering(meshes[n], 0.004) for n in names]
    tile = TileConfig(16, 32, 768, True, binner="count", cull_backfaces=True)
    renderer = RobotRenderer(mesh_list, H, W, tile=tile)
    link_idx = jnp.asarray([chain.link_index(n) for n in names])
    return chain, renderer, link_idx, names


def make_training_set(seed: int = 0):
    """Flat-shaded synthetic renders at varied qposes x camera poses."""
    import jax

    from easyhec_tpu.data.synthetic import (
        default_camera,
        generate_dataset,
        sample_qposes,
    )

    chain, renderer, link_idx, names = build_xarm_scene(RES, RES)
    K = np.array(
        [[420.0, 0, RES / 2], [0, 420.0, RES / 2], [0, 0, 1]], np.float32
    )
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    rgbs, masks, lids = [], [], []
    n_views = 6
    per_view = N_FRAMES // n_views
    for v in range(n_views):
        Tc = default_camera(
            distance=float(rng.uniform(1.1, 1.7)),
            azimuth_deg=float(rng.uniform(0, 360)),
            height=float(rng.uniform(0.2, 0.7)),
            target=(0.0, 0.0, 0.3),
        )
        key, sub = jax.random.split(key)
        qs = sample_qposes(sub, chain, per_view, limit_fraction=0.55)
        data = generate_dataset(
            EVAL / "synth" / f"view{v}",
            chain,
            renderer,
            names,
            Tc,
            K,
            n_frames=per_view,
            qposes=np.asarray(qs),
        )
        rgbs.append(data["rgb"])
        masks.append(data["masks"])
        lids.append(data["link_id"])
    rgb = np.concatenate(rgbs)
    mask = (np.concatenate(masks) > 0.5).astype(np.float32)
    lid = np.concatenate(lids)  # [N, H, W], -1 = background

    # Appearance randomization, the two measured domain-gap axes:
    # 1. per-link ALBEDO (the real gripper is near-black while the links
    #    are white — a brightness-keyed net drops dark parts; random
    #    per-link gray levels force shape cues over brightness cues),
    # 2. BACKGROUND: random gray level + gaussian noise + soft vertical
    #    gradient — cheap stand-ins for curtain folds / table edges.
    out = rgb.astype(np.float32) / 255.0
    L = int(lid.max()) + 1
    H = out.shape[1]
    for i in range(out.shape[0]):
        if ALBEDO:
            alb = rng.uniform(0.15, 1.0, (L,))
            out[i] *= np.where(
                lid[i] >= 0, alb[np.clip(lid[i], 0, L - 1)], 1.0
            )[..., None]
        lvl = rng.uniform(0.05, 0.45)
        grad = rng.uniform(-0.15, 0.15) * np.linspace(0, 1, H)[:, None]
        bg = lvl + grad + rng.normal(0, rng.uniform(0.01, 0.06), out.shape[1:3])
        bg3 = np.repeat(np.clip(bg, 0, 1)[..., None], 3, axis=-1)
        m = mask[i][..., None]
        out[i] = m * out[i] + (1 - m) * bg3
    rgb = (np.clip(out, 0, 1) * 255).astype(np.uint8)
    return rgb, mask


def load_real():
    rgb = np.asarray(Image.open(EVAL / "real_xarm7.png").convert("RGB"))
    hand = np.asarray(Image.open(EVAL / "handmask.png")) > 127
    return rgb, hand


def iou(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(bool)
    b = b.astype(bool)
    u = (a | b).sum()
    return float((a & b).sum() / u) if u else 1.0


def main() -> None:
    from easyhec_tpu.models.segmentation import (
        SegmenterMaskSource,
        save_params,
        train_segmenter,
    )

    t0 = time.time()
    rgb, mask = make_training_set()
    t_data = time.time() - t0
    print(f"[eval] synthetic set: {rgb.shape} in {t_data:.1f}s", flush=True)

    t0 = time.time()
    params, loss = train_segmenter(
        rgb, mask, steps=STEPS, batch_size=8, base=16, seed=0, augment=True
    )
    t_train = time.time() - t0
    print(f"[eval] trained {STEPS} steps, loss {loss:.4f}, {t_train:.1f}s", flush=True)
    save_params(EVAL / "unet_params.pkl", params)

    src = SegmenterMaskSource(params, base=16)

    # Synthetic holdout sanity: IoU on the training distribution.
    synth_iou = float(
        np.mean([iou(src.predict(rgb[i]), mask[i] > 0.5) for i in range(0, 8)])
    )

    # Real photo: resize to the network resolution, predict, resize back.
    real, hand = load_real()
    H0, W0 = real.shape[:2]
    real_r = np.asarray(Image.fromarray(real).resize((RES, RES), Image.BILINEAR))
    pred_r = src.predict(real_r)
    pred = (
        np.asarray(
            Image.fromarray((pred_r * 255).astype(np.uint8)).resize(
                (W0, H0), Image.BILINEAR
            )
        )
        > 127
    )
    real_iou = iou(pred, hand)

    ov = real.astype(np.float32).copy()
    tp = pred & hand
    fp = pred & ~hand
    fn = ~pred & hand
    ov[tp] = 0.55 * ov[tp] + 0.45 * np.array([0.0, 220.0, 0.0])
    ov[fp] = 0.55 * ov[fp] + 0.45 * np.array([220.0, 0.0, 0.0])
    ov[fn] = 0.55 * ov[fn] + 0.45 * np.array([0.0, 80.0, 255.0])
    Image.fromarray(ov.astype(np.uint8)).save(EVAL / "pred_overlay.png")

    result = {
        "synthetic_holdout_iou": round(synth_iou, 4),
        "real_photo_iou": round(real_iou, 4),
        "train_loss": round(loss, 4),
        "steps": STEPS,
        "n_train_frames": int(rgb.shape[0]),
        "resolution": RES,
        "pred_fraction": round(float(pred.mean()), 4),
        "hand_fraction": round(float(hand.mean()), 4),
        "albedo_randomization": ALBEDO,
        "all_links": ALL_LINKS,
    }
    (EVAL / "result.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
