"""Synthetic calibration-data generator (the framework's closed-loop test rig).

Replaces the reference's SAPIEN ray-traced simulator
(tools/simulate/gen_data_for_mask_training.py:21-174) for the purposes the
framework actually needs: GT-pose datasets for closed-loop accuracy tests and
mask/segmentation training data. Rendering uses our own rasterizer — masks
are exact GT silhouettes; RGB is flat-shaded lambertian from per-face normals
(not path-traced; capability-preserving substitution, SURVEY.md §7).
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import camera, se3
from ..render.renderer import RobotRenderer
from ..robot import KinematicChain
from .dataset import save_calib_dataset

__all__ = [
    "sample_qposes",
    "make_render_fn",
    "generate_dataset",
    "split_dataset",
]


def sample_qposes(
    key: jax.Array,
    chain: KinematicChain,
    n: int,
    limit_fraction: float = 0.5,
) -> jax.Array:
    """Uniform random joint configurations within scaled joint limits
    (reference SpaceExplorer.sample_qposes, space_explorer.py:200-209)."""
    lo = jnp.asarray(chain.joint_limits[:, 0]) * limit_fraction
    hi = jnp.asarray(chain.joint_limits[:, 1]) * limit_fraction
    return jax.random.uniform(key, (n, chain.n_dof), minval=lo, maxval=hi)


def _face_normals(renderer: RobotRenderer, Tc_c2l: jax.Array) -> jax.Array:
    """Camera-frame unit normals per packed face under per-link poses [L,4,4]."""
    from ..render.projection import transform_verts

    verts_cam = transform_verts(renderer.vertices, renderer.vert_link_id, Tc_c2l)
    tri = verts_cam[renderer.faces]  # [F, 3, 3]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def make_render_fn(
    chain: KinematicChain,
    renderer: RobotRenderer,
    link_names: list[str],
    K: np.ndarray,
):
    """One jitted (Tc_c2b [4,4], qposes [B, n_dof]) -> (masks, depth,
    link_id, gray) for the synthetic generator. Build ONCE and reuse across
    camera views / qpos batches of the same shape — per-call jit closures
    recompile for every view (measured ~40 s/view on the tunneled chip,
    dominating multi-view dataset generation)."""
    link_idx = jnp.asarray([chain.link_index(n) for n in link_names])
    Kj = jnp.asarray(K, jnp.float32)

    @jax.jit
    def render(Tc, qs):
        lp = jax.vmap(chain.fk)(qs)[:, link_idx]  # [B, L, 4, 4]
        masks = renderer.silhouette(Tc, lp, Kj)
        depth, link_id = renderer.depth(Tc, lp, Kj)

        # Flat-shaded gray: lambertian from the hit face's camera normal.
        def one(lp_f, ids, d):
            Tc_c2l = renderer.camera_link_poses(Tc, lp_f)
            normals = _face_normals(renderer, Tc_c2l)  # [F, 3]
            tris = renderer._triangles(Tc_c2l, Kj)
            # Recover face-level normal per pixel via the link-id pass's
            # triangle ids — re-run depth to get tri ids
            from ..render.tiled import depth_tiled

            _, tid = depth_tiled(tris, renderer.H, renderer.W, renderer.tile)
            light = jnp.asarray([0.3, -0.5, -0.8])
            light = light / jnp.linalg.norm(light)
            lam = jnp.abs(normals @ light)  # [F]
            lam = jnp.concatenate([lam, jnp.zeros(1)])
            shadepix = lam[jnp.where(tid >= 0, tid, normals.shape[0])]
            base = 0.25 + 0.75 * shadepix
            img = jnp.where(tid >= 0, base, 0.08)  # dark background
            return img

        gray = jax.vmap(one)(lp, link_id, depth)
        return masks, depth, link_id, gray

    return render


def generate_dataset(
    out_dir: str | Path,
    chain: KinematicChain,
    renderer: RobotRenderer,
    link_names: list[str],
    Tc_c2b: np.ndarray,
    K: np.ndarray,
    n_frames: int = 10,
    seed: int = 0,
    limit_fraction: float = 0.5,
    qposes: np.ndarray | None = None,
    write_depth: bool = False,
    render_fn=None,
) -> dict[str, np.ndarray]:
    """Render a GT dataset in the reference-compatible directory layout.

    Returns {"masks", "qpos", "rgb", "depth"} for in-memory use as well.
    Pass render_fn (from make_render_fn) to amortize compilation across
    calls with the same frame-batch shape.
    """
    key = jax.random.PRNGKey(seed)
    if qposes is None:
        qposes = sample_qposes(key, chain, n_frames, limit_fraction)
    qposes = jnp.asarray(qposes, jnp.float32)
    Tc = jnp.asarray(Tc_c2b, jnp.float32)
    if render_fn is None:
        render_fn = make_render_fn(chain, renderer, link_names, K)

    masks, depth, link_id, gray = render_fn(Tc, qposes)
    gray = np.asarray(gray)
    rgb = (np.repeat(gray[..., None], 3, axis=-1) * 255).astype(np.uint8)

    masks_np = np.asarray(masks)
    qpos_np = np.asarray(qposes)
    save_calib_dataset(
        out_dir,
        masks=(masks_np > 0.5).astype(np.float32),
        qpos=qpos_np,
        K=np.asarray(K),
        Tc_c2b_gt=np.asarray(Tc_c2b),
        rgb=rgb,
    )
    if write_depth:
        ddir = Path(out_dir) / "depth"
        ddir.mkdir(parents=True, exist_ok=True)
        for i, d in enumerate(np.asarray(depth)):
            np.save(ddir / f"{i:06d}.npy", d)
    return {
        "masks": masks_np,
        "qpos": qpos_np,
        "rgb": rgb,
        "depth": np.asarray(depth),
        "link_id": np.asarray(link_id),
    }


def split_dataset(
    src_dir: str | Path,
    out_dir: str | Path | None = None,
    train_fraction: float = 0.8,
    seed: int = 0,
) -> tuple[list[int], list[int]]:
    """Split a generated dataset into train/ and val/ subsets by file copy.

    Covers the reference's tools/simulate/split_mask_training_data.py:10-60
    (80/20 split of mask-training captures). Frames are the per-frame files
    in any of the known subdirs (color/mask/qpos/pose/depth); known
    frame-independent top-level files (K.txt, Tc_c2b.txt, model.ply,
    diameter.txt, meta/camera.json) are duplicated into both subsets;
    unrecognized top-level files are skipped with a warning (they may be
    frame-indexed and would go stale under renumbering). Returns
    (train_ids, val_ids).
    """
    import shutil

    src = Path(src_dir)
    out = Path(out_dir) if out_dir is not None else src
    subdirs = [d for d in ("color", "mask", "qpos", "pose", "depth")
               if (src / d).is_dir()]
    if not subdirs:
        raise FileNotFoundError(f"no per-frame subdirs under {src}")
    stems = sorted(p.stem for p in (src / subdirs[0]).iterdir() if p.is_file())
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(stems))
    n_train = int(round(len(stems) * train_fraction))
    splits = {"train": sorted(perm[:n_train].tolist()),
              "val": sorted(perm[n_train:].tolist())}
    # Only KNOWN frame-independent files are duplicated into both subsets; a
    # frame-indexed top-level file (e.g. a monolithic qpos.txt) would become
    # inconsistent with the renumbered per-frame files if copied verbatim.
    _SHARED = {"K.txt", "Tc_c2b.txt", "model.ply", "diameter.txt",
               "meta.json", "camera.json"}
    shared = [p for p in src.iterdir() if p.is_file() and p.name in _SHARED]
    skipped = [p.name for p in src.iterdir()
               if p.is_file() and p.name not in _SHARED]
    if skipped:
        import warnings

        warnings.warn(
            f"split_dataset: not copying unrecognized top-level files "
            f"{skipped} (add frame-independent ones to the whitelist)",
            stacklevel=2,
        )
    for name, ids in splits.items():
        dst = out / name
        for sub in subdirs:
            (dst / sub).mkdir(parents=True, exist_ok=True)
            files = {p.stem: p for p in (src / sub).iterdir() if p.is_file()}
            for new_i, old_i in enumerate(ids):
                p = files[stems[old_i]]
                shutil.copy2(p, dst / sub / f"{new_i:06d}{p.suffix}")
        for p in shared:
            shutil.copy2(p, dst / p.name)
    return splits["train"], splits["val"]


def default_camera(
    distance: float = 1.6,
    azimuth_deg: float = 40.0,
    height: float = 0.9,
    target=(0.0, 0.0, 0.25),
) -> np.ndarray:
    """A plausible tripod camera pose looking at the robot workspace.
    Returns Tc_c2b (camera-from-base extrinsic)."""
    az = np.deg2rad(azimuth_deg)
    eye = jnp.asarray(
        [
            target[0] + distance * np.cos(az),
            target[1] + distance * np.sin(az),
            height,
        ],
        jnp.float32,
    )
    T_cam2base = camera.look_at(
        eye, jnp.asarray(target, jnp.float32), jnp.asarray([0.0, 0.0, 1.0])
    )
    return np.asarray(se3.inverse(T_cam2base))


def generate_pose_dataset(
    out_dir: str | Path,
    chain: KinematicChain,
    renderer: RobotRenderer,
    link_names: list[str],
    K: np.ndarray,
    n_views: int = 36,
    radius: float = 1.5,
    height: float = 0.8,
    qpos: np.ndarray | None = None,
    target=(0.0, 0.0, 0.25),
    seed: int = 0,
    jitter: float = 0.0,
) -> dict[str, np.ndarray]:
    """Pose-training dataset: one fixed qpos, a ring of camera poses.

    The reference generates this with SAPIEN for PVNet training
    (tools/simulate/gen_data_for_pvnet.py:21-188 renders a ring of Tc_c2b at
    the zero qpos) and reformats it with
    convert_pvnet_data_to_pvnet_format.py:1-69 (rgb/mask/pose + model.ply +
    diameter). Here both steps are one call producing that final layout:

        color/%06d.png  mask/%06d.png  pose/%06d.txt  (Tc_c2b per view)
        K.txt  qpos.txt  model.ply  diameter.txt

    model.ply is the robot posed at `qpos` in BASE frame; diameter is the
    max pairwise extent of its vertices (the reference's calc_pts_diameter2
    role). Consumers: any single-shot pose estimator used as a PoseInit —
    including models.pose_init.global_search_init's scorer.
    """
    from ..geometry import camera as cam
    from ..geometry import se3
    from ..render.projection import transform_verts
    from ..utils.scene3d import _write_ply

    out = Path(out_dir)
    qpos = np.zeros(chain.n_dof, np.float32) if qpos is None else np.asarray(qpos)
    link_idx = jnp.asarray([chain.link_index(n) for n in link_names])
    lp = chain.fk(jnp.asarray(qpos))[link_idx]  # [L, 4, 4]

    rng = np.random.default_rng(seed)
    rings = cam.ring_poses(
        n_views, radius, height, target=jnp.asarray(target, jnp.float32)
    )  # [N, 4, 4] camera-to-world(base)
    poses = jax.vmap(se3.inverse)(rings)  # Tc_c2b per view
    if jitter > 0:
        noise = rng.normal(0, jitter, (n_views, 3)).astype(np.float32)
        poses = poses.at[:, :3, 3].add(jnp.asarray(noise))

    Kj = jnp.asarray(K, jnp.float32)

    @jax.jit
    def render(Tcs):
        masks = renderer.silhouette(Tcs, jnp.broadcast_to(lp, (n_views,) + lp.shape), Kj)
        return masks

    masks = np.asarray(render(poses))

    from PIL import Image

    for sub in ("color", "mask", "pose"):
        (out / sub).mkdir(parents=True, exist_ok=True)
    for i in range(n_views):
        m8 = (masks[i] > 0.5).astype(np.uint8) * 255
        # flat render as the color image (shape cue only; pose training on
        # synthetic silhouettes matches the reference's mask-driven use)
        Image.fromarray(m8).save(out / "color" / f"{i:06d}.png")
        Image.fromarray(m8).save(out / "mask" / f"{i:06d}.png")
        np.savetxt(out / "pose" / f"{i:06d}.txt", np.asarray(poses[i]))
    np.savetxt(out / "K.txt", np.asarray(K))
    np.savetxt(out / "qpos.txt", qpos)

    # model.ply: packed robot mesh posed at qpos in base frame + diameter
    verts = np.asarray(
        transform_verts(renderer.vertices, renderer.vert_link_id, lp)
    )
    _write_ply(out / "model.ply", verts, np.asarray(renderer.faces))
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    diameter = float(np.linalg.norm(hi - lo))
    (out / "diameter.txt").write_text(f"{diameter}\n")
    return {"poses": np.asarray(poses), "masks": masks, "diameter": diameter}
