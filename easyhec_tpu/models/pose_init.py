"""Initial-pose estimation — the PVNet-initializer capability, TPU-native.

The reference bootstraps `Tc_c2b` in three ways (SURVEY.md §2.3, §3.1):
1. xArm online: a PVNet keypoint-voting CNN run as a subprocess
   (easyhec/trainer/rbsolve_iter.py:326-334 + third_party/pvnet CUDA ops);
2. Franka: a manually tuned look-at pose (tools/manual_tune_franka_init.py,
   cfg rbsolver_iter.init_Tc_c2b);
3. offline: GT/identity from the dataset.

Here initialization is a first-class subsystem with the same three
capabilities, re-designed for TPU instead of porting two CNN codebases:

- `lookat_init`: the manual/look-at path (capability 2).
- `global_search_init`: a **render-and-score global search** — sample
  thousands of candidate camera poses on a view sphere, render the arm's
  silhouette at low resolution for ALL candidates in one batched compiled
  program, score IoU against the observed mask, and refine the best
  candidates by translation fitting from mask moments. This replaces the
  PVNet CNN (capability 1) with zero training data: the MXU renders and
  scores ~thousands of hypotheses per second.
- `ransac_pnp`: vectorized DLT+RANSAC PnP from 2D-3D correspondences (the
  uncertainty_pnp role, third_party/pvnet/lib/csrc/uncertainty_pnp) for
  users who do have keypoint predictions.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import camera as cam
from ..geometry import se3

__all__ = ["lookat_init", "global_search_init", "ransac_pnp", "GlobalSearchResult"]


def lookat_init(eye, target, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Camera-from-base extrinsic from an eye/target guess (the reference's
    calc_pose_from_lookat path, easyhec/utils/utils_3d.py:359-394)."""
    T_c2w = cam.look_at(
        jnp.asarray(eye, jnp.float32),
        jnp.asarray(target, jnp.float32),
        jnp.asarray(up, jnp.float32),
    )
    return np.asarray(se3.inverse(T_c2w))


@dataclasses.dataclass
class GlobalSearchResult:
    Tc_c2b: np.ndarray  # [4, 4] best pose
    score: float  # IoU of best candidate after refinement
    scores: np.ndarray  # [n_candidates] IoU of every candidate
    poses: np.ndarray  # [n_candidates, 4, 4]


def _fibonacci_hemisphere(n: int, min_elev: float = 0.1) -> np.ndarray:
    """Quasi-uniform directions on the upper hemisphere (z >= sin(min_elev))."""
    i = np.arange(n, dtype=np.float64) + 0.5
    zlo = np.sin(min_elev)
    z = zlo + (1.0 - zlo) * (i / n)
    phi = i * (np.pi * (3.0 - np.sqrt(5.0)))
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)


def _mask_moments(mask: jax.Array):
    """(area, centroid u, centroid v) of a soft mask."""
    H, W = mask.shape[-2:]
    area = mask.sum((-2, -1))
    us = jnp.arange(W, dtype=jnp.float32) + 0.5
    vs = jnp.arange(H, dtype=jnp.float32) + 0.5
    a = jnp.maximum(area, 1e-6)
    cu = (mask * us[None, :]).sum((-2, -1)) / a
    cv = (mask * vs[:, None]).sum((-2, -1)) / a
    return area, cu, cv


def global_search_init(
    renderer,
    link_poses: np.ndarray,  # [B, L, 4, 4] FK per frame (or [L, 4, 4])
    K: np.ndarray,
    masks: np.ndarray,  # [B, H, W] observed masks (or [H, W])
    radii=(0.6, 1.0, 1.5),
    n_dirs: int = 128,
    n_roll: int = 8,
    target: np.ndarray | None = None,
    downscale: int = 8,
    moment_iters: int = 2,
    topk: int = 16,
    refine_steps: int = 200,
    refine_lr: float = 2e-2,
    max_score_frames: int = 4,
) -> GlobalSearchResult:
    """Render-and-score global pose search (PVNet-replacement).

    Three stages, all compiled:
    1. **Sweep**: candidates = view directions (Fibonacci hemisphere) ×
       radii × rolls about the optical axis, looking at the arm centroid.
       Every candidate renders at low resolution over up to
       `max_score_frames` frames in one lax.map; score = mean soft-IoU.
    2. **Moment refine**: the topk candidates get closed-form translation
       updates matching mask area (depth) and centroid (image offset).
    3. **Gradient refine**: a vmapped Adam scan polishes all topk se(3)
       poses against the multi-frame low-res mask loss simultaneously;
       the best final IoU wins.
    """
    from .calib import downscale_K

    link_poses = np.asarray(link_poses, np.float32)
    masks = np.asarray(masks, np.float32)
    if link_poses.ndim == 3:
        link_poses = link_poses[None]
    if masks.ndim == 2:
        masks = masks[None]
    Bs = min(masks.shape[0], max_score_frames)
    lp = jnp.asarray(link_poses[:Bs])
    H, W = masks.shape[-2:]
    Hs, Ws = H // downscale, W // downscale
    Ks = jnp.asarray(downscale_K(np.asarray(K), downscale))
    m = masks[:Bs, : Hs * downscale, : Ws * downscale]
    masks_lo = jnp.asarray(m.reshape(Bs, Hs, downscale, Ws, downscale).mean((2, 4)))

    if target is None:
        target = link_poses[:Bs, :, :3, 3].mean((0, 1))
    target = np.asarray(target, np.float32)

    dirs = _fibonacci_hemisphere(n_dirs)
    eyes = np.concatenate([target + float(r) * dirs for r in radii])
    rolls = np.linspace(0.0, 2 * np.pi, n_roll, endpoint=False, dtype=np.float32)

    def pose_for(eye, roll):
        T_c2w = cam.look_at(eye, jnp.asarray(target), jnp.asarray([0.0, 0.0, 1.0]))
        T = se3.inverse(T_c2w)
        # roll about the optical axis: left-multiply an in-plane rotation
        c, s = jnp.cos(roll), jnp.sin(roll)
        Rz = jnp.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        return T.at[:3, :3].set(Rz @ T[:3, :3]).at[:3, 3].set(Rz @ T[:3, 3])

    eyes_j = jnp.asarray(eyes)
    poses = jax.vmap(
        lambda e: jax.vmap(lambda r: pose_for(e, r))(jnp.asarray(rolls))
    )(eyes_j).reshape(-1, 4, 4)

    # tiny low-res renderer for scoring: reuse the full renderer's meshes
    score_renderer = _scoring_renderer(renderer, Hs, Ws)

    def _iou(T):
        sil = score_renderer.silhouette(T, lp, Ks)  # [Bs, Hs, Ws]
        inter = jnp.minimum(sil, masks_lo).sum((-2, -1))
        union = jnp.maximum(sil, masks_lo).sum((-2, -1))
        return (inter / jnp.maximum(union, 1e-6)).mean()

    @jax.jit
    def score_all(poses):
        return jax.lax.map(_iou, poses, batch_size=64)

    @jax.jit
    def moment_refine(T):
        """Translation from mask moments: area ratio -> depth scale,
        centroid -> image-plane shift (closed form, frame 0)."""
        def body(T, _):
            sil = score_renderer.silhouette(T, lp[0], Ks)
            a_r, _, _ = _mask_moments(sil)
            a_o, cu_o, cv_o = _mask_moments(masks_lo[0])
            s = jnp.sqrt(jnp.maximum(a_r, 1e-6) / jnp.maximum(a_o, 1e-6))
            c_c = T[:3, :3] @ jnp.asarray(target) + T[:3, 3]
            z_new = c_c[2] * s
            fx, fy = Ks[0, 0], Ks[1, 1]
            cx, cy = Ks[0, 2], Ks[1, 2]
            x_new = (cu_o - cx) * z_new / fx
            y_new = (cv_o - cy) * z_new / fy
            t_new = T[:3, 3] + (jnp.asarray([x_new, y_new, z_new]) - c_c)
            return T.at[:3, 3].set(t_new), None

        T, _ = jax.lax.scan(body, T, None, length=moment_iters)
        return T

    def _loss(dof):
        sil = score_renderer.silhouette(se3.exp(dof), lp, Ks)
        return ((sil - masks_lo) ** 2).sum((-2, -1)).mean()

    @jax.jit
    def grad_refine(dofs):
        """Polish all topk candidates at once: vmapped Adam scan."""
        import optax

        opt = optax.adam(refine_lr)

        def one(dof0):
            state = opt.init(dof0)

            def step(carry, _):
                dof, st = carry
                g = jax.grad(_loss)(dof)
                upd, st = opt.update(g, st, dof)
                return (dof + upd, st), None

            (dof, _), _ = jax.lax.scan(step, (dof0, state), None, length=refine_steps)
            return dof, _iou(se3.exp(dof))

        return jax.vmap(one)(dofs)

    scores = score_all(poses)
    order = np.asarray(jnp.argsort(-scores))[:topk]
    cand = jax.vmap(moment_refine)(poses[jnp.asarray(order)])
    dofs0 = jax.vmap(se3.log)(cand)
    dofs, ious = grad_refine(dofs0)
    best = int(np.argmax(np.asarray(ious)))
    return GlobalSearchResult(
        Tc_c2b=np.asarray(se3.exp(dofs[best])),
        score=float(ious[best]),
        scores=np.asarray(scores),
        poses=np.asarray(poses),
    )


_SCORING_CACHE: dict = {}


def _scoring_renderer(renderer, Hs: int, Ws: int):
    """Low-res renderer sharing the packed meshes of `renderer`."""
    key = (id(renderer), Hs, Ws)
    if key not in _SCORING_CACHE:
        import copy

        from ..render.tiled import TileConfig

        r = copy.copy(renderer)
        r.H, r.W = Hs, Ws
        r.tile = TileConfig(
            min(renderer.tile.tile_h, Hs),
            min(renderer.tile.tile_w, max(Ws, 8)),
            renderer.tile.capacity,
            renderer.tile.use_pallas,
        )
        _SCORING_CACHE[key] = r
    return _SCORING_CACHE[key]


def ransac_pnp(
    pts3d: np.ndarray,  # [N, 3] in base frame
    pts2d: np.ndarray,  # [N, 2] pixels
    K: np.ndarray,
    n_iters: int = 256,
    inlier_px: float = 4.0,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized RANSAC + DLT PnP (capability of PVNet's uncertainty_pnp).

    All RANSAC hypotheses solve in one batched lstsq on device. Returns
    (Tc_c2b [4,4], inlier mask [N]).
    """
    pts3d = jnp.asarray(pts3d, jnp.float32)
    pts2d = jnp.asarray(pts2d, jnp.float32)
    Kj = jnp.asarray(K, jnp.float32)
    N = pts3d.shape[0]
    if N < 6:
        raise ValueError("ransac_pnp needs >= 6 correspondences")

    # normalized image coords
    xy = (pts2d - Kj[:2, 2]) / jnp.asarray([Kj[0, 0], Kj[1, 1]])

    def dlt(idx):
        """DLT for P = [R|t] from 6+ correspondences (rows of A p = 0)."""
        X = pts3d[idx]
        x = xy[idx]
        ones = jnp.ones((idx.shape[0], 1), jnp.float32)
        Xh = jnp.concatenate([X, ones], -1)  # [k, 4]
        zeros = jnp.zeros_like(Xh)
        r1 = jnp.concatenate([Xh, zeros, -x[:, :1] * Xh], -1)
        r2 = jnp.concatenate([zeros, Xh, -x[:, 1:2] * Xh], -1)
        A = jnp.concatenate([r1, r2], 0)  # [2k, 12]
        _, _, vt = jnp.linalg.svd(A, full_matrices=False)
        P = vt[-1].reshape(3, 4)
        # enforce rotation via SVD orthogonalization + scale from det
        U, S, Vt = jnp.linalg.svd(P[:, :3])
        sign = jnp.sign(jnp.linalg.det(U @ Vt))
        R = U @ jnp.diag(jnp.asarray([1.0, 1.0, sign])) @ Vt
        scale = sign * S.mean()
        t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
        # resolve the global sign so points land in front of the camera
        z = (pts3d @ R.T + t)[:, 2]
        flip = jnp.sign(jnp.sum(jnp.sign(z)))
        flip = jnp.where(flip == 0, 1.0, flip)
        return R * flip, t * flip

    def reproj_err(R, t):
        pc = pts3d @ R.T + t
        uv, z = cam.project_points(Kj, pc)
        err = jnp.linalg.norm(uv - pts2d, axis=-1)
        return jnp.where(z > 0, err, jnp.inf)

    key = jax.random.PRNGKey(seed)
    idxs = jax.vmap(
        lambda k: jax.random.choice(k, N, (6,), replace=False)
    )(jax.random.split(key, n_iters))

    @jax.jit
    def run():
        Rs, ts = jax.vmap(dlt)(idxs)
        errs = jax.vmap(reproj_err)(Rs, ts)  # [n_iters, N]
        inliers = errs < inlier_px
        counts = inliers.sum(-1)
        best = jnp.argmax(counts)
        return Rs[best], ts[best], inliers[best]

    R, t, inl = run()
    # final refit on all inliers of the best hypothesis (host-side gather)
    inl_np = np.asarray(inl)
    if inl_np.sum() >= 6:
        R, t = dlt(jnp.asarray(np.flatnonzero(inl_np)))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(t)
    return T, inl_np
