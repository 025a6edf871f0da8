"""Pose-initialization subsystem tests (PVNet-capability analog)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyhec_tpu.geometry import camera as cam
from easyhec_tpu.geometry import se3
from easyhec_tpu.models.pose_init import global_search_init, lookat_init, ransac_pnp


def test_lookat_init_points_at_target():
    T = lookat_init(eye=[1.0, 0.0, 0.5], target=[0.0, 0.0, 0.2])
    # the target must project near the optical axis, in front of the camera
    p = T[:3, :3] @ np.array([0.0, 0.0, 0.2]) + T[:3, 3]
    assert p[2] > 0
    assert abs(p[0]) < 1e-5 and abs(p[1]) < 1e-5


def test_ransac_pnp_recovers_pose():
    rng = np.random.default_rng(0)
    pts3d = rng.uniform(-0.4, 0.4, (60, 3)).astype(np.float32)
    T_gt = np.asarray(
        se3.inverse(
            cam.look_at(
                jnp.asarray([0.8, 0.5, 0.9]), jnp.zeros(3), jnp.asarray([0.0, 0.0, 1.0])
            )
        )
    )
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    pc = pts3d @ T_gt[:3, :3].T + T_gt[:3, 3]
    uv = np.asarray(cam.project_points(jnp.asarray(K), jnp.asarray(pc))[0])
    # 20% outliers
    uv_noisy = uv.copy()
    out_idx = rng.choice(60, 12, replace=False)
    uv_noisy[out_idx] += rng.uniform(30, 80, (12, 2))
    T_est, inliers = ransac_pnp(pts3d, uv_noisy, K, n_iters=128, seed=1)
    assert inliers.sum() >= 40
    assert np.allclose(T_est[:3, 3], T_gt[:3, 3], atol=5e-3)
    ang = np.degrees(
        np.arccos(np.clip((np.trace(T_est[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -1, 1))
    )
    assert ang < 0.5


@pytest.mark.slow
def test_global_search_init_finds_viewpoint(mini_rig):
    chain, renderer, link_idx = mini_rig
    q = jnp.asarray([0.4, -0.5])
    lp = chain.fk(q)[link_idx]
    T_gt = lookat_init(eye=[0.7, 0.4, 0.6], target=[0.0, 0.0, 0.25])
    K = np.array([[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]], np.float32)
    mask_gt = np.asarray(renderer.silhouette(jnp.asarray(T_gt), lp, jnp.asarray(K)))
    assert mask_gt.sum() > 20  # the arm is visible in the GT view

    res = global_search_init(
        renderer,
        np.asarray(lp),
        K,
        mask_gt,
        radii=(0.6, 0.9, 1.2),
        n_dirs=48,
        n_roll=2,
        downscale=2,
        topk=4,
    )
    assert res.score > 0.3  # coarse init: good overlap, not exactness
    # the found camera center should be in the right half-space
    c_est = -res.Tc_c2b[:3, :3].T @ res.Tc_c2b[:3, 3]
    c_gt = -T_gt[:3, :3].T @ T_gt[:3, 3]
    assert np.dot(c_est / np.linalg.norm(c_est), c_gt / np.linalg.norm(c_gt)) > 0.5
