"""Pinhole camera projection, OpenCV convention, TPU-first.

The reference routes everything through an OpenGL clip-space projection plus
two coordinate flips (OpenCV→Blender flip of the pose, then a vertical image
flip after rasterization; reference: easyhec/utils/nvdiffrast_utils.py:5-18
and easyhec/structures/nvdiffrast_renderer.py:18-47). The net effect is a
plain OpenCV pinhole projection:

    u = fx · X/Z + cx ,  v = fy · Y/Z + cy ,   +Z in front of the camera,
    pixel (ix, iy) has center (ix + 0.5, iy + 0.5), row iy down.

We rasterize directly in that pixel space — no clip space, no flips.
Near/far only gate validity (no depth-buffer remap is needed because depth
tests use metric Z directly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEAR_DEFAULT = 0.001  # matches reference near/far (nvdiffrast_utils.py:5)
FAR_DEFAULT = 10.0


def project_points(
    K: jax.Array, pts_cam: jax.Array, eps: float = 1e-9
) -> tuple[jax.Array, jax.Array]:
    """Project camera-frame points to pixels.

    K: [3, 3] intrinsics; pts_cam: [..., 3]. Returns (uv [..., 2], z [...]).
    Z is NOT clamped — callers cull/clip using the returned z.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z = pts_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    u = fx * pts_cam[..., 0] / z_safe + cx
    v = fy * pts_cam[..., 1] / z_safe + cy
    return jnp.stack([u, v], axis=-1), z


def look_at(eye: jax.Array, target: jax.Array, up: jax.Array) -> jax.Array:
    """World-from-camera pose with +Z looking from eye to target (OpenCV).

    Returns Tw_w2c's inverse convention? No — returns `Tw_c2w`? Be explicit:
    returns the camera-to-world transform `T_w_cam` (columns = camera axes in
    world frame, translation = eye). Invert for a world-to-camera extrinsic.
    """
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    down = jnp.cross(fwd, right)  # OpenCV y axis points down
    R = jnp.stack([right, down, fwd], axis=-1)
    T = jnp.eye(4, dtype=eye.dtype)
    T = T.at[:3, :3].set(R).at[:3, 3].set(eye)
    return T


def ring_poses(
    n: int,
    radius: float,
    height: float,
    target: jax.Array | None = None,
    up: jax.Array | None = None,
    start_angle: float = 0.0,
) -> jax.Array:
    """[n, 4, 4] camera-to-world poses on a ring looking at `target`.

    Replaces the reference's ring samplers (easyhec/utils/render_api.py:195-219,
    easyhec/utils/utils_3d.py:254-279) for synthetic-data generation.
    """
    if target is None:
        target = jnp.zeros(3, dtype=jnp.float32)
    if up is None:
        up = jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32)
    angles = start_angle + jnp.arange(n, dtype=jnp.float32) * (2.0 * jnp.pi / n)
    eyes = jnp.stack(
        [
            target[0] + radius * jnp.cos(angles),
            target[1] + radius * jnp.sin(angles),
            jnp.full((n,), target[2] + height, dtype=jnp.float32),
        ],
        axis=-1,
    )
    return jax.vmap(lambda e: look_at(e, target, up))(eyes)
