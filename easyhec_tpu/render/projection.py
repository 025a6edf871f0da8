"""Vertex transform + triangle setup for the TPU rasterizer.

Replaces the reference's clip-space vertex path
(reference: easyhec/utils/nvdiffrast_utils.py:5-18 `K_to_projection` /
`transform_pos`, and the per-link CUDA launches in
easyhec/modeling/models/rb_solve/rb_solver.py:60-67): here ALL links of ALL
frames are transformed in one fused batched computation, projecting straight
to OpenCV pixel coordinates (see easyhec_tpu.geometry.camera for why no
clip-space/flip dance is needed).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera

_HI = jax.lax.Precision.HIGHEST


class Triangles2D(NamedTuple):
    """Screen-space triangle records, batched over leading axes.

    uv:    [..., F, 3, 2] pixel-space vertex positions
    z:     [..., F, 3] camera-space depths (metric)
    valid: [..., F] bool — renderable (in front of near plane, non-degenerate)
    """

    uv: jax.Array
    z: jax.Array
    valid: jax.Array


def transform_verts(
    verts: jax.Array, vert_mesh_id: jax.Array, mesh_poses: jax.Array
) -> jax.Array:
    """Pose packed multi-mesh vertices: one gather + fused einsum.

    verts: [V, 3] packed vertices (all meshes concatenated)
    vert_mesh_id: [V] int — which mesh each vertex belongs to
    mesh_poses: [..., M, 4, 4] per-mesh rigid transforms (e.g. camera-from-link)
    returns: [..., V, 3] camera-frame vertices
    """
    R = mesh_poses[..., :3, :3]  # [..., M, 3, 3]
    t = mesh_poses[..., :3, 3]  # [..., M, 3]
    Rv = jnp.take(R, vert_mesh_id, axis=-3)  # [..., V, 3, 3]
    tv = jnp.take(t, vert_mesh_id, axis=-2)  # [..., V, 3]
    return (
        jnp.einsum("...vij,vj->...vi", Rv, verts, precision=_HI) + tv
    )


def setup_triangles(
    verts_cam: jax.Array,
    faces: jax.Array,
    K: jax.Array,
    near: float = camera.NEAR_DEFAULT,
    far: float = camera.FAR_DEFAULT,
) -> Triangles2D:
    """Project camera-frame vertices and gather per-triangle screen records.

    verts_cam: [..., V, 3]; faces: [F, 3] int; K: [3, 3].
    A triangle is culled (valid=False) if ANY vertex is behind the near plane
    or beyond far — matching the practical behavior of the reference's fixed
    near=0.001/far=10 frustum for robot-arm scenes (no partial clipping:
    calibration scenes never straddle the near plane).
    """
    uv, z = camera.project_points(K, verts_cam)
    tri_uv = jnp.take(uv, faces, axis=-2)  # [..., F, 3, 2]
    tri_z = jnp.take(z, faces, axis=-1)  # [..., F, 3]
    in_frustum = jnp.all((tri_z > near) & (tri_z < far), axis=-1)
    # Degenerate screen triangles (zero area) contribute nothing.
    e01 = tri_uv[..., 1, :] - tri_uv[..., 0, :]
    e02 = tri_uv[..., 2, :] - tri_uv[..., 0, :]
    area2 = e01[..., 0] * e02[..., 1] - e01[..., 1] * e02[..., 0]
    nondegenerate = jnp.abs(area2) > 1e-12
    return Triangles2D(uv=tri_uv, z=tri_z, valid=in_frustum & nondegenerate)
