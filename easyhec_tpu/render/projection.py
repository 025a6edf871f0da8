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


class TrianglesSoA(NamedTuple):
    """Structure-of-arrays screen triangles — the TPU-native layout.

    The AoS Triangles2D layout ([..., F, 3, 2]) puts 2- and 3-sized axes on
    the TPU lane dimension, wasting 126 of every 128 lanes on every
    downstream op (edge setup, binning, record packing). Here each component
    is a full-width [..., F] lane vector:

    u, v:  [..., 3, F] pixel coordinates, vertex on the sublane axis
    z:     [..., 3, F] camera-space depths
    valid: [..., F] bool
    """

    u: jax.Array
    v: jax.Array
    z: jax.Array
    valid: jax.Array

    @property
    def n_faces(self) -> int:
        return self.valid.shape[-1]


def soa_from_aos(t: Triangles2D) -> TrianglesSoA:
    u = jnp.swapaxes(t.uv[..., 0], -1, -2)
    v = jnp.swapaxes(t.uv[..., 1], -1, -2)
    z = jnp.swapaxes(t.z, -1, -2)
    return TrianglesSoA(u=u, v=v, z=z, valid=t.valid)


def to_aos(t: TrianglesSoA) -> Triangles2D:
    uv = jnp.stack(
        [jnp.swapaxes(t.u, -1, -2), jnp.swapaxes(t.v, -1, -2)], axis=-1
    )
    return Triangles2D(uv=uv, z=jnp.swapaxes(t.z, -1, -2), valid=t.valid)


def transform_verts_soa(
    verts_xyz: tuple[jax.Array, jax.Array, jax.Array],
    vert_mesh_id: jax.Array,
    mesh_poses: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """SoA rigid transform of packed multi-mesh vertices.

    verts_xyz: three [V] arrays; vert_mesh_id: [V] int; mesh_poses
    [..., M, 4, 4]. Returns (x, y, z) each [..., V] — every op is an
    elementwise fma on a [V]-lane vector (the AoS einsum materializes a
    [..., V, 3, 3] gathered-rotation tensor instead).
    """
    x0, y0, z0 = verts_xyz

    def row(i):
        r = [jnp.take(mesh_poses[..., i, j], vert_mesh_id, axis=-1) for j in range(4)]
        return r[0] * x0 + r[1] * y0 + r[2] * z0 + r[3]

    return row(0), row(1), row(2)


def setup_triangles_soa(
    verts_xyz: tuple[jax.Array, jax.Array, jax.Array],
    faces: jax.Array,
    K: jax.Array,
    near: float = camera.NEAR_DEFAULT,
    far: float = camera.FAR_DEFAULT,
    eps: float = 1e-9,
    cull_backfaces: bool = False,
) -> TrianglesSoA:
    """Project SoA camera-frame vertices and gather per-triangle records.

    Same semantics as setup_triangles (OpenCV pinhole, whole-triangle
    near/far cull, degenerate cull) in pure lane-vector ops.

    cull_backfaces: drop triangles whose outward normal faces away from the
    camera (camera-space test n . v0 >= 0, projection-convention free). For
    a CLOSED, consistently outward-oriented mesh this leaves the silhouette
    union exactly unchanged (every ray hitting a backface entered the solid
    through a frontface covering the same pixel) while halving the triangle
    load of binning and rasterization.
    """
    x, y, z = verts_xyz
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z_safe = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    u_pt = fx * x / z_safe + cx
    v_pt = fy * y / z_safe + cy

    def gather(a):  # [..., V] -> [..., 3, F]
        return jnp.stack(
            [jnp.take(a, faces[:, i], axis=-1) for i in range(3)], axis=-2
        )

    u = gather(u_pt)
    v = gather(v_pt)
    tz = gather(z)
    in_frustum = jnp.all((tz > near) & (tz < far), axis=-2)
    e01u, e01v = u[..., 1, :] - u[..., 0, :], v[..., 1, :] - v[..., 0, :]
    e02u, e02v = u[..., 2, :] - u[..., 0, :], v[..., 2, :] - v[..., 0, :]
    area2 = e01u * e02v - e01v * e02u
    valid = in_frustum & (jnp.abs(area2) > 1e-12)
    if cull_backfaces:
        xt, yt = gather(x), gather(y)
        x0, y0, z0 = xt[..., 0, :], yt[..., 0, :], tz[..., 0, :]
        e1 = (xt[..., 1, :] - x0, yt[..., 1, :] - y0, tz[..., 1, :] - z0)
        e2 = (xt[..., 2, :] - x0, yt[..., 2, :] - y0, tz[..., 2, :] - z0)
        nx = e1[1] * e2[2] - e1[2] * e2[1]
        ny = e1[2] * e2[0] - e1[0] * e2[2]
        nz = e1[0] * e2[1] - e1[1] * e2[0]
        valid = valid & (nx * x0 + ny * y0 + nz * z0 < 0.0)
    return TrianglesSoA(u=u, v=v, z=tz, valid=valid)


def setup_triangles_corners(
    corners_rest: jax.Array,
    face_mesh_onehot: jax.Array,
    mesh_poses: jax.Array,
    K: jax.Array,
    near: float = camera.NEAR_DEFAULT,
    far: float = camera.FAR_DEFAULT,
    eps: float = 1e-9,
    cull_backfaces: bool = False,
) -> TrianglesSoA:
    """Gather-free triangle setup from statically face-expanded vertices.

    The SoA path's only dynamic-index ops were the per-vertex pose gather
    (transform_verts_soa) and the faces gather — both slow on TPU (the
    faces-gather transpose in backward is an XLA scatter-add costing more
    than the entire rasterizer kernel). Pre-expanding rest-pose vertices to
    per-face-corner arrays at renderer build time removes every gather: the
    pose lookup becomes one tiny one-hot matmul and the corner transform is
    pure lane-vector fma.

    corners_rest:     [3 corners, 4, F] static homogeneous rest positions
    face_mesh_onehot: [M, F] static 0/1 link membership
    mesh_poses:       [..., M, 4, 4] camera-from-mesh transforms
    """
    P = mesh_poses[..., :3, :4]  # [..., M, 3, 4]
    # Per-face pose rows: [..., 3, 4, F] — one small matmul, MXU work.
    pr = jnp.einsum(
        "...mij,mf->...ijf", P, face_mesh_onehot, precision=_HI
    )

    def corner(c):
        r = corners_rest[c]  # [4, F]
        out = [
            pr[..., i, 0, :] * r[0]
            + pr[..., i, 1, :] * r[1]
            + pr[..., i, 2, :] * r[2]
            + pr[..., i, 3, :] * r[3]
            for i in range(3)
        ]
        return out  # x, y, z each [..., F]

    xs, ys, zs = zip(corner(0), corner(1), corner(2))
    x = jnp.stack(xs, axis=-2)  # [..., 3, F]
    y = jnp.stack(ys, axis=-2)
    z = jnp.stack(zs, axis=-2)

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z_safe = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    u = fx * x / z_safe + cx
    v = fy * y / z_safe + cy

    in_frustum = jnp.all((z > near) & (z < far), axis=-2)
    e01u, e01v = u[..., 1, :] - u[..., 0, :], v[..., 1, :] - v[..., 0, :]
    e02u, e02v = u[..., 2, :] - u[..., 0, :], v[..., 2, :] - v[..., 0, :]
    area2 = e01u * e02v - e01v * e02u
    valid = in_frustum & (jnp.abs(area2) > 1e-12)
    if cull_backfaces:
        x0, y0, z0 = x[..., 0, :], y[..., 0, :], z[..., 0, :]
        e1 = (x[..., 1, :] - x0, y[..., 1, :] - y0, z[..., 1, :] - z0)
        e2 = (x[..., 2, :] - x0, y[..., 2, :] - y0, z[..., 2, :] - z0)
        nx = e1[1] * e2[2] - e1[2] * e2[1]
        ny = e1[2] * e2[0] - e1[0] * e2[2]
        nz = e1[0] * e2[1] - e1[1] * e2[0]
        valid = valid & (nx * x0 + ny * y0 + nz * z0 < 0.0)
    return TrianglesSoA(u=u, v=v, z=z, valid=valid)


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
