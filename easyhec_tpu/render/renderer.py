"""High-level robot silhouette/depth renderer.

The TPU-native replacement for the reference's render facade
(easyhec/utils/render_api.py:27-192 and
easyhec/structures/nvdiffrast_renderer.py): all links of all frames render in
ONE batched call (the reference issues B×L separate CUDA rasterizer launches,
its #1 hot-loop cost — SURVEY.md §3.2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..robot.mesh import TriMesh, pack_meshes
from .projection import (
    setup_triangles,
    setup_triangles_corners,
    setup_triangles_soa,
    transform_verts,
    transform_verts_soa,
)
from .raster_jnp import depth_bruteforce, silhouette_bruteforce
from .tiled import TileConfig, depth_tiled, silhouette_tiled

__all__ = ["RobotRenderer"]

_HI = jax.lax.Precision.HIGHEST


class RobotRenderer:
    """Renders a set of per-link meshes under per-frame link poses.

    Static data (packed vertices/faces/link-ids) is baked at construction;
    `silhouette`/`depth` are pure jittable functions of the pose inputs.

    mode: "tiled" (production) or "brute" (reference path, small scenes).
    """

    def __init__(
        self,
        link_meshes: list[TriMesh],
        H: int,
        W: int,
        tile: TileConfig | None = None,
        mode: str = "tiled",
    ):
        packed = pack_meshes(link_meshes)
        self.meshes = list(link_meshes)  # kept for budget-escalated rebuilds
        self.vertices = jnp.asarray(packed.vertices)
        # SoA copies for the lane-vector fast path (see projection.py docs).
        self.verts_xyz = tuple(jnp.asarray(packed.vertices[:, i]) for i in range(3))
        self.faces = jnp.asarray(packed.faces)
        self.vert_link_id = jnp.asarray(packed.vert_mesh_id)
        self.face_link_id = jnp.asarray(packed.face_mesh_id)
        self.n_links = packed.n_meshes
        self.H, self.W = int(H), int(W)
        self.tile = tile or TileConfig()
        self.mode = mode
        # Static face-corner expansion: kills every dynamic gather in the
        # vertex/setup stage (see projection.setup_triangles_corners).
        vc = packed.vertices[packed.faces]  # [F, 3, 3] numpy
        hom = np.concatenate([vc, np.ones_like(vc[..., :1])], axis=-1)
        self.corners_rest = jnp.asarray(
            np.ascontiguousarray(hom.transpose(1, 2, 0)), jnp.float32
        )  # [3 corners, 4, F]
        onehot = (
            packed.face_mesh_id[None, :] == np.arange(packed.n_meshes)[:, None]
        )
        self.face_link_onehot = jnp.asarray(onehot, jnp.float32)  # [L, F]
        # Per-link AABB corners in link-local frame [L, 8, 3] — the drift
        # probe set for adaptive rebinning (models.calib.drift_probe_points).
        # Link ORIGINS alone underestimate projected drift under
        # rotation-dominant pose updates by the mesh lever arm; the AABB
        # corners bound every vertex of the link (advisor r4, medium).
        corners = np.zeros((packed.n_meshes, 8, 3), np.float32)
        cube = np.array(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            np.float32,
        )
        for l in range(packed.n_meshes):
            v = packed.vertices[packed.vert_mesh_id == l]
            if len(v) == 0:
                continue
            lo, hi = v.min(0), v.max(0)
            corners[l] = lo + cube * (hi - lo)
        self._link_aabb_corners = corners

    def link_aabb_corners(self) -> np.ndarray:
        """[L, 8, 3] per-link mesh AABB corners in link-local frame (host
        numpy; empty links give 8 zero corners = the link origin)."""
        return self._link_aabb_corners

    # Identity hash/eq: lets a renderer be a static jit argument (its packed
    # mesh arrays become baked constants of the compiled program).
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    # -- mesh accessors (debug/visualization; host-side) ---------------------

    def link_vertices(self, link: int) -> np.ndarray:
        """Vertices of one link's mesh [Nv, 3] (host numpy)."""
        v = np.asarray(self.vertices)
        return v[np.asarray(self.vert_link_id) == link]

    def link_faces(self, link: int) -> np.ndarray:
        """Faces of one link's mesh, re-indexed into link_vertices."""
        vid = np.asarray(self.vert_link_id)
        faces = np.asarray(self.faces)[np.asarray(self.face_link_id) == link]
        offset = int(np.flatnonzero(vid == link)[0]) if np.any(vid == link) else 0
        return faces - offset

    # -- pose plumbing -----------------------------------------------------

    def camera_link_poses(self, Tc_c2b: jax.Array, link_poses: jax.Array) -> jax.Array:
        """Compose camera-from-link transforms.

        Tc_c2b: [..., 4, 4] camera-from-base; link_poses: [..., L, 4, 4]
        base-from-link (FK output). Returns [..., L, 4, 4].
        """
        return jnp.einsum(
            "...ij,...ljk->...lik", Tc_c2b, link_poses, precision=_HI
        )

    def _triangles(self, Tc_c2l: jax.Array, K: jax.Array):
        verts_cam = transform_verts(self.vertices, self.vert_link_id, Tc_c2l)
        return setup_triangles(verts_cam, self.faces, K)

    def _triangles_soa(self, Tc_c2l: jax.Array, K: jax.Array):
        return setup_triangles_corners(
            self.corners_rest,
            self.face_link_onehot,
            Tc_c2l,
            K,
            cull_backfaces=self.tile.cull_backfaces,
        )

    # -- rendering ---------------------------------------------------------

    def silhouette(
        self,
        Tc_c2b: jax.Array,
        link_poses: jax.Array,
        K: jax.Array,
        sharpness: float = 1.0,
        bin_state=None,
    ) -> jax.Array:
        """Soft silhouette of the whole arm (union of links), in [0, 1].

        Tc_c2b [..., 4, 4], link_poses [..., L, 4, 4], K [3, 3]
        -> [..., H, W].

        bin_state: optional precomputed BinState (from self.bin_state) to
        reuse tile bins across optimizer steps (count binner only) —
        amortizes the binning pass over rebin_every steps. With
        tile.fused=True this is a FusedState and the render runs the
        fused-pose kernel (gradients through Tc_c2b only).
        """
        if self.tile.fused and self.mode != "brute" and self.tile.use_pallas:
            from .fused import CompactState, FusedState, silhouette_fused

            if isinstance(bin_state, CompactState):
                # Compact states drive the loss kernel only; a silhouette
                # image re-bins densely (one-shot calls — not the hot loop).
                bin_state = None
            if bin_state is None or isinstance(bin_state, FusedState):
                return silhouette_fused(
                    self, Tc_c2b, link_poses, K, sharpness, state=bin_state
                )
        Tc_c2l = self.camera_link_poses(Tc_c2b, link_poses)
        if self.mode == "brute":
            tris = self._triangles(Tc_c2l, K)
            return silhouette_bruteforce(tris, self.H, self.W, sharpness)
        if self.tile.use_pallas:
            tris = self._triangles_soa(Tc_c2l, K)
            if bin_state is not None or self.tile.binner == "count":
                from .binning import silhouette_counted

                return silhouette_counted(
                    tris, self.H, self.W, self.tile, sharpness, state=bin_state
                )
        else:
            tris = self._triangles(Tc_c2l, K)
        return silhouette_tiled(tris, self.H, self.W, self.tile, sharpness)

    def bin_state(
        self,
        Tc_c2b: jax.Array,
        link_poses: jax.Array,
        K: jax.Array,
        sharpness: float = 1.0,
    ):
        """Compute the counting-binner state for the current pose (count
        binner only). Leaves carry the FLATTENED frame batch; feed back via
        silhouette(..., bin_state=...) while the pose stays within
        tile.margin pixels of where the state was computed. With
        tile.fused=True, returns a FusedState (records + bins).

        sharpness must match the loss kernel's when tile.bwd_chunks > 0 (it
        sizes the boundary-prefix backward-map band dilation)."""
        from .binning import fields_and_bins

        if self.tile.fused and self.mode != "brute" and self.tile.use_pallas:
            if int(getattr(self.tile, "compact_chunks", 0)) > 0:
                from .fused import build_compact_state

                return build_compact_state(
                    self, Tc_c2b, link_poses, K, sharpness=sharpness
                )
            from .fused import build_fused_state

            return build_fused_state(self, Tc_c2b, link_poses, K)

        Tc_c2l = self.camera_link_poses(Tc_c2b, link_poses)
        tris = self._triangles_soa(Tc_c2l, K)
        batch = tris.valid.shape[:-1]
        flat = jax.tree.map(
            lambda a: a.reshape((-1,) + a.shape[len(batch):]), tris
        )
        _, state = fields_and_bins(flat, self.H, self.W, self.tile)
        return jax.tree.map(jax.lax.stop_gradient, state)

    def depth(self, Tc_c2b: jax.Array, link_poses: jax.Array, K: jax.Array):
        """-> (depth [..., H, W] metric z, link_id [..., H, W] int32, -1=bg)."""
        tris = self._triangles(self.camera_link_poses(Tc_c2b, link_poses), K)
        if self.mode == "brute":
            z, tid = depth_bruteforce(tris, self.H, self.W)
        else:
            z, tid = depth_tiled(tris, self.H, self.W, self.tile)
        face_ids = jnp.concatenate(
            [self.face_link_id, jnp.asarray([-1], jnp.int32)]
        )
        link_id = face_ids[jnp.where(tid >= 0, tid, self.faces.shape[0])]
        return z, link_id

    def link_silhouettes(
        self,
        Tc_c2b: jax.Array,
        link_poses: jax.Array,
        K: jax.Array,
        sharpness: float = 1.0,
    ) -> jax.Array:
        """Per-link masks [..., L, H, W] (parity with the reference's
        per-link render loop; used by validation/overlay tooling)."""
        Tc_c2l = self.camera_link_poses(Tc_c2b, link_poses)
        if self.mode != "brute" and self.tile.use_pallas:
            tris = self._triangles_soa(Tc_c2l, K)
        else:
            tris = self._triangles(Tc_c2l, K)

        def one(link):
            masked = tris._replace(valid=tris.valid & (self.face_link_id == link))
            if self.mode == "brute":
                return silhouette_bruteforce(masked, self.H, self.W, sharpness)
            return silhouette_tiled(masked, self.H, self.W, self.tile, sharpness)

        outs = [one(l) for l in range(self.n_links)]
        return jnp.stack(outs, axis=-3)
