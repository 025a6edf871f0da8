"""Core rasterization math shared by the brute-force and tiled rasterizers.

Design (TPU-first, replaces nvdiffrast's rasterize+interpolate+antialias CUDA
pipeline used at reference easyhec/structures/nvdiffrast_renderer.py:39-47):

- Per-triangle **soft coverage**: signed distance of the pixel center to the
  triangle boundary (min over the 3 normalized edge functions, orientation-
  corrected so inside is positive for either winding), passed through a
  1-pixel linear filter `clamp(0.5 + d, 0, 1)`. This is the analytic-
  silhouette-gradient formulation (cf. "Analytical Derivatives for
  Differentiable Renderers", PAPERS.md): values equal hard coverage except in
  a 1-px band at the boundary, where the gradient w.r.t. vertex positions is
  exact and dense — the same role as nvdiffrast's antialias edge gradients,
  but computed uniformly per pixel with no scatter/atomics (TPU-friendly).

- **Union** over triangles/links: `clamp(Σ coverage, 0, 1)` — identical
  semantics to the reference's link union `stack().sum(0).clamp(max=1)`
  (reference easyhec/modeling/models/rb_solve/rb_solver.py:68). At shared
  internal edges the two adjacent triangles' coverages sum to exactly 1, so
  interior edges produce no seams and no spurious gradients; gradients appear
  only at true silhouette boundaries.

Everything is dense math over fixed shapes: edge evaluation is a matmul
(pixels × edge-coefficients) that XLA tiles onto the MXU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EdgeData(NamedTuple):
    """Per-triangle rasterization coefficients (leading batch axes allowed).

    abc:    [..., F, 3, 3] normalized edge line functions; abc[..., i, :] =
            (a, b, c) with d_i(p) = a·px + b·py + c = signed distance (pixels)
            of p to edge i, positive inside.
    zinv:   [..., F, 3] per-vertex 1/z for perspective-correct interpolation
    bary_abc: [..., F, 3, 3] screen-space barycentric line functions;
            bary_i(p) = abc·(px, py, 1) gives the (unnormalized-safe) weight
            of vertex i.
    bbox:   [..., F, 4] (lo_x, lo_y, hi_x, hi_y) screen bbox per triangle.
            Soft coverage takes min with the bbox half-plane distances:
            distance-to-edge-LINES underestimates distance to the triangle
            beyond edge endpoints, so near-degenerate slivers (e.g. edge-on
            mesh faces) would otherwise leak phantom coverage along their
            lines; the bbox confines coverage to the triangle's neighborhood
            while staying exact inside.
    valid:  [..., F] bool
    """

    abc: jax.Array
    zinv: jax.Array
    bary_abc: jax.Array
    bbox: jax.Array
    valid: jax.Array


def build_edges(tri_uv: jax.Array, tri_z: jax.Array, valid: jax.Array) -> EdgeData:
    """Precompute edge/barycentric line coefficients from screen triangles.

    tri_uv: [..., F, 3, 2], tri_z: [..., F, 3], valid: [..., F].
    """
    v0, v1, v2 = tri_uv[..., 0, :], tri_uv[..., 1, :], tri_uv[..., 2, :]

    # Twice signed area (CCW positive in x-right/y-down pixel space).
    area2 = (v1[..., 0] - v0[..., 0]) * (v2[..., 1] - v0[..., 1]) - (
        v1[..., 1] - v0[..., 1]
    ) * (v2[..., 0] - v0[..., 0])
    orient = jnp.where(area2 >= 0, 1.0, -1.0)

    def edge(va, vb):
        # Line function cross(vb-va, p-va) = a·px + b·py + c, positive on the
        # CCW-inside side; normalized to signed distance and orientation-fixed.
        a = -(vb[..., 1] - va[..., 1])
        b = vb[..., 0] - va[..., 0]
        length = jnp.sqrt(a * a + b * b)
        inv_len = orient / jnp.maximum(length, 1e-12)
        a = a * inv_len
        b = b * inv_len
        c = -(a * va[..., 0] + b * va[..., 1])
        return jnp.stack([a, b, c], axis=-1)

    # Edge i is FROM v_i TO v_{i+1}; the edge opposite vertex i is edge i+1.
    e0 = edge(v0, v1)
    e1 = edge(v1, v2)
    e2 = edge(v2, v0)
    abc = jnp.stack([e0, e1, e2], axis=-2)  # [..., F, 3, 3]

    # Screen-space barycentrics: bary_i(p) = edge_opposite_i(p) scaled so the
    # three sum to 1 (normalize by their value sum at evaluation time instead
    # of by area — cheaper and immune to the distance normalization above).
    bary_abc = jnp.stack([e1, e2, e0], axis=-2)

    zinv = 1.0 / jnp.maximum(tri_z, 1e-9)
    lo = jnp.min(tri_uv, axis=-2)  # [..., F, 2]
    hi = jnp.max(tri_uv, axis=-2)
    bbox = jnp.concatenate([lo, hi], axis=-1)  # (lo_x, lo_y, hi_x, hi_y)
    return EdgeData(abc=abc, zinv=zinv, bary_abc=bary_abc, bbox=bbox, valid=valid)


def pixel_grid(H: int, W: int, y0: int = 0, x0: int = 0, dtype=jnp.float32):
    """Homogeneous pixel-center coordinates [H*W, 3] (px, py, 1) for a tile
    whose top-left pixel is (x0, y0)."""
    ys = y0 + jnp.arange(H, dtype=dtype) + 0.5
    xs = x0 + jnp.arange(W, dtype=dtype) + 0.5
    px = jnp.broadcast_to(xs[None, :], (H, W)).reshape(-1)
    py = jnp.broadcast_to(ys[:, None], (H, W)).reshape(-1)
    return jnp.stack([px, py, jnp.ones_like(px)], axis=-1)


def coverage_from_edges(
    pix: jax.Array, edges: EdgeData, sharpness: float = 1.0
) -> jax.Array:
    """Soft coverage of each pixel by each triangle.

    pix: [P, 3] homogeneous pixel centers; edges: EdgeData with [F, ...].
    Returns [P, F] coverage in [0, 1]. The edge evaluation is one [P,3]x[3,3F]
    matmul — MXU work.
    """
    F = edges.abc.shape[-3]
    coef = edges.abc.reshape(*edges.abc.shape[:-3], 3 * F, 3)  # [..., 3F, 3]
    # d[..., p, f*3+i] = signed distance of pixel p to edge i of triangle f
    d = jnp.einsum(
        "pk,...ek->...pe", pix, coef, precision=jax.lax.Precision.HIGHEST
    )
    d = d.reshape(*d.shape[:-1], F, 3)
    dmin = jnp.min(d, axis=-1)  # [..., P, F] signed distance to boundary
    dmin = jnp.minimum(dmin, bbox_distance(pix, edges.bbox))
    cov = jnp.clip(0.5 + sharpness * dmin, 0.0, 1.0)
    return jnp.where(edges.valid[..., None, :], cov, 0.0)


def bbox_distance(pix: jax.Array, bbox: jax.Array) -> jax.Array:
    """Signed distance of pixels [P, 3] to triangle bboxes [..., F, 4]
    (positive inside). Returns [..., P, F]. Stops sliver-line coverage leaks —
    see EdgeData.bbox."""
    px = pix[..., 0][:, None]  # [P, 1]
    py = pix[..., 1][:, None]
    lo_x = bbox[..., None, :, 0]  # [..., 1, F]
    lo_y = bbox[..., None, :, 1]
    hi_x = bbox[..., None, :, 2]
    hi_y = bbox[..., None, :, 3]
    return jnp.minimum(
        jnp.minimum(px - lo_x, hi_x - px), jnp.minimum(py - lo_y, hi_y - py)
    )


def depth_from_edges(
    pix: jax.Array, edges: EdgeData
) -> tuple[jax.Array, jax.Array]:
    """Hard visibility: per-pixel nearest depth and triangle index.

    Returns (z [P], tri_id [P] int32 with -1 for background). Inside test is
    the hard version of the soft coverage (all edge distances ≥ 0).
    """
    F = edges.abc.shape[-3]
    coef = edges.abc.reshape(*edges.abc.shape[:-3], 3 * F, 3)
    d = jnp.einsum(
        "pk,...ek->...pe", pix, coef, precision=jax.lax.Precision.HIGHEST
    ).reshape(*pix.shape[:-1], F, 3)
    inside = jnp.all(d >= 0.0, axis=-1) & edges.valid[..., None, :]

    bcoef = edges.bary_abc.reshape(*edges.bary_abc.shape[:-3], 3 * F, 3)
    b = jnp.einsum(
        "pk,...ek->...pe", pix, bcoef, precision=jax.lax.Precision.HIGHEST
    ).reshape(*pix.shape[:-1], F, 3)
    bsum = jnp.sum(b, axis=-1, keepdims=True)
    bary = b / jnp.where(jnp.abs(bsum) < 1e-12, 1.0, bsum)
    zinv = jnp.sum(bary * edges.zinv[..., None, :, :], axis=-1)  # [P, F]
    z = 1.0 / jnp.maximum(zinv, 1e-9)

    z_masked = jnp.where(inside, z, jnp.inf)
    tri_id = jnp.argmin(z_masked, axis=-1).astype(jnp.int32)
    zmin = jnp.min(z_masked, axis=-1)
    hit = jnp.isfinite(zmin)
    return jnp.where(hit, zmin, 0.0), jnp.where(hit, tri_id, -1)
