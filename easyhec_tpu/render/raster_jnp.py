"""Brute-force rasterizer: every pixel against every triangle.

The correctness reference for the tiled/Pallas rasterizers, and a perfectly
good production path for small images / few triangles (O(H·W·F) dense work).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import Triangles2D
from .raster_core import (
    EdgeData,
    build_edges,
    coverage_from_edges,
    depth_from_edges,
    pixel_grid,
)

__all__ = ["silhouette_bruteforce", "depth_bruteforce"]


def _flatten_batch(edges: EdgeData, n_batch_axes: int) -> EdgeData:
    return jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[n_batch_axes:]), edges
    )


def silhouette_bruteforce(
    tris: Triangles2D, H: int, W: int, sharpness: float = 1.0
) -> jax.Array:
    """[..., F, …] screen triangles -> [..., H, W] soft silhouette in [0, 1].

    Union semantics: clamp(Σ per-triangle coverage, 0, 1) — the fused
    equivalent of the reference's per-link renders + sum().clamp(max=1)
    (reference easyhec/modeling/models/rb_solve/rb_solver.py:60-68).
    """
    edges = build_edges(tris.uv, tris.z, tris.valid)
    pix = pixel_grid(H, W)

    def one(e: EdgeData):
        cov = coverage_from_edges(pix, e, sharpness)
        return jnp.clip(jnp.sum(cov, axis=-1), 0.0, 1.0).reshape(H, W)

    batch_shape = tris.valid.shape[:-1]
    if batch_shape:
        flat = jax.vmap(one)(_flatten_batch(edges, len(batch_shape)))
        return flat.reshape(batch_shape + (H, W))
    return one(edges)


def depth_bruteforce(
    tris: Triangles2D, H: int, W: int
) -> tuple[jax.Array, jax.Array]:
    """-> (depth [..., H, W] metric camera-space z, 0 = background;
           tri_id [..., H, W] int32, -1 = background)."""
    edges = build_edges(tris.uv, tris.z, tris.valid)
    pix = pixel_grid(H, W)

    def one(e: EdgeData):
        z, tid = depth_from_edges(pix, e)
        return z.reshape(H, W), tid.reshape(H, W)

    batch_shape = tris.valid.shape[:-1]
    if batch_shape:
        z, tid = jax.vmap(one)(_flatten_batch(edges, len(batch_shape)))
        return z.reshape(batch_shape + (H, W)), tid.reshape(batch_shape + (H, W))
    return one(edges)
