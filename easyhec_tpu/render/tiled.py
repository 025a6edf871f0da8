"""Tiled/binned rasterizer — the production path.

The brute-force rasterizer is O(H·W·F); this one bins triangles into pixel
tiles (bbox overlap + top_k compaction — no scatter, no atomics, static
shapes throughout, XLA/TPU-friendly) and evaluates each tile only against
its fixed-capacity triangle bin.

Per-tile evaluation reuses raster_core: the edge test is a
[tile_pixels, 3] × [3, 3·CAP] matmul that XLA maps onto the MXU. Instead of
per-tile pixel grids, each gathered triangle's edge constant c is translated
by (a·x0 + b·y0) so one shared base grid serves every tile.

This is the TPU replacement for nvdiffrast's CUDA tile rasterizer used by
the reference (easyhec/structures/nvdiffrast_renderer.py:39-47); the
silhouette output additionally folds in the antialias edge-gradient role
(see raster_core docstring).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Triangles2D
from .raster_core import build_edges, pixel_grid

__all__ = ["silhouette_tiled", "depth_tiled", "TileConfig", "bin_triangles"]

_HI = jax.lax.Precision.HIGHEST


class TileConfig(NamedTuple):
    tile_h: int = 32
    tile_w: int = 128
    capacity: int = 512  # max triangles per tile bin
    use_pallas: bool = True  # Pallas kernel (interpret-mode off-TPU) vs pure XLA


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def bin_triangles(
    tris: Triangles2D, H: int, W: int, cfg: TileConfig, margin: float = 1.0
) -> tuple[jax.Array, jax.Array]:
    """Assign triangles to tiles by bbox overlap.

    Returns (tri_ids [n_tiles, cap] int32 — index F is the sentinel for an
    empty slot; overflowed [] bool — True if any tile's bin exceeded cap).
    `margin` dilates triangle bboxes so the soft-coverage half-pixel band
    (and a safety pixel) never straddles an unbinned tile.
    """
    F = tris.uv.shape[-3]
    n_ty, n_tx = _cdiv(H, cfg.tile_h), _cdiv(W, cfg.tile_w)

    lo = jnp.min(tris.uv, axis=-2) - margin  # [F, 2] (x, y)
    hi = jnp.max(tris.uv, axis=-2) + margin

    ty = jnp.arange(n_ty, dtype=jnp.float32)
    tx = jnp.arange(n_tx, dtype=jnp.float32)
    tile_y0 = ty * cfg.tile_h  # [n_ty]
    tile_x0 = tx * cfg.tile_w  # [n_tx]

    # Overlap tests per axis, then combine: [n_ty, F] & [n_tx, F]
    oy = (lo[..., 1][None, :] < (tile_y0[:, None] + cfg.tile_h)) & (
        hi[..., 1][None, :] > tile_y0[:, None]
    )
    ox = (lo[..., 0][None, :] < (tile_x0[:, None] + cfg.tile_w)) & (
        hi[..., 0][None, :] > tile_x0[:, None]
    )
    valid = tris.valid[None, None, :]
    overlap = (oy[:, None, :] & ox[None, :, :] & valid).reshape(n_ty * n_tx, F)

    # top_k compaction: the k largest of {1,0} are exactly the overlap set
    # (ties keep lowest index). Score by -index so selected ids come out
    # sorted ascending; empty slots map to sentinel F.
    score = jnp.where(
        overlap,
        -jax.lax.broadcasted_iota(jnp.int32, (n_ty * n_tx, F), 1),
        jnp.int32(-2_000_000_000),
    )
    k = min(cfg.capacity, F)  # top_k requires k <= F; scenes smaller than the
    top_scores, _ = jax.lax.top_k(score, k)  # bin capacity just use F slots
    hit = top_scores != jnp.int32(-2_000_000_000)
    tri_ids = jnp.where(hit, -top_scores, F).astype(jnp.int32)

    counts = jnp.sum(overlap, axis=-1)
    overflowed = jnp.any(counts > k)
    return tri_ids, jnp.minimum(counts, k).astype(jnp.int32), overflowed


def _gather_tile_edges(edges, tri_ids, cfg: TileConfig, n_tx: int):
    """Gather per-tile triangle records and translate edge offsets to
    tile-local coordinates. Returns (abc_t [n_tiles, cap, 3, 3], bbox_t
    [n_tiles, cap, 4], valid_t, x0, y0)."""
    F = edges.abc.shape[-3]
    # Pad with a sentinel invalid triangle at index F
    abc_pad = jnp.concatenate([edges.abc, jnp.zeros((1, 3, 3), edges.abc.dtype)])
    bbox_pad = jnp.concatenate([edges.bbox, jnp.zeros((1, 4), edges.bbox.dtype)])
    valid_pad = jnp.concatenate([edges.valid, jnp.zeros((1,), bool)])
    abc_t = abc_pad[tri_ids]  # [n_tiles, cap, 3, 3]
    bbox_t = bbox_pad[tri_ids]  # [n_tiles, cap, 4]
    valid_t = valid_pad[tri_ids]  # [n_tiles, cap]

    n_tiles = tri_ids.shape[0]
    tile_idx = jnp.arange(n_tiles, dtype=jnp.float32)
    x0 = (tile_idx % n_tx) * cfg.tile_w
    y0 = (tile_idx // n_tx) * cfg.tile_h
    # d(p_local + (x0,y0)) = a·px + b·py + (c + a·x0 + b·y0)
    c_shift = (
        abc_t[..., 0] * x0[:, None, None] + abc_t[..., 1] * y0[:, None, None]
    )
    abc_t = abc_t.at[..., 2].add(c_shift)
    # bbox in tile-local coords: subtract (x0, y0) from both corners
    shift4 = jnp.stack([x0, y0, x0, y0], axis=-1)[:, None, :]
    bbox_t = bbox_t - shift4
    return abc_t, bbox_t, valid_t, x0, y0


@partial(jax.jit, static_argnames=("H", "W", "cfg", "sharpness"))
def _silhouette_tiled_single(tris: Triangles2D, H: int, W: int, cfg: TileConfig, sharpness: float):
    n_ty, n_tx = _cdiv(H, cfg.tile_h), _cdiv(W, cfg.tile_w)
    edges = build_edges(tris.uv, tris.z, tris.valid)
    tri_ids, counts, overflowed = bin_triangles(tris, H, W, cfg)
    abc_t, bbox_t, valid_t, _, _ = _gather_tile_edges(edges, tri_ids, cfg, n_tx)

    if cfg.use_pallas:
        from ..ops.tile_raster import tile_silhouette

        cap = abc_t.shape[1]
        tri16 = jnp.concatenate(
            [
                abc_t.reshape(abc_t.shape[0], cap, 9),
                bbox_t,
                jnp.zeros((abc_t.shape[0], cap, 3), abc_t.dtype),
            ],
            axis=-1,
        )
        tiles3 = tile_silhouette(tri16, counts, cfg.tile_h, cfg.tile_w, sharpness)
        img = (
            tiles3.reshape(n_ty, n_tx, cfg.tile_h, cfg.tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(n_ty * cfg.tile_h, n_tx * cfg.tile_w)
        )
        return img[:H, :W], overflowed

    pix = pixel_grid(cfg.tile_h, cfg.tile_w)  # [P, 3] tile-local

    @jax.checkpoint  # recompute in backward: avoids saving [P, cap] residuals
    def tile_cov(abc, bbox, valid):
        from .raster_core import bbox_distance

        # Three [P,3]x[3,cap] evals (one per edge) — avoids a [P, cap, 3]
        # intermediate that XLA would otherwise materialize and save for AD.
        d0 = jnp.einsum("pk,ek->pe", pix, abc[:, 0, :], precision=_HI)
        d1 = jnp.einsum("pk,ek->pe", pix, abc[:, 1, :], precision=_HI)
        d2 = jnp.einsum("pk,ek->pe", pix, abc[:, 2, :], precision=_HI)
        dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
        dmin = jnp.minimum(dmin, bbox_distance(pix, bbox))
        cov = jnp.clip(0.5 + sharpness * dmin, 0.0, 1.0)
        cov = jnp.where(valid[None, :], cov, 0.0)
        return jnp.clip(jnp.sum(cov, axis=-1), 0.0, 1.0)  # [P]

    tiles = jax.vmap(tile_cov)(abc_t, bbox_t, valid_t)  # [n_tiles, P]
    img = (
        tiles.reshape(n_ty, n_tx, cfg.tile_h, cfg.tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(n_ty * cfg.tile_h, n_tx * cfg.tile_w)
    )
    return img[:H, :W], overflowed


def silhouette_tiled(
    tris: Triangles2D,
    H: int,
    W: int,
    cfg: TileConfig = TileConfig(),
    sharpness: float = 1.0,
    return_overflow: bool = False,
):
    """Soft silhouette via tile binning. Accepts leading batch axes on `tris`
    (mapped sequentially with lax.map to bound binning memory)."""
    batch_shape = tris.valid.shape[:-1]
    if not batch_shape:
        img, ov = _silhouette_tiled_single(tris, H, W, cfg, sharpness)
        return (img, ov) if return_overflow else img

    flat = Triangles2D(
        uv=tris.uv.reshape((-1,) + tris.uv.shape[len(batch_shape):]),
        z=tris.z.reshape((-1,) + tris.z.shape[len(batch_shape):]),
        valid=tris.valid.reshape((-1,) + tris.valid.shape[len(batch_shape):]),
    )
    imgs, ovs = jax.lax.map(
        lambda t: _silhouette_tiled_single(t, H, W, cfg, sharpness), flat
    )
    imgs = imgs.reshape(batch_shape + (H, W))
    ov = jnp.any(ovs)
    return (imgs, ov) if return_overflow else imgs


@partial(jax.jit, static_argnames=("H", "W", "cfg"))
def _depth_tiled_single(tris: Triangles2D, H: int, W: int, cfg: TileConfig):
    n_ty, n_tx = _cdiv(H, cfg.tile_h), _cdiv(W, cfg.tile_w)
    edges = build_edges(tris.uv, tris.z, tris.valid)
    tri_ids, _counts, overflowed = bin_triangles(tris, H, W, cfg)
    abc_t, _bbox_t, valid_t, _, _ = _gather_tile_edges(edges, tri_ids, cfg, n_tx)

    F = edges.abc.shape[-3]
    bary_pad = jnp.concatenate(
        [edges.bary_abc, jnp.zeros((1, 3, 3), edges.bary_abc.dtype)]
    )
    zinv_pad = jnp.concatenate([edges.zinv, jnp.ones((1, 3), edges.zinv.dtype)])
    bary_t = bary_pad[tri_ids]
    zinv_t = zinv_pad[tri_ids]
    n_tiles = tri_ids.shape[0]
    tile_idx = jnp.arange(n_tiles, dtype=jnp.float32)
    x0 = (tile_idx % n_tx) * cfg.tile_w
    y0 = (tile_idx // n_tx) * cfg.tile_h
    bshift = bary_t[..., 0] * x0[:, None, None] + bary_t[..., 1] * y0[:, None, None]
    bary_t = bary_t.at[..., 2].add(bshift)

    pix = pixel_grid(cfg.tile_h, cfg.tile_w)

    def tile_depth(abc, valid, babc, zinv, ids):
        coef = abc.reshape(-1, 3)
        d = jnp.einsum("pk,ek->pe", pix, coef, precision=_HI).reshape(
            -1, abc.shape[0], 3
        )
        inside = jnp.all(d >= 0.0, axis=-1) & valid[None, :]
        bcoef = babc.reshape(-1, 3)
        b = jnp.einsum("pk,ek->pe", pix, bcoef, precision=_HI).reshape(
            -1, abc.shape[0], 3
        )
        bsum = jnp.sum(b, axis=-1, keepdims=True)
        bary = b / jnp.where(jnp.abs(bsum) < 1e-12, 1.0, bsum)
        zi = jnp.sum(bary * zinv[None, :, :], axis=-1)
        z = 1.0 / jnp.maximum(zi, 1e-9)
        z_masked = jnp.where(inside, z, jnp.inf)
        slot = jnp.argmin(z_masked, axis=-1)
        zmin = jnp.min(z_masked, axis=-1)
        hit = jnp.isfinite(zmin)
        tid = jnp.where(hit, ids[slot], -1).astype(jnp.int32)
        return jnp.where(hit, zmin, 0.0), tid

    z_tiles, id_tiles = jax.vmap(tile_depth)(abc_t, valid_t, bary_t, zinv_t, tri_ids)

    def untile(x):
        return (
            x.reshape(n_ty, n_tx, cfg.tile_h, cfg.tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(n_ty * cfg.tile_h, n_tx * cfg.tile_w)[:H, :W]
        )

    # Sentinel F ids that won (empty tiles) were already mapped to -1 via hit.
    return untile(z_tiles), untile(id_tiles), overflowed


def depth_tiled(
    tris: Triangles2D, H: int, W: int, cfg: TileConfig = TileConfig()
):
    """Hard depth + triangle-id maps via tile binning (batched like
    silhouette_tiled)."""
    batch_shape = tris.valid.shape[:-1]
    if not batch_shape:
        z, tid, _ = _depth_tiled_single(tris, H, W, cfg)
        return z, tid

    flat = Triangles2D(
        uv=tris.uv.reshape((-1,) + tris.uv.shape[len(batch_shape):]),
        z=tris.z.reshape((-1,) + tris.z.shape[len(batch_shape):]),
        valid=tris.valid.reshape((-1,) + tris.valid.shape[len(batch_shape):]),
    )
    z, tid, _ = jax.lax.map(lambda t: _depth_tiled_single(t, H, W, cfg), flat)
    return z.reshape(batch_shape + (H, W)), tid.reshape(batch_shape + (H, W))
