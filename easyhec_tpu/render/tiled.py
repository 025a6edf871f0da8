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

from .projection import Triangles2D, TrianglesSoA, soa_from_aos, to_aos
from .raster_core import build_edges, pixel_grid

__all__ = ["silhouette_tiled", "depth_tiled", "TileConfig", "bin_triangles"]

_HI = jax.lax.Precision.HIGHEST


class TileConfig(NamedTuple):
    tile_h: int = 8
    tile_w: int = 128
    capacity: int = 256  # max triangles per tile bin. NOTE: one ad-hoc
    #                      benchmark graph repeatably faulted a v5e worker at
    #                      cap 1024 while the production trainer runs the
    #                      same cap fine (runs/franka_d10); if a worker fault
    #                      appears, suspect cascading tunnel state first
    use_pallas: bool = True  # Pallas kernel (interpret-mode off-TPU) vs pure XLA
    binner: str = "count"  # "count" (counting sort, see binning.py) | "topk"
    rect_y: int = 0  # static tile-rect enumeration window (count binner):
    rect_x: int = 0  # bbox may span at most rect_y x rect_x tiles;
    #                  0 = auto (the full tile grid — exact for any triangle
    #                  size; production configs set tight windows for speed)
    margin: float = 1.0  # bbox dilation (px): soft-band + rebin drift budget
    cull_backfaces: bool = False  # exact for closed oriented meshes
    fused: bool = False  # fused-pose kernel (render/fused.py): records are
    #                      packed per rebin, gradients flow through the
    #                      camera pose only (the calibration contract)
    bwd_band_only: bool = False  # fused backward: gradient only from
    #                      silhouette-band pixels (0 < acc < 1); interior
    #                      internal-edge contributions cancel pairwise in
    #                      pose space, so this is exact to roundoff while
    #                      letting interior/background tiles skip backward.
    #                      Default False HERE (the raw kernel layer keeps
    #                      full-pixel gradients so oracle/parity tests see
    #                      unmodified semantics); the trainer-facing
    #                      config.RenderConfig defaults it to True — the
    #                      production calibration contract, where the
    #                      cancellation argument holds and interior tiles
    #                      skipping backward is the point.
    bin_big_k: int = 0  # count binner: span-classed enumeration — small
    #                      bboxes get 2 entries, up to bin_big_k large ones
    #                      get the full rect window (see binning.bin_count);
    #                      0 = dense ry*rx enumeration for every triangle
    bin_subsort_rows: bool = False  # count binner: order each bin with
    #                      upper-tile-half triangles first (composite key
    #                      tile*2 + rowclass) so record chunks are
    #                      row-coherent and the kernels' 8-row sub-block
    #                      guards fire; identical rasterized output
    compact_chunks: int = 0  # >0: compact-chunk-grid loss path (fused only;
    #                      ops/pose_raster_compact.py) — records packed
    #                      contiguously into this static budget of
    #                      128-slot chunks (sum(ceil(count/128)) over
    #                      tiles must fit or overflow flags); memory, DMA
    #                      and grid work scale with occupancy, not
    #                      n_tiles*capacity. 0 = dense per-tile records
    bwd_chunks: int = 0  # >0 (compact + bwd_band_only only): the backward
    #                      runs on its OWN chunk map covering just the
    #                      tiles that can hold silhouette-BAND pixels
    #                      anywhere in the rebin window (classified at
    #                      rebin time from the rebin-pose accumulation,
    #                      dilated by margin + band width — the same
    #                      drift contract the binning itself assumes).
    #                      Interior/background tiles leave the backward's
    #                      grid and DMA entirely (the in-kernel
    #                      zero-cotangent skip only saved their compute).
    #                      Static budget of 128-slot chunks; overflow
    #                      flags if exceeded. 0 = backward map == forward


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _topk_compact(overlap: jax.Array, k: int, sentinel: int, values=None):
    """Compact boolean rows to ascending index lists via top_k.

    overlap: [R, N] bool. The k largest of {-value if hit else -inf} are
    exactly the first k hits, ascending (values default to the column index;
    pass id-like ascending f32 values to select those directly). Scores are
    f32 — XLA's f32 top_k has a fast TPU path that the i32 one lacks — which
    is exact for ids below 2^24. Returns (ids [R, k] int32 with `sentinel`
    for empty slots, counts [R], overflowed []).
    """
    R, N = overlap.shape
    if values is None:
        values = jax.lax.broadcasted_iota(jnp.float32, (R, N), 1)
    score = jnp.where(overlap, -values, -jnp.inf)
    top_scores, _ = jax.lax.top_k(score, k)
    hit = jnp.isfinite(top_scores)
    ids = jnp.where(hit, (-top_scores).astype(jnp.int32), sentinel)
    counts = jnp.sum(overlap, axis=-1)
    return ids, jnp.minimum(counts, k).astype(jnp.int32), jnp.any(counts > k)


def _bin_bboxes(
    blox: jax.Array,
    bloy: jax.Array,
    bhix: jax.Array,
    bhiy: jax.Array,
    valid: jax.Array,
    H: int,
    W: int,
    cfg: TileConfig,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Assign (margin-dilated) triangle bboxes to tiles, hierarchically.

    Inputs are [F] lane vectors. Returns (tri_ids [n_tiles, cap] int32 —
    index F is the sentinel for an empty slot; counts [n_tiles] int32;
    overflowed [] bool — True if any bin exceeded capacity at either level,
    i.e. triangles were dropped).

    Two levels: a flat [n_tiles, F] overlap + top_k compaction is O(tiles·F)
    and dominates the whole render at production triangle counts. Binning
    first into 4×2-tile super-tiles cuts the F-wide top_k to ~n_tiles/8 rows;
    the per-tile pass then compacts over the super-tile's candidate list only.
    """
    F = valid.shape[-1]
    n_ty, n_tx = _cdiv(H, cfg.tile_h), _cdiv(W, cfg.tile_w)
    n_tiles = n_ty * n_tx
    cap = min(cfg.capacity, F)

    def axis_overlap(n, size, lo1, hi1):
        t0 = jnp.arange(n, dtype=jnp.float32) * size
        return (lo1[None, :] < t0[:, None] + size) & (hi1[None, :] > t0[:, None])

    # ---- level 1: super-tiles of 4×2 tiles -------------------------------
    SY, SX = 4, 2
    sh, sw = SY * cfg.tile_h, SX * cfg.tile_w
    n_sy, n_sx = _cdiv(H, sh), _cdiv(W, sw)
    cap1 = min(max(8 * cap, 512), F)
    oy1 = axis_overlap(n_sy, sh, bloy, bhiy)  # [n_sy, F]
    ox1 = axis_overlap(n_sx, sw, blox, bhix)  # [n_sx, F]
    overlap1 = (oy1[:, None, :] & ox1[None, :, :] & valid[None, None, :]).reshape(
        n_sy * n_sx, F
    )
    super_ids, _, over1 = _topk_compact(overlap1, cap1, F)  # [n_super, cap1]

    # ---- level 2: tiles over their super-tile's candidates ----------------
    # Gather the candidate bboxes once per SUPER-tile (one 2-D take for all
    # four fields — per-field 1-D lane gathers and per-TILE gathers are both
    # an order of magnitude slower), then test the super's SY×SX tiles by
    # broadcasting: only the tile origin differs within a super.
    bounds = jnp.stack([blox, bloy, bhix, bhiy], axis=0)  # [4, F]
    bounds = jnp.concatenate(
        [bounds, jnp.asarray([[1e30], [1e30], [-1e30], [-1e30]], bounds.dtype)],
        axis=1,
    )
    cb = jnp.take(bounds, super_ids, axis=1)  # [4, n_super, cap1]
    cb = cb.reshape(4, n_sy, n_sx, 1, 1, cap1)

    sy0 = jnp.arange(n_sy, dtype=jnp.float32) * sh
    sx0 = jnp.arange(n_sx, dtype=jnp.float32) * sw
    jy0 = jnp.arange(SY, dtype=jnp.float32) * cfg.tile_h
    jx0 = jnp.arange(SX, dtype=jnp.float32) * cfg.tile_w
    ty0 = sy0.reshape(n_sy, 1, 1, 1, 1) + jy0.reshape(1, 1, SY, 1, 1)
    tx0 = sx0.reshape(1, n_sx, 1, 1, 1) + jx0.reshape(1, 1, 1, SX, 1)
    overlap2 = (
        (cb[0] < tx0 + cfg.tile_w)
        & (cb[2] > tx0)
        & (cb[1] < ty0 + cfg.tile_h)
        & (cb[3] > ty0)
    )  # [n_sy, n_sx, SY, SX, cap1]; sentinel slots always False

    def to_tile_major(x):  # (super, intra) -> row-major tile grid, crop W/H
        return x.transpose(0, 2, 1, 3, 4).reshape(
            n_sy * SY, n_sx * SX, cap1
        )[:n_ty, :n_tx].reshape(n_tiles, cap1)

    overlap2 = to_tile_major(overlap2)
    # Selecting by -triangle-id score makes top_k return the ids directly
    # (no per-tile map-back gather); candidate lists are ascending so
    # position order == id order.
    cand_vals = jnp.broadcast_to(
        super_ids.astype(jnp.float32).reshape(n_sy, n_sx, 1, 1, cap1),
        (n_sy, n_sx, SY, SX, cap1),
    )
    tri_ids, counts, over2 = _topk_compact(
        overlap2, cap, F, values=to_tile_major(cand_vals)
    )
    return tri_ids, counts, over1 | over2


def bin_triangles(
    tris: Triangles2D, H: int, W: int, cfg: TileConfig, margin: float = 1.0
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """bbox-overlap tile binning of AoS triangles (see _bin_bboxes).

    `margin` dilates triangle bboxes so the soft-coverage half-pixel band
    (and a safety pixel) never straddles an unbinned tile.
    """
    lo = jnp.min(tris.uv, axis=-2) - margin  # [F, 2] (x, y)
    hi = jnp.max(tris.uv, axis=-2) + margin
    return _bin_bboxes(
        lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1], tris.valid, H, W, cfg
    )


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


def _edge_fields_soa(t: TrianglesSoA):
    """Edge/bbox setup in pure lane-vector math (the SoA twin of
    raster_core.build_edges for the silhouette path). Returns 13 [..., F]
    field arrays (a0 b0 c0 a1 b1 c1 a2 b2 c2 lox loy hix hiy)."""
    u0, u1, u2 = t.u[..., 0, :], t.u[..., 1, :], t.u[..., 2, :]
    v0, v1, v2 = t.v[..., 0, :], t.v[..., 1, :], t.v[..., 2, :]
    area2 = (u1 - u0) * (v2 - v0) - (v1 - v0) * (u2 - u0)
    orient = jnp.where(area2 >= 0, 1.0, -1.0)

    def edge(ua, va, ub, vb):
        a = -(vb - va)
        b = ub - ua
        inv = orient / jnp.maximum(jnp.sqrt(a * a + b * b), 1e-12)
        a = a * inv
        b = b * inv
        return a, b, -(a * ua + b * va)

    a0, b0, c0 = edge(u0, v0, u1, v1)
    a1, b1, c1 = edge(u1, v1, u2, v2)
    a2, b2, c2 = edge(u2, v2, u0, v0)
    lox = jnp.minimum(jnp.minimum(u0, u1), u2)
    hix = jnp.maximum(jnp.maximum(u0, u1), u2)
    loy = jnp.minimum(jnp.minimum(v0, v1), v2)
    hiy = jnp.maximum(jnp.maximum(v0, v1), v2)
    return a0, b0, c0, a1, b1, c1, a2, b2, c2, lox, loy, hix, hiy


def _pack_records(t: TrianglesSoA, H: int, W: int, cfg: TileConfig, margin: float = 1.0):
    """Bin one frame's triangles and gather field-major tile-local records.

    Returns (rec [n_tiles, 16, cap] f32, counts [n_tiles] i32, overflowed []).
    Field-major layout (bin slot on the lane axis) keeps every downstream op
    — the shift into tile-local coordinates here and the whole Pallas kernel —
    a full-width (sublane, lane) vector op; an [..., 16]-minor layout would
    waste 8 of every 128 lanes on TPU.
    """
    from ..ops.tile_raster import TRI_RECORD

    n_tx = _cdiv(W, cfg.tile_w)
    fl = _edge_fields_soa(t)
    lox, loy, hix, hiy = fl[9], fl[10], fl[11], fl[12]
    tri_ids, counts, overflowed = _bin_bboxes(
        lox - margin, loy - margin, hix + margin, hiy + margin,
        t.valid, H, W, cfg,
    )

    # fields [13, F+1]; sentinel column F is all-zero (bbox zeros give
    # negative bbox distance everywhere -> zero coverage even unmasked).
    fields = jnp.stack(fl, axis=0)  # [13, F]
    fields = jnp.pad(fields, ((0, 0), (0, 1)))  # sentinel
    g = jnp.take(fields, tri_ids, axis=1)  # [13, n_tiles, cap]

    n_tiles = tri_ids.shape[0]
    tile_idx = jnp.arange(n_tiles, dtype=jnp.float32)
    x0 = ((tile_idx % n_tx) * cfg.tile_w)[:, None]  # [n_tiles, 1]
    y0 = ((tile_idx // n_tx) * cfg.tile_h)[:, None]

    a0, b0, c0, a1, b1, c1, a2, b2, c2 = (g[k] for k in range(9))
    # d(p_local + (x0,y0)) = a·px + b·py + (c + a·x0 + b·y0)
    c0 = c0 + a0 * x0 + b0 * y0
    c1 = c1 + a1 * x0 + b1 * y0
    c2 = c2 + a2 * x0 + b2 * y0
    lox, loy, hix, hiy = g[9] - x0, g[10] - y0, g[11] - x0, g[12] - y0
    zero = jnp.zeros_like(a0)
    rec = jnp.stack(
        [a0, b0, c0, a1, b1, c1, a2, b2, c2, lox, loy, hix, hiy]
        + [zero] * (TRI_RECORD - 13),
        axis=1,
    )  # [n_tiles, 16, cap]
    return rec, counts, overflowed


def _untile(tiles: jax.Array, H: int, W: int, cfg: TileConfig) -> jax.Array:
    """[..., n_tiles, th, tw] -> [..., H, W]."""
    n_ty, n_tx = _cdiv(H, cfg.tile_h), _cdiv(W, cfg.tile_w)
    lead = tiles.shape[:-3]
    img = (
        tiles.reshape(lead + (n_ty, n_tx, cfg.tile_h, cfg.tile_w))
        .swapaxes(-3, -2)
        .reshape(lead + (n_ty * cfg.tile_h, n_tx * cfg.tile_w))
    )
    return img[..., :H, :W]


def _silhouette_tiled_pallas(
    flat: TrianglesSoA, H: int, W: int, cfg: TileConfig, sharpness: float
):
    """Batched pallas path: [N, 3, F] SoA triangles -> [N, H, W] silhouettes.

    Binning runs per frame under lax.map (bounds the [n_tiles, F] overlap
    matrix to one frame), the kernel runs once over a (frame, tile) grid.
    """
    from ..ops.tile_raster import tile_silhouette

    rec, counts, ovs = jax.lax.map(
        lambda t: _pack_records(t, H, W, cfg), flat
    )
    tiles = tile_silhouette(rec, counts, cfg.tile_h, cfg.tile_w, sharpness)
    return _untile(tiles, H, W, cfg), jnp.any(ovs)


@partial(jax.jit, static_argnames=("H", "W", "cfg", "sharpness"))
def _silhouette_tiled_single(tris: Triangles2D, H: int, W: int, cfg: TileConfig, sharpness: float):
    n_ty, n_tx = _cdiv(H, cfg.tile_h), _cdiv(W, cfg.tile_w)
    edges = build_edges(tris.uv, tris.z, tris.valid)
    tri_ids, counts, overflowed = bin_triangles(tris, H, W, cfg)
    abc_t, bbox_t, valid_t, _, _ = _gather_tile_edges(edges, tri_ids, cfg, n_tx)

    pix = pixel_grid(cfg.tile_h, cfg.tile_w)  # [P, 3] tile-local

    @jax.checkpoint  # recompute in backward: avoids saving [P, cap] residuals
    def tile_cov(abc, bbox, valid):
        from .raster_core import bbox_distance

        def dense(abc, bbox, valid):
            # Three [P,3]x[3,cap] evals (one per edge) — avoids a [P, cap, 3]
            # intermediate XLA would otherwise materialize and save for AD.
            d0 = jnp.einsum("pk,ek->pe", pix, abc[:, 0, :], precision=_HI)
            d1 = jnp.einsum("pk,ek->pe", pix, abc[:, 1, :], precision=_HI)
            d2 = jnp.einsum("pk,ek->pe", pix, abc[:, 2, :], precision=_HI)
            dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
            dmin = jnp.minimum(dmin, bbox_distance(pix, bbox))
            cov = jnp.clip(0.5 + sharpness * dmin, 0.0, 1.0)
            cov = jnp.where(valid[None, :], cov, 0.0)
            return jnp.sum(cov, axis=-1)  # [P] pre-clamp

        cap = valid.shape[0]
        if cap <= 256:
            return jnp.clip(dense(abc, bbox, valid), 0.0, 1.0)
        # Large caps: scan 128-record chunks, accumulating the pre-clamp
        # coverage sum — bounds the [P, cap] temporaries to [P, 128]
        # (production-scale caps on the XLA fallback OOM'd otherwise).
        RC = 128
        capp = -(-cap // RC) * RC
        abc_p = jnp.pad(abc, ((0, capp - cap), (0, 0), (0, 0)))
        bbox_p = jnp.pad(bbox, ((0, capp - cap), (0, 0)))
        valid_p = jnp.pad(valid, (0, capp - cap))

        def chunk(s, sl):
            return s + dense(*sl), None

        s, _ = jax.lax.scan(
            chunk,
            jnp.zeros((pix.shape[0],), jnp.float32),
            (
                abc_p.reshape(-1, RC, *abc.shape[1:]),
                bbox_p.reshape(-1, RC, *bbox.shape[1:]),
                valid_p.reshape(-1, RC),
            ),
        )
        return jnp.clip(s, 0.0, 1.0)

    nt = abc_t.shape[0]
    if nt <= 64:
        tiles = jax.vmap(tile_cov)(abc_t, bbox_t, valid_t)  # [n_tiles, P]
    else:
        # Block the tile axis too: peak temporaries [TB, P, RC] instead of
        # [n_tiles, P, cap].
        TB = 32
        padt = (-nt) % TB

        def padb(a):
            return jnp.pad(a, ((0, padt),) + ((0, 0),) * (a.ndim - 1))

        blocks = jax.lax.map(
            lambda a: jax.vmap(tile_cov)(*a),
            (
                padb(abc_t).reshape(-1, TB, *abc_t.shape[1:]),
                padb(bbox_t).reshape(-1, TB, *bbox_t.shape[1:]),
                padb(valid_t).reshape(-1, TB, *valid_t.shape[1:]),
            ),
        )
        tiles = blocks.reshape(-1, blocks.shape[-1])[:nt]
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
    """Soft silhouette via tile binning. Accepts Triangles2D or TrianglesSoA
    with leading batch axes (binned per frame with lax.map to bound memory;
    the Pallas kernel then runs once over the full (frame, tile) grid)."""
    batch_shape = tris.valid.shape[:-1]

    def flatten(t):
        return jax.tree.map(
            lambda a: a.reshape((-1,) + a.shape[len(batch_shape) :]), t
        )

    if cfg.use_pallas and cfg.binner == "count":
        from .binning import silhouette_counted

        soa = tris if isinstance(tris, TrianglesSoA) else soa_from_aos(tris)
        imgs, ov = silhouette_counted(
            soa, H, W, cfg, sharpness, return_overflow=True
        )
    elif cfg.use_pallas:
        soa = tris if isinstance(tris, TrianglesSoA) else soa_from_aos(tris)
        imgs, ov = _silhouette_tiled_pallas(flatten(soa), H, W, cfg, sharpness)
    else:
        aos = to_aos(tris) if isinstance(tris, TrianglesSoA) else tris
        imgs, ovs = jax.lax.map(
            lambda t: _silhouette_tiled_single(t, H, W, cfg, sharpness),
            flatten(aos),
        )
        ov = jnp.any(ovs)
    imgs = imgs.reshape(batch_shape + (H, W))
    ov = jnp.any(ov)
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
