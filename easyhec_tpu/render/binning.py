"""Counting-sort tile binning with a gather-only custom VJP record pack.

This replaces the top_k-compaction binner (tiled._bin_bboxes) on the
production path. Motivation, from honest (readback-timed) TPU profiles of
the 10-frame 640x480 xArm7 workload:

- the 2-level top_k binning costs ~24 ms/step forward, and
- the backward of the record gather (``jnp.take(fields, tri_ids)``) is an
  XLA scatter-add costing ~67 ms/step — together over half the optimizer
  step.

Both disappear with one observation: the tiles overlapped by a triangle's
(margin-dilated) bbox form an axis-aligned RECTANGLE of tiles, so the
(triangle, tile) incidence can be enumerated densely as ``R = ry*rx`` static
"rect slots" per triangle — no compaction search needed. A vectorized
counting sort over the enumerated keys then yields, with no XLA sort, no
top_k and no float scatter:

- ``idx``  [n_tiles, cap]: per-tile triangle lists (dense slot prefixes),
- ``q``    [F, R]: the TRANSPOSE map — for every (triangle, rect-slot), the
  flat ``tile*cap + slot`` position of its record, or an out-of-range
  sentinel. This makes the backward of record packing a pure GATHER
  (``dfields[f] = sum_r drec[q[f, r]]``), ~6x faster on TPU than the
  scatter-add XLA derives for gather transposes.

The counting sort itself is three dense passes, all VPU/MXU friendly:
per-128-lane-chunk histograms via fused compare+reduce, an exclusive cumsum
over chunks, and per-chunk (slot-base, stable-rank) via compare+matmul
blocks under a lax.scan that bounds the materialized one-hots.

The only scatter left is ONE int32 scatter-set (unique indices, no
gradient) inverting the position map into per-tile lists; it runs only when
(re)binning, so optimization loops amortize it over many steps via
``rebin_every`` (triangles move by fractions of a pixel per Adam step; the
binning margin covers the drift).

Role in the reference: this is the tile/bin stage of nvdiffrast's CUDA
rasterizer (reference easyhec/structures/nvdiffrast_renderer.py:39-47 runs
it inside ``dr.rasterize``), redesigned for a machine without fast scatter.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "BinState",
    "bin_count",
    "pack_records_counted",
    "fields_and_bins",
    "silhouette_counted",
]

_HI = jax.lax.Precision.HIGHEST


class BinState(NamedTuple):
    """Integer binning state (no gradients flow through any field).

    idx:      [..., n_tiles, cap] int32 — triangle id per slot; F = sentinel
    counts:   [..., n_tiles] int32 — occupied slots per tile
    q:        [..., F, R] int32 — flat tile*cap + slot per rect entry;
              n_tiles*cap (out of range) where the entry is unused
    overflow: [...] bool — a tile exceeded cap, or a triangle's tile rect
              exceeded the static (ry, rx) enumeration window
    """

    idx: jax.Array
    counts: jax.Array
    q: jax.Array
    overflow: jax.Array


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _bin_count_single(lox, loy, hix, hiy, valid, H, W, th, tw, cap, ry, rx,
                      big_k=0, suby=None):
    F = valid.shape[-1]
    n_ty, n_tx = _cdiv(H, th), _cdiv(W, tw)
    K = n_ty * n_tx
    # suby (bbox center y, image px) enables ROW-SUB-CLASSED bins: the
    # composite key tile*2 + 1{center in lower half of the tile} makes each
    # bin's upper-half triangles a contiguous prefix, so the per-chunk
    # united bbox becomes row-coherent and the kernels' 8-row sub-block
    # guards (ops/pose_raster._fwd/_bwd_accumulate) actually fire. Order
    # within a bin is semantically free (the coverage sum is commutative).
    NCLS = 1 if suby is None else 2
    SENT = K * NCLS  # histogram column for unused entries

    def _cls(ty, sy):
        # row class of an entry given its tile row: 0 = bbox center in the
        # upper half of the tile, 1 = lower (clamped by the bool compare)
        return ((sy - ty.astype(jnp.float32) * th) * 2.0 >= th).astype(
            jnp.int32
        )

    # ---- tile rectangles --------------------------------------------------
    on_screen = (hix > 0.0) & (lox < W) & (hiy > 0.0) & (loy < H)
    use = valid & on_screen
    ty0 = jnp.clip(jnp.floor(loy / th).astype(jnp.int32), 0, n_ty - 1)
    ty1 = jnp.clip(jnp.floor(hiy / th).astype(jnp.int32), 0, n_ty - 1)
    tx0 = jnp.clip(jnp.floor(lox / tw).astype(jnp.int32), 0, n_tx - 1)
    tx1 = jnp.clip(jnp.floor(hix / tw).astype(jnp.int32), 0, n_tx - 1)
    span_y = ty1 - ty0 + 1
    span_x = tx1 - tx0 + 1
    rect_over = jnp.any(use & ((span_y > ry) | (span_x > rx)))

    if big_k <= 0:
        # ---- dense enumeration: ry*rx rect slots for EVERY triangle -------
        R = ry * rx
        iy = jnp.arange(ry, dtype=jnp.int32).reshape(1, ry, 1)
        ix = jnp.arange(rx, dtype=jnp.int32).reshape(1, 1, rx)
        ty = ty0[:, None, None] + iy
        tx = tx0[:, None, None] + ix
        inside = (
            use[:, None, None]
            & (iy < span_y[:, None, None])
            & (ix < span_x[:, None, None])
        )
        tkey = ty * n_tx + tx
        if NCLS == 2:
            tkey = tkey * 2 + _cls(ty, suby[:, None, None])
        keys = jnp.where(inside, tkey, SENT).reshape(F * R)
        fid = jax.lax.broadcasted_iota(jnp.int32, (F, R), 0).reshape(F * R)
        R_out, by = R, 0
        big_ids = None
    else:
        # ---- span-classed enumeration -------------------------------------
        # Small (margin-dilated) bboxes span at most 2 tile rows × 1 tile
        # column — the overwhelming majority at production tile sizes. Only
        # those few triangles whose rect exceeds that get the full ry×rx
        # window, compacted into `big_k` slots first. This cuts the counting
        # sort + inversion-scatter entry count from F·ry·rx to
        # ~2F + big_k·ry·rx (≈4x at bench scale, where the int32 scatter is
        # the dominant rebin cost).
        from .tiled import _topk_compact

        big_k = min(big_k, F)
        by = min(2, ry)
        need_big = use & ((span_y > by) | (span_x > 1))
        big_over = jnp.sum(need_big) > big_k
        big_ids, _, _ = _topk_compact(need_big[None, :], big_k, F)
        big_ids = big_ids[0]  # [big_k] int32, sentinel F for empty slots

        # base entries: by slots (rows ty0..ty0+by-1, column tx0)
        iyb = jnp.arange(by, dtype=jnp.int32).reshape(1, by)
        tyb = ty0[:, None] + iyb
        inside_b = (
            use[:, None] & ~need_big[:, None] & (iyb < span_y[:, None])
        )
        tkey_b = tyb * n_tx + tx0[:, None]
        if NCLS == 2:
            tkey_b = tkey_b * 2 + _cls(tyb, suby[:, None])
        keys_b = jnp.where(inside_b, tkey_b, SENT)

        # big entries: full ry×rx window, gathered through padded tables
        def padg(a, v):
            return jnp.concatenate(
                [a, jnp.full((1,), v, a.dtype)]
            )[big_ids]

        ty0g, tx0g = padg(ty0, 0), padg(tx0, 0)
        syg, sxg = padg(span_y, 0), padg(span_x, 0)
        iy = jnp.arange(ry, dtype=jnp.int32).reshape(1, ry, 1)
        ix = jnp.arange(rx, dtype=jnp.int32).reshape(1, 1, rx)
        tyg = ty0g[:, None, None] + iy
        txg = tx0g[:, None, None] + ix
        inside_g = (iy < syg[:, None, None]) & (ix < sxg[:, None, None])
        tkey_g = tyg * n_tx + txg
        if NCLS == 2:
            subg = jnp.concatenate(
                [suby, jnp.zeros((1,), suby.dtype)]
            )[big_ids]
            tkey_g = tkey_g * 2 + _cls(tyg, subg[:, None, None])
        keys_g = jnp.where(inside_g, tkey_g, SENT)

        keys = jnp.concatenate(
            [keys_b.reshape(F * by), keys_g.reshape(big_k * ry * rx)]
        )
        fid = jnp.concatenate([
            jax.lax.broadcasted_iota(jnp.int32, (F, by), 0).reshape(F * by),
            jnp.broadcast_to(
                big_ids[:, None], (big_k, ry * rx)
            ).reshape(big_k * ry * rx),
        ])
        rect_over = rect_over | big_over
        R_out = by + ry * rx

    # ---- counting sort ----------------------------------------------------
    N = keys.shape[0]
    C = _cdiv(N, 128)
    Np = C * 128
    keys_c = jnp.pad(keys, (0, Np - N), constant_values=SENT).reshape(C, 128)

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, SENT + 1), 2)
    hist = jnp.sum((keys_c[:, :, None] == cols).astype(jnp.float32), axis=1)
    choff = jnp.cumsum(hist, axis=0) - hist  # exclusive over chunks
    totals = hist.sum(axis=0)  # [SENT+1]
    if NCLS == 2:
        # class-1 entries slot AFTER the tile's class-0 block: fold the
        # per-key extra offset (count of the sibling even key) into choff
        # so the slot matmuls below need no change.
        ext = jnp.where(
            jnp.arange(SENT + 1) % 2 == 1,
            jnp.concatenate([jnp.zeros((1,), totals.dtype), totals[:-1]]),
            0.0,
        )
        choff = choff + ext[None, :]

    # Per-entry slot = choff[c, key] + stable within-chunk rank, via
    # compare+matmul blocks (a [C,128]-row take_along_axis costs ~15 ms per
    # 10-frame batch on TPU; these matmuls cost ~2 ms).
    tril = jnp.tril(jnp.ones((128, 128), jnp.float32), -1)
    G = 64  # chunk block: bounds the one-hot to G*128*(K+1) floats

    def block(carry, args):
        kblk, offblk = args  # [G, 128], [G, K+1]
        eq_oh = (kblk[:, :, None] == cols).astype(jnp.float32)
        base = jnp.einsum("glk,gk->gl", eq_oh, offblk, precision=_HI)
        pair = (kblk[:, :, None] == kblk[:, None, :]).astype(jnp.float32)
        rank = jnp.einsum("gij,ij->gi", pair, tril, precision=_HI)
        return carry, base + rank

    Cp = _cdiv(C, G) * G
    keys_b = jnp.pad(keys_c, ((0, Cp - C), (0, 0)), constant_values=SENT)
    choff_b = jnp.pad(choff, ((0, Cp - C), (0, 0)))
    _, slots = jax.lax.scan(
        block, None,
        (keys_b.reshape(-1, G, 128), choff_b.reshape(-1, G, SENT + 1)),
    )
    slot = slots.reshape(Cp * 128)[:N].astype(jnp.int32)

    ok = (keys < SENT) & (slot < cap)
    tile_of_key = keys // NCLS
    q = jnp.where(ok, tile_of_key * cap + slot, K * cap).astype(jnp.int32)

    # ---- invert into per-tile lists (int scatter, unique, no gradient) ----
    idx = (
        jnp.full((K * cap,), F, jnp.int32)
        .at[q]
        .set(fid, mode="drop", unique_indices=True)
        .reshape(K, cap)
    )
    if NCLS == 2:
        tile_tot = totals[:SENT].reshape(K, 2).sum(-1)
    else:
        tile_tot = totals[:K]
    counts = jnp.minimum(tile_tot, cap).astype(jnp.int32)
    overflow = rect_over | jnp.any(tile_tot > cap)

    # ---- per-triangle transpose map [F, R_out] ----------------------------
    if big_ids is None:
        q_full = q.reshape(F, R_out)
    else:
        q_b = q[: F * by].reshape(F, by)
        q_g = q[F * by:].reshape(big_k, ry * rx)
        q_ext = (
            jnp.full((F + 1, ry * rx), K * cap, jnp.int32)
            .at[big_ids]
            .set(q_g, mode="drop")
        )[:F]
        q_full = jnp.concatenate([q_b, q_ext], axis=1)
    return BinState(idx=idx, counts=counts, q=q_full, overflow=overflow)


@partial(
    jax.jit,
    static_argnames=("H", "W", "tile_h", "tile_w", "cap", "ry", "rx", "big_k"),
)
def bin_count(
    lox, loy, hix, hiy, valid, suby=None,
    *, H: int, W: int, tile_h: int, tile_w: int, cap: int,
    ry: int = 4, rx: int = 2, big_k: int = 0,
) -> BinState:
    """Bin (margin-dilated) triangle bboxes [..., F] into tiles. Any number
    of leading batch axes; see BinState.

    big_k > 0 enables span-classed enumeration: small bboxes (≤ 2 tile rows
    × 1 column) get 2 entries, only up to big_k larger triangles get the
    full ry×rx window — ~4x fewer counting-sort/scatter entries at
    production scale. q then has R = 2 + ry*rx columns.

    suby [..., F] (bbox center y, image px) enables row-sub-classed bins:
    each bin lists its upper-half-of-tile triangles first, making record
    chunks row-coherent so the kernels' 8-row sub-block guards fire (same
    rasterized output — in-bin order is free)."""
    fn = partial(
        _bin_count_single, H=H, W=W, th=tile_h, tw=tile_w,
        cap=cap, ry=ry, rx=rx, big_k=big_k,
    )
    if suby is None:
        g = fn
        for _ in valid.shape[:-1]:
            g = jax.vmap(g)
        return g(lox, loy, hix, hiy, valid)
    g = lambda a, b, c, d, e, s: fn(a, b, c, d, e, suby=s)  # noqa: E731
    for _ in valid.shape[:-1]:
        g = jax.vmap(g)
    return g(lox, loy, hix, hiy, valid, suby)


# ---------------------------------------------------------------------------
# Record packing with analytic (gather-only) VJP. Flat batch [B, ...] only.
# ---------------------------------------------------------------------------


def _tile_origins(K: int, n_tx: int, th: int, tw: int):
    t = jnp.arange(K, dtype=jnp.float32)
    return (t % n_tx) * tw, (t // n_tx) * th  # x0, y0


def _shift_rows(g, x0b, y0b, n_rec):
    """[B, 13, K, cap] gathered fields -> [B, K, n_rec, cap] tile-local."""
    a0, b0, c0, a1, b1, c1, a2, b2, c2 = (g[:, k] for k in range(9))
    rows = [
        a0, b0, c0 + a0 * x0b + b0 * y0b,
        a1, b1, c1 + a1 * x0b + b1 * y0b,
        a2, b2, c2 + a2 * x0b + b2 * y0b,
        g[:, 9] - x0b, g[:, 10] - y0b, g[:, 11] - x0b, g[:, 12] - y0b,
    ]
    zero = jnp.zeros_like(a0)
    rec = jnp.stack(rows + [zero] * (n_rec - 13), axis=1)  # [B, n_rec, K, cap]
    return jnp.swapaxes(rec, 1, 2)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pack_records_counted(fields, idx, q, n_tx, tile_h, tile_w, n_rec):
    """fields [B, 13, F] + bins -> records [B, n_tiles, n_rec, cap].

    idx: [B, n_tiles, cap] int32 (BinState.idx), q: [B, F, R] int32
    (BinState.q). Field rows: a0 b0 c0 a1 b1 c1 a2 b2 c2 lox loy hix hiy
    (tiled._edge_fields_soa), shifted into tile-local pixel coordinates,
    zero-padded to n_rec sublanes.

    Linear in ``fields``; backward is a pure gather at ``q`` (the whole
    point — XLA's autodiff of the equivalent take() emits a scatter-add
    costing ~6x more than this gather on TPU).
    """
    return _pack_fwd(fields, idx, q, n_tx, tile_h, tile_w, n_rec)[0]


def _pack_fwd(fields, idx, q, n_tx, tile_h, tile_w, n_rec):
    B, _, F = fields.shape
    K, cap = idx.shape[-2:]
    x0, y0 = _tile_origins(K, n_tx, tile_h, tile_w)
    fpad = jnp.concatenate([fields, jnp.zeros((B, 13, 1), fields.dtype)], -1)
    g = jax.vmap(lambda f, i: jnp.take(f, i.reshape(-1), axis=-1))(fpad, idx)
    g = g.reshape(B, 13, K, cap)
    rec = _shift_rows(g, x0[:, None], y0[:, None], n_rec)
    return rec, (q, F)


def _pack_bwd(n_tx, tile_h, tile_w, n_rec, res, drec):
    q, F = res
    B, K, _, cap = drec.shape
    x0, y0 = _tile_origins(K, n_tx, tile_h, tile_w)
    x0b, y0b = x0[:, None], y0[:, None]

    d = jnp.swapaxes(drec, 1, 2)  # [B, n_rec, K, cap]
    # Transpose of the tile-local shift: c' = c + a*x0 + b*y0 contributes
    # dc'*x0 to da and dc'*y0 to db; bbox translation is additive-constant.
    rows = []
    for e in range(3):
        da, db, dc = d[:, 3 * e], d[:, 3 * e + 1], d[:, 3 * e + 2]
        rows += [da + dc * x0b, db + dc * y0b, dc]
    rows += [d[:, 9], d[:, 10], d[:, 11], d[:, 12]]
    dg = jnp.stack(rows, axis=1).reshape(B, 13, K * cap)
    dgp = jnp.concatenate([dg, jnp.zeros((B, 13, 1), dg.dtype)], -1)

    # Gather-only transpose: dfields[b, :, f] = sum_r dgp[b, :, q[b, f, r]].
    qf = q.reshape(B, -1)
    got = jax.vmap(lambda a, i: jnp.take(a, i, axis=-1))(dgp, qf)
    dfields = got.reshape(B, 13, F, -1).sum(axis=-1)
    return dfields, None, None


pack_records_counted.defvjp(_pack_fwd, _pack_bwd)


# ---------------------------------------------------------------------------
# Full silhouette path (fields -> bins -> records -> Pallas kernel)
# ---------------------------------------------------------------------------


def fields_and_bins(soa, H, W, cfg, margin: float | None = None):
    """Edge-field setup + counting binning for flat-batched SoA triangles.

    soa: TrianglesSoA with ONE leading batch axis ([B, 3, F] / [B, F]).
    Returns (fields [B, 13, F], BinState with [B, ...] leaves).
    """
    from .tiled import _edge_fields_soa

    m = cfg.margin if margin is None else margin
    fl = _edge_fields_soa(soa)
    fields = jnp.stack(fl, axis=-2)
    lox, loy, hix, hiy = fl[9], fl[10], fl[11], fl[12]
    n_ty, n_tx = _cdiv(H, cfg.tile_h), _cdiv(W, cfg.tile_w)
    # rect 0 = auto. Small grids (tests/low-res): the full grid — exact for
    # any triangle size. Large grids: a bounded window (bboxes beyond it set
    # the overflow flag, which trainers surface) — the full grid there would
    # cost F * n_tiles enumeration entries.
    if n_ty * n_tx <= 64:
        auto_ry, auto_rx = n_ty, n_tx
    else:
        auto_ry = min(n_ty, max(2, 64 // cfg.tile_h + 1))
        auto_rx = min(n_tx, max(2, 64 // cfg.tile_w + 1))
    ry = min(cfg.rect_y, n_ty) if cfg.rect_y else auto_ry
    rx = min(cfg.rect_x, n_tx) if cfg.rect_x else auto_rx
    state = bin_count(
        lox - m, loy - m, hix + m, hiy + m, soa.valid,
        H=H, W=W, tile_h=cfg.tile_h, tile_w=cfg.tile_w, cap=cfg.capacity,
        ry=ry, rx=rx, big_k=getattr(cfg, "bin_big_k", 0),
    )
    return fields, state


def silhouette_counted(
    soa,
    H: int,
    W: int,
    cfg,
    sharpness: float = 1.0,
    state: BinState | None = None,
    return_overflow: bool = False,
):
    """Soft silhouette via counting-sort binning (TrianglesSoA, any batch).

    Pass a precomputed ``state`` (from fields_and_bins on the FLATTENED
    batch) to reuse bins across optimizer steps — triangles drift by
    sub-pixel amounts per step, so bins with a safety margin stay valid for
    many steps (see CalibModel rebin_every).
    """
    from ..ops.tile_raster import TRI_RECORD, tile_silhouette
    from .tiled import _edge_fields_soa, _untile

    batch = soa.valid.shape[:-1]
    flat = jax.tree.map(
        lambda a: a.reshape((-1,) + a.shape[len(batch):]), soa
    )
    if state is None:
        fields, state = fields_and_bins(flat, H, W, cfg)
    else:
        fields = jnp.stack(_edge_fields_soa(flat), axis=-2)

    n_tx = _cdiv(W, cfg.tile_w)
    rec = pack_records_counted(
        fields, state.idx, state.q, n_tx, cfg.tile_h, cfg.tile_w, TRI_RECORD
    )
    tiles = tile_silhouette(rec, state.counts, cfg.tile_h, cfg.tile_w, sharpness)
    img = _untile(tiles, H, W, cfg).reshape(batch + (H, W))
    ov = jnp.any(state.overflow)
    return (img, ov) if return_overflow else img
