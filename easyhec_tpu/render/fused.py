"""Fused-pose silhouette path: static per-rebin records, per-step kernel.

Builds the inputs of ops.pose_raster.pose_tile_silhouette:

- At REBIN time (amortized over solver.rebin_every steps): project the
  triangles under the current pose, bin their dilated bboxes with the
  counting binner, and pack per-tile records of BASE-frame corner
  positions Xb = T_base_from_link(qpos) @ X_rest. The records and bins are
  integer/constant state — `jax.lax.stop_gradient` everywhere.

- At STEP time: one kernel call whose only differentiable input is the
  16-scalar per-frame camera row [Tc[:3,:4] | fx fy cx cy]. No per-step
  gather, pack, or scatter — this removes the ~24 ms/step record-pack
  fwd+bwd that dominated the unfused profile (see ops/pose_raster.py).

Role in the reference: together with ops.pose_raster this is the
differentiable-rendering hot path of RBSolver (reference
easyhec/modeling/models/rb_solve/rb_solver.py:41-72 +
easyhec/structures/nvdiffrast_renderer.py:25-47), restructured so the
optimizer loop's per-step work is exactly one fused rasterize+gradient
program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera
from ..ops.pose_raster import (
    POSE_RECORD,
    pose_tile_loss,
    pose_tile_silhouette,
    tile_image,
)
from .binning import BinState, bin_count
from .projection import setup_triangles_corners

__all__ = [
    "FusedState",
    "CompactState",
    "build_fused_state",
    "build_compact_state",
    "silhouette_fused",
    "loss_fused",
    "cam_rows",
    "tile_image",
]

_HI = jax.lax.Precision.HIGHEST


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class FusedState(NamedTuple):
    """Per-rebin state for the fused-pose silhouette path.

    rec:      [Bflat, POSE_RECORD, n_tiles*cap] f32 field-major base-frame
              corner records (x,y,z,w per corner; all-zero = empty slot)
    counts:   [Bflat, n_tiles] int32
    overflow: [] bool — a bin exceeded cap or a bbox exceeded the rect
              enumeration window at rebin time
    """

    rec: jax.Array
    counts: jax.Array
    overflow: jax.Array


def cam_rows(Tc_c2b: jax.Array, K: jax.Array, batch: int) -> jax.Array:
    """[B, 16] kernel camera rows from a pose and intrinsics.

    Tc_c2b: [4, 4] or [B, 4, 4]; K: [3, 3]. The kernel's only
    differentiable input.
    """
    T = Tc_c2b[..., :3, :4]
    flat = T.reshape(T.shape[:-2] + (12,))
    if flat.ndim == 1:
        flat = jnp.broadcast_to(flat, (batch, 12))
    kvec = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
    kvec = jnp.broadcast_to(kvec, (batch, 4))
    return jnp.concatenate([flat, kvec], axis=-1)


def _gather_fields(fpad: jax.Array, idx: jax.Array) -> jax.Array:
    """[B, 12, N] record gather as 12 per-field row gathers.

    A single take(f, i, axis=-1) lowers to one gather whose [N, 12]
    output XLA materializes in (8, 128)-tiled layout — the minor dim 12
    pads to 128 lanes, a 10.7x memory blowup (17.4 GB for 10 frames of
    the config-5 scene; OOM'd the 16 GB chip). Twelve [N] row gathers
    produce unpadded intermediates and stack into the same [B, 12, N]
    field-major kernel operand."""
    return jax.vmap(
        lambda f, i: jnp.stack([jnp.take(f[r], i) for r in range(12)])
    )(fpad, idx)


def _base_corner_fields(corners_rest, face_link_onehot, link_poses):
    """Base-frame corner fields [B, 12, F] (+valid w folded by caller).

    corners_rest: [3, 4, F]; face_link_onehot: [L, F];
    link_poses: [B, L, 4, 4] base-from-link (FK output).
    """
    P = link_poses[..., :3, :4]  # [B, L, 3, 4]
    pr = jnp.einsum("bmij,mf->bijf", P, face_link_onehot, precision=_HI)
    rows = []
    for c in range(3):
        r = corners_rest[c]  # [4, F]
        for i in range(3):
            rows.append(
                pr[:, i, 0] * r[0]
                + pr[:, i, 1] * r[1]
                + pr[:, i, 2] * r[2]
                + pr[:, i, 3] * r[3]
            )
        rows.append(None)  # w slot, filled by caller with the valid row
    return rows  # list of 12 entries ([B, F] or None at w slots)


class CompactState(NamedTuple):
    """Per-rebin state for the compact-chunk-grid loss path
    (ops.pose_raster_compact): records packed contiguously, chunk-aligned
    per tile — memory, DMA and grid work scale with bin OCCUPANCY instead
    of capacity (~5% at honest caps, BASELINE.md).

    rec:      [Bflat, POSE_RECORD, nc*128] f32 compact field-major records
    nlive:    [Bflat, nc] int32 — live slots per compact chunk
    ctmap:    [Bflat, nc] int32 — tile of each compact chunk (padding
              chunks continue the last real chunk's tile with nlive 0)
    ncu:      [Bflat] int32 — used chunks (rest is padding)
    counts:   [Bflat, n_tiles] int32 — per-tile loads (empty-tile loss term)
    overflow: [] bool — bin cap, rect window, or the nc chunk budget
              overflowed at rebin time
    bwd_nlive/bwd_ctmap/bwd_cpos: the backward's own chunk map (equal to
              the forward's here; the boundary-prefix variant shrinks it)
    """

    rec: jax.Array
    nlive: jax.Array
    ctmap: jax.Array
    ncu: jax.Array
    counts: jax.Array
    overflow: jax.Array
    bwd_nlive: jax.Array
    bwd_ctmap: jax.Array
    bwd_cpos: jax.Array


def _fused_bins_and_fields(renderer, Tc_c2b, link_poses, K):
    """Shared rebin stage: current-pose binning + base-frame corner field
    table. Returns (BinState, fpad [B, 12, F+1], lp [B, L, 4, 4])."""
    cfg = renderer.tile
    H, W = renderer.H, renderer.W
    lp = link_poses.reshape((-1,) + link_poses.shape[-3:])
    B = lp.shape[0]
    Tc = Tc_c2b
    if Tc.ndim > 2:
        Tc = Tc.reshape((-1, 4, 4))

    # Screen-space triangles under the CURRENT pose: bbox + validity
    # (including optional backface culling) — reuses the standard setup.
    Tc_c2l = jnp.einsum(
        "ij,bljk->blik" if Tc.ndim == 2 else "bij,bljk->blik",
        Tc, lp, precision=_HI,
    )
    tris = setup_triangles_corners(
        renderer.corners_rest,
        renderer.face_link_onehot,
        Tc_c2l,
        K,
        cull_backfaces=cfg.cull_backfaces,
    )

    lox = jnp.min(tris.u, axis=-2)
    hix = jnp.max(tris.u, axis=-2)
    loy = jnp.min(tris.v, axis=-2)
    hiy = jnp.max(tris.v, axis=-2)

    n_ty, n_tx = _cdiv(H, cfg.tile_h), _cdiv(W, cfg.tile_w)
    if n_ty * n_tx <= 64:
        auto_ry, auto_rx = n_ty, n_tx
    else:
        auto_ry = min(n_ty, max(2, 64 // cfg.tile_h + 1))
        auto_rx = min(n_tx, max(2, 64 // cfg.tile_w + 1))
    ry = min(cfg.rect_y, n_ty) if cfg.rect_y else auto_ry
    rx = min(cfg.rect_x, n_tx) if cfg.rect_x else auto_rx
    m = cfg.margin
    suby = (
        0.5 * (loy + hiy)
        if getattr(cfg, "bin_subsort_rows", False) else None
    )
    state: BinState = bin_count(
        lox - m, loy - m, hix + m, hiy + m, tris.valid, suby,
        H=H, W=W, tile_h=cfg.tile_h, tile_w=cfg.tile_w, cap=cfg.capacity,
        ry=ry, rx=rx, big_k=getattr(cfg, "bin_big_k", 0),
    )

    # Base-frame corner fields; w row = valid (0 disables the slot via the
    # kernel's z>near test on Xc = Tc @ 0 = 0).
    rows = _base_corner_fields(
        renderer.corners_rest, renderer.face_link_onehot, lp
    )
    vrow = tris.valid.astype(jnp.float32)
    fields = jnp.stack(
        [vrow if r is None else r for r in rows], axis=1
    )  # [B, 12, F]

    fpad = jnp.concatenate(
        [fields, jnp.zeros((B, 12, 1), fields.dtype)], axis=-1
    )
    # Materialize the field table before gathering: without the barrier XLA
    # fuses the field computation INTO the gather, re-evaluating it per
    # gathered element (measured 21 ms vs 5 ms for the identical gather on
    # a materialized operand).
    fpad = jax.lax.optimization_barrier(fpad)
    return state, fpad, lp


def build_fused_state(
    renderer,
    Tc_c2b: jax.Array,
    link_poses: jax.Array,
    K: jax.Array,
) -> FusedState:
    """Bin + pack base-frame corner records under the current pose.

    link_poses: [..., L, 4, 4]; leading batch axes are flattened (the
    kernel runs over the flat frame axis, like silhouette_counted).
    """
    state, fpad, _ = _fused_bins_and_fields(renderer, Tc_c2b, link_poses, K)
    idx = state.idx  # [B, n_tiles, cap]
    # Field-major [B, 12, n_tiles*cap] — exactly the kernel's record layout,
    # so the gather output feeds the kernel with no transpose or padding.
    rec = _gather_fields(fpad, idx.reshape(idx.shape[0], -1))
    return FusedState(
        rec=jax.lax.stop_gradient(rec),
        counts=jax.lax.stop_gradient(state.counts),
        overflow=jax.lax.stop_gradient(state.overflow),
    )


def build_compact_state(
    renderer,
    Tc_c2b: jax.Array,
    link_poses: jax.Array,
    K: jax.Array,
    nc: int | None = None,
    sharpness: float = 1.0,
) -> CompactState:
    """Bin + pack COMPACT chunk-aligned records under the current pose.

    nc: static compact-chunk budget (default renderer.tile.compact_chunks);
    overflow is flagged if sum(ceil(counts/128)) exceeds it. Gather cost,
    record memory and kernel grid all scale with nc·128 slots instead of
    n_tiles·cap (mean occupancy ~5% at honest caps — BASELINE.md r2).

    sharpness must match the loss kernel's (band width enters the
    boundary-prefix backward-map dilation when tile.bwd_chunks > 0).
    """
    from ..ops.pose_raster import CHUNK as CH

    cfg = renderer.tile
    if nc is None:
        nc = int(getattr(cfg, "compact_chunks", 0))
    if nc <= 0:
        raise ValueError("compact_chunks must be set (> 0) for the compact path")
    cap = cfg.capacity
    state, fpad, _ = _fused_bins_and_fields(renderer, Tc_c2b, link_poses, K)
    counts = state.counts  # [B, T]
    B, T = counts.shape
    F = fpad.shape[-1] - 1

    cpt = -(-counts // CH)  # chunks per tile
    ends = jnp.cumsum(cpt, axis=-1)
    ncu = ends[:, -1]
    overflow = jnp.any(state.overflow) | jnp.any(ncu > nc)

    c0 = jnp.arange(nc, dtype=jnp.int32)
    # tile of chunk c = first t with ends[t] > c (tiles with 0 chunks are
    # skipped: their [ends[t-1], ends[t]) range is empty)
    tile_of = jax.vmap(
        lambda e: jnp.searchsorted(e, c0, side="right")
    )(ends).astype(jnp.int32)
    # Padding chunks (c >= ncu) continue the tile of the LAST real chunk —
    # they revisit its output block consecutively with nlive 0, never
    # zeroing it (the kernel's `first` is False) and carrying the final
    # loss emission. All-empty frames: clamp to tile 0; the kernel's
    # ncu>0 gate suppresses the loss write.
    last_tile = jax.vmap(lambda tof, n: tof[jnp.maximum(n - 1, 0)])(
        tile_of, ncu
    )
    last_tile = jnp.minimum(last_tile, T - 1)
    is_real = c0[None, :] < ncu[:, None]
    tile_of = jnp.where(is_real, jnp.minimum(tile_of, T - 1), last_tile[:, None])

    starts = ends - cpt
    koff = (c0[None, :] - jnp.take_along_axis(starts, tile_of, axis=-1)) * CH
    cnt_g = jnp.take_along_axis(counts, tile_of, axis=-1)
    nlive = jnp.where(is_real, jnp.clip(cnt_g - koff, 0, CH), 0)

    # Compact slot -> triangle id, through the per-tile bin lists.
    sl = koff[:, :, None] + jnp.arange(CH, dtype=jnp.int32)  # [B, nc, CH]
    ok = is_real[:, :, None] & (sl >= 0) & (sl < cap)
    gi = tile_of[:, :, None] * cap + jnp.clip(sl, 0, cap - 1)
    idxf = state.idx.reshape(B, -1)
    tri = jnp.take_along_axis(idxf, gi.reshape(B, -1), axis=-1).reshape(
        B, nc, CH
    )
    gidx = jnp.where(ok, tri, F).reshape(B, -1)
    # Single 12-row gather: the [N', 12] tile-padded intermediate is small
    # here (N' = nc*128 occupancy slots — ~26 MB/frame at 1080p budgets vs
    # the dense path's GB-scale), and the per-field _gather_fields variant
    # measured 9% slower END-TO-END on bench.py when this gather sits in
    # the adaptive scan's rebuild branch (459.0 -> 416.9 Mpix/s, bisected).
    rec = jax.vmap(lambda f, i: jnp.take(f, i, axis=-1))(fpad, gidx)

    sg = jax.lax.stop_gradient
    rec = sg(rec)
    nlive = sg(nlive.astype(jnp.int32))
    ctmap = sg(tile_of.astype(jnp.int32))
    ncu_i = sg(ncu.astype(jnp.int32))
    cpos = jnp.broadcast_to(c0[None, :], (B, nc)).astype(jnp.int32)

    # Boundary-prefix backward map (BASELINE.md round-3 roadmap item 2):
    # with bwd_band_only the pose gradient flows only through pixels in the
    # silhouette band (0 < acc < 1). Classify, at rebin time, the tiles
    # that can hold such a pixel anywhere in the rebin window — the
    # rebin-pose band/edge region dilated by (margin + band width), the
    # same pose-drift contract the binning's bbox dilation assumes — and
    # give the backward its own compact map over just those tiles. The
    # forward's in-kernel zero-cotangent skip already saved the COMPUTE of
    # interior/background tiles; this removes their grid steps and record
    # DMA too. Sub-pixel slivers that sample no coverage at the rebin pose
    # within the dilation radius are the only misses; their gradient is
    # below sampling resolution by construction.
    ncb = int(getattr(cfg, "bwd_chunks", 0))
    bwd_nlive, bwd_ctmap, bwd_cpos = nlive, ctmap, sg(cpos)
    if ncb > 0 and cfg.bwd_band_only:
        import math

        from ..ops.pose_raster_compact import compact_tile_acc
        from .tiled import _untile

        th, tw = cfg.tile_h, cfg.tile_w
        H, W = renderer.H, renderer.W
        n_tx = -(-W // tw)
        # stop_gradient: the classification pass is not differentiated (a
        # traced-cam input would JVP-trace the pallas_call itself).
        cam = jax.lax.stop_gradient(cam_rows(Tc_c2b, K, B))
        acc = compact_tile_acc(
            cam, rec, nlive, ctmap, ncu_i, T, th, tw, n_tx, H, W,
            sharpness=sharpness,
        )
        # Output blocks of tiles no chunk maps to are never written by the
        # kernel grid (undefined memory on TPU; interpret mode zeroes them).
        # Unvisited tiles render exactly 0, so mask by counts before the
        # band thresholding reads them.
        acc = jnp.where((counts > 0)[:, :, None, None], acc, 0.0)
        img = sg(_untile(acc, H, W, cfg))  # [B, H, W] un-clipped union sums
        D = int(math.ceil(cfg.margin + 0.5 / max(sharpness, 1e-6))) + 1
        kwin = 2 * D + 1

        def dil(m):
            return jax.lax.reduce_window(
                m.astype(jnp.float32), 0.0, jax.lax.max,
                (1, kwin, kwin), (1, 1, 1), "SAME",
            )

        relevant = (dil(img > 0) > 0) & (dil(img < 1) > 0)
        rel_tiles = tile_image(relevant.astype(jnp.float32), th, tw)
        band_tile = jnp.max(rel_tiles, axis=(-2, -1)) > 0  # [B, T]

        cpt_b = jnp.where(band_tile, cpt, 0)
        ends_b = jnp.cumsum(cpt_b, axis=-1)
        ncu_b = ends_b[:, -1]
        overflow = overflow | jnp.any(ncu_b > ncb)
        c0b = jnp.arange(ncb, dtype=jnp.int32)
        tob = jax.vmap(
            lambda e: jnp.searchsorted(e, c0b, side="right")
        )(ends_b).astype(jnp.int32)
        is_real_b = c0b[None, :] < ncu_b[:, None]
        tob = jnp.where(is_real_b, jnp.minimum(tob, T - 1), 0)
        starts_b = ends_b - cpt_b
        koff_b = c0b[None, :] - jnp.take_along_axis(starts_b, tob, axis=-1)
        cnt_gb = jnp.take_along_axis(counts, tob, axis=-1)
        nlive_b = jnp.where(
            is_real_b, jnp.clip(cnt_gb - koff_b * CH, 0, CH), 0
        )
        fstart = jnp.take_along_axis(starts, tob, axis=-1)
        cpos_b = jnp.clip(jnp.where(is_real_b, fstart + koff_b, 0), 0, nc - 1)
        bwd_nlive = sg(nlive_b.astype(jnp.int32))
        bwd_ctmap = sg(tob.astype(jnp.int32))
        bwd_cpos = sg(cpos_b.astype(jnp.int32))

    return CompactState(
        rec=rec,
        nlive=nlive,
        ctmap=ctmap,
        ncu=ncu_i,
        counts=sg(counts),
        overflow=sg(overflow),
        bwd_nlive=bwd_nlive,
        bwd_ctmap=bwd_ctmap,
        bwd_cpos=bwd_cpos,
    )


def silhouette_fused(
    renderer,
    Tc_c2b: jax.Array,
    link_poses: jax.Array,
    K: jax.Array,
    sharpness: float = 1.0,
    state: FusedState | None = None,
) -> jax.Array:
    """Soft silhouette via the fused-pose kernel.

    Tc_c2b [4,4] (or [B,4,4] matching the flattened frame batch);
    link_poses [..., L, 4, 4]; -> [..., H, W]. Gradients flow through
    Tc_c2b only (link_poses enter via the per-rebin records — exact for
    fixed qpos, which is the calibration contract).
    """
    from .tiled import _untile

    cfg = renderer.tile
    H, W = renderer.H, renderer.W
    batch = link_poses.shape[:-3]
    B = 1
    for s in batch:
        B *= s
    if isinstance(state, CompactState):
        raise TypeError(
            "CompactState drives the loss path only (loss_fused); for a "
            "silhouette image pass state=None (builds a dense FusedState)"
        )
    if state is None:
        state = build_fused_state(renderer, Tc_c2b, link_poses, K)
    cam = cam_rows(Tc_c2b, K, B)
    n_tx = _cdiv(W, cfg.tile_w)
    tiles = pose_tile_silhouette(
        cam, state.rec, state.counts, cfg.tile_h, cfg.tile_w, n_tx,
        sharpness, camera.NEAR_DEFAULT, camera.FAR_DEFAULT,
        band_only=cfg.bwd_band_only,
    )
    img = _untile(tiles, H, W, cfg)
    return img.reshape(batch + (H, W))


def silhouette_compact(
    renderer,
    Tc_c2b: jax.Array,
    K: jax.Array,
    state: CompactState,
    sharpness: float = 1.0,
) -> jax.Array:
    """Forward-only silhouette from a prebuilt CompactState.

    The compact records are pose-free base-frame corner fields (the pose
    enters through the cam rows inside the kernel), so one state renders
    any pose within tile.margin px of the state's build pose — the same
    rebin-reuse contract as the optimizer. Kernel work, DMA and memory
    scale with OCCUPANCY (nc·128 slots) instead of n_tiles·capacity,
    which makes this the fast path for forward-only many-pose workloads
    (explorer hypothesis scoring). Tc_c2b [4,4] or [B,4,4] with B = the
    state's frame batch; -> [B, H, W] in [0, 1]."""
    from ..ops.pose_raster_compact import compact_tile_acc
    from .tiled import _untile

    cfg = renderer.tile
    H, W = renderer.H, renderer.W
    B, T = state.counts.shape
    cam = cam_rows(Tc_c2b, K, B)
    n_tx = _cdiv(W, cfg.tile_w)
    acc = compact_tile_acc(
        cam, state.rec, state.nlive, state.ctmap, state.ncu, T,
        cfg.tile_h, cfg.tile_w, n_tx, H, W, sharpness,
        camera.NEAR_DEFAULT, camera.FAR_DEFAULT,
    )
    # Tiles no chunk maps to are never written by the kernel grid (they
    # render exactly 0 for any in-contract pose): mask before untiling.
    acc = jnp.where((state.counts > 0)[:, :, None, None], acc, 0.0)
    return jnp.clip(_untile(acc, H, W, cfg), 0.0, 1.0)


def loss_fused(
    renderer,
    Tc_c2b: jax.Array,
    link_poses: jax.Array,
    K: jax.Array,
    masks_ref: jax.Array | None = None,
    sharpness: float = 1.0,
    state: FusedState | None = None,
    ref_tiles: jax.Array | None = None,
) -> jax.Array:
    """Per-frame mask loss Σ_pixels (silhouette − ref)² via the fused loss
    kernel (ops.pose_raster.pose_tile_loss): the silhouette image never
    leaves the kernel, and the backward chains analytically to the pose.

    Pass either masks_ref [..., H, W] (tiled here — fine for one-shot calls)
    or pre-tiled ref_tiles [..., n_tiles, th, tw] (tile_image; hoist the
    tiling out of optimizer scans). -> per-frame loss [...] matching the
    link_poses batch.
    """
    cfg = renderer.tile
    H, W = renderer.H, renderer.W
    batch = link_poses.shape[:-3]
    B = 1
    for s in batch:
        B *= s
    if state is None:
        if int(getattr(cfg, "compact_chunks", 0)) > 0:
            state = build_compact_state(
                renderer, Tc_c2b, link_poses, K, sharpness=sharpness
            )
        else:
            state = build_fused_state(renderer, Tc_c2b, link_poses, K)
    cam = cam_rows(Tc_c2b, K, B)
    n_tx = _cdiv(W, cfg.tile_w)
    if ref_tiles is None:
        if masks_ref is None:
            raise ValueError("need masks_ref or ref_tiles")
        ref_tiles = tile_image(
            masks_ref.reshape((-1, H, W)), cfg.tile_h, cfg.tile_w
        )
    else:
        ref_tiles = ref_tiles.reshape((B,) + ref_tiles.shape[-3:])
    if isinstance(state, CompactState):
        from ..ops.pose_raster_compact import pose_tile_loss_compact

        loss_b = pose_tile_loss_compact(
            cam, state.rec, state.nlive, state.ctmap, state.ncu,
            state.bwd_nlive, state.bwd_ctmap, state.bwd_cpos, ref_tiles,
            cfg.tile_h, cfg.tile_w, n_tx, H, W, sharpness,
            camera.NEAR_DEFAULT, camera.FAR_DEFAULT,
            band_only=cfg.bwd_band_only,
        )
        # Tiles the compact map never visits (count == 0) render empty for
        # any pose within the binning-margin contract: their loss term is
        # the constant Σ ref² per tile, added here in XLA (no pose grad).
        ref_sq = jnp.sum(ref_tiles * ref_tiles, axis=(-2, -1))  # [B, T]
        empty = jnp.sum(
            jnp.where(state.counts == 0, ref_sq, 0.0), axis=-1
        )
        loss_b = loss_b + jax.lax.stop_gradient(empty)
    else:
        loss_b = pose_tile_loss(
            cam, state.rec, state.counts, ref_tiles, cfg.tile_h, cfg.tile_w,
            n_tx, H, W, sharpness, camera.NEAR_DEFAULT, camera.FAR_DEFAULT,
            band_only=cfg.bwd_band_only,
        )
    return loss_b.reshape(batch)
