"""Compact-chunk-grid variant of the fused pose-gradient rasterizer.

The pose_raster kernels iterate a (frame, tile) grid and DMA each tile's
FULL record capacity (cap slots) even though mean bin occupancy at honest
capacities is ~5% (BASELINE.md r2 decomposition: the [B, 12, n_tiles*cap]
record pack and per-tile cap-sized DMAs scale with CAPACITY, not load).

Here the records are packed CONTIGUOUSLY — each tile's slots start at a
chunk-aligned offset, `sum(ceil(counts/128))` chunks total, padded to a
static `nc` budget — and the kernel grid iterates COMPACT CHUNKS:

    grid = (B, nc); chunk c of frame b belongs to tile ctmap[b, c]

A scalar-prefetched chunk→tile map drives the output index maps, so all
chunks of one tile revisit the SAME output block consecutively: the
accumulator lives in VMEM across the revisits and is flushed to HBM once
per tile (the standard grouped/ragged Pallas TPU pattern). Work, DMA and
record memory all scale with occupancy; empty tiles never appear.

Contract notes:
- Chunks of a tile are consecutive in c (the pack guarantees it); padding
  chunks (c >= ncu[b]) carry ctmap = tile-of-last-real-chunk and
  nlive = 0, so they extend the final tile's visit without touching its
  accumulator and the loss is emitted exactly once, at the last grid step
  of each tile's visit.
- Tiles with count == 0 are NOT visited: their loss contribution
  (Σ ref² over the tile — silhouette is identically 0 there) is added by
  the wrapper in XLA (render.fused.loss_fused), which is exact because a
  binned-empty tile renders empty for any pose within the binning-margin
  contract.
- The backward runs on its OWN compact map (bwd_*): with band-prefix bins
  it covers only the per-tile prefix of band-relevant triangles
  (boundary-prefix contract, see render/fused.py); in the basic mode it
  equals the forward map. bwd_cpos maps backward chunks to positions in
  the shared record array.

Role in the reference: the tile/bin traversal of nvdiffrast's CUDA
rasterizer (easyhec/structures/nvdiffrast_renderer.py:39-47), redesigned
so a TPU grid walks occupancy-compact chunk lists instead of
capacity-padded bins.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pose_raster import (
    CHUNK,
    POSE_RECORD,
    _bwd_accumulate,
    _chunk_setup,
    _crop_mask,
    _fwd_accumulate,
    _on_tpu,
    _pix_grids,
    _tile_origin,
)

__all__ = ["pose_tile_loss_compact", "compact_tile_acc"]


def _loss_fwd_kernel_compact(
    nlive_ref, ctmap_ref, ncu_ref, cam_ref, rec_ref, ref_ref,
    loss_ref, acc_ref,
    *, th, tw, sharpness, near, far, n_tx, H, W, nc,
):
    b = pl.program_id(0)
    c = pl.program_id(1)
    t = ctmap_ref[b, c]
    prev = ctmap_ref[b, jnp.maximum(c - 1, 0)]
    nxt = ctmap_ref[b, jnp.minimum(c + 1, nc - 1)]
    first = (c == 0) | (prev != t)
    last = (c == nc - 1) | (nxt != t)
    cam = tuple(cam_ref[b, j] for j in range(16))
    x0, y0 = _tile_origin(t, n_tx, th, tw)
    px, py = _pix_grids(th, tw)

    @pl.when(first)
    def _():
        acc_ref[0, 0] = jnp.zeros((th, tw), jnp.float32)

    nl = nlive_ref[b, c]

    # Saturation early-out as in pose_raster: once every pixel of the tile
    # is >= 2 the clamped union can no longer change.
    @pl.when((nl > 0) & (jnp.min(acc_ref[0, 0]) < 2.0))
    def _():
        blk = rec_ref[0]
        s = _chunk_setup(blk, cam, x0, y0, near, far)
        _fwd_accumulate(acc_ref, s, sharpness, th, tw)

    acc = acc_ref[0, 0]
    e = jnp.minimum(jnp.maximum(acc, 0.0), 1.0) - ref_ref[0, 0]
    e = e * _crop_mask(x0, y0, px, py, H, W)
    emit = last & (ncu_ref[b] > 0)
    loss_ref[0, 0] = jnp.where(
        emit, jnp.sum(e * e), 0.0
    ).reshape(1, 1)


def _loss_bwd_kernel_compact(
    nlive_ref, ctmap_ref, cpos_ref, cam_ref, gb_ref, rec_ref, ref_ref,
    acc_ref, dcam_ref,
    *, th, tw, sharpness, near, far, n_tx, H, W, band_only,
):
    b = pl.program_id(0)
    c = pl.program_id(1)
    t = ctmap_ref[b, c]
    cam = tuple(cam_ref[b, j] for j in range(16))
    x0, y0 = _tile_origin(t, n_tx, th, tw)
    px, py = _pix_grids(th, tw)

    acc = acc_ref[0, 0]
    e = jnp.minimum(jnp.maximum(acc, 0.0), 1.0) - ref_ref[0, 0]
    # d(loss_b)/d(acc) = 2·e·1{acc ≤ 1} (sum-clip), zero outside the crop.
    gp2 = 2.0 * gb_ref[b] * e * (acc <= 1.0).astype(jnp.float32)
    gp2 = gp2 * _crop_mask(x0, y0, px, py, H, W)
    if band_only:
        # Exactness: non-band pixels carry only pairwise-cancelling
        # internal-edge contributions (see pose_raster._masked_cotangent).
        gp2 = gp2 * ((acc > 0.0) & (acc < 1.0)).astype(jnp.float32)

    dcam_ref[0, 0] = jnp.zeros((POSE_RECORD, CHUNK), jnp.float32)
    nl = nlive_ref[b, c]
    any_live = (jnp.max(jnp.abs(gp2)) > 0.0) & (nl > 0)

    @pl.when(any_live)
    def _():
        blk = rec_ref[0]
        s = _chunk_setup(blk, cam, x0, y0, near, far)
        # Per-sub-block live-cotangent-in-window cull inside (exact).
        _bwd_accumulate(
            dcam_ref, s, blk, cam, gp2, sharpness, th, tw,
        )


@functools.lru_cache(maxsize=None)
def _make_fwd_call(
    th: int, tw: int, sharpness: float, near: float, far: float,
    n_tx: int, n_tiles: int, H: int, W: int,
):
    interpret = not _on_tpu()
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    def fwd_call(cam, rec, nlive, ctmap, ncu, ref_tiles):
        B, nc = nlive.shape
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, nc),
            in_specs=[
                pl.BlockSpec(
                    (1, POSE_RECORD, CHUNK),
                    lambda b, c, nlive, ctmap, ncu, cam: (b, 0, c),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, th, tw),
                    lambda b, c, nlive, ctmap, ncu, cam: (
                        b, ctmap[b, c], 0, 0
                    ),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, 1, 1),
                    lambda b, c, nlive, ctmap, ncu, cam: (b, c, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, th, tw),
                    lambda b, c, nlive, ctmap, ncu, cam: (
                        b, ctmap[b, c], 0, 0
                    ),
                    memory_space=pltpu.VMEM,
                ),
            ],
        )
        loss4, acc = pl.pallas_call(
            functools.partial(
                _loss_fwd_kernel_compact, th=th, tw=tw, sharpness=sharpness,
                near=near, far=far, n_tx=n_tx, H=H, W=W, nc=nc,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, nc, 1, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, n_tiles, th, tw), jnp.float32),
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )(nlive, ctmap, ncu, cam, rec, ref_tiles)
        return loss4[..., 0, 0], acc

    return fwd_call


def compact_tile_acc(
    cam, rec, nlive, ctmap, ncu, n_tiles, tile_h, tile_w, n_tx, H, W,
    sharpness=1.0, near=0.001, far=10.0,
):
    """Tiled silhouette accumulation [B, n_tiles, th, tw] under the compact
    chunk map (un-clipped union sums — the fwd kernel's acc residual). Used
    by build_compact_state's boundary-prefix backward-map classification."""
    fwd_call = _make_fwd_call(
        int(tile_h), int(tile_w), float(sharpness), float(near), float(far),
        int(n_tx), int(n_tiles), int(H), int(W),
    )
    B = nlive.shape[0]
    zeros = jnp.zeros((B, n_tiles, tile_h, tile_w), jnp.float32)
    _, acc = fwd_call(
        cam, rec, nlive.astype(jnp.int32), ctmap.astype(jnp.int32),
        ncu.astype(jnp.int32), zeros,
    )
    return acc


@functools.lru_cache(maxsize=None)
def _make_pose_loss_compact(
    th: int, tw: int, sharpness: float, near: float, far: float,
    n_tx: int, n_tiles: int, H: int, W: int, band_only: bool,
):
    interpret = not _on_tpu()
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    fwd_call = _make_fwd_call(th, tw, sharpness, near, far, n_tx, n_tiles, H, W)

    def bwd_call(cam, rec, bwd_nlive, bwd_ctmap, bwd_cpos, ref_tiles, acc, gb):
        B, ncb = bwd_nlive.shape
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B, ncb),
            in_specs=[
                pl.BlockSpec(
                    (1, POSE_RECORD, CHUNK),
                    lambda b, c, nlive, ctmap, cpos, cam, gb: (
                        b, 0, cpos[b, c]
                    ),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, th, tw),
                    lambda b, c, nlive, ctmap, cpos, cam, gb: (
                        b, ctmap[b, c], 0, 0
                    ),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, th, tw),
                    lambda b, c, nlive, ctmap, cpos, cam, gb: (
                        b, ctmap[b, c], 0, 0
                    ),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, POSE_RECORD, CHUNK),
                lambda b, c, nlive, ctmap, cpos, cam, gb: (b, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            functools.partial(
                _loss_bwd_kernel_compact, th=th, tw=tw, sharpness=sharpness,
                near=near, far=far, n_tx=n_tx, H=H, W=W,
                band_only=band_only,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (B, ncb, POSE_RECORD, CHUNK), jnp.float32
            ),
            compiler_params=compiler_params,
            interpret=interpret,
        )(bwd_nlive, bwd_ctmap, bwd_cpos, cam, gb, rec, ref_tiles, acc)

    @jax.custom_vjp
    def pose_loss(cam, rec, nlive, ctmap, ncu, bnl, bct, bcp, ref_tiles):
        loss_chunks, _ = fwd_call(cam, rec, nlive, ctmap, ncu, ref_tiles)
        return jnp.sum(loss_chunks, axis=-1)

    def pose_loss_fwd(cam, rec, nlive, ctmap, ncu, bnl, bct, bcp, ref_tiles):
        loss_chunks, acc = fwd_call(cam, rec, nlive, ctmap, ncu, ref_tiles)
        return (
            jnp.sum(loss_chunks, axis=-1),
            (cam, rec, bnl, bct, bcp, ref_tiles, acc),
        )

    def pose_loss_bwd(res, gb):
        cam, rec, bnl, bct, bcp, ref_tiles, acc = res
        parts = bwd_call(cam, rec, bnl, bct, bcp, ref_tiles, acc, gb)
        dcam = jnp.sum(parts, axis=(1, 3))  # [B, 12]
        dcam = jnp.pad(dcam, ((0, 0), (0, 4)))
        return (dcam,) + (None,) * 8

    pose_loss.defvjp(pose_loss_fwd, pose_loss_bwd)
    return pose_loss


def pose_tile_loss_compact(
    cam: jax.Array,
    rec: jax.Array,
    nlive: jax.Array,
    ctmap: jax.Array,
    ncu: jax.Array,
    bwd_nlive: jax.Array,
    bwd_ctmap: jax.Array,
    bwd_cpos: jax.Array,
    ref_tiles: jax.Array,
    tile_h: int,
    tile_w: int,
    n_tx: int,
    H: int,
    W: int,
    sharpness: float = 1.0,
    near: float = 0.001,
    far: float = 10.0,
    band_only: bool = False,
) -> jax.Array:
    """Per-frame Σ (silhouette − ref)² over the tiles VISITED by the compact
    chunk map (empty tiles' constant Σ ref² term is the caller's, see
    render.fused.loss_fused).

    cam [B, 16] (rows 0..11 = Tc[:3,:4] row-major, 12..15 = fx fy cx cy; the
    only differentiable input); rec [B, POSE_RECORD, nc*128] compact
    field-major records; nlive/ctmap [B, nc] int32; ncu [B] int32 used-chunk
    counts; bwd_* the backward's chunk map (equal to the forward's, or the
    boundary-prefix subset); ref_tiles [B, n_tiles, th, tw]. -> [B].
    """
    n_tiles = ref_tiles.shape[-3]
    if rec.shape[-1] != nlive.shape[-1] * CHUNK:
        raise ValueError(
            f"rec slot axis {rec.shape[-1]} != nc*CHUNK "
            f"({nlive.shape[-1]}*{CHUNK})"
        )
    fn = _make_pose_loss_compact(
        int(tile_h), int(tile_w), float(sharpness), float(near), float(far),
        int(n_tx), int(n_tiles), int(H), int(W), bool(band_only),
    )
    return fn(
        cam, rec, nlive.astype(jnp.int32), ctmap.astype(jnp.int32),
        ncu.astype(jnp.int32), bwd_nlive.astype(jnp.int32),
        bwd_ctmap.astype(jnp.int32), bwd_cpos.astype(jnp.int32), ref_tiles,
    )
