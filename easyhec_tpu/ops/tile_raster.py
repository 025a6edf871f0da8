"""Pallas TPU kernel: per-tile soft-silhouette rasterization with custom VJP.

This is the hot loop of the whole framework — the replacement for
nvdiffrast's CUDA rasterize+antialias (reference
easyhec/structures/nvdiffrast_renderer.py:39-47) at the innermost level.

Why a kernel at all: the XLA version of the tile evaluation materializes
[P, cap] distance arrays per tile (HBM traffic) and its autodiff either
saves them (OOM at 640×480×10 frames) or rematerializes through a second
full pass with poor fusion. Here:

- forward: for each (frame, tile) grid cell, loop over the tile's actual
  triangle count (scalar-prefetched — work is proportional to occupancy,
  not bin capacity), evaluating signed-distance coverage on a
  [tile_h, tile_w] pixel block held in registers/VMEM. One HBM write per
  tile: the accumulated coverage. No intermediate ever touches HBM.
- backward: analytic. Recomputes per-triangle coverage (cheap, VMEM-local),
  masks by the saved pre-clip accumulator (union clip), and reduces
  d(loss)/d(edge coefficients a,b,c per edge) and d(loss)/d(bbox) per
  triangle — 13 scalars — directly in the kernel. The cotangents then flow
  back through the (XLA-differentiated) gather/setup to vertex positions
  and the SE(3) pose.

Triangle record layout (16 f32 lanes, last 3 padding):
  [a0 b0 c0 a1 b1 c1 a2 b2 c2 lox loy hix hiy 0 0 0]
with edge functions already shifted into tile-local pixel coordinates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tile_silhouette", "TRI_RECORD"]

TRI_RECORD = 16  # f32 lanes per triangle record


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pix_grids(th: int, tw: int):
    # Mosaic tpu.iota is integer-only; cast to f32 after generation.
    px = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32) + 0.5
    py = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32) + 0.5
    return px, py


def _coverage_terms(tri_row, px, py, sharpness):
    """Shared fwd/bwd per-triangle math on a [th, tw] pixel block.

    tri_row: [TRI_RECORD] vector of one triangle's record.
    Returns (cov, d0, d1, d2, dbb, dmin).
    """
    a0, b0, c0 = tri_row[0], tri_row[1], tri_row[2]
    a1, b1, c1 = tri_row[3], tri_row[4], tri_row[5]
    a2, b2, c2 = tri_row[6], tri_row[7], tri_row[8]
    lox, loy, hix, hiy = tri_row[9], tri_row[10], tri_row[11], tri_row[12]
    d0 = a0 * px + b0 * py + c0
    d1 = a1 * px + b1 * py + c1
    d2 = a2 * px + b2 * py + c2
    dbb = jnp.minimum(
        jnp.minimum(px - lox, hix - px), jnp.minimum(py - loy, hiy - py)
    )
    dmin = jnp.minimum(jnp.minimum(jnp.minimum(d0, d1), d2), dbb)
    cov = jnp.minimum(jnp.maximum(0.5 + sharpness * dmin, 0.0), 1.0)
    return cov, d0, d1, d2, dbb, dmin


def _fwd_kernel(counts_ref, tri_ref, out_ref, acc_ref, *, th, tw, sharpness):
    i = pl.program_id(0)
    count = counts_ref[i]
    px, py = _pix_grids(th, tw)

    def body(t, acc):
        cov, *_ = _coverage_terms(tri_ref[0, t, :], px, py, sharpness)
        return acc + cov

    acc = jax.lax.fori_loop(0, count, body, jnp.zeros((th, tw), jnp.float32))
    acc_ref[0] = acc
    out_ref[0] = jnp.minimum(jnp.maximum(acc, 0.0), 1.0)


def _bwd_kernel(
    counts_ref, tri_ref, acc_ref, g_ref, dtri_ref, *, th, tw, sharpness
):
    i = pl.program_id(0)
    count = counts_ref[i]
    px, py = _pix_grids(th, tw)
    # d clip(acc)/d acc = 1 only below saturation; union-occluded pixels
    # (acc > 1: interiors covered by multiple tris/links) get no gradient —
    # same semantics as the reference's .clamp(max=1).
    gp_base = g_ref[0] * (acc_ref[0] <= 1.0).astype(jnp.float32)

    dtri_ref[0] = jnp.zeros_like(dtri_ref[0])

    def body(t, _):
        row = tri_ref[0, t, :]
        cov, d0, d1, d2, dbb, dmin = _coverage_terms(row, px, py, sharpness)
        in_band = (cov > 0.0) & (cov < 1.0)
        gp = gp_base * in_band.astype(jnp.float32) * sharpness  # dcov/ddmin

        # Subgradient of the 4-way min: first matching arm wins.
        m0 = d0 <= dmin
        m1 = (d1 <= dmin) & ~m0
        m2 = (d2 <= dmin) & ~m0 & ~m1
        mb = ~m0 & ~m1 & ~m2

        s0 = gp * m0.astype(jnp.float32)
        s1 = gp * m1.astype(jnp.float32)
        s2 = gp * m2.astype(jnp.float32)
        sb = gp * mb.astype(jnp.float32)

        # bbox arms: dbb = min(px-lox, hix-px, py-loy, hiy-py)
        lox, loy, hix, hiy = row[9], row[10], row[11], row[12]
        axl = (px - lox) <= dbb
        axh = ((hix - px) <= dbb) & ~axl
        ayl = ((py - loy) <= dbb) & ~axl & ~axh
        ayh = ~axl & ~axh & ~ayl

        # Compose the 16-lane gradient row with one-hot masks (Mosaic allows
        # neither scatter nor scalar stores to VMEM) and store it as a [1, 16]
        # dynamic-sublane slice.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, TRI_RECORD), 1)
        scalars = (
            jnp.sum(s0 * px), jnp.sum(s0 * py), jnp.sum(s0),
            jnp.sum(s1 * px), jnp.sum(s1 * py), jnp.sum(s1),
            jnp.sum(s2 * px), jnp.sum(s2 * py), jnp.sum(s2),
            -jnp.sum(sb * axl.astype(jnp.float32)),
            -jnp.sum(sb * ayl.astype(jnp.float32)),
            jnp.sum(sb * axh.astype(jnp.float32)),
            jnp.sum(sb * ayh.astype(jnp.float32)),
        )
        row = jnp.zeros((1, TRI_RECORD), jnp.float32)
        for k, val in enumerate(scalars):
            row = row + jnp.where(lane == k, val, 0.0)
        dtri_ref[0, pl.ds(t, 1), :] = row
        return 0

    jax.lax.fori_loop(0, count, body, 0)


@functools.lru_cache(maxsize=None)
def _make_tile_silhouette(th: int, tw: int, cap: int, sharpness: float):
    interpret = not _on_tpu()

    def fwd_call(tri, counts):
        n_tiles = tri.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, cap, TRI_RECORD),
                    lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, th, tw), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, th, tw), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
        )
        out, acc = pl.pallas_call(
            functools.partial(_fwd_kernel, th=th, tw=tw, sharpness=sharpness),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, th, tw), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, th, tw), jnp.float32),
            ],
            interpret=interpret,
        )(counts, tri)
        return out, acc

    def bwd_call(tri, counts, acc, g):
        n_tiles = tri.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, cap, TRI_RECORD),
                    lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, th, tw), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, th, tw), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, cap, TRI_RECORD),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel, th=th, tw=tw, sharpness=sharpness),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles, cap, TRI_RECORD), jnp.float32
            ),
            interpret=interpret,
        )(counts, tri, acc, g)

    @jax.custom_vjp
    def tile_sil(tri, counts):
        out, _ = fwd_call(tri, counts)
        return out

    def tile_sil_fwd(tri, counts):
        out, acc = fwd_call(tri, counts)
        return out, (tri, counts, acc)

    def tile_sil_bwd(res, g):
        tri, counts, acc = res
        dtri = bwd_call(tri, counts, acc, g)
        return dtri, None

    tile_sil.defvjp(tile_sil_fwd, tile_sil_bwd)
    return tile_sil


def tile_silhouette(
    tri: jax.Array,
    counts: jax.Array,
    tile_h: int,
    tile_w: int,
    sharpness: float = 1.0,
) -> jax.Array:
    """Rasterize per-tile triangle bins to soft coverage.

    tri: [n_tiles, cap, TRI_RECORD] f32 — tile-local triangle records
         (slots beyond counts[i] are ignored)
    counts: [n_tiles] int32 — occupied slots per tile
    -> [n_tiles, tile_h, tile_w] coverage in [0, 1]; differentiable w.r.t.
    `tri` via the analytic Pallas backward.
    """
    cap = tri.shape[1]
    fn = _make_tile_silhouette(int(tile_h), int(tile_w), int(cap), float(sharpness))
    return fn(tri, counts.astype(jnp.int32))
