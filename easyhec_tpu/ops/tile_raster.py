"""Pallas TPU kernel: per-tile soft-silhouette rasterization with custom VJP.

This is the hot loop of the whole framework — the replacement for
nvdiffrast's CUDA rasterize+antialias (reference
easyhec/structures/nvdiffrast_renderer.py:39-47) at the innermost level.

Why a kernel at all: the XLA version of the tile evaluation materializes
[P, cap] distance arrays per tile (HBM traffic) and its autodiff either
saves them (OOM at 640×480×10 frames) or rematerializes through a second
full pass with poor fusion. Here no per-pixel-per-triangle intermediate
ever touches HBM, forward or backward.

Layout is everything on TPU. Triangle records are **field-major** per tile:

    tri: [B, n_tiles, 16, cap] f32
    fields (sublane axis): [a0 b0 c0 a1 b1 c1 a2 b2 c2 lox loy hix hiy 0 0 0]
    bin slot (lane axis):  cap, a multiple of 128 in production

with edge functions already shifted into tile-local pixel coordinates. The
kernel walks the bin in 128-slot lane chunks, skipping chunks beyond the
tile's occupancy (scalar-prefetched counts [B, n_tiles]), so:

- every operation is a natural (sublane, lane) vector op on a
  [tile_h, tile_w, chunk] block — no scalar extracts, no dynamic slices,
  no in-kernel transposes (the previous design looped one triangle at a
  time, paying 13 scalar extracts plus full-tile vector work per triangle);
- work scales with bin occupancy at 128-triangle granularity;
- forward writes one coverage block + one pre-clip accumulator block per
  tile; backward is analytic, reducing d(loss)/d(record) per triangle with
  lane-preserving reductions. The cotangents then flow back through the
  (XLA-differentiated) gather/setup to vertex positions and the SE(3) pose.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tile_silhouette", "TRI_RECORD"]

TRI_RECORD = 16  # f32 sublanes per triangle record
CHUNK = 128  # bin slots processed per step (one lane tile)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pix_grids(th: int, tw: int):
    # Mosaic iota is integer-only; cast to f32 after generation. Trailing
    # size-1 axis broadcasts against the chunk (lane) axis.
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 1).astype(jnp.float32)
        + 0.5
    )
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 0).astype(jnp.float32)
        + 0.5
    )
    return px, py


def _chunk_coverage(blk, px, py, remaining, sharpness):
    """Coverage of one [16, C] record chunk over a [th, tw] pixel block.

    Returns (cov, d0, d1, d2, dbb, dmin), all [th, tw, C]. Slots at or
    beyond `remaining` are masked to zero coverage.
    """
    C = blk.shape[-1]

    def f(i):  # field row -> [1, 1, C] broadcastable over pixels
        return blk[i : i + 1, :].reshape(1, 1, C)

    a0, b0, c0 = f(0), f(1), f(2)
    a1, b1, c1 = f(3), f(4), f(5)
    a2, b2, c2 = f(6), f(7), f(8)
    lox, loy, hix, hiy = f(9), f(10), f(11), f(12)

    d0 = a0 * px + b0 * py + c0
    d1 = a1 * px + b1 * py + c1
    d2 = a2 * px + b2 * py + c2
    dbb = jnp.minimum(
        jnp.minimum(px - lox, hix - px), jnp.minimum(py - loy, hiy - py)
    )
    dmin = jnp.minimum(jnp.minimum(jnp.minimum(d0, d1), d2), dbb)
    cov = jnp.minimum(jnp.maximum(0.5 + sharpness * dmin, 0.0), 1.0)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    cov = jnp.where(slot < remaining, cov, 0.0)
    return cov, d0, d1, d2, dbb, dmin


def _fwd_kernel(counts_ref, tri_ref, out_ref, acc_ref, *, th, tw, cap, sharpness):
    b = pl.program_id(0)
    i = pl.program_id(1)
    count = counts_ref[b, i]
    px, py = _pix_grids(th, tw)

    acc_ref[0, 0] = jnp.zeros((th, tw), jnp.float32)
    for k in range(0, cap, CHUNK):
        c = min(CHUNK, cap - k)

        # Saturation early-out: once every pixel has acc >= 2, further
        # coverage can change neither clip(acc) (still 1) nor the backward
        # mask (acc <= 1 already false with >= 1 slack) — dense meshes
        # stack dozens of depth layers per interior pixel, so interior
        # tiles stop after a couple of chunks.
        @pl.when((k < count) & (jnp.min(acc_ref[0, 0]) < 2.0))
        def _():
            cov, *_ = _chunk_coverage(
                tri_ref[0, 0, :, k : k + c], px, py, count - k, sharpness
            )
            acc_ref[0, 0] += jnp.sum(cov, axis=-1)

    acc = acc_ref[0, 0]
    out_ref[0, 0] = jnp.minimum(jnp.maximum(acc, 0.0), 1.0)


def _bwd_kernel(
    counts_ref, tri_ref, acc_ref, g_ref, dtri_ref, *, th, tw, cap, sharpness
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    count = counts_ref[b, i]
    px, py = _pix_grids(th, tw)
    # d clip(acc)/d acc = 1 only below saturation; union-occluded pixels
    # (acc > 1: interiors covered by multiple tris/links) get no gradient —
    # same semantics as the reference's .clamp(max=1).
    gp_base = (g_ref[0, 0] * (acc_ref[0, 0] <= 1.0).astype(jnp.float32))[
        :, :, None
    ]

    dtri_ref[0, 0] = jnp.zeros((TRI_RECORD, cap), jnp.float32)
    # If every pixel is beyond saturation (acc > 1), gp_base is identically
    # zero and the whole tile contributes no gradient — skip all chunks
    # (the dense-mesh twin of the forward's saturation early-out).
    any_live = jnp.min(acc_ref[0, 0]) <= 1.0
    for k in range(0, cap, CHUNK):
        c = min(CHUNK, cap - k)

        @pl.when((k < count) & any_live)
        def _():
            blk = tri_ref[0, 0, :, k : k + c]
            cov, d0, d1, d2, dbb, dmin = _chunk_coverage(
                blk, px, py, count - k, sharpness
            )
            in_band = (cov > 0.0) & (cov < 1.0)
            gp = gp_base * in_band.astype(jnp.float32) * sharpness  # dcov/ddmin

            # Subgradient of the 4-way min: first matching arm wins.
            m0 = d0 <= dmin
            m1 = (d1 <= dmin) & ~m0
            m2 = (d2 <= dmin) & ~m0 & ~m1
            mb = ~m0 & ~m1 & ~m2

            def put(row, val):  # val [th, tw, C] -> reduce pixels -> [1, C]
                dtri_ref[0, 0, row : row + 1, k : k + c] = jnp.sum(
                    val, axis=(0, 1)
                )[None, :]

            for e, m in enumerate((m0, m1, m2)):
                s = gp * m.astype(jnp.float32)
                put(3 * e + 0, s * px)
                put(3 * e + 1, s * py)
                put(3 * e + 2, s)

            # bbox arms: dbb = min(px-lox, hix-px, py-loy, hiy-py)
            lox, loy = blk[9:10, :].reshape(1, 1, c), blk[10:11, :].reshape(1, 1, c)
            hix, hiy = blk[11:12, :].reshape(1, 1, c), blk[12:13, :].reshape(1, 1, c)
            axl = (px - lox) <= dbb
            axh = ((hix - px) <= dbb) & ~axl
            ayl = ((py - loy) <= dbb) & ~axl & ~axh
            ayh = ~axl & ~axh & ~ayl
            sb = gp * mb.astype(jnp.float32)
            put(9, -(sb * axl.astype(jnp.float32)))
            put(10, -(sb * ayl.astype(jnp.float32)))
            put(11, sb * axh.astype(jnp.float32))
            put(12, sb * ayh.astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _make_tile_silhouette(th: int, tw: int, cap: int, sharpness: float):
    interpret = not _on_tpu()
    # The unrolled bin-chunk loop keeps several [th, tw, CHUNK] f32
    # intermediates on the Mosaic stack; the default 16 MB scoped-vmem limit
    # trips at larger tiles/caps (v5e has 128 MB of VMEM).
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024
    )

    def fwd_call(tri, counts):
        B, n_tiles = tri.shape[0], tri.shape[1]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, TRI_RECORD, cap),
                    lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, th, tw),
                    lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, th, tw),
                    lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
        )
        out, acc = pl.pallas_call(
            functools.partial(
                _fwd_kernel, th=th, tw=tw, cap=cap, sharpness=sharpness
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, n_tiles, th, tw), jnp.float32),
                jax.ShapeDtypeStruct((B, n_tiles, th, tw), jnp.float32),
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )(counts, tri)
        return out, acc

    def bwd_call(tri, counts, acc, g):
        B, n_tiles = tri.shape[0], tri.shape[1]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, TRI_RECORD, cap),
                    lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, th, tw),
                    lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, th, tw),
                    lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, TRI_RECORD, cap),
                lambda b, i, *_: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            functools.partial(
                _bwd_kernel, th=th, tw=tw, cap=cap, sharpness=sharpness
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (B, n_tiles, TRI_RECORD, cap), jnp.float32
            ),
            compiler_params=compiler_params,
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

    tri: [B, n_tiles, TRI_RECORD, cap] f32 — field-major tile-local triangle
         records (slots beyond counts[b, i] are ignored)
    counts: [B, n_tiles] int32 — occupied slots per tile
    -> [B, n_tiles, tile_h, tile_w] coverage in [0, 1]; differentiable w.r.t.
    `tri` via the analytic Pallas backward.
    """
    cap = tri.shape[-1]
    fn = _make_tile_silhouette(int(tile_h), int(tile_w), int(cap), float(sharpness))
    return fn(tri, counts.astype(jnp.int32))
