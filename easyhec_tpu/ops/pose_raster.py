"""Fused pose-gradient rasterizer kernel — zero per-step packing.

The tile_raster kernel consumes per-tile EDGE-FIELD records that must be
re-gathered from freshly projected triangles every optimizer step; honest
TPU profiles of the 10-frame 640x480 workload put that per-step record
pack at ~5.5 ms forward and ~18.6 ms backward (the gather transpose) — 3x
the cost of rasterization itself.

This kernel removes the per-step pack entirely by exploiting the structure
of the calibration problem (reference easyhec/modeling/models/rb_solve/
rb_solver.py:41-72): during an optimization the joint configurations are
FIXED — only the camera-from-base pose Tc moves. So the per-tile records
store each triangle corner's ROBOT-BASE-frame position

    Xb = T_base_from_link(qpos) @ X_rest        (constant per capture set)

packed ONCE per rebin window, and the kernel performs the entire remaining
per-step pipeline internally:

    camera transform  Xc = Tc @ Xb            (16 scalars per frame)
    pinhole projection u = fx*x/z + cx        (tile-local)
    edge-function setup (normalized edges + bbox)
    soft-coverage accumulation over the pixel block

All per-corner/per-edge math runs on [1, chunk] lane rows (negligible next
to the [tile_pixels, chunk] coverage work); the only per-step inputs are
the 12 pose entries + 4 intrinsics per frame. The backward is analytic and
chains all the way to d(loss)/d(Tc) — a [3, 4] matrix per tile accumulated
as lane partials — so the entire silhouette + gradient step reads only
static records from HBM and writes one coverage image plus a few MB of
pose-gradient partials. No gather, no scatter, forward or backward.

Gradient semantics note: the records (and the binning) depend on the pose
at REBIN time only, exactly like the amortized-rebinning contract of the
unfused path (binning.py): gradients flow through the live Tc, and the
bins/records stay valid while the silhouette drifts within the binning
margin. Since the records are Tc-independent by construction, the Tc
gradient is exact (not approximate) for the rendered triangle set.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pose_tile_silhouette", "pose_tile_loss", "POSE_RECORD"]

POSE_RECORD = 12  # f32 sublanes: [x0 y0 z0 w0 x1 y1 z1 w1 x2 y2 z2 w2]
CHUNK = 128
_EPS_Z = 1e-9
_EPS_N = 1e-12


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pix_grids(th: int, tw: int):
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 1).astype(jnp.float32)
        + 0.5
    )
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 0).astype(jnp.float32)
        + 0.5
    )
    return px, py


def _tile_origin(i, n_tx: int, th: int, tw: int):
    x0 = (i % n_tx).astype(jnp.float32) * tw
    y0 = (i // n_tx).astype(jnp.float32) * th
    return x0, y0


def _chunk_setup(blk, cam, x0, y0, near, far):
    """Per-chunk triangle setup from base-frame corner records.

    blk: [POSE_RECORD, C] record chunk; cam: tuple of 16 per-frame scalars
    (t00..t23 row-major 3x4, fx, fy, cx, cy). Returns per-[1, C]-row dict
    of camera coords, local pixel coords, normalized edges, bbox and the
    validity row. Pure lane-row math — negligible vs the pixel block work.
    """

    def row(i):
        return blk[i : i + 1, :]  # [1, C]

    t = cam[:12]
    fx, fy, cx, cy = cam[12], cam[13], cam[14], cam[15]

    xc, yc, zc, u, v = [], [], [], [], []
    valid = None
    for i in range(3):
        Xb, Yb, Zb, Wb = row(4 * i), row(4 * i + 1), row(4 * i + 2), row(4 * i + 3)
        x = t[0] * Xb + t[1] * Yb + t[2] * Zb + t[3] * Wb
        y = t[4] * Xb + t[5] * Yb + t[6] * Zb + t[7] * Wb
        z = t[8] * Xb + t[9] * Yb + t[10] * Zb + t[11] * Wb
        ok = (z > near) & (z < far)
        valid = ok if valid is None else (valid & ok)
        zs = jnp.where(jnp.abs(z) < _EPS_Z, jnp.where(z < 0, -_EPS_Z, _EPS_Z), z)
        ui = fx * x / zs + cx - x0
        vi = fy * y / zs + cy - y0
        xc.append(x)
        yc.append(y)
        zc.append(zs)
        u.append(ui)
        v.append(vi)

    e01u, e01v = u[1] - u[0], v[1] - v[0]
    e02u, e02v = u[2] - u[0], v[2] - v[0]
    area2 = e01u * e02v - e01v * e02u
    valid = valid & (jnp.abs(area2) > _EPS_N)
    orient = jnp.where(area2 >= 0, 1.0, -1.0)

    edges = []  # (a, b, cst, p, q, n2, inv) per edge for fwd+bwd reuse
    for (ia, ib) in ((0, 1), (1, 2), (2, 0)):
        p = v[ia] - v[ib]  # = -(vb - va)
        q = u[ib] - u[ia]
        n = jnp.maximum(jnp.sqrt(p * p + q * q), _EPS_N)
        inv = orient / n
        a = p * inv
        b = q * inv
        cst = -(a * u[ia] + b * v[ia])
        edges.append((a, b, cst, p, q, n, inv))

    lox = jnp.minimum(jnp.minimum(u[0], u[1]), u[2])
    hix = jnp.maximum(jnp.maximum(u[0], u[1]), u[2])
    loy = jnp.minimum(jnp.minimum(v[0], v[1]), v[2])
    hiy = jnp.maximum(jnp.maximum(v[0], v[1]), v[2])
    # Invalid lanes (z-clipped, degenerate, or zero sentinel records —
    # empty slots gather the all-zero pad column, so z=0 fails z>near)
    # get a poisoned bbox: dbb = px-lox = -1e9 -> dmin -> cov = 0. This
    # kills dead lanes in SETUP ([1, C] rows) instead of a per-pixel
    # [rows, tw, C] slot/valid mask in the coverage hot loop.
    lox = jnp.where(valid, lox, jnp.float32(1e9))
    return dict(
        xc=xc, yc=yc, zc=zc, u=u, v=v, valid=valid, orient=orient,
        edges=edges, bbox=(lox, loy, hix, hiy),
    )


def _chunk_coverage(s, px, py, sharpness):
    """Coverage + distance arms of one setup chunk over the pixel block.

    Dead lanes need no per-pixel mask: _chunk_setup poisons their bbox so
    dbb (hence dmin, hence cov) is very negative everywhere."""
    C = s["valid"].shape[-1]

    def r3(x):  # [1, C] -> [1, 1, C]
        return x.reshape(1, 1, C)

    ds = []
    for (a, b, cst, *_rest) in s["edges"]:
        ds.append(r3(a) * px + r3(b) * py + r3(cst))
    lox, loy, hix, hiy = (r3(x) for x in s["bbox"])
    dbb = jnp.minimum(
        jnp.minimum(px - lox, hix - px), jnp.minimum(py - loy, hiy - py)
    )
    dmin = jnp.minimum(jnp.minimum(jnp.minimum(ds[0], ds[1]), ds[2]), dbb)
    cov = jnp.minimum(jnp.maximum(0.5 + sharpness * dmin, 0.0), 1.0)
    return cov, ds, dbb, dmin


def _fwd_kernel(
    counts_ref, cam_ref, rec_ref, out_ref, acc_ref,
    *, th, tw, cap, sharpness, near, far, n_tx,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    count = counts_ref[b, i]
    cam = tuple(cam_ref[b, j] for j in range(16))
    x0, y0 = _tile_origin(i, n_tx, th, tw)
    px, py = _pix_grids(th, tw)

    acc_ref[0, 0] = jnp.zeros((th, tw), jnp.float32)

    # Dynamic loop over OCCUPIED chunks only: cost scales with bin
    # occupancy, not capacity. (A Python-unrolled loop over cap//CHUNK
    # copies of the body made caps > 512 pathologically slow — the
    # scheduler keeps many chunk intermediates live, spilling VMEM.)
    def body(j, _):
        k = j * CHUNK

        # Saturation early-out (see tile_raster._fwd_kernel).
        @pl.when(jnp.min(acc_ref[0, 0]) < 2.0)
        def _():
            blk = rec_ref[0, :, pl.ds(pl.multiple_of(k, CHUNK), CHUNK)]
            s = _chunk_setup(blk, cam, x0, y0, near, far)
            _fwd_accumulate(acc_ref, s, sharpness, th, tw)

        return 0

    jax.lax.fori_loop(0, pl.cdiv(count, CHUNK), body, 0)

    acc = acc_ref[0, 0]
    out_ref[0, 0] = jnp.minimum(jnp.maximum(acc, 0.0), 1.0)


def _first_match_arms(cands, target):
    """Disjoint first-match masks for min/max subgradients."""
    arms, taken = [], None
    for c in cands:
        m = c == target
        if taken is not None:
            m = m & ~taken
        arms.append(m)
        taken = m if taken is None else (taken | m)
    return arms


def _pix_rows(th: int, tw: int):
    """[th*tw, 3] pixel-coordinate matrix (px, py, 1) for the MXU-side
    backward reductions (contracted along the pixel axis)."""
    px, py = _pix_grids(th, tw)
    one = jnp.ones((th, tw, 1), jnp.float32)
    return jnp.concatenate([px, py, one], axis=-1).reshape(th * tw, 3)


def _bwd_chunk(s, blk, cam, gp_base, px, py, sharpness,
               prows=None):
    """Analytic backward of one record chunk: d(loss)/d(Tc) lane partials.

    s: precomputed _chunk_setup dict; gp_base: [th, tw, 1] masked loss
    cotangent. Returns upd [POSE_RECORD, CHUNK]: row r*4+j holds per-lane
    partials of dTc[r, j].

    The nine edge-field reductions Σ_p gp·m_e·{px,py,1} run as three
    [P,3]ᵀ×[P,C] MXU contractions (prows = _pix_rows) instead of nine VPU
    sum-reductions over the [P, C] pixel block — the VPU reductions were
    ~40% of the backward's cycles on v5e.
    """
    fx, fy = cam[12], cam[13]
    cov, ds, dbb, dmin = _chunk_coverage(s, px, py, sharpness)
    in_band = (cov > 0.0) & (cov < 1.0)
    gp = gp_base * in_band.astype(jnp.float32) * sharpness

    # --- pixel reductions: d(loss)/d(edge fields), [1, C] rows ---
    m0 = ds[0] <= dmin
    m1 = (ds[1] <= dmin) & ~m0
    m2 = (ds[2] <= dmin) & ~m0 & ~m1
    mb = ~m0 & ~m1 & ~m2

    C = gp.shape[-1]
    P = gp.shape[0] * gp.shape[1]

    def red(val):  # [th, tw, C] -> [1, C]
        return jnp.sum(val, axis=(0, 1))[None, :]

    dabc = []
    if _BWD_REDUCE == "factored":
        # Separable reduction: px depends only on the COLUMN and py only on
        # the ROW, so Σ_p g·px = Σ_col px·(Σ_row g) and Σ_p g·py =
        # Σ_col (Σ_row g·py) — one [rows, tw, C] row-reduce pair per arm
        # plus tiny [tw, C] column stages, instead of a [P,3]ᵀ×[P,C]
        # K-bound MXU dot (K = pixels; BASELINE.md r2: ~2048 cycles each).
        px_row = px[0, :, :]  # [tw, 1] column coordinate
        for m in (m0, m1, m2):
            gm = gp * m.astype(jnp.float32)  # [rows, tw, C]
            r0 = jnp.sum(gm, axis=0)         # [tw, C]
            r1 = jnp.sum(gm * py, axis=0)    # [tw, C]
            sg = jnp.sum(r0, axis=0)[None, :]
            sgx = jnp.sum(r0 * px_row, axis=0)[None, :]
            sgy = jnp.sum(r1, axis=0)[None, :]
            dabc.append((sgx, sgy, sg))
    else:
        if prows is None:
            prows = _pix_rows(gp.shape[0], gp.shape[1])
        for m in (m0, m1, m2):
            G = (gp * m.astype(jnp.float32)).reshape(P, C)
            r = jax.lax.dot_general(
                prows, G, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [3, C]: rows = (Σ g·px, Σ g·py, Σ g)
            dabc.append((r[0:1], r[1:2], r[2:3]))

    lox, loy, hix, hiy = (x.reshape(1, 1, CHUNK) for x in s["bbox"])
    axl = (px - lox) <= dbb
    axh = ((hix - px) <= dbb) & ~axl
    ayl = ((py - loy) <= dbb) & ~axl & ~axh
    ayh = ~axl & ~axh & ~ayl
    sb = gp * mb.astype(jnp.float32)
    dlox = -red(sb * axl.astype(jnp.float32))
    dloy = -red(sb * ayl.astype(jnp.float32))
    dhix = red(sb * axh.astype(jnp.float32))
    dhiy = red(sb * ayh.astype(jnp.float32))

    # --- chain: edge fields -> corner pixel coords ([1, C] rows) ---
    u, v = s["u"], s["v"]
    du = [jnp.zeros_like(u[0]) for _ in range(3)]
    dv = [jnp.zeros_like(u[0]) for _ in range(3)]
    for e, (ia, ib) in enumerate(((0, 1), (1, 2), (2, 0))):
        a, bb_, cst, pp, q, n, inv = s["edges"][e]
        da, db, dc = dabc[e]
        # cst = -(a*ua + b*va)
        da_t = da - dc * u[ia]
        db_t = db - dc * v[ia]
        du[ia] += -a * dc
        dv[ia] += -bb_ * dc
        # a = p*inv, b = q*inv, inv = orient/max(|pq|, eps)
        sdot = (da_t * pp + db_t * q) / (n * n)
        dp = inv * (da_t - sdot * pp)
        dq = inv * (db_t - sdot * q)
        # p = va - vb ; q = ub - ua
        dv[ia] += dp
        dv[ib] -= dp
        du[ib] += dq
        du[ia] -= dq

    bb = s["bbox"]
    for (dlo, vals, dvs) in ((dlox, u, du), (dloy, v, dv)):
        tgt = bb[0] if vals is u else bb[1]
        for arm, mvs in zip(_first_match_arms(vals, tgt), range(3)):
            dvs[mvs] += dlo * arm.astype(jnp.float32)
    for (dhi, vals, dvs) in ((dhix, u, du), (dhiy, v, dv)):
        tgt = bb[2] if vals is u else bb[3]
        for arm, mvs in zip(_first_match_arms(vals, tgt), range(3)):
            dvs[mvs] += dhi * arm.astype(jnp.float32)

    # --- chain: pixel coords -> camera coords -> dTc partials -----
    vmask = s["valid"].astype(jnp.float32)
    acc12 = []
    for ci in range(3):
        zs = s["zc"][ci]
        izs = 1.0 / zs
        dxc = du[ci] * fx * izs * vmask
        dyc = dv[ci] * fy * izs * vmask
        dzc = (
            -(du[ci] * fx * s["xc"][ci] + dv[ci] * fy * s["yc"][ci])
            * izs
            * izs
            * vmask
        )
        acc12.append((dxc, dyc, dzc, ci))

    # dTc[r, j] partials: row r*4+j += sum_corners dXc_r * Xb_j
    rows = []
    for r in range(3):
        for j in range(4):
            tot = None
            for (dxc, dyc, dzc, ci) in acc12:
                dcomp = (dxc, dyc, dzc)[r]
                xb = blk[4 * ci + j : 4 * ci + j + 1, :]
                term = dcomp * xb
                tot = term if tot is None else tot + term
            rows.append(tot)
    return jnp.concatenate(rows, axis=0)  # [POSE_RECORD, CHUNK]


import os as _os

# Backward reduction strategy ("factored" separable VPU vs "mxu" dots) and
# sub-block row granularity — read at TRACE time (A/B them across fresh
# processes; the kernel factories are lru_cached within a process).
_BWD_REDUCE = _os.environ.get("EASYHEC_BWD_REDUCE", "mxu")
_SUB = int(_os.environ.get("EASYHEC_SUB_ROWS", "8"))  # f32 native sublanes


def _row_subs(th: int):
    if th % _SUB:
        return [(0, th)]  # odd tile heights: one full block
    return [(r, _SUB) for r in range(0, th, _SUB)]


def _chunk_xy_range(s, band):
    """Band-dilated scalar bbox of the chunk's valid triangles (tile-local
    pixel coords). Empty chunk -> inverted range, every overlap test False.
    Coverage is exactly zero outside it: cov > 0 requires
    dmin > -0.5/sharpness and dmin <= bbox distance."""
    m = s["valid"]
    big = jnp.float32(1e9)
    lox, loy, hix, hiy = s["bbox"]
    clo_x = jnp.min(jnp.where(m, lox, big)) - band
    chi_x = jnp.max(jnp.where(m, hix, -big)) + band
    clo_y = jnp.min(jnp.where(m, loy, big)) - band
    chi_y = jnp.max(jnp.where(m, hiy, -big)) + band
    return clo_x, chi_x, clo_y, chi_y


def _sub_grids(r0: int, rh: int, tw: int):
    """Pixel-center grids of rows [r0, r0+rh) — GENERATED per sub-block,
    never sliced from the full grid: static slicing of [th, tw, 1]
    trailing-singleton values SIGABRTs the Mosaic compile helper ("Check
    failed: limits[i] <= dim(i) (16 vs. 1)", array.h:480 — the same
    signature as the historical tile_h=8/cap-1024 faults, BASELINE.md).
    Mixed int+slice REF indexing (acc_ref[0, 0, r0:r0+rh]) hits the same
    check, and dynamic_update_slice has no Pallas TPU lowering — so refs
    are only ever read/stored as FULL blocks throughout."""
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (rh, tw, 1), 1).astype(jnp.float32)
        + 0.5
    )
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (rh, tw, 1), 0).astype(jnp.float32)
        + 0.5
        + float(r0)
    )
    return px, py


def _pix_rows_sub(r0: int, rh: int, tw: int):
    px, py = _sub_grids(r0, rh, tw)
    one = jnp.ones((rh, tw, 1), jnp.float32)
    return jnp.concatenate([px, py, one], axis=-1).reshape(rh * tw, 3)


def _fwd_accumulate(acc_ref, s, sharpness, th, tw):
    """Coverage accumulation in guarded _SUB-row sub-blocks.

    Each sub-block runs only if the chunk's band-dilated bbox overlaps its
    rows (exact — see _chunk_xy_range) and the sub-block is not already
    saturated. Chunks are id-contiguous mesh patches, typically spanning
    few rows of a 16-row tile, so about half the [rows, tw, C] VPU
    coverage work disappears without the tile_h=8 configuration that
    faults the compile helper (see _sub_grids). The store pads the
    sub-block delta with static zeros and adds the full block."""
    band = 0.5 / float(sharpness)
    clo_x, chi_x, clo_y, chi_y = _chunk_xy_range(s, band)
    full = acc_ref[0, 0]
    for (r0, rh) in _row_subs(th):
        acc_h0 = full[r0:r0 + rh]
        overlap = (clo_y <= r0 + rh) & (chi_y >= r0)

        @pl.when(overlap & (jnp.min(acc_h0) < 2.0))
        def _(r0=r0, rh=rh):
            cur = acc_ref[0, 0]
            pxh, pyh = _sub_grids(r0, rh, tw)
            cov, *_ = _chunk_coverage(s, pxh, pyh, sharpness)
            delta = jnp.sum(cov, axis=-1)  # [rh, tw]
            parts = []
            if r0 > 0:
                parts.append(jnp.zeros((r0, tw), jnp.float32))
            parts.append(delta)
            if r0 + rh < th:
                parts.append(jnp.zeros((th - r0 - rh, tw), jnp.float32))
            upd = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
            acc_ref[0, 0] = cur + upd


def _bwd_accumulate(
    dcam_ref, s, blk, cam, gp2, sharpness, th, tw,
):
    """Backward in guarded _SUB-row sub-blocks.

    gp2: [th, tw] masked loss cotangent (2D — sliced per sub-block then
    expanded; 3D trailing-singleton slicing crashes Mosaic, _sub_grids).
    A sub-block runs only if some LIVE cotangent pixel falls inside the
    chunk's band-dilated united bbox window — exact (every contribution is
    linear in gp·1{0<cov<1}, and cov is fractional only within
    0.5/sharpness of the bbox). This is a finer cull than the former
    whole-tile cotangent-bbox rectangle test, and halving the rows halves
    the K of the [P,3]^T x [P,C] MXU reductions — the dominant backward
    cost (BASELINE.md r2: ~2048 cycles each, K-bound)."""
    band = 0.5 / float(sharpness)
    clo_x, chi_x, clo_y, chi_y = _chunk_xy_range(s, band)
    for (r0, rh) in _row_subs(th):
        gp_h = gp2[r0:r0 + rh][:, :, None]
        px_h, py_h = _sub_grids(r0, rh, tw)
        win = (
            (px_h >= clo_x) & (px_h <= chi_x)
            & (py_h >= clo_y) & (py_h <= chi_y)
        )
        live = jnp.max(jnp.abs(gp_h) * win.astype(jnp.float32)) > 0.0

        @pl.when(live)
        def _(gp_h=gp_h, px_h=px_h, py_h=py_h, r0=r0, rh=rh):
            dcam_ref[0, 0] += _bwd_chunk(
                s, blk, cam, gp_h, px_h, py_h, sharpness,
                _pix_rows_sub(r0, rh, tw),
            )


def _masked_cotangent(acc, g, band_only):
    """[th, tw] masked cotangent (2D; expanded per sub-block downstream)."""
    gp_base = g * (acc <= 1.0).astype(jnp.float32)
    if band_only:
        # Restrict gradient flow to silhouette-BAND pixels (0 < acc < 1).
        # Non-band pixels carry only internal-mesh-edge contributions whose
        # pose gradients cancel pairwise (adjacent faces share the edge, so
        # d(cov_A + cov_B)/d(edge) = 0 exactly away from clipping); dropping
        # them leaves the pose gradient intact to roundoff while letting
        # every interior/background tile skip its backward entirely.
        band = ((acc > 0.0) & (acc < 1.0)).astype(jnp.float32)
        gp_base = gp_base * band
    return gp_base


def _bwd_kernel(
    counts_ref, cam_ref, rec_ref, acc_ref, g_ref, dcam_ref,
    *, th, tw, cap, sharpness, near, far, n_tx, band_only,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    count = counts_ref[b, i]
    cam = tuple(cam_ref[b, j] for j in range(16))
    x0, y0 = _tile_origin(i, n_tx, th, tw)
    px, py = _pix_grids(th, tw)

    gp2 = _masked_cotangent(acc_ref[0, 0], g_ref[0, 0], band_only)
    dcam_ref[0, 0] = jnp.zeros((POSE_RECORD, CHUNK), jnp.float32)
    # Exact tile skip: every contribution below is linear in gp2, so a
    # tile whose masked cotangent is identically zero (background tiles,
    # perfectly matched saturated interiors) produces exactly no gradient.
    any_live = jnp.max(jnp.abs(gp2)) > 0.0

    def body(j, _):
        k = j * CHUNK

        @pl.when(any_live)
        def _():
            blk = rec_ref[0, :, pl.ds(pl.multiple_of(k, CHUNK), CHUNK)]
            s = _chunk_setup(blk, cam, x0, y0, near, far)
            # Per-sub-block live-cotangent-in-window cull inside (exact).
            _bwd_accumulate(
                dcam_ref, s, blk, cam, gp2, sharpness, th, tw,
            )

        return 0

    jax.lax.fori_loop(0, pl.cdiv(count, CHUNK), body, 0)


@functools.lru_cache(maxsize=None)
def _make_pose_silhouette(
    th: int, tw: int, cap: int, sharpness: float, near: float, far: float,
    n_tx: int, band_only: bool,
):
    interpret = not _on_tpu()
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    def fwd_call(cam, rec, counts):
        B, n_tiles = rec.shape[0], rec.shape[-1] // cap
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, POSE_RECORD, cap),
                    lambda b, i, *_: (b, 0, i),
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
        return pl.pallas_call(
            functools.partial(
                _fwd_kernel, th=th, tw=tw, cap=cap, sharpness=sharpness,
                near=near, far=far, n_tx=n_tx,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, n_tiles, th, tw), jnp.float32),
                jax.ShapeDtypeStruct((B, n_tiles, th, tw), jnp.float32),
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )(counts, cam, rec)

    def bwd_call(cam, rec, counts, acc, g):
        B, n_tiles = rec.shape[0], rec.shape[-1] // cap
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, POSE_RECORD, cap),
                    lambda b, i, *_: (b, 0, i),
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
                (1, 1, POSE_RECORD, CHUNK),
                lambda b, i, *_: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            functools.partial(
                _bwd_kernel, th=th, tw=tw, cap=cap, sharpness=sharpness,
                near=near, far=far, n_tx=n_tx, band_only=band_only,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (B, n_tiles, POSE_RECORD, CHUNK), jnp.float32
            ),
            compiler_params=compiler_params,
            interpret=interpret,
        )(counts, cam, rec, acc, g)

    @jax.custom_vjp
    def pose_sil(cam, rec, counts):
        out, _ = fwd_call(cam, rec, counts)
        return out

    def pose_sil_fwd(cam, rec, counts):
        out, acc = fwd_call(cam, rec, counts)
        return out, (cam, rec, counts, acc)

    def pose_sil_bwd(res, g):
        cam, rec, counts, acc = res
        parts = bwd_call(cam, rec, counts, acc, g)
        dcam = jnp.sum(parts, axis=(1, 3))  # [B, 12] pose-matrix gradient
        # Intrinsics rows (fx fy cx cy) are non-optimized constants -> 0.
        dcam = jnp.pad(dcam, ((0, 0), (0, 4)))
        return dcam, None, None

    pose_sil.defvjp(pose_sil_fwd, pose_sil_bwd)
    return pose_sil


# ---------------------------------------------------------------------------
# Fused loss kernel: rasterize + mask loss + pose gradient, no image round-trip
# ---------------------------------------------------------------------------


def _crop_mask(x0, y0, px, py, H, W):
    """[th, tw] validity for pixels inside the cropped H×W image (tile grids
    cover ceil-multiples of the tile size; out-of-image pixels must not
    contribute to the loss)."""
    vy = (py[..., 0] - 0.5 + y0) < H
    vx = (px[..., 0] - 0.5 + x0) < W
    return (vy & vx).astype(jnp.float32)


def _loss_fwd_kernel(
    counts_ref, cam_ref, rec_ref, ref_ref, loss_ref, acc_ref,
    *, th, tw, cap, sharpness, near, far, n_tx, H, W,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    count = counts_ref[b, i]
    cam = tuple(cam_ref[b, j] for j in range(16))
    x0, y0 = _tile_origin(i, n_tx, th, tw)
    px, py = _pix_grids(th, tw)

    acc_ref[0, 0] = jnp.zeros((th, tw), jnp.float32)

    def body(j, _):
        k = j * CHUNK

        @pl.when(jnp.min(acc_ref[0, 0]) < 2.0)
        def _():
            blk = rec_ref[0, :, pl.ds(pl.multiple_of(k, CHUNK), CHUNK)]
            s = _chunk_setup(blk, cam, x0, y0, near, far)
            _fwd_accumulate(acc_ref, s, sharpness, th, tw)

        return 0

    jax.lax.fori_loop(0, pl.cdiv(count, CHUNK), body, 0)

    acc = acc_ref[0, 0]
    e = jnp.minimum(jnp.maximum(acc, 0.0), 1.0) - ref_ref[0, 0]
    e = e * _crop_mask(x0, y0, px, py, H, W)
    # (1, 1) store: Mosaic cannot store bare scalars to VMEM
    loss_ref[0, 0] = jnp.reshape(jnp.sum(e * e), (1, 1))


def _loss_bwd_kernel(
    counts_ref, cam_ref, gb_ref, rec_ref, ref_ref, acc_ref, dcam_ref,
    *, th, tw, cap, sharpness, near, far, n_tx, H, W, band_only,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    count = counts_ref[b, i]
    cam = tuple(cam_ref[b, j] for j in range(16))
    x0, y0 = _tile_origin(i, n_tx, th, tw)
    px, py = _pix_grids(th, tw)

    acc = acc_ref[0, 0]
    e = jnp.minimum(jnp.maximum(acc, 0.0), 1.0) - ref_ref[0, 0]
    # d(loss_b)/d(acc) = 2·e·1{acc ≤ 1} (sum-clip), zero outside the crop.
    gp2 = 2.0 * gb_ref[b] * e * (acc <= 1.0).astype(jnp.float32)
    gp2 = gp2 * _crop_mask(x0, y0, px, py, H, W)
    if band_only:
        # Same exactness argument as _masked_cotangent: non-band pixels
        # carry only pairwise-cancelling internal-edge contributions.
        gp2 = gp2 * ((acc > 0.0) & (acc < 1.0)).astype(jnp.float32)

    dcam_ref[0, 0] = jnp.zeros((POSE_RECORD, CHUNK), jnp.float32)
    any_live = jnp.max(jnp.abs(gp2)) > 0.0

    def body(j, _):
        k = j * CHUNK

        @pl.when(any_live)
        def _():
            blk = rec_ref[0, :, pl.ds(pl.multiple_of(k, CHUNK), CHUNK)]
            s = _chunk_setup(blk, cam, x0, y0, near, far)
            _bwd_accumulate(
                dcam_ref, s, blk, cam, gp2, sharpness, th, tw,
            )

        return 0

    jax.lax.fori_loop(0, pl.cdiv(count, CHUNK), body, 0)


@functools.lru_cache(maxsize=None)
def _make_pose_loss(
    th: int, tw: int, cap: int, sharpness: float, near: float, far: float,
    n_tx: int, H: int, W: int, band_only: bool = False,
):
    interpret = not _on_tpu()
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    def fwd_call(cam, rec, counts, ref_tiles):
        B, n_tiles = rec.shape[0], rec.shape[-1] // cap
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, POSE_RECORD, cap),
                    lambda b, i, *_: (b, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, th, tw),
                    lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                # scalar-per-tile loss as a [., ., 1, 1] block: TPU block
                # shapes must have their last two dims equal to the array's
                # (a bare (1, 1) block over [B, n_tiles] does not lower)
                pl.BlockSpec(
                    (1, 1, 1, 1),
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
        loss4, acc = pl.pallas_call(
            functools.partial(
                _loss_fwd_kernel, th=th, tw=tw, cap=cap, sharpness=sharpness,
                near=near, far=far, n_tx=n_tx, H=H, W=W,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, n_tiles, 1, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, n_tiles, th, tw), jnp.float32),
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )(counts, cam, rec, ref_tiles)
        return loss4[..., 0, 0], acc

    def bwd_call(cam, rec, counts, ref_tiles, acc, gb):
        B, n_tiles = rec.shape[0], rec.shape[-1] // cap
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, POSE_RECORD, cap),
                    lambda b, i, *_: (b, 0, i),
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
                (1, 1, POSE_RECORD, CHUNK),
                lambda b, i, *_: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            functools.partial(
                _loss_bwd_kernel, th=th, tw=tw, cap=cap, sharpness=sharpness,
                near=near, far=far, n_tx=n_tx, H=H, W=W,
                band_only=band_only,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (B, n_tiles, POSE_RECORD, CHUNK), jnp.float32
            ),
            compiler_params=compiler_params,
            interpret=interpret,
        )(counts, cam, gb, rec, ref_tiles, acc)

    @jax.custom_vjp
    def pose_loss(cam, rec, counts, ref_tiles):
        loss_tiles, _ = fwd_call(cam, rec, counts, ref_tiles)
        return jnp.sum(loss_tiles, axis=-1)

    def pose_loss_fwd(cam, rec, counts, ref_tiles):
        loss_tiles, acc = fwd_call(cam, rec, counts, ref_tiles)
        return (
            jnp.sum(loss_tiles, axis=-1),
            (cam, rec, counts, ref_tiles, acc),
        )

    def pose_loss_bwd(res, gb):
        cam, rec, counts, ref_tiles, acc = res
        parts = bwd_call(cam, rec, counts, ref_tiles, acc, gb)
        dcam = jnp.sum(parts, axis=(1, 3))  # [B, 12]
        dcam = jnp.pad(dcam, ((0, 0), (0, 4)))
        return dcam, None, None, None

    pose_loss.defvjp(pose_loss_fwd, pose_loss_bwd)
    return pose_loss


def tile_image(img: jax.Array, tile_h: int, tile_w: int) -> jax.Array:
    """[..., H, W] -> [..., n_tiles, tile_h, tile_w] (zero-padded), the
    layout pose_tile_loss expects for the reference masks. Tile once per
    dataset, outside the optimizer scan."""
    H, W = img.shape[-2:]
    n_ty, n_tx = -(-H // tile_h), -(-W // tile_w)
    pad = [(0, 0)] * (img.ndim - 2) + [
        (0, n_ty * tile_h - H), (0, n_tx * tile_w - W)
    ]
    p = jnp.pad(img, pad)
    lead = img.shape[:-2]
    p = p.reshape(lead + (n_ty, tile_h, n_tx, tile_w))
    p = jnp.swapaxes(p, -3, -2)
    return p.reshape(lead + (n_ty * n_tx, tile_h, tile_w))


def pose_tile_loss(
    cam: jax.Array,
    rec: jax.Array,
    counts: jax.Array,
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
    """Per-frame mask loss Σ_pixels (silhouette − ref)², fused in-kernel.

    One forward kernel rasterizes the base-frame corner records (see
    pose_tile_silhouette) AND reduces the squared mask error per tile — the
    [B, H, W] silhouette image never round-trips to HBM, and the XLA
    elementwise loss pass disappears. The backward kernel reads back only
    the raw coverage accumulator and chains analytically to d(loss)/d(Tc).

    cam [B, 16], rec [B, POSE_RECORD, n_tiles*cap], counts [B, n_tiles],
    ref_tiles [B, n_tiles, tile_h, tile_w] (tile_image of the masks).
    -> [B] per-frame loss; VJP to cam only.

    Role in the reference: this is rb_solver.py:60-72 (render + mask loss)
    collapsed into one fused device program.
    """
    n_tiles = counts.shape[-1]
    cap, rem = divmod(rec.shape[-1], n_tiles)
    if cap == 0 or rem != 0:
        raise ValueError(
            f"rec slot axis ({rec.shape[-1]}) must be a positive multiple of "
            f"n_tiles ({n_tiles})"
        )
    if cap % CHUNK != 0:
        cap_pad = -(-cap // CHUNK) * CHUNK
        r = rec.reshape(rec.shape[:-1] + (n_tiles, cap))
        r = jnp.pad(r, [(0, 0)] * (r.ndim - 1) + [(0, cap_pad - cap)])
        rec = r.reshape(rec.shape[:-1] + (n_tiles * cap_pad,))
        cap = cap_pad
    fn = _make_pose_loss(
        int(tile_h), int(tile_w), int(cap), float(sharpness), float(near),
        float(far), int(n_tx), int(H), int(W), bool(band_only),
    )
    return fn(cam, rec, counts.astype(jnp.int32), ref_tiles)


def pose_tile_silhouette(
    cam: jax.Array,
    rec: jax.Array,
    counts: jax.Array,
    tile_h: int,
    tile_w: int,
    n_tx: int,
    sharpness: float = 1.0,
    near: float = 0.001,
    far: float = 10.0,
    band_only: bool = False,
) -> jax.Array:
    """Rasterize base-frame corner records under per-frame camera poses.

    cam:    [B, 16] f32 — rows 0..11 = Tc_c2b[:3, :4] row-major, rows
            12..15 = fx, fy, cx, cy. The ONLY differentiable input.
    rec:    [B, POSE_RECORD, n_tiles*cap] f32 — field-major per-slot
            base-frame corner positions (x,y,z,w per corner; zero = empty
            sentinel), packed once per rebin window (render.fused). The
            field-major layout IS the pack-gather's natural output — no
            transpose or pad between gather and kernel.
    counts: [B, n_tiles] int32.
    -> [B, n_tiles, tile_h, tile_w] soft coverage; analytic VJP to `cam`.
    """
    n_tiles = counts.shape[-1]
    cap, rem = divmod(rec.shape[-1], n_tiles)
    if cap == 0 or rem != 0:
        raise ValueError(
            f"rec slot axis ({rec.shape[-1]}) must be a positive multiple of "
            f"n_tiles ({n_tiles}); records are [B, POSE_RECORD, n_tiles*cap]"
        )
    if cap % CHUNK != 0:
        # Small-capacity configs (tests, tiny scenes): pad each tile's slot
        # axis with empty records (all-zero = empty sentinel) up to the lane
        # chunk. Production configs use CHUNK multiples and skip this.
        cap_pad = -(-cap // CHUNK) * CHUNK
        r = rec.reshape(rec.shape[:-1] + (n_tiles, cap))
        r = jnp.pad(r, [(0, 0)] * (r.ndim - 1) + [(0, cap_pad - cap)])
        rec = r.reshape(rec.shape[:-1] + (n_tiles * cap_pad,))
        cap = cap_pad
    fn = _make_pose_silhouette(
        int(tile_h), int(tile_w), int(cap), float(sharpness), float(near),
        float(far), int(n_tx), bool(band_only),
    )
    return fn(cam, rec, counts.astype(jnp.int32))
