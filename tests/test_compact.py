"""Compact-chunk-grid loss path (ops/pose_raster_compact.py +
render/fused.build_compact_state).

The compact path must be loss- and gradient-identical to the dense fused
loss path (same records, same kernel math — only the grid traversal and
record layout change). Runs in Pallas interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyhec_tpu.geometry import se3
from easyhec_tpu.models.calib import mask_loss, tile_masks
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.render.fused import (
    CompactState,
    build_compact_state,
    build_fused_state,
    loss_fused,
)
from easyhec_tpu.robot import make_box, make_cylinder

CFG_DENSE = TileConfig(
    tile_h=16, tile_w=32, capacity=128, binner="count", fused=True
)
CFG_COMPACT = CFG_DENSE._replace(compact_chunks=12)


def _renderer(cfg, H=64, W=64):
    meshes = [
        make_box((0.15, 0.15, 0.3)),
        make_cylinder(0.05, 0.4, sections=12),
    ]
    return RobotRenderer(meshes, H=H, W=W, tile=cfg)


def _poses(B=3):
    link_poses = jnp.stack([jnp.eye(4), jnp.eye(4).at[2, 3].set(0.3)])
    lps = [link_poses]
    key = jax.random.PRNGKey(0)
    for i in range(B - 1):
        key, k = jax.random.split(key)
        off = jax.random.uniform(k, (3,), minval=-0.2, maxval=0.2)
        lps.append(link_poses.at[1, :3, 3].add(off))
    lp = jnp.stack(lps)  # [B, L, 4, 4]
    Tc = se3.exp(jnp.asarray([0.02, -0.03, 1.2, 0.05, -0.08, 0.03]))
    K = jnp.asarray([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])
    return Tc, lp, K


def _target(renderer, Tc, lp, K):
    sil = renderer.silhouette(Tc, lp, K)
    return (np.asarray(sil) > 0.5).astype(np.float32)


class TestCompactState:
    def test_map_shape_and_budget(self):
        Tc, lp, K = _poses()
        r = _renderer(CFG_COMPACT)
        st = build_compact_state(r, Tc, lp, K)
        assert isinstance(st, CompactState)
        B = lp.shape[0]
        nc = CFG_COMPACT.compact_chunks
        assert st.rec.shape == (B, 12, nc * 128)
        assert st.nlive.shape == st.ctmap.shape == (B, nc)
        assert not bool(np.asarray(st.overflow))
        # used chunks == sum(ceil(count/128)) and nlive sums to counts
        counts = np.asarray(st.counts)
        ncu = np.asarray(st.ncu)
        np.testing.assert_array_equal(
            ncu, np.ceil(counts / 128).astype(np.int64).sum(-1)
        )
        np.testing.assert_array_equal(
            np.asarray(st.nlive).sum(-1), counts.sum(-1)
        )
        # chunk->tile map is non-decreasing (consecutive block revisits)
        ct = np.asarray(st.ctmap)
        assert (np.diff(ct, axis=-1) >= 0).all()

    def test_budget_overflow_flags(self):
        Tc, lp, K = _poses()
        r = _renderer(CFG_COMPACT._replace(compact_chunks=1))
        st = build_compact_state(r, Tc, lp, K)
        assert bool(np.asarray(st.overflow))

    def test_requires_positive_budget(self):
        Tc, lp, K = _poses()
        r = _renderer(CFG_DENSE)
        with pytest.raises(ValueError):
            build_compact_state(r, Tc, lp, K)


class TestCompactLoss:
    @pytest.mark.parametrize("nc", [12, 6])
    def test_loss_matches_dense(self, nc):
        # nc=6: B tiles * ceil counts can still fit exactly or nearly —
        # exercises little-to-no padding; nc=12 exercises heavy padding.
        Tc, lp, K = _poses()
        rd = _renderer(CFG_DENSE)
        rc = _renderer(CFG_COMPACT._replace(compact_chunks=nc))
        target = _target(rd, Tc, lp, K)
        ld = np.asarray(loss_fused(rd, Tc, lp, K, masks_ref=target))
        sc = build_compact_state(rc, Tc, lp, K)
        if bool(np.asarray(sc.overflow)):
            pytest.skip(f"nc={nc} too small for this scene")
        lc = np.asarray(loss_fused(rc, Tc, lp, K, masks_ref=target, state=sc))
        np.testing.assert_allclose(ld, lc, rtol=1e-5, atol=1e-5)

    def test_loss_includes_empty_tiles(self):
        # Target mask has pixels in tiles no triangle touches: the
        # empty-tile Σ ref² term must appear in the loss.
        Tc, lp, K = _poses(B=1)
        rd = _renderer(CFG_DENSE)
        rc = _renderer(CFG_COMPACT)
        target = np.ones((1, 64, 64), np.float32)  # everything masked
        ld = np.asarray(loss_fused(rd, Tc, lp[0:1], K, masks_ref=target))
        lc = np.asarray(loss_fused(rc, Tc, lp[0:1], K, masks_ref=target))
        np.testing.assert_allclose(ld, lc, rtol=1e-5, atol=1e-5)
        assert ld[0] > 100.0  # background mismatch dominates

    @pytest.mark.slow
    def test_gradient_matches_dense(self):
        Tc, lp, K = _poses()
        rd = _renderer(CFG_DENSE)
        rc = _renderer(CFG_COMPACT)
        target = _target(rd, Tc, lp, K)
        xi = se3.log(Tc) + 0.01

        def loss_of(r):
            def f(dof):
                return jnp.mean(
                    loss_fused(r, se3.exp(dof), lp, K, masks_ref=target)
                )

            return f

        gd = np.asarray(jax.grad(loss_of(rd))(xi))
        gc = np.asarray(jax.grad(loss_of(rc))(xi))
        assert np.abs(gd).max() > 0
        np.testing.assert_allclose(gd, gc, rtol=1e-4, atol=1e-6)

    def test_gradient_matches_dense_band_only(self):
        Tc, lp, K = _poses()
        rd = _renderer(CFG_DENSE._replace(bwd_band_only=True))
        rc = _renderer(CFG_COMPACT._replace(bwd_band_only=True))
        target = _target(rd, Tc, lp, K)
        xi = se3.log(Tc) + 0.01

        def loss_of(r):
            def f(dof):
                return jnp.mean(
                    loss_fused(r, se3.exp(dof), lp, K, masks_ref=target)
                )

            return f

        gd = np.asarray(jax.grad(loss_of(rd))(xi))
        gc = np.asarray(jax.grad(loss_of(rc))(xi))
        np.testing.assert_allclose(gd, gc, rtol=1e-4, atol=1e-6)

    def test_mask_loss_routes_compact(self):
        # mask_loss + renderer.bin_state must round-trip through the
        # compact path (what the bench/calibrate loop does).
        Tc, lp, K = _poses()
        rc = _renderer(CFG_COMPACT)
        rd = _renderer(CFG_DENSE)
        target = _target(rd, Tc, lp, K)
        xi = se3.log(Tc) + 0.005
        st = rc.bin_state(se3.exp(xi), lp, K)
        assert isinstance(st, CompactState)
        ref_tiles = tile_masks(target, rc)
        v1, g1 = jax.value_and_grad(
            lambda d: mask_loss(d, rc, lp, K, target, bin_state=st,
                                ref_tiles=ref_tiles)
        )(xi)
        v2, g2 = jax.value_and_grad(
            lambda d: mask_loss(d, rd, lp, K, target)
        )(xi)
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6
        )

    def test_offscreen_frame(self):
        # A pose looking away: zero triangles binned; the loss must be the
        # pure Σ ref² term and the gradient exactly zero.
        _, lp, K = _poses(B=1)
        Tc = se3.exp(jnp.asarray([0.0, 0.0, -3.0, 0.0, 0.0, 0.0]))
        rc = _renderer(CFG_COMPACT)
        target = np.zeros((1, 64, 64), np.float32)
        target[:, 2:6, 3:9] = 1.0
        st = build_compact_state(rc, Tc, lp[0:1], K)
        assert int(np.asarray(st.ncu)[0]) == 0
        val, g = jax.value_and_grad(
            lambda d: jnp.mean(
                loss_fused(rc, se3.exp(d), lp[0:1], K, masks_ref=target,
                           state=st)
            )
        )(se3.log(Tc))
        np.testing.assert_allclose(float(val), float(target.sum()), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(g), 0.0)


class TestBoundaryPrefixBackward:
    """bwd_chunks > 0: the backward runs on its own reduced chunk map over
    band-capable tiles only (BASELINE.md round-3 roadmap item 2). Must be
    gradient-identical to the full-map compact path under bwd_band_only."""

    CFG = CFG_COMPACT._replace(bwd_band_only=True, bwd_chunks=12)

    def test_map_is_reduced_and_consistent(self):
        Tc, lp, K = _poses()
        r = _renderer(self.CFG)
        st = build_compact_state(r, Tc, lp, K)
        assert not bool(np.asarray(st.overflow))
        assert st.bwd_nlive.shape == (lp.shape[0], 12)
        # every backward chunk's cpos points at a forward chunk of the SAME
        # tile with the SAME live count
        nl, ct, cp = (np.asarray(a) for a in (st.bwd_nlive, st.bwd_ctmap, st.bwd_cpos))
        fnl, fct = np.asarray(st.nlive), np.asarray(st.ctmap)
        for b in range(nl.shape[0]):
            for c in range(nl.shape[1]):
                if nl[b, c] == 0:
                    continue
                assert fct[b, cp[b, c]] == ct[b, c]
                assert fnl[b, cp[b, c]] == nl[b, c]
        # the map covers no more chunks than the forward
        assert (nl > 0).sum() <= (fnl > 0).sum()

    @pytest.mark.slow
    def test_gradient_matches_full_map(self):
        Tc, lp, K = _poses()
        r_full = _renderer(CFG_COMPACT._replace(bwd_band_only=True))
        r_red = _renderer(self.CFG)
        target = _target(_renderer(CFG_DENSE), Tc, lp, K)
        xi = se3.log(Tc) + 0.01

        def lg(r):
            return jax.value_and_grad(
                lambda d: jnp.mean(
                    loss_fused(r, se3.exp(d), lp, K, masks_ref=target)
                )
            )(xi)

        v0, g0 = lg(r_full)
        v1, g1 = lg(r_red)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
        assert np.abs(np.asarray(g0)).max() > 0
        np.testing.assert_allclose(
            np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-7
        )

    @pytest.mark.slow
    def test_gradient_matches_dense_band_only(self):
        # end-to-end: reduced-map compact vs the dense fused path
        Tc, lp, K = _poses()
        rd = _renderer(CFG_DENSE._replace(bwd_band_only=True))
        rr = _renderer(self.CFG)
        target = _target(rd, Tc, lp, K)
        xi = se3.log(Tc) + 0.01

        def lg(r):
            return jax.value_and_grad(
                lambda d: jnp.mean(
                    loss_fused(r, se3.exp(d), lp, K, masks_ref=target)
                )
            )(xi)

        v0, g0 = lg(rd)
        v1, g1 = lg(rr)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-6
        )

    def test_budget_overflow_flags(self):
        Tc, lp, K = _poses()
        r = _renderer(self.CFG._replace(bwd_chunks=1))
        st = build_compact_state(r, Tc, lp, K)
        assert bool(np.asarray(st.overflow))

    def test_requires_band_only(self):
        # without bwd_band_only the reduced map is not built (full-pixel
        # cotangents need every chunk): backward map == forward map
        Tc, lp, K = _poses()
        r = _renderer(CFG_COMPACT._replace(bwd_chunks=12))
        st = build_compact_state(r, Tc, lp, K)
        np.testing.assert_array_equal(
            np.asarray(st.bwd_nlive), np.asarray(st.nlive)
        )

    def test_offscreen_frame_zero_grad(self):
        _, lp, K = _poses(B=1)
        Tc = se3.exp(jnp.asarray([0.0, 0.0, -3.0, 0.0, 0.0, 0.0]))
        r = _renderer(self.CFG)
        target = np.zeros((1, 64, 64), np.float32)
        st = build_compact_state(r, Tc, lp[0:1], K)
        g = jax.grad(
            lambda d: jnp.mean(
                loss_fused(r, se3.exp(d), lp[0:1], K, masks_ref=target,
                           state=st)
            )
        )(se3.log(Tc))
        np.testing.assert_array_equal(np.asarray(g), 0.0)


class TestRowSubsortedBins:
    @pytest.mark.slow
    def test_loss_and_grad_match_unsorted(self):
        # Row-sub-classed bin ordering is semantically free: identical loss,
        # gradient equal up to summation-order roundoff.
        Tc, lp, K = _poses()
        base = _renderer(CFG_DENSE)
        target = _target(base, Tc, lp, K)
        xi = se3.log(Tc) + 0.01

        def lg(r):
            return jax.value_and_grad(
                lambda d: jnp.mean(
                    loss_fused(r, se3.exp(d), lp, K, masks_ref=target)
                )
            )(xi)

        v0, g0 = lg(base)
        for cfg in (
            CFG_DENSE._replace(bin_subsort_rows=True),
            CFG_COMPACT._replace(bin_subsort_rows=True),
        ):
            v1, g1 = lg(_renderer(cfg))
            np.testing.assert_allclose(
                np.asarray(v0), np.asarray(v1), rtol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(g0), np.asarray(g1), rtol=1e-3, atol=1e-6
            )

    def test_bins_are_row_classed(self):
        # Within each bin, triangles whose bbox center lies in the upper
        # half of the tile must form a contiguous prefix.
        from easyhec_tpu.render.fused import _fused_bins_and_fields

        Tc, lp, K = _poses()
        r = _renderer(CFG_DENSE._replace(bin_subsort_rows=True))
        st, _, _ = _fused_bins_and_fields(r, Tc, lp, K)
        idx = np.asarray(st.idx)
        counts = np.asarray(st.counts)
        # recompute per-triangle bbox center rows (same pipeline inputs)
        from easyhec_tpu.render.projection import setup_triangles_corners

        Tcl = jnp.einsum("ij,bljk->blik", Tc, lp.reshape(-1, 2, 4, 4))
        tris = setup_triangles_corners(
            r.corners_rest, r.face_link_onehot, Tcl, K,
            cull_backfaces=False,
        )
        loy = np.asarray(jnp.min(tris.v, axis=-2) - r.tile.margin)
        hiy = np.asarray(jnp.max(tris.v, axis=-2) + r.tile.margin)
        cy = 0.5 * (loy + hiy)
        th = r.tile.tile_h
        n_tx = -(-64 // r.tile.tile_w)
        F = idx.shape[-1] and tris.valid.shape[-1]
        checked = 0
        for b in range(idx.shape[0]):
            for t in range(idx.shape[1]):
                ids = idx[b, t, : counts[b, t]]
                if len(ids) < 2:
                    continue
                ty = t // n_tx
                cls = ((cy[b, ids] - ty * th) * 2 >= th).astype(int)
                assert (np.diff(cls) >= 0).all(), (b, t, cls)
                checked += 1
        assert checked > 0
