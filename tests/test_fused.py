"""Fused-pose rasterizer (ops/pose_raster.py + render/fused.py).

Verifies the fused kernel against the unfused counted path: identical
forward silhouettes, matching pose gradients (the fused backward chains
analytically all the way to d(loss)/d(Tc) in-kernel), and end-to-end
convergence through calibrate(). Runs in Pallas interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyhec_tpu.geometry import se3
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.render.fused import build_fused_state, silhouette_fused
from easyhec_tpu.robot import make_box, make_cylinder

CFG = TileConfig(
    tile_h=16, tile_w=32, capacity=128, binner="count", fused=True
)
CFG_REF = CFG._replace(fused=False)


def _renderer(cfg=CFG, H=64, W=64, cull=False):
    meshes = [
        make_box((0.15, 0.15, 0.3)),
        make_cylinder(0.05, 0.4, sections=12),
    ]
    return RobotRenderer(
        meshes, H=H, W=W, tile=cfg._replace(cull_backfaces=cull)
    )


def _poses(B=3):
    link_poses = jnp.stack(
        [jnp.eye(4), jnp.eye(4).at[2, 3].set(0.3)]
    )
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


class TestFusedForward:
    @pytest.mark.parametrize("cull", [False, True])
    def test_matches_counted_path(self, cull):
        Tc, lp, K = _poses()
        rf = _renderer(CFG, cull=cull)
        rc = _renderer(CFG_REF, cull=cull)
        a = np.asarray(rf.silhouette(Tc, lp, K))
        b = np.asarray(rc.silhouette(Tc, lp, K))
        assert a.shape == b.shape == (3, 64, 64)
        assert a.max() == 1.0
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_single_frame_and_odd_size(self):
        Tc, lp, K = _poses(B=1)
        rf = _renderer(CFG, H=50, W=70)
        rc = _renderer(CFG_REF, H=50, W=70)
        a = np.asarray(rf.silhouette(Tc, lp[0], K))
        b = np.asarray(rc.silhouette(Tc, lp[0], K))
        assert a.shape == (50, 70)
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_state_reuse_matches_fresh(self):
        Tc, lp, K = _poses()
        rf = _renderer(CFG)
        state = rf.bin_state(Tc, lp, K)
        a = np.asarray(rf.silhouette(Tc, lp, K, bin_state=state))
        b = np.asarray(rf.silhouette(Tc, lp, K))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_state_valid_under_small_drift(self):
        # Records/bins packed at Tc stay exact for a slightly moved pose
        # (within the binning margin) — the rebin_every contract.
        Tc, lp, K = _poses()
        rf = _renderer(CFG._replace(margin=3.0))
        rc = _renderer(CFG_REF._replace(margin=3.0))
        state = rf.bin_state(Tc, lp, K)
        xi = se3.log(Tc) + jnp.asarray([1e-3, -1e-3, 5e-4, 1e-3, -5e-4, 1e-3])
        Tc2 = se3.exp(xi)
        a = np.asarray(rf.silhouette(Tc2, lp, K, bin_state=state))
        b = np.asarray(rc.silhouette(Tc2, lp, K))
        np.testing.assert_allclose(a, b, atol=2e-5)


class TestCapacityPadding:
    @pytest.mark.slow
    def test_non_chunk_multiple_capacity(self):
        # capacity=64 is not a CHUNK(128) multiple: exercises the reshape/
        # pad/reshape path in pose_tile_silhouette. (48 would overflow this
        # scene's densest bin — 58 triangles.) Forward and pose grad must
        # equal the unfused reference path.
        cfg = CFG._replace(capacity=64)
        Tc, lp, K = _poses()
        rf = _renderer(cfg)
        rc = _renderer(CFG_REF)
        a = np.asarray(rf.silhouette(Tc, lp, K))
        b = np.asarray(rc.silhouette(Tc, lp, K))
        np.testing.assert_allclose(a, b, atol=2e-5)

        target = jnp.asarray(b)
        xi0 = se3.log(Tc) + jnp.asarray(
            [0.004, -0.003, 0.002, 0.003, -0.002, 0.004]
        )

        def loss(r):
            return lambda x: jnp.mean(
                jnp.sum((r.silhouette(se3.exp(x), lp, K) - target) ** 2,
                        axis=(-2, -1))
            )

        vf, gf = jax.value_and_grad(loss(rf))(xi0)
        vr, gr = jax.value_and_grad(loss(rc))(xi0)
        np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
        gf, gr = np.asarray(gf), np.asarray(gr)
        scale = np.abs(gr).max()
        np.testing.assert_allclose(gf, gr, atol=2e-3 * scale, rtol=2e-3)

    def test_bad_record_shape_raises(self):
        from easyhec_tpu.ops.pose_raster import pose_tile_silhouette

        cam = jnp.zeros((1, 16))
        counts = jnp.zeros((1, 8), jnp.int32)
        rec = jnp.zeros((1, 12, 4))  # 4 slots < 8 tiles -> cap would be 0
        with pytest.raises(ValueError, match="positive multiple"):
            pose_tile_silhouette(cam, rec, counts, 8, 32, 2)


class TestFusedGradient:
    def _loss_pair(self, cull=False):
        Tc, lp, K = _poses()
        rf = _renderer(CFG, cull=cull)
        rc = _renderer(CFG_REF, cull=cull)
        target = jnp.asarray(
            np.asarray(rc.silhouette(se3.exp(se3.log(Tc)), lp, K))
        )
        xi0 = se3.log(Tc) + jnp.asarray(
            [0.004, -0.003, 0.002, 0.003, -0.002, 0.004]
        )

        def loss_fused(x):
            img = rf.silhouette(se3.exp(x), lp, K)
            return jnp.mean(jnp.sum((img - target) ** 2, axis=(-2, -1)))

        def loss_ref(x):
            img = rc.silhouette(se3.exp(x), lp, K)
            return jnp.mean(jnp.sum((img - target) ** 2, axis=(-2, -1)))

        return xi0, loss_fused, loss_ref

    @pytest.mark.parametrize(
        "cull",
        [pytest.param(False, marks=pytest.mark.slow), True],
    )
    def test_grad_matches_unfused(self, cull):
        xi0, loss_fused, loss_ref = self._loss_pair(cull)
        vf, gf = jax.value_and_grad(loss_fused)(xi0)
        vr, gr = jax.value_and_grad(loss_ref)(xi0)
        np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
        gf, gr = np.asarray(gf), np.asarray(gr)
        scale = np.abs(gr).max()
        np.testing.assert_allclose(gf, gr, atol=2e-3 * scale, rtol=2e-3)

    @pytest.mark.slow
    def test_grad_vs_finite_differences(self):
        # FD of a piecewise-linear soft rasterizer is noisy near clip/arm
        # kinks (measured: the validated unfused path shows the SAME
        # deviations) — tolerance is scale-aware: 12% of the component or
        # 3% of the gradient's max magnitude, whichever is larger.
        xi0, loss_fused, _ = self._loss_pair()
        g = np.asarray(jax.grad(loss_fused)(xi0))
        gmax = np.abs(g).max()
        eps = 1e-4
        for i in range(6):
            e = np.zeros(6)
            e[i] = eps
            fp = float(loss_fused(xi0 + jnp.asarray(e)))
            fm = float(loss_fused(xi0 - jnp.asarray(e)))
            fd = (fp - fm) / (2 * eps)
            tol = max(0.12 * abs(fd), 0.03 * gmax)
            assert abs(g[i] - fd) < tol, (i, g[i], fd)


class TestBandOnlyBackward:
    def test_grad_close_to_exact(self):
        # Band-only drops internal-edge gradient pairs that cancel in pose
        # space — the pose gradient must match the exact backward closely.
        Tc, lp, K = _poses()
        rb = _renderer(CFG._replace(bwd_band_only=True), cull=True)
        re_ = _renderer(CFG, cull=True)
        target = jnp.asarray(np.asarray(re_.silhouette(Tc, lp, K)))
        xi0 = se3.log(Tc) + jnp.asarray(
            [0.004, -0.003, 0.002, 0.003, -0.002, 0.004]
        )

        def loss(r):
            def f(x):
                img = r.silhouette(se3.exp(x), lp, K)
                return jnp.mean(jnp.sum((img - target) ** 2, axis=(-2, -1)))

            return f

        vb, gb = jax.value_and_grad(loss(rb))(xi0)
        ve, ge = jax.value_and_grad(loss(re_))(xi0)
        np.testing.assert_allclose(float(vb), float(ve), rtol=1e-6)
        gb, ge = np.asarray(gb), np.asarray(ge)
        scale = np.abs(ge).max()
        # cancellation is exact away from clips/vertices; crumbs stay small
        assert np.abs(gb - ge).max() < 0.05 * scale, (gb, ge)

    def test_loss_kernel_band_only_grad_close_to_exact(self):
        # The fused LOSS kernel threads band_only too (same cancellation
        # argument); value must be identical, pose grad close to exact.
        from easyhec_tpu.models.calib import mask_loss, tile_masks

        Tc, lp, K = _poses()
        rb = _renderer(CFG._replace(bwd_band_only=True), cull=True)
        re_ = _renderer(CFG, cull=True)
        target = np.asarray(re_.silhouette(Tc, lp, K))
        xi0 = se3.log(Tc) + jnp.asarray(
            [0.004, -0.003, 0.002, 0.003, -0.002, 0.004]
        )

        def loss(r):
            rt = tile_masks(target, r)
            return lambda x: mask_loss(x, r, lp, K, jnp.asarray(target),
                                       ref_tiles=rt)

        vb, gb = jax.value_and_grad(loss(rb))(xi0)
        ve, ge = jax.value_and_grad(loss(re_))(xi0)
        np.testing.assert_allclose(float(vb), float(ve), rtol=1e-6)
        gb, ge = np.asarray(gb), np.asarray(ge)
        scale = np.abs(ge).max()
        assert np.abs(gb - ge).max() < 0.05 * scale, (gb, ge)

    def test_band_only_convergence(self):
        from easyhec_tpu.models.calib import calibrate

        Tc, lp, K = _poses()
        r = _renderer(CFG._replace(bwd_band_only=True), cull=True)
        target = r.silhouette(Tc, lp, K)
        init = np.asarray(se3.log(Tc)) + np.asarray(
            [0.02, -0.02, 0.03, 0.02, -0.01, 0.02]
        )
        res = calibrate(
            init, r, lp, K, target, num_steps=150, max_lr=3e-3,
            rebin_every=10, Tc_c2b_gt=np.asarray(Tc),
        )
        assert res.losses[-1] < 0.1 * res.losses[0]
        assert res.metrics["err_trans_geodesic_cm"] < 1.5
        assert res.metrics["err_rot_geodesic_deg"] < 1.0


class TestFusedLossKernel:
    """pose_tile_loss: the loss+gradient fused kernel must match the
    unfused silhouette-then-loss pipeline exactly (value and pose grad)."""

    @pytest.mark.parametrize(
        "hw", [(64, 64), pytest.param((50, 70), marks=pytest.mark.slow)]
    )
    def test_loss_and_grad_match_unfused(self, hw):
        from easyhec_tpu.models.calib import mask_loss

        H, W = hw
        Tc, lp, K = _poses()
        rf = _renderer(CFG, H=H, W=W)
        rc = _renderer(CFG_REF, H=H, W=W)
        target = jnp.asarray(np.asarray(rc.silhouette(Tc, lp, K)))
        xi0 = se3.log(Tc) + jnp.asarray(
            [0.004, -0.003, 0.002, 0.003, -0.002, 0.004]
        )
        lf = lambda x: mask_loss(x, rf, lp, K, target)
        lr = lambda x: mask_loss(x, rc, lp, K, target)
        vf, gf = jax.value_and_grad(lf)(xi0)
        vr, gr = jax.value_and_grad(lr)(xi0)
        np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
        gf, gr = np.asarray(gf), np.asarray(gr)
        scale = np.abs(gr).max()
        np.testing.assert_allclose(gf, gr, atol=2e-3 * scale, rtol=2e-3)

    @pytest.mark.slow
    def test_robust_delta_matches(self):
        from easyhec_tpu.models.calib import mask_loss

        Tc, lp, K = _poses()
        rf = _renderer(CFG)
        rc = _renderer(CFG_REF)
        target = jnp.asarray(np.asarray(rc.silhouette(Tc, lp, K)))
        xi0 = se3.log(Tc) + jnp.asarray(
            [0.01, -0.01, 0.01, 0.01, -0.01, 0.01]
        )
        for delta in (0.05, 0.3):
            vf, gf = jax.value_and_grad(
                lambda x: mask_loss(x, rf, lp, K, target, robust_delta=delta)
            )(xi0)
            vr, gr = jax.value_and_grad(
                lambda x: mask_loss(x, rc, lp, K, target, robust_delta=delta)
            )(xi0)
            np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
            scale = np.abs(np.asarray(gr)).max()
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), atol=2e-3 * scale, rtol=2e-3
            )

    def test_pretiled_ref_matches(self):
        from easyhec_tpu.models.calib import mask_loss, tile_masks

        Tc, lp, K = _poses()
        rf = _renderer(CFG)
        target = jnp.asarray(np.asarray(rf.silhouette(Tc, lp, K)))
        ref_tiles = tile_masks(target, rf)
        assert ref_tiles is not None
        xi0 = se3.log(Tc) + jnp.asarray(
            [0.004, -0.003, 0.002, 0.003, -0.002, 0.004]
        )
        va = float(mask_loss(xi0, rf, lp, K, target))
        vb = float(mask_loss(xi0, rf, lp, K, target, ref_tiles=ref_tiles))
        np.testing.assert_allclose(va, vb, rtol=1e-6)

    def test_state_reuse(self):
        from easyhec_tpu.models.calib import mask_loss

        Tc, lp, K = _poses()
        rf = _renderer(CFG)
        target = jnp.asarray(np.asarray(rf.silhouette(Tc, lp, K)))
        state = rf.bin_state(Tc, lp, K)
        xi0 = se3.log(Tc)
        va = float(mask_loss(xi0, rf, lp, K, target, bin_state=state))
        vb = float(mask_loss(xi0, rf, lp, K, target))
        np.testing.assert_allclose(va, vb, rtol=1e-6)
        assert va < 1e-6  # perfectly aligned


class TestFusedCalibrate:
    def test_convergence(self):
        from easyhec_tpu.models.calib import calibrate

        Tc, lp, K = _poses()
        rf = _renderer(CFG)
        target = rf.silhouette(Tc, lp, K)
        gt_xi = se3.log(Tc)
        init = np.asarray(gt_xi) + np.asarray(
            [0.02, -0.02, 0.03, 0.02, -0.01, 0.02]
        )
        res = calibrate(
            init, rf, lp, K, target, num_steps=150, max_lr=3e-3,
            rebin_every=10, Tc_c2b_gt=np.asarray(Tc),
        )
        assert res.losses[-1] < 0.1 * res.losses[0]
        assert res.metrics["err_trans_geodesic_cm"] < 1.5
        assert res.metrics["err_rot_geodesic_deg"] < 1.0
