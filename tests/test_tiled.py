import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyhec_tpu.geometry import se3
from easyhec_tpu.render import (
    RobotRenderer,
    TileConfig,
    depth_bruteforce,
    depth_tiled,
    silhouette_bruteforce,
    silhouette_tiled,
)
from easyhec_tpu.render.projection import Triangles2D
from easyhec_tpu.robot import make_box, make_cylinder

CFG = TileConfig(tile_h=16, tile_w=32, capacity=64)


def random_scene(key, n_tris, H, W, batch=()):
    """Random screen-space triangles across the image."""
    k1, k2, k3 = jax.random.split(key, 3)
    centers = jax.random.uniform(
        k1, batch + (n_tris, 1, 2), minval=-10, maxval=max(H, W) + 10
    )
    offsets = jax.random.normal(k2, batch + (n_tris, 3, 2)) * 8.0
    uv = centers + offsets
    z = jax.random.uniform(k3, batch + (n_tris, 3), minval=0.5, maxval=3.0)
    valid = jnp.ones(batch + (n_tris,), bool)
    return Triangles2D(uv=uv, z=z, valid=valid)


class TestTiledVsBrute:
    def test_silhouette_matches(self):
        tris = random_scene(jax.random.PRNGKey(0), 50, 48, 96)
        a = np.asarray(silhouette_bruteforce(tris, 48, 96))
        b = np.asarray(silhouette_tiled(tris, 48, 96, CFG))
        np.testing.assert_allclose(a, b, atol=1e-4)

    @pytest.mark.slow
    def test_silhouette_batched_matches(self):
        tris = random_scene(jax.random.PRNGKey(1), 30, 48, 96, batch=(3,))
        a = np.asarray(silhouette_bruteforce(tris, 48, 96))
        b = np.asarray(silhouette_tiled(tris, 48, 96, CFG))
        assert b.shape == (3, 48, 96)
        np.testing.assert_allclose(a, b, atol=1e-4)

    @pytest.mark.slow
    def test_xla_path_chunked_matches_brute(self):
        # cap > 256 and n_tiles > 64 cross both memory-bounding branches of
        # the XLA fallback (record-chunk scan + tile-block map). Forward must
        # equal the brute reference; the gradient oracle for the chunked
        # branches is the UNCHUNKED tiled path (cap<=256) on the same scene,
        # which is mathematically identical (the scan only reorders the
        # coverage sum) — vs brute, tiled picks a different subgradient at
        # bbox-distance min-ties (~0.5% here), which is a pre-existing,
        # documented semantics difference, not a chunking bug.
        H, W = 144, 160  # 9x10 = 90 tiles at 16x16
        cfg = TileConfig(tile_h=16, tile_w=16, capacity=512, use_pallas=False)
        cfg_ref = TileConfig(
            tile_h=16, tile_w=16, capacity=256, use_pallas=False
        )
        tris = random_scene(jax.random.PRNGKey(7), 300, H, W)
        a = np.asarray(silhouette_bruteforce(tris, H, W))
        b, ov = silhouette_tiled(tris, H, W, cfg, return_overflow=True)
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-4)
        _, ov_ref = silhouette_tiled(tris, H, W, cfg_ref, return_overflow=True)
        assert not bool(ov) and not bool(ov_ref)  # oracle must be lossless

        def loss(render):
            def f(duv):
                t = Triangles2D(uv=tris.uv + duv, z=tris.z, valid=tris.valid)
                return jnp.sum(render(t) ** 2)

            return f

        g_b = np.asarray(
            jax.grad(loss(lambda t: silhouette_bruteforce(t, H, W)))(
                jnp.zeros(2)
            )
        )
        g_t = np.asarray(
            jax.grad(loss(lambda t: silhouette_tiled(t, H, W, cfg)))(
                jnp.zeros(2)
            )
        )
        g_ref = np.asarray(
            jax.grad(loss(lambda t: silhouette_tiled(t, H, W, cfg_ref)))(
                jnp.zeros(2)
            )
        )
        # chunked == unchunked exactly (verified bit-identical on CPU)
        np.testing.assert_allclose(g_ref, g_t, rtol=1e-6, atol=1e-7)
        # and both stay within the known subgradient envelope of brute
        # (measured 2.24% here; 5% matches TestBandOnlyBackward's envelope)
        np.testing.assert_allclose(g_b, g_t, rtol=5e-2, atol=1e-3)

    def test_depth_matches(self):
        tris = random_scene(jax.random.PRNGKey(2), 40, 48, 96)
        az, aid = depth_bruteforce(tris, 48, 96)
        bz, bid = depth_tiled(tris, 48, 96, CFG)
        np.testing.assert_allclose(np.asarray(az), np.asarray(bz), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(aid), np.asarray(bid))

    def test_non_multiple_image_size(self):
        # H, W not multiples of the tile size: cropping must be exact
        tris = random_scene(jax.random.PRNGKey(3), 25, 37, 53)
        a = np.asarray(silhouette_bruteforce(tris, 37, 53))
        b = np.asarray(silhouette_tiled(tris, 37, 53, CFG))
        assert b.shape == (37, 53)
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_overflow_flag(self):
        # 100 triangles all stacked on one tile with capacity 64 -> overflow
        uv = jnp.tile(jnp.asarray([[[2.0, 2], [14, 2], [8, 14]]]), (100, 1, 1))
        tris = Triangles2D(
            uv=uv, z=jnp.ones((100, 3)), valid=jnp.ones((100,), bool)
        )
        _, ov = silhouette_tiled(tris, 48, 96, CFG, return_overflow=True)
        assert bool(ov)
        tris_small = Triangles2D(
            uv=uv[:10], z=jnp.ones((10, 3)), valid=jnp.ones((10,), bool)
        )
        _, ov2 = silhouette_tiled(tris_small, 48, 96, CFG, return_overflow=True)
        assert not bool(ov2)

    @pytest.mark.slow
    def test_gradient_matches_brute(self):
        tris = random_scene(jax.random.PRNGKey(4), 20, 48, 96)
        target = jnp.zeros((48, 96))

        def loss_brute(uv):
            t = tris._replace(uv=uv)
            return jnp.sum((silhouette_bruteforce(t, 48, 96) - target) ** 2)

        def loss_tiled(uv):
            t = tris._replace(uv=uv)
            return jnp.sum((silhouette_tiled(t, 48, 96, CFG) - target) ** 2)

        ga = jax.grad(loss_brute)(tris.uv)
        gb = jax.grad(loss_tiled)(tris.uv)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-3)
        assert np.abs(np.asarray(ga)).max() > 0


class TestSpanClassedBinning:
    """bin_big_k > 0: span-classed enumeration must be exact vs dense."""

    CFG_BIG = TileConfig(
        tile_h=16, tile_w=32, capacity=64, binner="count", bin_big_k=64
    )

    def test_silhouette_matches_brute(self):
        tris = random_scene(jax.random.PRNGKey(7), 50, 48, 96)
        a = np.asarray(silhouette_bruteforce(tris, 48, 96))
        b = np.asarray(silhouette_tiled(tris, 48, 96, self.CFG_BIG))
        np.testing.assert_allclose(a, b, atol=1e-4)

    @pytest.mark.slow
    def test_gradient_matches_dense(self):
        # The q transpose map (pack backward) must stay exact with the
        # classed layout (base columns + scattered big-window columns).
        tris = random_scene(jax.random.PRNGKey(8), 30, 48, 96)
        target = jnp.zeros((48, 96))
        dense = TileConfig(tile_h=16, tile_w=32, capacity=64, binner="count")

        def loss(cfg):
            def f(uv):
                t = tris._replace(uv=uv)
                return jnp.sum((silhouette_tiled(t, 48, 96, cfg) - target) ** 2)

            return f

        ga = jax.grad(loss(dense))(tris.uv)
        gb = jax.grad(loss(self.CFG_BIG))(tris.uv)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4)
        assert np.abs(np.asarray(ga)).max() > 0

    def test_big_k_overflow_flag(self):
        # More wide triangles than big_k slots -> overflow reported.
        n = 12
        base = jnp.asarray([[[2.0, 2], [90.0, 2], [45.0, 30.0]]])  # spans cols
        uv = jnp.tile(base, (n, 1, 1)) + jnp.arange(n).reshape(n, 1, 1) * 0.5
        tris = Triangles2D(
            uv=uv, z=jnp.ones((n, 3)), valid=jnp.ones((n,), bool)
        )
        cfg = self.CFG_BIG._replace(bin_big_k=4, capacity=32)
        _, ov = silhouette_tiled(tris, 48, 96, cfg, return_overflow=True)
        assert bool(ov)


class TestRobotRenderer:
    def _renderer(self, mode):
        meshes = [
            make_box((0.15, 0.15, 0.3)),
            make_cylinder(0.05, 0.4, sections=12),
        ]
        return RobotRenderer(meshes, H=64, W=64, tile=CFG, mode=mode)

    def _poses(self):
        # Two "links": one at base origin, one 0.3m up
        link_poses = jnp.stack(
            [jnp.eye(4), jnp.eye(4).at[2, 3].set(0.3)]
        )  # [L, 4, 4]
        Tc_c2b = jnp.eye(4).at[2, 3].set(1.2)  # base 1.2m in front of camera
        K = jnp.asarray([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])
        return Tc_c2b, link_poses, K

    @pytest.mark.parametrize("mode", ["brute", "tiled"])
    def test_silhouette_modes_agree(self, mode):
        r = self._renderer(mode)
        Tc, lp, K = self._poses()
        img = np.asarray(r.silhouette(Tc, lp, K))
        assert img.shape == (64, 64)
        assert img.max() == 1.0
        if mode == "tiled":
            r2 = self._renderer("brute")
            np.testing.assert_allclose(
                img, np.asarray(r2.silhouette(Tc, lp, K)), atol=1e-5
            )

    def test_batched_frames(self):
        r = self._renderer("tiled")
        Tc, lp, K = self._poses()
        lp_b = jnp.stack([lp, lp])  # [B=2, L, 4, 4]
        Tc_b = jnp.stack([Tc, Tc])
        imgs = r.silhouette(Tc_b, lp_b, K)
        assert imgs.shape == (2, 64, 64)
        np.testing.assert_allclose(np.asarray(imgs[0]), np.asarray(imgs[1]))

    def test_depth_and_link_id(self):
        r = self._renderer("tiled")
        Tc, lp, K = self._poses()
        z, link_id = r.depth(Tc, lp, K)
        z, link_id = np.asarray(z), np.asarray(link_id)
        hit = link_id >= 0
        assert hit.any()
        assert set(np.unique(link_id)) <= {-1, 0, 1}
        # Depth within plausible range: box spans z in [1.05, 1.35]
        assert z[hit].min() > 0.9 and z[hit].max() < 1.5

    def test_link_silhouettes_union(self):
        r = self._renderer("brute")
        Tc, lp, K = self._poses()
        per_link = r.link_silhouettes(Tc, lp, K)
        assert per_link.shape == (2, 64, 64)
        union_ref = np.asarray(r.silhouette(Tc, lp, K))
        union = np.clip(np.asarray(per_link).sum(0), 0, 1)
        # Union of per-link masks ≈ one-pass union (equal away from overlaps)
        assert (np.abs(union - union_ref) < 0.51).all()
        assert (np.abs(union - union_ref) < 1e-5).mean() > 0.98

    @pytest.mark.slow
    def test_pose_optimization_convergence(self):
        """End-to-end sanity: recover a pose offset with Adam (the reference's
        optimizer: Adam, constant lr 3e-3 — configs/xarm7/example.yaml:44)."""
        import optax

        r = self._renderer("brute")
        Tc, lp, K = self._poses()
        # A single near-frontal view is degenerate (x-translation vs y-rotation
        # ambiguity) — exactly why the reference does multi-pose space
        # exploration. Use 3 diverse link configurations to observe the pose.
        lp2 = lp.at[1, :3, :3].set(np.asarray(se3.exp(jnp.asarray([0, 0, 0, 0, 1.0, 0]))[:3, :3]))
        lp2 = lp2.at[1, :3, 3].set(jnp.asarray([0.2, 0.1, 0.25]))
        lp3 = lp.at[1, :3, 3].set(jnp.asarray([-0.25, 0.15, 0.1]))
        lp = jnp.stack([lp, lp2, lp3])  # [B=3, L, 4, 4]
        gt_xi = se3.log(Tc)
        target = r.silhouette(se3.exp(gt_xi), lp, K)
        opt = optax.adam(3e-3)

        @jax.jit
        def step(xi, opt_state):
            def loss(x):
                img = r.silhouette(se3.exp(x), lp, K)
                return jnp.sum((img - target) ** 2)

            v, g = jax.value_and_grad(loss)(xi)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(xi, updates), opt_state, v

        xi = gt_xi + jnp.asarray([0.03, -0.02, 0.04, 0.02, -0.01, 0.02])
        opt_state = opt.init(xi)
        losses = []
        for _ in range(200):
            xi, opt_state, v = step(xi, opt_state)
            losses.append(float(v))
        assert losses[-1] < 0.05 * losses[0], losses[::20]
        err = np.abs(np.asarray(xi - gt_xi))
        assert err[:3].max() < 0.01, err  # <1cm translation
        assert err[3:].max() < 0.01, err  # <0.6deg rotation
