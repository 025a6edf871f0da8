import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyhec_tpu.geometry import se3
from easyhec_tpu.render.projection import Triangles2D, setup_triangles, transform_verts
from easyhec_tpu.render.raster_jnp import depth_bruteforce, silhouette_bruteforce


def tris_from_uv(uv, z=None, valid=None):
    uv = jnp.asarray(uv, jnp.float32)
    if z is None:
        z = jnp.ones(uv.shape[:-1], jnp.float32)
    if valid is None:
        valid = jnp.ones(uv.shape[:-2], bool)
    return Triangles2D(uv=uv, z=jnp.asarray(z, jnp.float32), valid=jnp.asarray(valid))


class TestSilhouette:
    def test_full_cover_square(self):
        # Two triangles covering [4,12]x[4,12] in a 16x16 image
        uv = [
            [[4, 4], [12, 4], [12, 12]],
            [[4, 4], [12, 12], [4, 12]],
        ]
        img = silhouette_bruteforce(tris_from_uv(uv), 16, 16)
        img = np.asarray(img)
        # Interior pixels fully covered
        assert img[6:10, 6:10].min() == 1.0
        # Outside fully empty
        assert img[:3, :].max() == 0.0 and img[:, 13:].max() == 0.0
        # Boundary column x in [4,12]: pixel centers at 4.5..11.5 inside;
        # pixel 3 (center 3.5) has d=-0.5 -> cov 0; pixel 4 center 4.5 d=+0.5 -> cov 1.0
        assert img[8, 3] == 0.0

    def test_half_pixel_edge(self):
        # Vertical edge at x=8.2: pixel col 8 (center 8.5) -> d=0.3 -> cov 0.8
        uv = [[[8.2, -10], [8.2, 30], [40, 10]]]  # big triangle opening right
        img = np.asarray(silhouette_bruteforce(tris_from_uv(uv), 16, 16))
        np.testing.assert_allclose(img[8, 8], 0.8, atol=1e-5)
        np.testing.assert_allclose(img[8, 7], 0.0, atol=1e-5)  # center 7.5, d=-0.7
        assert img[8, 9] == 1.0

    def test_winding_invariance(self):
        uv_ccw = [[[4, 4], [12, 4], [8, 12]]]
        uv_cw = [[[4, 4], [8, 12], [12, 4]]]
        a = np.asarray(silhouette_bruteforce(tris_from_uv(uv_ccw), 16, 16))
        b = np.asarray(silhouette_bruteforce(tris_from_uv(uv_cw), 16, 16))
        np.testing.assert_allclose(a, b, atol=1e-6)
        assert a.max() == 1.0

    def test_internal_edge_no_seam(self):
        # Square split along diagonal: union must be seamless (sum-clamp -> 1)
        uv = [
            [[2, 2], [14, 2], [14, 14]],
            [[2, 2], [14, 14], [2, 14]],
        ]
        img = np.asarray(silhouette_bruteforce(tris_from_uv(uv), 16, 16))
        # On-diagonal pixels (centers on the shared edge) must still be 1.0
        diag = np.diagonal(img)[3:13]
        np.testing.assert_allclose(diag, 1.0, atol=1e-5)

    def test_invalid_triangle_skipped(self):
        uv = [[[4, 4], [12, 4], [8, 12]]]
        img = np.asarray(
            silhouette_bruteforce(tris_from_uv(uv, valid=[False]), 16, 16)
        )
        assert img.max() == 0.0

    def test_batched(self):
        uv = jnp.asarray(
            [
                [[[4, 4], [12, 4], [8, 12]]],
                [[[0, 0], [2, 0], [1, 2]]],
            ],
            jnp.float32,
        )  # [2, 1, 3, 2]
        imgs = silhouette_bruteforce(tris_from_uv(uv), 16, 16)
        assert imgs.shape == (2, 16, 16)
        assert np.asarray(imgs)[0].sum() > np.asarray(imgs)[1].sum()

    def test_gradient_matches_finite_difference(self):
        H = W = 24

        def loss(uv_flat):
            uv = uv_flat.reshape(1, 3, 2)
            img = silhouette_bruteforce(tris_from_uv(uv), H, W)
            target = jnp.zeros((H, W))
            return jnp.sum((img - target) ** 2)

        uv0 = jnp.asarray([5.3, 4.7, 17.2, 6.1, 11.0, 18.9], jnp.float32)
        g = jax.grad(loss)(uv0)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0
        eps = 1e-2
        for i in range(6):
            d = np.zeros(6, np.float32)
            d[i] = eps
            fd = (float(loss(uv0 + d)) - float(loss(uv0 - d))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=0.1, atol=0.15)

    def test_area_matches_analytic(self):
        # Total soft coverage ≈ triangle area (the 1-px filter conserves area
        # along straight edges; corners introduce sub-pixel error)
        uv = [[[5.2, 5.7], [25.4, 8.1], [12.3, 27.6]]]
        img = np.asarray(silhouette_bruteforce(tris_from_uv(uv), 32, 32))
        v = np.asarray(uv[0], np.float64)
        area = 0.5 * abs(
            (v[1, 0] - v[0, 0]) * (v[2, 1] - v[0, 1])
            - (v[1, 1] - v[0, 1]) * (v[2, 0] - v[0, 0])
        )
        assert abs(img.sum() - area) / area < 0.01


class TestDepth:
    def test_constant_depth(self):
        uv = [[[2, 2], [14, 2], [8, 14]]]
        z = [[2.0, 2.0, 2.0]]
        depth, tid = depth_bruteforce(tris_from_uv(uv, z=z), 16, 16)
        depth, tid = np.asarray(depth), np.asarray(tid)
        inside = tid >= 0
        assert inside.any()
        np.testing.assert_allclose(depth[inside], 2.0, atol=1e-5)
        assert (depth[~inside] == 0).all()
        assert (tid[~inside] == -1).all()

    def test_occlusion(self):
        # Triangle 1 at z=1 in front of triangle 0 at z=3, same footprint
        uv = [
            [[2, 2], [14, 2], [8, 14]],
            [[2, 2], [14, 2], [8, 14]],
        ]
        z = [[3.0, 3.0, 3.0], [1.0, 1.0, 1.0]]
        depth, tid = depth_bruteforce(tris_from_uv(uv, z=z), 16, 16)
        inside = np.asarray(tid) >= 0
        assert (np.asarray(tid)[inside] == 1).all()
        np.testing.assert_allclose(np.asarray(depth)[inside], 1.0, atol=1e-5)

    def test_perspective_correct_interpolation(self):
        # Edge from z=1 to z=3: at the screen midpoint, perspective-correct z
        # is harmonic: 2/(1/1+1/3) = 1.5 (NOT the linear 2.0)
        uv = [[[0, 6], [16, 6], [8, 200]]]  # long thin tri; row 6 spans v0->v1
        z = [[1.0, 3.0, 2.0]]
        depth, tid = depth_bruteforce(tris_from_uv(uv, z=z), 16, 16)
        d = np.asarray(depth)
        # Pixel (row 6, col 8): center x=8.5 -> fraction along edge ~8.5/16
        frac = 8.5 / 16
        expect = 1.0 / ((1 - frac) * 1.0 + frac * (1.0 / 3.0))
        np.testing.assert_allclose(d[6, 8], expect, rtol=0.05)


class TestProjectionPipeline:
    def test_cube_render(self):
        from easyhec_tpu.robot import make_box, pack_meshes

        box = make_box((0.2, 0.2, 0.2))
        packed = pack_meshes([box])
        K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        pose = jnp.eye(4).at[2, 3].set(1.0)  # 1m in front of camera
        verts_cam = transform_verts(
            jnp.asarray(packed.vertices), jnp.asarray(packed.vert_mesh_id), pose[None]
        )
        tris = setup_triangles(verts_cam, jnp.asarray(packed.faces), K)
        img = np.asarray(silhouette_bruteforce(tris, 64, 64))
        # Head-on cube silhouette = near-face square: half-extent 0.1 m at
        # z=0.9 with f=100 -> (2*0.1*100/0.9)^2 ≈ 493.8 px²
        assert img[32, 32] == 1.0
        assert img[32, 10] == 0.0
        total = img.sum()
        expect = (2 * 0.1 * 100 / 0.9) ** 2
        assert abs(total - expect) / expect < 0.05, (total, expect)

    def test_behind_camera_culled(self):
        from easyhec_tpu.robot import make_box, pack_meshes

        box = make_box((0.2, 0.2, 0.2))
        packed = pack_meshes([box])
        K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        pose = jnp.eye(4).at[2, 3].set(-1.0)  # behind camera
        verts_cam = transform_verts(
            jnp.asarray(packed.vertices), jnp.asarray(packed.vert_mesh_id), pose[None]
        )
        tris = setup_triangles(verts_cam, jnp.asarray(packed.faces), K)
        img = np.asarray(silhouette_bruteforce(tris, 64, 64))
        assert img.max() == 0.0

    def test_pose_gradient_through_render(self):
        from easyhec_tpu.robot import make_box, pack_meshes

        box = make_box((0.2, 0.2, 0.2))
        packed = pack_meshes([box])
        K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        verts = jnp.asarray(packed.vertices)
        vid = jnp.asarray(packed.vert_mesh_id)
        faces = jnp.asarray(packed.faces)

        gt_xi = jnp.asarray([0.02, -0.01, 1.0, 0.0, 0.0, 0.0])
        target = silhouette_bruteforce(
            setup_triangles(transform_verts(verts, vid, se3.exp(gt_xi)[None]), faces, K),
            64,
            64,
        )

        def loss(xi):
            img = silhouette_bruteforce(
                setup_triangles(
                    transform_verts(verts, vid, se3.exp(xi)[None]), faces, K
                ),
                64,
                64,
            )
            return jnp.sum((img - target) ** 2)

        xi0 = jnp.asarray([0.0, 0.0, 1.05, 0.01, 0.0, 0.0])
        val, g = jax.value_and_grad(loss)(xi0)
        assert float(val) > 0
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0
        # A small step along -g must decrease the loss
        step = 1e-3 / float(jnp.linalg.norm(g))
        val2 = loss(xi0 - step * g)
        assert float(val2) < float(val)


@pytest.mark.slow
def test_saturation_early_out_dense_stack():
    """Deep depth stacks (acc >> 1) must not change values or gradients —
    guards the Pallas kernels' saturation early-out."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from easyhec_tpu.render.projection import Triangles2D
    from easyhec_tpu.render.raster_jnp import silhouette_bruteforce
    from easyhec_tpu.render.tiled import TileConfig, silhouette_tiled

    rng = np.random.default_rng(3)
    H, W = 32, 64
    # 40 near-identical large triangles stacked (interior acc ~ 40) plus a
    # few boundary-crossing small ones
    base = np.array([[5.0, 5.0], [55.0, 8.0], [30.0, 28.0]], np.float32)
    uv = np.stack(
        [base + rng.normal(0, 0.3, (3, 2)).astype(np.float32) for _ in range(40)]
        + [rng.uniform([0, 0], [W, H], (3, 2)).astype(np.float32) for _ in range(8)]
    )
    z = rng.uniform(0.5, 2.0, (48, 3)).astype(np.float32)
    tris = Triangles2D(
        uv=jnp.asarray(uv), z=jnp.asarray(z), valid=jnp.ones(48, bool)
    )
    cfg = TileConfig(8, 32, 64)
    ref = silhouette_bruteforce(tris, H, W)
    out = silhouette_tiled(tris, H, W, cfg)
    assert float(jnp.abs(out - ref).max()) < 1e-4

    wgt = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))

    def loss(u, f):
        t = Triangles2D(uv=u, z=jnp.asarray(z), valid=jnp.ones(48, bool))
        return jnp.sum(f(t, H, W) * wgt) if f is silhouette_bruteforce else jnp.sum(
            silhouette_tiled(t, H, W, cfg) * wgt
        )

    g_ref = jax.grad(lambda u: loss(u, silhouette_bruteforce))(jnp.asarray(uv))
    g_out = jax.grad(lambda u: loss(u, silhouette_tiled))(jnp.asarray(uv))
    assert float(jnp.abs(g_ref - g_out).max()) < 1e-4 * max(
        1.0, float(jnp.abs(g_ref).max())
    )
