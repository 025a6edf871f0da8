"""nvdiffrast-semantics parity harness (BASELINE.md render-parity target).

The reference renders silhouettes as dr.rasterize (hard pixel-center
coverage) -> dr.interpolate (constant white) -> dr.antialias (edge pixels
blended by the signed distance of the silhouette edge to the pixel center)
— easyhec/structures/nvdiffrast_renderer.py:39-47. nvdiffrast itself cannot
run here (CUDA), so parity is established against an independent NUMPY
oracle implementing exactly those semantics, plus structural checks:

1. hard coverage (pixel-center inside test) == our soft coverage outside
   the 1-px antialias band, and == sharpness→∞ limit of the soft mode;
2. inside the band, our soft coverage IS the antialias blend
   clamp(0.5 + d_edge, 0, 1) for silhouette edges (single-triangle oracle);
3. projection conventions: OpenCV pinhole at pixel centers (u = fx·x/z +
   cx sampled at px+0.5), no vertical flip, near/far = 0.001/10.

See PARITY.md for the full mapping.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from easyhec_tpu.geometry import camera
from easyhec_tpu.render.projection import Triangles2D
from easyhec_tpu.render.raster_jnp import silhouette_bruteforce
from easyhec_tpu.render.tiled import TileConfig, silhouette_tiled

CFG = TileConfig(16, 32, 64)


def numpy_hard_coverage(uv, H, W):
    """Oracle: pixel-center-inside test (dr.rasterize semantics for a
    silhouette: a pixel is covered iff its center is inside any triangle)."""
    ys, xs = np.mgrid[0:H, 0:W]
    px = xs + 0.5
    py = ys + 0.5
    out = np.zeros((H, W), bool)
    for tri in np.asarray(uv):
        cov = np.ones((H, W), bool)
        area = 0.0
        for i in range(3):
            x0, y0 = tri[i]
            x1, y1 = tri[(i + 1) % 3]
            area += x0 * y1 - x1 * y0
        sgn = 1.0 if area >= 0 else -1.0
        for i in range(3):
            x0, y0 = tri[i]
            x1, y1 = tri[(i + 1) % 3]
            d = (px - x0) * (y1 - y0) - (py - y0) * (x1 - x0)
            cov &= (-sgn * d) >= 0
        out |= cov
    return out.astype(np.float32)


def numpy_antialias_coverage(tri, H, W):
    """Oracle for ONE triangle: dr.antialias blend semantics — coverage =
    clamp(0.5 + signed_distance_to_boundary, 0, 1) with distance in pixels
    (positive inside). Distance to the boundary = min over normalized edge
    functions (exact for convex triangles near edges)."""
    ys, xs = np.mgrid[0:H, 0:W]
    px = xs + 0.5
    py = ys + 0.5
    area = 0.0
    for i in range(3):
        x0, y0 = tri[i]
        x1, y1 = tri[(i + 1) % 3]
        area += x0 * y1 - x1 * y0
    sgn = 1.0 if area >= 0 else -1.0
    dmin = None
    for i in range(3):
        x0, y0 = tri[i]
        x1, y1 = tri[(i + 1) % 3]
        nrm = max(np.hypot(x1 - x0, y1 - y0), 1e-12)
        d = -sgn * ((px - x0) * (y1 - y0) - (py - y0) * (x1 - x0)) / nrm
        dmin = d if dmin is None else np.minimum(dmin, d)
    return np.clip(0.5 + dmin, 0.0, 1.0).astype(np.float32)


def _tris(uv):
    uv = jnp.asarray(uv, jnp.float32)
    n = uv.shape[0]
    return Triangles2D(
        uv=uv, z=jnp.ones((n, 3)), valid=jnp.ones((n,), bool)
    )


class TestHardSoftRelation:
    def _scene(self, seed=0, n=12, H=48, W=64):
        rng = np.random.default_rng(seed)
        centers = rng.uniform(5, min(H, W) - 5, (n, 1, 2))
        uv = centers + rng.normal(0, 7, (n, 3, 2))
        return uv, H, W

    def test_soft_equals_hard_outside_band(self):
        uv, H, W = self._scene()
        soft = np.asarray(silhouette_bruteforce(_tris(uv), H, W, 1.0))
        hard = numpy_hard_coverage(uv, H, W)
        band = (soft > 0.0) & (soft < 1.0)
        # Outside the open band the soft rasterizer is bit-hard
        np.testing.assert_array_equal(soft[~band], hard[~band])
        # And the band is thin: ~1 px around silhouette boundaries
        assert band.mean() < 0.25

    def test_sharpness_limit_is_hard(self):
        uv, H, W = self._scene(seed=3)
        sharp = np.asarray(silhouette_bruteforce(_tris(uv), H, W, 1e7))
        hard = numpy_hard_coverage(uv, H, W)
        # Pixel centers exactly on an edge (measure zero) may differ
        assert (sharp != hard).mean() < 1e-3

    def test_tiled_matches_brute(self):
        uv, H, W = self._scene(seed=5)
        a = np.asarray(silhouette_bruteforce(_tris(uv), H, W, 1.0))
        b = np.asarray(silhouette_tiled(_tris(uv), H, W, CFG, 1.0))
        np.testing.assert_allclose(a, b, atol=1e-4)


class TestAntialiasBlend:
    def test_single_triangle_band_is_aa_blend(self):
        # One convex triangle: our soft coverage must equal the antialias
        # blend oracle everywhere (away from vertex corners, where the
        # min-of-edge-lines distance differs from true euclidean distance
        # by design — nvdiffrast AA only handles edge crossings either).
        tri = np.array([[10.3, 8.2], [52.7, 14.9], [30.1, 40.6]])
        H, W = 48, 64
        ours = np.asarray(silhouette_bruteforce(_tris(tri[None]), H, W, 1.0))
        oracle = numpy_antialias_coverage(tri, H, W)
        # mask out 2-px disks at the vertices
        ys, xs = np.mgrid[0:H, 0:W]
        keep = np.ones((H, W), bool)
        for (vx, vy) in tri:
            keep &= (xs + 0.5 - vx) ** 2 + (ys + 0.5 - vy) ** 2 > 4.0
        np.testing.assert_allclose(ours[keep], oracle[keep], atol=1e-5)
        # and the band really interpolates (not all 0/1)
        band = (oracle > 0) & (oracle < 1)
        assert band.sum() > 50

    def test_shared_internal_edge_is_seamless(self):
        # Two triangles sharing an edge (a split quad): coverages sum to
        # exactly 1 across the shared edge -> the union shows no seam and
        # no band, exactly like rasterize+antialias on a closed silhouette.
        quad = np.array(
            [
                [[10.0, 10.0], [50.0, 12.0], [48.0, 38.0]],
                [[10.0, 10.0], [48.0, 38.0], [12.0, 36.0]],
            ]
        )
        H, W = 48, 64
        ours = np.asarray(silhouette_bruteforce(_tris(quad), H, W, 1.0))
        # interior: strictly 1 in a region crossing the shared edge
        assert ours[24, 30] == 1.0
        interior = ours[14:32, 16:42]
        assert (interior == 1.0).mean() > 0.97


class TestProjectionConventions:
    def test_opencv_pixel_centers_no_flip(self):
        # A point at (x, y, z) in camera frame lands at u = fx·x/z + cx,
        # v = fy·y/z + cy in OPENCV pixel coordinates (y down, NO vertical
        # flip — the reference's GL pipeline flips twice and lands in the
        # same convention, nvdiffrast_renderer.py:47).
        from easyhec_tpu.render.projection import setup_triangles

        K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        # small triangle around camera-frame point (0.1, 0.05, 1.0)
        verts = jnp.asarray(
            [[0.1, 0.05, 1.0], [0.12, 0.05, 1.0], [0.1, 0.08, 1.0]]
        )
        tris = setup_triangles(verts, jnp.asarray([[0, 1, 2]]), K)
        uv = np.asarray(tris.uv)[0]
        np.testing.assert_allclose(uv[0], [42.0, 29.0], atol=1e-4)
        np.testing.assert_allclose(uv[1], [44.0, 29.0], atol=1e-4)
        np.testing.assert_allclose(uv[2], [42.0, 32.0], atol=1e-4)

    def test_near_far_culling(self):
        from easyhec_tpu.render.projection import setup_triangles

        K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        faces = jnp.asarray([[0, 1, 2]])
        # behind the camera -> culled
        behind = jnp.asarray(
            [[0.0, 0.0, -1.0], [0.1, 0.0, -1.0], [0.0, 0.1, -1.0]]
        )
        t = setup_triangles(behind, faces, K)
        assert not bool(np.asarray(t.valid)[0])
        # beyond far (10.0) -> culled
        far = jnp.asarray(
            [[0.0, 0.0, 20.0], [0.5, 0.0, 20.0], [0.0, 0.5, 20.0]]
        )
        t = setup_triangles(far, faces, K)
        assert not bool(np.asarray(t.valid)[0])
        # inside the frustum -> kept
        ok = jnp.asarray([[0.0, 0.0, 1.0], [0.1, 0.0, 1.0], [0.0, 0.1, 1.0]])
        t = setup_triangles(ok, faces, K)
        assert bool(np.asarray(t.valid)[0])


class TestGradientParity:
    def test_band_gradient_matches_aa_blend_fd(self):
        # The pose/vertex gradient of our soft silhouette equals the finite
        # difference of the ANTIALIAS ORACLE for a single triangle — i.e.
        # our analytic VJP implements the AA edge gradient.
        tri0 = np.array([[12.0, 9.0], [50.0, 15.0], [28.0, 40.0]])
        H, W = 48, 64
        target = np.zeros((H, W), np.float32)

        def loss_ours(uv):
            img = silhouette_bruteforce(_tris(uv[None]), H, W, 1.0)
            return jnp.sum((img - target) ** 2)

        g = np.asarray(jax.grad(loss_ours)(jnp.asarray(tri0, jnp.float32)))

        def loss_oracle(tri):
            img = numpy_antialias_coverage(tri, H, W)
            return float(np.sum((img - target) ** 2))

        eps = 1e-3
        for i in range(3):
            for j in range(2):
                tp = tri0.copy()
                tp[i, j] += eps
                tm = tri0.copy()
                tm[i, j] -= eps
                fd = (loss_oracle(tp) - loss_oracle(tm)) / (2 * eps)
                assert abs(g[i, j] - fd) < 0.05 * max(abs(fd), 1.0), (
                    i, j, g[i, j], fd,
                )
