import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyhec_tpu.geometry import camera, se3, so3


def random_rotations(key, n):
    """Uniform-ish random rotations via QR of gaussian matrices."""
    A = jax.random.normal(key, (n, 3, 3))
    Q, R = jnp.linalg.qr(A)
    # Fix signs so det=+1
    d = jnp.sign(jnp.diagonal(R, axis1=-2, axis2=-1))
    Q = Q * d[:, None, :]
    det = jnp.linalg.det(Q)
    Q = Q.at[:, :, 0].multiply(jnp.sign(det)[:, None])
    return Q


class TestSO3:
    def test_exp_identity(self):
        R = so3.exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-7)

    def test_exp_known_axis(self):
        R = so3.exp(jnp.array([0.0, 0.0, np.pi / 2]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_log_exp_roundtrip(self):
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (64, 3)) * 0.7  # keep |w| < π for principal value
        norms = np.linalg.norm(np.asarray(w), axis=-1)
        assert norms.max() < np.pi
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(w, w2, atol=2e-5)

    def test_log_exp_large_angle_rotation_match(self):
        # |w| > π: log returns the principal twist; rotations must still match.
        key = jax.random.PRNGKey(3)
        w = jax.random.normal(key, (32, 3)) * 2.0
        R = so3.exp(w)
        R2 = so3.exp(so3.log(R))
        # f32 arccos conditioning degrades near θ=π — 3e-4 is the f32 floor there
        np.testing.assert_allclose(R, R2, atol=3e-4)

    def test_exp_log_roundtrip_random_R(self):
        R = random_rotations(jax.random.PRNGKey(1), 64)
        R2 = so3.exp(so3.log(R))
        np.testing.assert_allclose(R, R2, atol=1e-5)

    @pytest.mark.parametrize("theta", [1e-9, 1e-6, 1e-4, 0.1, 3.0, np.pi - 1e-6, np.pi])
    def test_extreme_angles(self, theta):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        w = jnp.asarray(theta * axis, dtype=jnp.float32)
        R = so3.exp(w)
        w2 = so3.log(R)
        R2 = so3.exp(w2)
        # Compare rotations (not vectors: at θ=π, ±axis both valid)
        np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_grad_at_identity_finite(self):
        g = jax.grad(lambda w: jnp.sum(so3.exp(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(g))

    def test_geodesic(self):
        R1 = so3.exp(jnp.array([0.0, 0.0, 0.1]))
        R2 = so3.exp(jnp.array([0.0, 0.0, 0.5]))
        np.testing.assert_allclose(so3.geodesic_distance(R1, R2), 0.4, atol=1e-5)


class TestSE3:
    def test_exp_identity(self):
        T = se3.exp(jnp.zeros(6))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-7)

    def test_pure_translation(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
        T = se3.exp(xi)
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)

    def test_log_exp_roundtrip(self):
        key = jax.random.PRNGKey(2)
        xi = jax.random.normal(key, (64, 6))
        xi = xi.at[:, 3:].multiply(0.6)  # keep |w| < π for principal value
        assert np.linalg.norm(np.asarray(xi[:, 3:]), axis=-1).max() < np.pi
        xi2 = se3.log(se3.exp(xi))
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_inverse(self):
        xi = jnp.array([0.1, -0.2, 0.3, 0.4, -0.5, 0.6])
        T = se3.exp(xi)
        np.testing.assert_allclose(T @ se3.inverse(T), np.eye(4), atol=1e-6)

    def test_transform_points(self):
        T = se3.exp(jnp.array([0.0, 0.0, 1.0, 0.0, 0.0, jnp.pi / 2]))
        pts = jnp.array([[1.0, 0.0, 0.0]])
        out = se3.transform_points(T, pts)
        np.testing.assert_allclose(out, [[0.0, 1.0, 1.0]], atol=1e-6)

    def test_batch_shapes(self):
        xi = jnp.zeros((4, 5, 6))
        assert se3.exp(xi).shape == (4, 5, 4, 4)
        assert se3.log(se3.exp(xi)).shape == (4, 5, 6)

    def test_jit_grad(self):
        f = jax.jit(jax.grad(lambda xi: jnp.sum(se3.exp(xi) ** 2)))
        g = f(jnp.array([0.1, 0.2, 0.3, 0.01, 0.02, 0.03]))
        assert np.all(np.isfinite(g))
        # finite-difference check
        xi0 = np.array([0.1, 0.2, 0.3, 0.01, 0.02, 0.03], dtype=np.float64)
        fn = lambda x: float(jnp.sum(se3.exp(jnp.asarray(x, dtype=jnp.float32)) ** 2))
        eps = 1e-4
        for i in range(6):
            d = np.zeros(6)
            d[i] = eps
            fd = (fn(xi0 + d) - fn(xi0 - d)) / (2 * eps)
            assert abs(fd - g[i]) < 1e-2, (i, fd, g[i])


class TestCamera:
    def test_project_center(self):
        K = jnp.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
        uv, z = camera.project_points(K, jnp.array([[0.0, 0.0, 2.0]]))
        np.testing.assert_allclose(uv, [[320.0, 240.0]], atol=1e-5)
        np.testing.assert_allclose(z, [2.0])

    def test_look_at(self):
        eye = jnp.array([0.0, 0.0, 2.0])
        target = jnp.zeros(3)
        up = jnp.array([0.0, 1.0, 0.0])
        T = camera.look_at(eye, target, up)
        # Forward (+z cam) should point from eye to target = -z world
        np.testing.assert_allclose(T[:3, 2], [0, 0, -1], atol=1e-6)
        np.testing.assert_allclose(T[:3, 3], eye, atol=1e-6)
        # Rotation orthonormal
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)

    def test_ring_poses(self):
        poses = camera.ring_poses(8, radius=1.0, height=0.5)
        assert poses.shape == (8, 4, 4)
        # All cameras look at origin: origin in camera frame has x,y ≈ 0, z>0
        from easyhec_tpu.geometry import se3 as se3m

        for i in range(8):
            w2c = se3m.inverse(poses[i])
            origin_cam = se3m.transform_points(w2c, jnp.zeros((1, 3)))[0]
            assert abs(float(origin_cam[0])) < 1e-5
            assert abs(float(origin_cam[1])) < 1e-5
            assert float(origin_cam[2]) > 0
