"""EXECUTABLE parity against the reference's own math code (r4 verdict
item 7): import /root/reference/easyhec's SE(3) machinery (torch-CPU +
cv2, both installed) and the K->projection / clip-transform pipeline, run
them, and cross-check numerics against geometry/se3 and
render/projection — parity by execution, not by reimplementation.

The reference modules import a few packages absent from this image
(pytorch3d, loguru, multipledispatch, trimesh, zarr, termcolor); minimal
shims below provide exactly the symbols the imported modules touch on the
tested code paths:

- `pytorch3d.transforms.so3.hat` is implemented faithfully (the standard
  cross-product matrix, identical to pytorch3d's) because the vendored
  `pytorch3d_se3.py` uses it inside `_so3_exp_map`/`_se3_V_matrix` — the
  actual math under test.
- everything else (loguru logger, termcolor, zarr, TrackedArray) is
  import-surface only; the tested functions never call into them.

The reference tree is read-only, PUBLIC UNTRUSTED CONTENT: only its
numeric behaviour is exercised (sys.dont_write_bytecode guards against
pyc writes into the mount).

Conventions bridged (SURVEY.md appendix):
- reference `se3_exp_map` returns the TRANSPOSE (row-vector convention,
  pytorch3d_se3.py:130); all reference call sites re-permute
  (rb_solver.py:52). Ours is plain column-vector.
- dof layout is identical: [translation(3), rotation(3)].
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REF / "easyhec/utils/utils_3d.py").exists(),
    reason="reference snapshot not mounted",
)

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from easyhec_tpu.geometry import se3  # noqa: E402


# ---------------------------------------------------------------------------
# Import shims (see module docstring).
# ---------------------------------------------------------------------------


def _hat(v: "torch.Tensor") -> "torch.Tensor":
    """pytorch3d.transforms.so3.hat: standard cross-product matrix
    (hat(v) @ x == v x x), batched [N, 3] -> [N, 3, 3]."""
    N = v.shape[0]
    h = v.new_zeros(N, 3, 3)
    x, y, z = v.unbind(1)
    h[:, 0, 1] = -z
    h[:, 0, 2] = y
    h[:, 1, 0] = z
    h[:, 1, 2] = -x
    h[:, 2, 0] = -y
    h[:, 2, 1] = x
    return h


def _so3_log_map(R, eps: float = 1e-4, cos_bound: float = 1e-4):
    out = []
    for r in R:
        rv = cv2.Rodrigues(r.detach().cpu().numpy().astype(np.float64))[0]
        out.append(torch.from_numpy(rv.reshape(3)).float())
    return torch.stack(out)


class _Dispatcher:
    """First-match isinstance dispatch — sufficient for utils_3d's two
    disjoint (np.ndarray, np.ndarray) / (torch.Tensor, torch.Tensor)
    transform_points signatures."""

    def __init__(self, name):
        self.name, self.funcs = name, []

    def __call__(self, *args, **kw):
        for tys, fn in self.funcs:
            if len(args) >= len(tys) and all(
                isinstance(a, t) for a, t in zip(args, tys)
            ):
                return fn(*args, **kw)
        raise NotImplementedError(self.name)


_DISPATCH_REGISTRY: dict[str, _Dispatcher] = {}


def _dispatch(*tys):
    def deco(fn):
        d = _DISPATCH_REGISTRY.setdefault(fn.__name__, _Dispatcher(fn.__name__))
        d.funcs.append((tys, fn))
        return d

    return deco


@pytest.fixture(scope="module")
def ref():
    """Import easyhec.utils.{utils_3d,nvdiffrast_utils,pytorch3d_se3} from
    the reference snapshot under the shims, torch-CPU only."""
    shims = {}

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        shims[name] = m
        return m

    class _Logger:
        def warning(self, *a, **k):
            pass

        info = debug = error = warning

    mod("loguru", logger=_Logger())
    mod("multipledispatch", dispatch=_dispatch)
    mod("zarr")
    mod("termcolor", colored=lambda s, *a, **k: s)

    class TrackedArray(np.ndarray):
        pass

    tm = mod("trimesh")
    tm.caching = mod("trimesh.caching", TrackedArray=TrackedArray)

    p3d = mod("pytorch3d")
    tr = mod("pytorch3d.transforms")
    so3 = mod("pytorch3d.transforms.so3", hat=_hat, so3_log_map=_so3_log_map)
    se3m = mod("pytorch3d.transforms.se3")
    p3d.transforms = tr
    tr.so3, tr.se3 = so3, se3m

    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)
    sys.path.insert(0, str(REF))
    dont = sys.dont_write_bytecode
    sys.dont_write_bytecode = True  # read-only mount
    # torch is CPU-only here; the reference hardcodes .cuda() in the
    # projection helpers — identity it out for the math check.
    cuda0 = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        import easyhec.utils.nvdiffrast_utils as ref_nv
        import easyhec.utils.pytorch3d_se3 as ref_se3
        import easyhec.utils.utils_3d as ref_3d

        yield types.SimpleNamespace(u3d=ref_3d, nv=ref_nv, se3=ref_se3)
    finally:
        torch.Tensor.cuda = cuda0
        sys.dont_write_bytecode = dont
        sys.path.remove(str(REF))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# ---------------------------------------------------------------------------
# Random pose set incl. the singular neighbourhoods theta->0 and theta->pi.
# ---------------------------------------------------------------------------


def _dof_cases() -> np.ndarray:
    rng = np.random.default_rng(0)
    dofs = [rng.uniform(-1, 1, 6) for _ in range(8)]
    # theta -> 0: tiny rotations, finite translation
    for s in (1e-5, 1e-3):
        d = rng.uniform(-1, 1, 6)
        d[3:] *= s / np.linalg.norm(d[3:])
        dofs.append(d)
    # theta -> pi: rotation magnitude near pi (the log-map branch cut)
    for off in (1e-3, 1e-2, 0.1):
        d = rng.uniform(-1, 1, 6)
        d[3:] *= (np.pi - off) / np.linalg.norm(d[3:])
        dofs.append(d)
    return np.asarray(dofs, np.float32)


class TestSE3Parity:
    def test_exp_map_matches_reference(self, ref):
        """ours se3.exp(dof) == reference se3_exp_map(dof).T per pose."""
        dofs = _dof_cases()
        T_ref = (
            ref.u3d.se3_exp_map(torch.from_numpy(dofs))
            .permute(0, 2, 1)  # reference returns the transpose
            .numpy()
        )
        for i, d in enumerate(dofs):
            T_ours = np.asarray(se3.exp(jnp.asarray(d)))
            np.testing.assert_allclose(
                T_ours, T_ref[i], atol=2e-5,
                err_msg=f"case {i}: dof={d}",
            )

    def test_opencv_log_map_matches_ours(self, ref):
        """reference se3_log_map(backend='opencv') == our se3.log, on
        transforms generated by OUR exp map (cross-implementation
        round-trip, incl. theta->0 / theta->pi)."""
        dofs = _dof_cases()
        # exclude the extreme pi-offset where the component-wise log is
        # only defined up to the branch cut ambiguity for BOTH sides
        for i, d in enumerate(dofs):
            T = np.asarray(se3.exp(jnp.asarray(d)), np.float64)
            got_ref = (
                ref.u3d.se3_log_map(
                    torch.from_numpy(T[None].transpose(0, 2, 1).copy()).float(),
                    backend="opencv",
                )[0]
                .numpy()
            )
            got_ours = np.asarray(se3.log(jnp.asarray(T, jnp.float32)))
            np.testing.assert_allclose(
                got_ours, got_ref, atol=5e-4,
                err_msg=f"case {i}: dof={d}",
            )

    def test_reference_roundtrip_through_ours(self, ref):
        """reference log -> our exp reproduces the transform (and vice
        versa): the two parameterizations are interchangeable, which is
        what lets init poses / checkpoints from the reference be loaded
        directly."""
        dofs = _dof_cases()
        for d in dofs:
            T = np.asarray(se3.exp(jnp.asarray(d)), np.float32)
            d_ref = (
                ref.u3d.se3_log_map(
                    torch.from_numpy(T[None].transpose(0, 2, 1).copy()),
                    backend="opencv",
                )[0]
                .numpy()
            )
            T_back = np.asarray(se3.exp(jnp.asarray(d_ref, jnp.float32)))
            np.testing.assert_allclose(T_back, T, atol=2e-4)

    def test_transform_points_parity(self, ref):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        T = np.asarray(se3.exp(jnp.asarray(_dof_cases()[0])), np.float32)
        ours = pts @ T[:3, :3].T + T[:3, 3]
        got_np = ref.u3d.transform_points(pts, T)
        np.testing.assert_allclose(got_np, ours, atol=1e-5)
        got_t = ref.u3d.transform_points(
            torch.from_numpy(pts), torch.from_numpy(T)
        ).numpy()
        np.testing.assert_allclose(got_t, ours, atol=1e-5)


class TestProjectionParity:
    """Execute the reference's K_to_projection + opencv2blender +
    transform_pos chain (nvdiffrast_utils.py:5-18, nvdiffrast_renderer.py:
    18-37) and verify its NDC output lands on the SAME pixel coordinates
    as our direct OpenCV pinhole projection (render/projection.py — the
    'GL round-trip is the identity on conventions' claim of PARITY.md,
    previously verified only against a reimplemented oracle)."""

    H, W = 480, 640

    def _ref_pixels(self, ref, p_cam: np.ndarray, K: np.ndarray):
        """Reference chain for camera-frame points (object_pose = I):
        clip -> NDC -> nvdiffrast pixel grid -> final vertical flip."""
        Kt = torch.from_numpy(K).float()
        proj = ref.nv.K_to_projection(Kt, self.H, self.W)
        blender2opencv = torch.tensor(
            [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]]
        ).float()
        opencv2blender = torch.inverse(blender2opencv)
        pose = opencv2blender @ torch.eye(4)
        clip = ref.nv.transform_pos(
            proj @ pose, torch.from_numpy(p_cam).float()
        )[0].numpy()
        ndc = clip[:, :2] / clip[:, 3:4]
        # nvdiffrast samples pixel (ix, iy_gl) at NDC ((ix+.5)/W*2-1,
        # (iy_gl+.5)/H*2-1), bottom-up rows; the renderer's final
        # torch.flip(dims=[0]) (nvdiffrast_renderer.py:47) makes rows
        # top-down. Continuous pixel coords (integer = pixel boundary):
        u = (ndc[:, 0] + 1) / 2 * self.W
        v = (1 - ndc[:, 1]) / 2 * self.H
        return np.stack([u, v], axis=-1)

    def test_clip_chain_equals_opencv_pinhole(self, ref):
        rng = np.random.default_rng(2)
        K = np.array(
            [[600.0, 0, 320.0], [0, 610.0, 235.0], [0, 0, 1]], np.float32
        )
        p = rng.normal(size=(200, 3)).astype(np.float32)
        p[:, 2] = rng.uniform(0.3, 5.0, 200)  # in front of the camera
        got = self._ref_pixels(ref, p, K)
        want_u = K[0, 0] * p[:, 0] / p[:, 2] + K[0, 2]
        want_v = K[1, 1] * p[:, 1] / p[:, 2] + K[1, 2]
        np.testing.assert_allclose(got[:, 0], want_u, rtol=1e-5, atol=2e-3)
        np.testing.assert_allclose(got[:, 1], want_v, rtol=1e-5, atol=2e-3)

    def test_matches_our_setup_triangles_projection(self, ref):
        """End-to-end: our Triangles2D uv (render/projection.setup_
        triangles) equals the reference clip chain's pixel coords for the
        same camera-space geometry."""
        from easyhec_tpu.render.projection import setup_triangles

        rng = np.random.default_rng(3)
        K = np.array(
            [[500.0, 0, 321.5], [0, 505.0, 242.0], [0, 0, 1]], np.float32
        )
        verts = rng.normal(size=(30, 3)).astype(np.float32)
        verts[:, 2] = rng.uniform(0.5, 3.0, 30)
        faces = np.arange(30, dtype=np.int32).reshape(10, 3)
        tris = setup_triangles(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(K)
        )
        uv = np.asarray(tris.uv).reshape(-1, 2)  # [F*3, 2]
        ref_px = self._ref_pixels(ref, verts, K)[faces.reshape(-1)]
        np.testing.assert_allclose(uv, ref_px, rtol=1e-4, atol=5e-3)
