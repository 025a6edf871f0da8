"""Default-tier CPU coverage for the SHIPPED adaptive rebinning policy
(`solver.rebin_every: 0` in every production config — r4 verdict item 2 /
advisor low 4): the lax.cond rebuild path in models.calib.opt_scan, the
drift-budget arithmetic, overflow propagation under adaptive, the
lever-arm-aware probe set (advisor r4 medium), and the sharded per-shard
probe gating (parallel/sharding.py) — all without TPU.
"""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import MINI_URDF
from easyhec_tpu.geometry import se3
from easyhec_tpu.models.calib import (
    BinOverflowError,
    adaptive_drift_budget,
    calibrate,
    drift_probe_points,
    make_drift_probe_fn,
)
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf

H, W = 48, 64
K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)

# The production kernel class: fused + count binner (reuse_bins_ok=True).
GOOD = TileConfig(16, 32, 256, binner="count", fused=True, margin=2.0,
                  bin_big_k=128)
# cap 32 << this scene's true max load (~90): every rebin saturates.
BAD = TileConfig(16, 32, 32, binner="count", fused=True, margin=2.0,
                 bin_big_k=128)
# margin 0.7 with sharpness 1.0 leaves budget 0.7-0.5-0.3 < 0: adaptive
# is not viable and must fall back to per-step rebinning (advisor low 2:
# no silent 0.5 px floor).
TIGHT = TileConfig(16, 32, 256, binner="count", fused=True, margin=0.7,
                   bin_big_k=128)


@pytest.fixture(scope="module")
def arm():
    with tempfile.NamedTemporaryFile("w", suffix=".urdf", delete=False) as f:
        f.write(MINI_URDF)
        path = f.name
    model = parse_urdf(path)
    chain = build_chain(model)
    links = ["base", "upper", "fore"]
    meshes = load_link_meshes(model, link_names=links)
    return chain, [meshes[n] for n in links], links


def _scene(chain, renderer, B=2):
    qs = jnp.linspace(-0.3, 0.3, B * chain.n_dof).reshape(B, chain.n_dof)
    lp = jax.vmap(chain.fk)(qs)[:, jnp.asarray([0, 1, 2])]
    Tc = np.eye(4, dtype=np.float32)
    Tc[2, 3] = 1.2
    gt = np.asarray(se3.log(jnp.asarray(Tc)))
    target = np.asarray(
        renderer.silhouette(jnp.asarray(Tc), lp, jnp.asarray(K))
    )
    return lp, gt, target


class TestAdaptiveMatchesPerStep:
    def test_single_chip_trajectory_equivalent(self, arm):
        """rebin_every=0 (shipped default) ≡ rebin_every=1 to float
        precision: both policies keep every render inside the binning
        contract, so the rasterization — and hence the whole Adam
        trajectory — must agree."""
        chain, meshes, _ = arm
        r = RobotRenderer(meshes, H, W, tile=GOOD)
        lp, gt, target = _scene(chain, r)
        init = gt + np.asarray([0.02, -0.02, 0.015, 0.01, -0.01, 0.015],
                               np.float32)
        res_a = calibrate(init, r, lp, K, target, num_steps=30,
                          rebin_every=0)
        res_1 = calibrate(init, r, lp, K, target, num_steps=30,
                          rebin_every=1)
        np.testing.assert_allclose(res_a.losses, res_1.losses,
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(res_a.dof, res_1.dof, atol=1e-4)
        # Adaptive actually amortized: fewer bin builds than steps.
        assert 1 <= res_a.rebins < 30
        assert res_1.rebins == 30

    def test_drift_guard_fires(self, arm):
        """A start far from the target drifts past the budget within the
        run: the lax.cond rebuild path must fire (rebins > 1) — and stop
        firing once converged (rebins << steps)."""
        chain, meshes, _ = arm
        r = RobotRenderer(meshes, H, W, tile=GOOD)
        lp, gt, target = _scene(chain, r)
        init = gt + np.asarray([0.06, -0.05, 0.04, 0.03, -0.03, 0.04],
                               np.float32)
        res = calibrate(init, r, lp, K, target, num_steps=60,
                        rebin_every=0, max_lr=5e-3)
        assert res.rebins > 1, "drift guard never fired"
        assert res.rebins < 60, "adaptive never reused bins"
        assert res.losses[-1] < res.losses[0]

    def test_overflow_raises_under_adaptive(self, arm):
        """BinOverflowError propagates out of the adaptive scan's
        lax.cond rebuilds, not only the fixed-cadence path."""
        chain, meshes, _ = arm
        r = RobotRenderer(meshes, H, W, tile=BAD)
        lp, gt, target = _scene(chain, r)
        with pytest.raises(BinOverflowError):
            calibrate(gt + 0.01, r, lp, K, target, num_steps=8,
                      rebin_every=0)

    def test_nonviable_budget_falls_back_to_per_step(self, arm):
        """margin − band − safety ≤ 0 ⇒ adaptive silently degrading is
        forbidden; the run must rebin every step instead (advisor low 2)."""
        assert adaptive_drift_budget(TIGHT, 1.0) <= 0
        chain, meshes, _ = arm
        r = RobotRenderer(meshes, H, W, tile=TIGHT)
        lp, gt, target = _scene(chain, r)
        res = calibrate(gt + 0.01, r, lp, K, target, num_steps=10,
                        rebin_every=0)
        assert res.rebins == 10  # per-step fallback engaged
        assert res.losses[-1] < res.losses[0]


class TestProbeSet:
    def test_budget_formula(self):
        # Shipped configs (margin 2.0, sharpness 1.0): 2 − 0.5 − 0.3.
        assert adaptive_drift_budget(GOOD, 1.0) == pytest.approx(1.2)
        # Lower sharpness widens the soft band and shrinks the budget.
        assert adaptive_drift_budget(GOOD, 0.5) == pytest.approx(0.7)
        assert adaptive_drift_budget(GOOD, 0.25) < adaptive_drift_budget(
            GOOD, 0.5
        )

    def test_lever_arm_probes_exceed_origin_drift(self, arm):
        """The r4 advisor's failure mode: under camera ROTATION, mesh
        corners move farther in pixels than link origins — the corner
        probe set must measure the larger drift."""
        chain, meshes, _ = arm
        r = RobotRenderer(meshes, H, W, tile=GOOD)
        lp, gt, _ = _scene(chain, r)
        B, L = lp.shape[0], lp.shape[1]
        probes = drift_probe_points(r, lp)
        assert probes.shape == (B * L * 9, 3)  # 8 corners + origin per link

        origins = lp[..., :3, 3].reshape(-1, 3)
        Kj = jnp.asarray(K)
        pf_corners = make_drift_probe_fn(probes, Kj)
        pf_origins = make_drift_probe_fn(origins, Kj)
        d0 = jnp.asarray(gt, jnp.float32)
        # Rotation-dominant perturbation.
        d1 = d0 + jnp.asarray([0.0, 0.0, 0.0, 0.04, -0.03, 0.05], jnp.float32)
        drift_c = float(jnp.max(jnp.abs(pf_corners(d1) - pf_corners(d0))))
        drift_o = float(jnp.max(jnp.abs(pf_origins(d1) - pf_origins(d0))))
        assert drift_c > drift_o

    def test_corners_cover_mesh_aabb(self, arm):
        chain, meshes, _ = arm
        r = RobotRenderer(meshes, H, W, tile=GOOD)
        corners = r.link_aabb_corners()
        assert corners.shape == (3, 8, 3)
        for l in range(3):
            v = r.link_vertices(l)
            np.testing.assert_allclose(corners[l].min(0), v.min(0), atol=1e-6)
            np.testing.assert_allclose(corners[l].max(0), v.max(0), atol=1e-6)


SH_W, SH_BAND_H, SH_N_TILE = 64, 32, 2
SH_H = SH_BAND_H * SH_N_TILE
SH_K = np.array(
    [[80.0, 0, SH_W / 2], [0, 80.0, SH_H / 2], [0, 0, 1]], np.float32
)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
class TestShardedAdaptive:
    """The sharded adaptive path (parallel/sharding.py per-shard probe
    gating) in the DEFAULT tier — shards gate on their own local probes and
    may rebin at different steps, which must stay exact."""

    @pytest.fixture(scope="class")
    def rig(self, arm):
        from easyhec_tpu.parallel import make_mesh

        chain, meshes, _ = arm
        full = RobotRenderer(meshes, SH_H, SH_W, tile=GOOD)
        band = RobotRenderer(meshes, SH_BAND_H, SH_W, tile=GOOD)
        mesh = make_mesh(2, SH_N_TILE)
        qs = jnp.linspace(-0.4, 0.4, 4 * chain.n_dof).reshape(4, chain.n_dof)
        lp = jax.vmap(chain.fk)(qs)[:, jnp.asarray([0, 1, 2])]
        Tc = np.eye(4, dtype=np.float32)
        Tc[2, 3] = 1.2
        gt = np.asarray(se3.log(jnp.asarray(Tc)))
        target = np.asarray(
            full.silhouette(jnp.asarray(Tc), lp, jnp.asarray(SH_K))
        )
        return band, mesh, np.asarray(lp), gt, target

    def test_sharded_adaptive_matches_per_step(self, rig):
        from easyhec_tpu.parallel import sharded_calibrate

        band, mesh, lp, gt, target = rig
        init = gt + np.asarray([0.02, -0.02, 0.015, 0.01, -0.01, 0.015],
                               np.float32)
        dof_a, losses_a, _ = sharded_calibrate(
            init, band, mesh, lp, SH_K, target, num_steps=20,
            rebin_every=0, chunk=10,
        )
        dof_1, losses_1, _ = sharded_calibrate(
            init, band, mesh, lp, SH_K, target, num_steps=20,
            rebin_every=1, chunk=10,
        )
        np.testing.assert_allclose(
            np.asarray(losses_a), np.asarray(losses_1), rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dof_a), np.asarray(dof_1), atol=1e-4
        )

    def test_sharded_adaptive_overflow_raises(self, rig):
        """The overflow flag must cross the lax.cond rebuild AND the mesh
        psum under the adaptive policy."""
        from easyhec_tpu.parallel import sharded_calibrate
        from easyhec_tpu.robot.mesh import TriMesh

        band, mesh, lp, gt, target = rig
        links = [
            TriMesh(band.link_vertices(l), band.link_faces(l))
            for l in range(band.n_links)
        ]
        bad = RobotRenderer(links, SH_BAND_H, SH_W, tile=BAD)
        with pytest.raises(BinOverflowError):
            sharded_calibrate(
                gt + 0.01, bad, mesh, lp, SH_K, target, num_steps=8,
                rebin_every=0, chunk=8,
            )
