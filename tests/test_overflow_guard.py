"""Round-4 honesty machinery: the bin-overflow flag threaded out of every
rebin of the optimizer scans, the raise/warn/ignore contract, trainer
budget escalation, and the forward-only compact silhouette + shared-bin
explorer scoring built on the same rebin-reuse contract.

The failure mode under test is the r2 audit's: a saturated bin silently
drops triangles, truncating gradients while everything looks converged
(BASELINE.md "r2 honesty correction")."""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import MINI_URDF
from easyhec_tpu.geometry import se3
from easyhec_tpu.models.calib import BinOverflowError, calibrate
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf

H, W = 48, 64
K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)


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
    li = [0, 1, 2]
    qs = jnp.linspace(-0.3, 0.3, B * chain.n_dof).reshape(B, chain.n_dof)
    lp = jax.vmap(chain.fk)(qs)[:, jnp.asarray(li)]
    Tc = np.eye(4, dtype=np.float32)
    Tc[2, 3] = 1.2
    gt = np.asarray(se3.log(jnp.asarray(Tc)))
    target = np.asarray(
        renderer.silhouette(jnp.asarray(Tc), lp, jnp.asarray(K))
    )
    return lp, gt, target


GOOD = TileConfig(16, 32, 256, binner="count", fused=True, margin=2.0,
                  bin_big_k=128)
# cap 32 is far below this scene's true max load (~90): every rebin
# saturates -> the honest flag must fire.
BAD = TileConfig(16, 32, 32, binner="count", fused=True, margin=2.0,
                 bin_big_k=128)


class TestCalibrateOverflowContract:
    def test_honest_config_runs_clean(self, arm):
        chain, meshes, links = arm
        r = RobotRenderer(meshes, H, W, tile=GOOD)
        lp, gt, target = _scene(chain, r)
        res = calibrate(gt + 0.01, r, lp, K, target, num_steps=8,
                        rebin_every=4)
        assert res.overflow is False

    def test_truncating_config_raises(self, arm):
        chain, meshes, links = arm
        r = RobotRenderer(meshes, H, W, tile=BAD)
        lp, gt, target = _scene(chain, r)
        with pytest.raises(BinOverflowError):
            calibrate(gt + 0.01, r, lp, K, target, num_steps=8,
                      rebin_every=4)

    def test_warn_mode_completes_and_flags(self, arm):
        chain, meshes, links = arm
        r = RobotRenderer(meshes, H, W, tile=BAD)
        lp, gt, target = _scene(chain, r)
        res = calibrate(gt + 0.01, r, lp, K, target, num_steps=8,
                        rebin_every=4, on_overflow="warn")
        assert res.overflow is True
        assert np.isfinite(res.losses).all()

    def test_rebin_every_one_still_checks(self, arm):
        """The pre-r4 gap: at rebin_every=1 the scan built states
        internally and the flag was invisible; reusable renderers now
        always thread explicit states."""
        chain, meshes, links = arm
        r = RobotRenderer(meshes, H, W, tile=BAD)
        lp, gt, target = _scene(chain, r)
        with pytest.raises(BinOverflowError):
            calibrate(gt + 0.01, r, lp, K, target, num_steps=4,
                      rebin_every=1)


class TestTrainerEscalation:
    def test_offline_trainer_escalates_to_success(self, arm, tmp_path):
        from easyhec_tpu.config import Config
        from easyhec_tpu.data.dataset import CalibBatch
        from easyhec_tpu.trainer.offline import run_offline_calibration

        chain, meshes, links = arm
        r = RobotRenderer(meshes, H, W, tile=GOOD)
        lp, gt, target = _scene(chain, r)

        cfg = Config()
        with tempfile.NamedTemporaryFile(
            "w", suffix=".urdf", delete=False
        ) as f:
            f.write(MINI_URDF)
            cfg.model.urdf_path = f.name
        cfg.model.use_links = links
        cfg.model.H, cfg.model.W = H, W
        cfg.solver.num_epochs = 8
        cfg.solver.rebin_every = 4
        cfg.solver.save_freq = 0
        cfg.solver.log_interval = 0
        cfg.render.tile_h, cfg.render.tile_w = 16, 32
        cfg.render.capacity = 32  # truncates; must escalate 32->128->256
        cfg.render.bin_big_k = 128
        cfg.output_dir = str(tmp_path / "run")

        batch = CalibBatch(
            rgb=np.zeros((2, 1, 1, 3), np.uint8),
            masks=np.asarray(target, np.float32),
            qpos=np.zeros((2, chain.n_dof), np.float32),
            link_poses=np.asarray(lp, np.float32),
            K=K,
            Tc_c2b_gt=np.eye(4, dtype=np.float32),
        )
        res = run_offline_calibration(cfg, batch=batch, init_dof=gt + 0.01)
        assert res.overflow is False
        assert cfg.render.capacity >= 128  # escalated
        assert np.isfinite(res.losses).all()


class TestCompactForwardSilhouette:
    def test_matches_plain_silhouette_in_contract(self, arm):
        from easyhec_tpu.render.fused import silhouette_compact

        chain, meshes, links = arm
        cfgc = GOOD._replace(compact_chunks=16)
        r = RobotRenderer(meshes, H, W, tile=cfgc)
        lp, gt, target = _scene(chain, r)
        Tc0 = se3.exp(jnp.asarray(gt, jnp.float32))
        state = r.bin_state(Tc0, lp, jnp.asarray(K))
        # a pose within the margin contract of the build pose
        Td = se3.exp(jnp.asarray(gt + 0.003, jnp.float32))
        got = np.asarray(silhouette_compact(r, Td, jnp.asarray(K), state))
        ref = np.asarray(r.silhouette(Td, lp, jnp.asarray(K)))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_overflow_flag_on_small_budget(self, arm):
        chain, meshes, links = arm
        cfgc = GOOD._replace(compact_chunks=1)  # scene needs more chunks
        r = RobotRenderer(meshes, H, W, tile=cfgc)
        lp, gt, _ = _scene(chain, r)
        st = r.bin_state(se3.exp(jnp.asarray(gt)), lp, jnp.asarray(K))
        assert bool(jnp.any(st.overflow))


class TestExplorerSharedScoring:
    def _ex(self, arm, tile):
        from easyhec_tpu.models.explorer import SpaceExplorer

        chain, meshes, links = arm
        r = RobotRenderer(meshes, H, W, tile=tile)
        return chain, SpaceExplorer(
            chain, r, links, n_sample_qposes=6, n_hypotheses=4,
            history_start=0, max_dist=None, score_batch=3,
        )

    def test_shared_matches_exact_narrow_cloud(self, arm):
        chain, ex = self._ex(
            arm, GOOD._replace(margin=8.0, compact_chunks=16)
        )
        rng = np.random.default_rng(0)
        Tc = np.eye(4, dtype=np.float32)
        Tc[2, 3] = 1.2
        xi = np.asarray(se3.log(jnp.asarray(Tc)))
        hyp = jnp.asarray((xi + 0.004 * rng.normal(size=(4, 6))).astype(
            np.float32))
        qs = jnp.asarray(
            rng.uniform(-0.5, 0.5, (6, chain.n_dof)).astype(np.float32))
        v_sh, _, ov = ex._score(qs, hyp, jnp.asarray(K), shared=True)
        v_ex, _, _ = ex._score(qs, hyp, jnp.asarray(K), shared=False)
        assert not bool(ov)
        np.testing.assert_allclose(
            np.asarray(v_sh), np.asarray(v_ex), rtol=1e-4, atol=1e-4
        )

    def test_spread_gate_selects_paths(self, arm):
        chain, ex = self._ex(arm, GOOD._replace(margin=8.0))
        rng = np.random.default_rng(1)
        Tc = np.eye(4, dtype=np.float32)
        Tc[2, 3] = 1.2
        xi = np.asarray(se3.log(jnp.asarray(Tc)))
        narrow = (xi + 0.002 * rng.normal(size=(20, 6))).astype(np.float32)
        wide = (xi + 0.2 * rng.normal(size=(20, 6))).astype(np.float32)
        s_n = ex.hypothesis_spread_px(narrow, K)
        s_w = ex.hypothesis_spread_px(wide, K)
        assert s_n < 6.0 < s_w
        ex.explore(narrow, K, key=0)
        assert ex.last_shared is True
        ex.explore(wide, K, key=0)
        assert ex.last_shared is False
