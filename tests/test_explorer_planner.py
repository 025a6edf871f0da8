"""Space explorer, collision spheres, RRT planner, and the full simulated
iterative loop (capture -> optimize -> explore -> move)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyhec_tpu.config import Config
from easyhec_tpu.data.synthetic import default_camera
from easyhec_tpu.geometry import se3
from easyhec_tpu.io.planner import CollisionModel, RRTPlanner, plan_to_qpos, time_parameterize
from easyhec_tpu.models.explorer import SpaceExplorer, build_link_spheres
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf

from test_e2e_calib import ARM_URDF, H, W, K


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("xrig")
    urdf = tmp / "mini_arm.urdf"
    urdf.write_text(ARM_URDF)
    model = parse_urdf(urdf)
    chain = build_chain(model)
    link_names = ["base", "upper", "fore"]
    meshes = load_link_meshes(model, link_names=link_names)
    renderer = RobotRenderer(
        [meshes[n] for n in link_names], H, W, tile=TileConfig(16, 32, 64), mode="tiled"
    )
    spheres = build_link_spheres(chain, meshes)
    return urdf, chain, renderer, link_names, meshes, spheres, tmp


class TestSpheres:
    def test_sphere_cover(self, rig):
        _, chain, _, _, meshes, spheres, _ = rig
        # Every mesh vertex must be inside some sphere of its link
        for i, n in enumerate(meshes):
            v = meshes[n].vertices
            d = np.linalg.norm(v[:, None, :] - spheres.centers[i][None], axis=-1)
            ok = (d <= spheres.radii[i][None] + 1e-5).any(axis=1)
            assert ok.mean() > 0.99, (n, ok.mean())

    def test_pair_mask_skips_adjacent(self, rig):
        *_, spheres, _ = rig
        assert not spheres.pair_mask[0, 1]  # adjacent
        assert spheres.pair_mask[0, 2]  # base vs fore checked


class TestExplorer:
    def test_explore_selects_feasible_max_variance(self, rig):
        _, chain, renderer, link_names, _, spheres, _ = rig
        explorer = SpaceExplorer(
            chain,
            renderer,
            link_names,
            spheres=spheres,
            n_sample_qposes=32,
            n_hypotheses=4,
            history_start=0,
            max_dist=2.0,
        )
        # History: GT pose + noisy hypotheses
        Tc = default_camera(distance=1.0, azimuth_deg=30, height=0.6, target=(0, 0, 0.3))
        gt = np.asarray(se3.log(jnp.asarray(Tc)))
        history = gt[None] + np.random.default_rng(0).normal(0, 0.01, (50, 6))
        res = explorer.explore(history.astype(np.float32), K, key=0)
        assert res.qpos.shape == (chain.n_dof,)
        assert np.isfinite(res.variance) and res.variance > 0
        assert res.feasible.any()
        # The chosen candidate must be the max among feasible
        assert res.variance == res.var_all.max()

    def test_overflow_escalates_budgets_and_rescore(self, rig):
        """A truncating scoring pass must escalate the bin budgets 2x and
        re-score (trainer escalation contract applied to the explorer) —
        not merely warn and rank variance on truncated silhouettes."""
        _, chain, _, link_names, meshes, _, _ = rig
        tiny = RobotRenderer(
            [meshes[n] for n in link_names], H, W,
            tile=TileConfig(16, 32, 16), mode="tiled",  # cap 16: truncates
        )
        explorer = SpaceExplorer(
            chain, tiny, link_names, spheres=None,
            n_sample_qposes=8, n_hypotheses=3, history_start=0,
            max_dist=None,
        )
        Tc = default_camera(distance=1.0, azimuth_deg=30, height=0.6,
                            target=(0, 0, 0.3))
        gt = np.asarray(se3.log(jnp.asarray(Tc)))
        history = gt[None] + np.random.default_rng(0).normal(0, 0.01, (20, 6))
        res = explorer.explore(history.astype(np.float32), K, key=0)
        assert explorer.renderer.tile.capacity > 16  # escalated
        assert np.isfinite(res.variance)
        # escalated-budget pass no longer truncates on this scene
        st = jax.jit(
            lambda q: explorer.renderer.bin_state(
                se3.exp(jnp.asarray(gt)),
                jax.vmap(chain.fk)(q)[:, explorer.link_idx],
                jnp.asarray(K),
            )
        )(jnp.asarray(res.qpos[None]))
        assert not bool(np.asarray(jnp.any(st.overflow)))

    def test_identical_hypotheses_zero_variance(self, rig):
        _, chain, renderer, link_names, _, _, _ = rig
        explorer = SpaceExplorer(
            chain, renderer, link_names, spheres=None,
            n_sample_qposes=8, n_hypotheses=3, history_start=0, max_dist=None,
        )
        Tc = default_camera(distance=1.0, azimuth_deg=30, height=0.6, target=(0, 0, 0.3))
        gt = np.asarray(se3.log(jnp.asarray(Tc)))
        history = np.repeat(gt[None], 20, axis=0)  # no disagreement
        res = explorer.explore(history.astype(np.float32), K, key=1)
        assert abs(res.variance) < 1e-6


class TestPlanner:
    def test_straight_line_when_free(self, rig):
        _, chain, _, _, _, spheres, _ = rig
        q0 = np.zeros(chain.n_dof)
        q1 = np.asarray([0.5, 0.3])
        plan = plan_to_qpos(chain, spheres, q0, q1, dt=0.05)
        assert plan["status"] == "Success"
        np.testing.assert_allclose(plan["position"][0], q0, atol=1e-6)
        np.testing.assert_allclose(plan["position"][-1], q1, atol=1e-2)
        # velocity respects v_max on every joint
        assert np.abs(plan["velocity"]).max() <= 0.3 * 1.3

    def test_env_obstacle_forces_failure_or_detour(self, rig):
        _, chain, _, _, _, spheres, _ = rig
        # Wall of points blocking everything near the arm
        grid = np.mgrid[-1:1:21j, -1:1:21j, 0:1:11j].reshape(3, -1).T
        model = CollisionModel(chain, spheres, env_points=grid.astype(np.float32))
        assert model.in_collision(np.zeros(chain.n_dof))

    def test_obstacle_forces_second_choice(self, rig):
        # Plan-gating contract: when the top candidate is blocked by an env
        # obstacle, plan_first_feasible falls through to the next plannable
        # candidate — and returns (None, None) when all are blocked, which
        # run_iterative turns into a SKIP (never an unplanned move).
        from easyhec_tpu.io.planner import plan_first_feasible

        _, chain, _, _, _, spheres, _ = rig
        q0 = np.zeros(chain.n_dof, np.float32)
        blocked = np.asarray([1.2, 0.0], np.float32)[: chain.n_dof]
        free = np.asarray([-0.5, -0.3], np.float32)[: chain.n_dof]
        # cloud of obstacle points around the BLOCKED goal's end-effector
        # only (earlier link origins barely move with q — points there
        # would block every configuration)
        ee = chain.fk_np(blocked)[-1, :3, 3]
        wall = (
            ee + np.random.default_rng(0).normal(0, 0.02, (80, 3))
        ).astype(np.float32)
        chosen, plan = plan_first_feasible(
            chain, spheres, q0, [blocked, free], env_points=wall, seed=0
        )
        assert chosen is not None and plan["status"] == "Success"
        np.testing.assert_allclose(chosen, free)
        # all candidates blocked -> no move
        chosen2, plan2 = plan_first_feasible(
            chain, spheres, q0, [blocked], env_points=wall, seed=0
        )
        assert chosen2 is None and plan2 is None

    def test_time_param_trapezoid(self):
        path = [np.zeros(2), np.array([1.0, 0.0])]
        plan = time_parameterize(path, v_max=0.5, a_max=1.0, dt=0.01)
        assert plan["status"] == "Success"
        assert abs(np.abs(plan["velocity"]).max() - 0.5) < 0.05
        # duration = accel 0.5s + cruise (1-0.25)/0.5=1.5s + decel 0.5s
        assert abs(plan["duration"] - 2.5) < 0.1


class TestIterativeSimLoop:
    @pytest.mark.slow
    def test_closed_loop_recovers_pose(self, rig, tmp_path):
        urdf, chain, renderer, link_names, _, _, _ = rig
        cfg = Config()
        cfg.model.urdf_path = str(urdf)
        cfg.model.use_links = link_names
        cfg.model.H, cfg.model.W = H, W
        cfg.render.tile_h, cfg.render.tile_w, cfg.render.capacity = 16, 32, 64
        cfg.solver.num_epochs = 200
        cfg.solver.explore_iters = 3
        cfg.explorer.n_sample_qposes = 24
        cfg.explorer.n_hypotheses = 4
        cfg.explorer.history_start = 50
        cfg.explorer.self_collision_check = True
        cfg.dataset.data_dir = str(tmp_path / "captures")
        cfg.output_dir = str(tmp_path / "run")

        Tc = default_camera(distance=1.0, azimuth_deg=30, height=0.6, target=(0, 0, 0.3))
        gt_dof = np.asarray(se3.log(jnp.asarray(Tc)))
        init = gt_dof + np.array([0.04, -0.03, 0.02, 0.03, -0.03, 0.03], np.float32)
        cfg.model.init_Tc_c2b = np.asarray(se3.exp(jnp.asarray(init))).tolist()

        from easyhec_tpu.trainer import run_iterative

        result = run_iterative(cfg, Tc_c2b_gt=Tc, K=K)
        assert result.metrics["err_trans_geodesic_cm"] < 1.5, result.metrics
        assert result.metrics["err_rot_geodesic_deg"] < 1.5, result.metrics
        # Captures written in the reference-compatible layout
        caps = tmp_path / "captures"
        assert len(list((caps / "mask").glob("*.png"))) == 3
        assert (caps / "K.txt").exists()
        # Round checkpoints exist
        assert (tmp_path / "run" / "checkpoints" / "round_002.npz").exists()


class TestLiveGeometryAdaptation:
    @pytest.mark.slow
    def test_renderer_rebuilt_to_captured_resolution(self, rig, tmp_path):
        # Camera captures at a resolution DIFFERENT from cfg.model.H/W: the
        # trainer must rebuild the renderer at the live resolution instead
        # of silently corrupting the loss (reference defrost behavior,
        # rbsolve_iter.py:230-234).
        import jax.numpy as jnp

        from easyhec_tpu.io.interfaces import RendererMaskSource, SimArm, SimCamera
        from easyhec_tpu.render import RobotRenderer, TileConfig
        from easyhec_tpu.robot import load_link_meshes, parse_urdf
        from easyhec_tpu.robot import build_chain
        from easyhec_tpu.trainer import run_iterative

        urdf, chain, renderer, link_names, _, _, _ = rig
        cfg = Config()
        cfg.model.urdf_path = str(urdf)
        cfg.model.use_links = link_names
        cfg.model.H, cfg.model.W = 32, 48  # WRONG vs the live camera
        cfg.render.tile_h, cfg.render.tile_w, cfg.render.capacity = 16, 32, 64
        cfg.solver.num_epochs = 80
        cfg.solver.explore_iters = 2
        cfg.explorer.n_sample_qposes = 8
        cfg.explorer.n_hypotheses = 2
        cfg.explorer.history_start = 20
        cfg.explorer.self_collision_check = False
        cfg.dataset.data_dir = str(tmp_path / "captures")
        cfg.output_dir = str(tmp_path / "run")

        Tc = default_camera(distance=1.0, azimuth_deg=30, height=0.6,
                            target=(0, 0, 0.3))
        init = np.asarray(se3.log(jnp.asarray(Tc))) + 0.01
        cfg.model.init_Tc_c2b = np.asarray(se3.exp(jnp.asarray(init))).tolist()

        # Live camera at the RIG resolution (48x64), not cfg's 32x48
        model = parse_urdf(urdf)
        meshes = load_link_meshes(model, link_names=link_names)
        live = RobotRenderer(
            [meshes[n] for n in link_names], H, W, tile=TileConfig(16, 32, 64)
        )
        arm = SimArm(chain.n_dof)
        camera = SimCamera(live, chain, link_names, Tc, K, arm)
        result = run_iterative(
            cfg, arm=arm, camera=camera, mask_source=RendererMaskSource(),
            Tc_c2b_gt=Tc, K=K,
        )
        # converged on the ADAPTED resolution
        assert result.metrics["err_trans_geodesic_cm"] < 2.0

    @pytest.mark.slow
    def test_midrun_resolution_change_raises(self, rig, tmp_path):
        from easyhec_tpu.io.interfaces import RendererMaskSource, SimArm, SimCamera
        from easyhec_tpu.render import RobotRenderer, TileConfig
        from easyhec_tpu.robot import load_link_meshes, parse_urdf
        from easyhec_tpu.trainer import run_iterative

        urdf, chain, renderer, link_names, _, _, _ = rig
        cfg = Config()
        cfg.model.urdf_path = str(urdf)
        cfg.model.use_links = link_names
        cfg.model.H, cfg.model.W = H, W
        cfg.render.tile_h, cfg.render.tile_w, cfg.render.capacity = 16, 32, 64
        cfg.solver.num_epochs = 40
        cfg.solver.explore_iters = 2
        cfg.explorer.n_sample_qposes = 8
        cfg.explorer.n_hypotheses = 2
        cfg.explorer.history_start = 10
        cfg.explorer.self_collision_check = False
        cfg.dataset.data_dir = str(tmp_path / "captures")
        cfg.output_dir = str(tmp_path / "run")

        Tc = default_camera(distance=1.0, azimuth_deg=30, height=0.6,
                            target=(0, 0, 0.3))
        cfg.model.init_Tc_c2b = np.asarray(Tc).tolist()

        model = parse_urdf(urdf)
        meshes = load_link_meshes(model, link_names=link_names)
        live = RobotRenderer(
            [meshes[n] for n in link_names], H, W, tile=TileConfig(16, 32, 64)
        )
        arm = SimArm(chain.n_dof)

        class ShrinkingCamera(SimCamera):
            calls = 0

            def capture(self):
                rgb, Kc = super().capture()
                type(self).calls += 1
                if type(self).calls > 1:
                    rgb = rgb[: H // 2]  # resolution changes mid-run
                return rgb, Kc

        camera = ShrinkingCamera(live, chain, link_names, Tc, K, arm)
        with pytest.raises(RuntimeError, match="resolution changed mid-run"):
            run_iterative(
                cfg, arm=arm, camera=camera,
                mask_source=RendererMaskSource(), Tc_c2b_gt=Tc, K=K,
            )


class TestNativePlanner:
    def test_native_matches_python(self, rig):
        from easyhec_tpu.io.native_planner import (
            NativePlanner,
            native_available,
            plan_to_qpos_native,
        )

        if not native_available():
            pytest.skip("libezplan.so not built")
        _, chain, _, _, _, spheres, _ = rig
        planner = NativePlanner(chain, spheres)
        # FK parity with the Python chain
        q = np.asarray([0.4, -0.6])
        np.testing.assert_allclose(planner.fk(q), chain.fk_np(q), atol=1e-5)
        # Collision parity on a sweep
        from easyhec_tpu.io.planner import CollisionModel

        pymodel = CollisionModel(chain, spheres)
        rng = np.random.default_rng(0)
        qs = rng.uniform(chain.joint_limits[:, 0], chain.joint_limits[:, 1], (50, 2))
        agree = [planner.in_collision(q) == pymodel.in_collision(q) for q in qs]
        assert np.mean(agree) == 1.0
        # End-to-end plan with timing contract
        plan = plan_to_qpos_native(chain, spheres, np.zeros(2), np.asarray([0.5, 0.3]))
        assert plan["status"] == "Success"
        np.testing.assert_allclose(plan["position"][-1], [0.5, 0.3], atol=1e-2)

    def test_native_env_collision(self, rig):
        from easyhec_tpu.io.native_planner import NativePlanner, native_available

        if not native_available():
            pytest.skip("libezplan.so not built")
        _, chain, _, _, _, spheres, _ = rig
        grid = np.mgrid[-1:1:21j, -1:1:21j, 0:1:11j].reshape(3, -1).T
        planner = NativePlanner(chain, spheres, env_points=grid)
        assert planner.in_collision(np.zeros(chain.n_dof))
