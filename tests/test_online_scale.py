"""xArm7 online-scale rehearsal (VERDICT item 9): the simulated closed loop
at REFERENCE scale — 1280×720, the real xArm7 link meshes from the
reference assets, 1000 optimizer steps per round — with bin-overflow guard
assertions. Slow-marked and TPU-gated (CPU interpret-mode Pallas at 0.9 MP
is not a meaningful rehearsal); run on hardware:

    EASYHEC_TEST_TPU=1 pytest tests/test_online_scale.py -m slow -q
"""
import pathlib
import time

import numpy as np
import pytest

REF_ASSETS = pathlib.Path("/root/reference/assets")


def _tpu_available() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@pytest.mark.slow
@pytest.mark.skipif(
    not REF_ASSETS.exists(), reason="reference assets not mounted"
)
@pytest.mark.skipif(
    not _tpu_available(), reason="needs a TPU (full-res rehearsal)"
)
def test_xarm7_online_scale_closed_loop(tmp_path):
    import jax
    import jax.numpy as jnp

    from easyhec_tpu.config import Config
    from easyhec_tpu.data.synthetic import default_camera
    from easyhec_tpu.geometry import se3
    from easyhec_tpu.io.interfaces import RendererMaskSource, SimArm, SimCamera
    from easyhec_tpu.render.fused import build_fused_state
    from easyhec_tpu.trainer import run_iterative
    from easyhec_tpu.trainer.offline import build_runtime

    H, W = 720, 1280
    cfg = Config()
    cfg.model.urdf_path = str(REF_ASSETS / "xarm7_with_gripper_reduced_dof.urdf")
    cfg.model.use_links = [f"link{i}" for i in range(1, 8)]
    cfg.model.H, cfg.model.W = H, W
    cfg.model.decimate_voxel = 0.004
    # The audited 720p production settings (= configs/xarm7_example.yaml;
    # scripts/bin_audit.py at 1280x720 f=906.8: max load 824 over random
    # poses, but EXPLORED poses concentrate loads — a 5-round run measured
    # 1309 at round 3's explored pose, so cap carries explorer headroom).
    # calibrate() raises BinOverflowError if any rebin of any round
    # truncates, and run_iterative escalates budgets 2x and retries.
    cfg.render.tile_h, cfg.render.tile_w = 16, 32
    cfg.render.capacity = 1664
    cfg.render.rect_y, cfg.render.rect_x = 6, 4
    cfg.render.margin = 2.0
    cfg.render.cull_backfaces = True
    cfg.render.fused = True
    cfg.render.bin_big_k = 3840
    cfg.render.bin_subsort_rows = True
    cfg.render.compact_chunks = 384
    cfg.solver.num_epochs = 1000  # reference budget (docs/usage.md:41)
    # 3 rounds keeps the CI-tier cost bounded; the committed flagship
    # record (docs/online_scale_report.md) runs the reference's 5 rounds
    # via EASYHEC_ONLINE_ROUNDS=5.
    cfg.solver.explore_iters = int(
        __import__("os").environ.get("EASYHEC_ONLINE_ROUNDS", "3")
    )
    cfg.solver.rebin_every = 0  # adaptive (drift-exact), as shipped
    cfg.explorer.n_sample_qposes = 64
    cfg.explorer.n_hypotheses = 10
    cfg.explorer.history_start = 200
    cfg.explorer.self_collision_check = False  # sim smoke: no planner
    cfg.dataset.data_dir = str(tmp_path / "captures")
    cfg.output_dir = str(tmp_path / "run")

    rt = build_runtime(cfg)
    chain = rt.chain
    # RealSense-like intrinsics (reference config defaults.py:12-16)
    K = np.array(
        [[906.8, 0, 650.2], [0, 906.7, 367.7], [0, 0, 1]], np.float32
    )
    Tc = default_camera(
        distance=1.4, azimuth_deg=40, height=0.9, target=(0.2, 0.0, 0.3)
    )
    gt_dof = np.asarray(se3.log(jnp.asarray(Tc)))
    init = gt_dof + np.asarray(
        [0.02, -0.02, 0.02, 0.015, -0.015, 0.02], np.float32
    )
    cfg.model.init_Tc_c2b = np.asarray(se3.exp(jnp.asarray(init))).tolist()

    # Bin-overflow guard at the initial pose (the silent-degradation trap)
    li = jnp.asarray([chain.link_index(n) for n in rt.link_names])
    lp0 = chain.fk(jnp.zeros(chain.n_dof))[li][None]
    st = build_fused_state(rt.renderer, jnp.asarray(Tc), lp0, jnp.asarray(K))
    assert not bool(np.asarray(jnp.any(st.overflow))), (
        "tile-bin overflow at reference scale — raise capacity/rect window"
    )

    arm = SimArm(chain.n_dof)
    camera = SimCamera(rt.renderer, chain, rt.link_names, Tc, K, arm)
    t0 = time.time()
    result = run_iterative(
        cfg, arm=arm, camera=camera, mask_source=RendererMaskSource(),
        Tc_c2b_gt=Tc, K=K,
    )
    wall = time.time() - t0
    print(f"\nonline-scale rehearsal: {cfg.solver.explore_iters} rounds x "
          f"{cfg.solver.num_epochs} steps @ {W}x{H}, wall {wall:.1f}s")
    assert result.metrics["err_trans_geodesic_cm"] < 1.0, result.metrics
    assert result.metrics["err_rot_geodesic_deg"] < 0.5, result.metrics
