"""Resume: an interrupted calibration continued from its checkpoint must
reproduce the uninterrupted run bit-for-bit (reference resume convention,
easyhec/trainer/base.py:420-440 — capability the reference has and round 1
lacked)."""
import numpy as np
import jax.numpy as jnp
import pytest

from easyhec_tpu.geometry import se3
from easyhec_tpu.models.calib import calibrate
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.robot import make_box, make_cylinder


@pytest.fixture(scope="module")
def rig():
    meshes = [make_box((0.15, 0.15, 0.3)), make_cylinder(0.05, 0.4, sections=12)]
    cfg = TileConfig(16, 32, 128, binner="count", fused=True)
    r = RobotRenderer(meshes, H=64, W=64, tile=cfg)
    lp = jnp.stack([jnp.eye(4), jnp.eye(4).at[2, 3].set(0.3)])[None]
    Tc = se3.exp(jnp.asarray([0.02, -0.03, 1.2, 0.05, -0.08, 0.03]))
    K = jnp.asarray([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])
    target = np.asarray(r.silhouette(Tc, lp, K))
    init = np.asarray(se3.log(Tc)) + np.asarray(
        [0.02, -0.02, 0.02, 0.02, -0.01, 0.02], np.float32
    )
    return r, lp, K, target, init, np.asarray(Tc)


def test_kill_and_resume_reproduces(rig):
    r, lp, K, target, init, Tc = rig
    kwargs = dict(num_steps=100, max_lr=3e-3, rebin_every=10, Tc_c2b_gt=Tc)

    # Uninterrupted run
    full = calibrate(init, r, lp, K, target, **kwargs)

    # "Killed" run: capture the resumable state the trainer would have
    # checkpointed at step 50, then resume a fresh call from it.
    states = {}
    calibrate(
        init, r, lp, K, target,
        step_hook=lambda done, s: states.setdefault(done, s), **kwargs
    )
    assert 50 in states
    resumed = calibrate(
        init, r, lp, K, target, resume_state=states[50], **kwargs
    )

    np.testing.assert_array_equal(resumed.dof, full.dof)
    np.testing.assert_array_equal(resumed.losses, full.losses)
    np.testing.assert_array_equal(resumed.history, full.history)
    assert resumed.losses.shape == (100,)


def test_resume_from_complete_state_is_noop(rig):
    r, lp, K, target, init, Tc = rig
    kwargs = dict(num_steps=60, max_lr=3e-3, Tc_c2b_gt=Tc)
    states = {}
    full = calibrate(
        init, r, lp, K, target,
        step_hook=lambda done, s: states.setdefault(done, s), **kwargs
    )
    resumed = calibrate(
        init, r, lp, K, target, resume_state=states[60], **kwargs
    )
    np.testing.assert_array_equal(resumed.dof, full.dof)
    np.testing.assert_array_equal(resumed.losses, full.losses)


@pytest.mark.slow
def test_offline_trainer_resume(tmp_path):
    """run_offline_calibration with solver.load='latest' restores the
    midrun checkpoint written by the step hook, and writes mid-run image
    panels."""
    import tempfile

    import jax

    from __graft_entry__ import MINI_URDF
    from easyhec_tpu.config.config import Config
    from easyhec_tpu.data.dataset import CalibBatch
    from easyhec_tpu.trainer.offline import build_runtime, run_offline_calibration
    from easyhec_tpu.utils.checkpoint import load_checkpoint

    cfg = Config()
    with tempfile.NamedTemporaryFile("w", suffix=".urdf", delete=False) as f:
        f.write(MINI_URDF)
        cfg.model.urdf_path = f.name
    cfg.solver.num_epochs = 60
    cfg.solver.save_freq = 50
    cfg.solver.log_interval = 50
    cfg.model.init_method = "gt"
    cfg.output_dir = str(tmp_path / "run")
    cfg.render.tile_h, cfg.render.tile_w, cfg.render.capacity = 16, 32, 128
    cfg.render.fused = True
    cfg.model.H, cfg.model.W = 48, 64

    rt = build_runtime(cfg)
    chain = rt.chain
    link_idx = [chain.link_index(n) for n in rt.link_names]
    qpos = np.zeros((2, chain.n_dof), np.float32)
    qpos[1] = 0.3
    lp = np.stack([chain.fk_np(q)[link_idx] for q in qpos]).astype(np.float32)
    Tc = np.asarray(
        se3.exp(jnp.asarray([0.0, 0.0, 1.0, 0.1, -0.1, 0.05])), np.float32
    )
    K = np.array([[70.0, 0, 32], [0, 70.0, 24], [0, 0, 1]], np.float32)
    target = np.asarray(
        rt.renderer.silhouette(jnp.asarray(Tc), jnp.asarray(lp), jnp.asarray(K))
    )
    batch = CalibBatch(
        rgb=np.zeros((2, 1, 1, 3), np.uint8),
        masks=target.astype(np.float32),
        qpos=qpos,
        link_poses=lp,
        K=K,
        Tc_c2b_gt=Tc,
    )
    init = np.asarray(se3.log(jnp.asarray(Tc))) + np.asarray(
        [0.01, -0.01, 0.01, 0.01, -0.01, 0.01], np.float32
    )

    # First run writes midrun checkpoints
    run_offline_calibration(cfg, batch=batch, init_dof=init)
    mid = tmp_path / "run" / "checkpoints" / "midrun.npz"
    assert mid.exists()
    state, _ = load_checkpoint(mid)
    assert int(state["step"]) == 60
    # Mid-run observability: image panels were written
    imgs = list((tmp_path / "run" / "images").glob("*.png"))
    assert imgs, "mid-run image panels missing"
    # Second run with load=latest resumes (from the completed state -> noop
    # optimization, same final pose)
    cfg.solver.load = "latest"
    res2 = run_offline_calibration(cfg, batch=batch, init_dof=init)
    np.testing.assert_array_equal(state["dof"], res2.dof)
