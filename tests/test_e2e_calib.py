"""Closed-loop end-to-end test: synthetic GT dataset -> offline calibration
recovers the camera pose. This is the framework's equivalent of the
reference's SAPIEN-simulator-based verification (SURVEY.md §4.5), fully
self-contained: procedural URDF, own rasterizer for data gen AND solving.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from easyhec_tpu.config import Config
from easyhec_tpu.data import generate_dataset, load_calib_dataset
from easyhec_tpu.data.synthetic import default_camera
from easyhec_tpu.geometry import se3
from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.trainer import run_offline_calibration

ARM_URDF = """<?xml version="1.0"?>
<robot name="mini_arm">
  <link name="base">
    <visual><geometry><cylinder radius="0.06" length="0.1"/></geometry>
      <origin xyz="0 0 0.05" rpy="0 0 0"/></visual>
  </link>
  <link name="upper">
    <visual><geometry><box size="0.07 0.07 0.3"/></geometry>
      <origin xyz="0 0 0.15" rpy="0 0 0"/></visual>
  </link>
  <link name="fore">
    <visual><geometry><box size="0.05 0.05 0.25"/></geometry>
      <origin xyz="0 0 0.125" rpy="0 0 0"/></visual>
  </link>
  <joint name="shoulder" type="revolute">
    <origin xyz="0 0 0.1" rpy="0 0 0"/>
    <parent link="base"/><child link="upper"/>
    <axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" velocity="1" effort="10"/>
  </joint>
  <joint name="elbow" type="revolute">
    <origin xyz="0 0 0.3" rpy="0 0 0"/>
    <parent link="upper"/><child link="fore"/>
    <axis xyz="0 1 0"/>
    <limit lower="-2.0" upper="2.0" velocity="1" effort="10"/>
  </joint>
</robot>
"""

H, W = 120, 160
K = np.array([[140.0, 0, 80], [0, 140.0, 60], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rig")
    urdf = tmp / "mini_arm.urdf"
    urdf.write_text(ARM_URDF)
    model = parse_urdf(urdf)
    chain = build_chain(model)
    link_names = ["base", "upper", "fore"]
    meshes = load_link_meshes(model, link_names=link_names)
    renderer = RobotRenderer(
        [meshes[n] for n in link_names],
        H,
        W,
        tile=TileConfig(16, 32, 64),
        mode="tiled",
    )
    return urdf, chain, renderer, link_names, tmp


class TestSyntheticPipeline:
    def test_generate_and_load_roundtrip(self, rig):
        urdf, chain, renderer, link_names, tmp = rig
        Tc = default_camera(distance=1.0, azimuth_deg=30, height=0.6, target=(0, 0, 0.3))
        out = tmp / "synth"
        data = generate_dataset(
            out, chain, renderer, link_names, Tc, K, n_frames=4, seed=1
        )
        assert data["masks"].shape == (4, H, W)
        assert data["masks"].max() == 1.0
        assert (data["masks"] > 0.5).mean() > 0.005  # robot visible
        assert data["rgb"].shape == (4, H, W, 3)
        # shaded pixels brighter than background
        m = data["masks"][0] > 0.5
        assert data["rgb"][0][m].mean() > data["rgb"][0][~m].mean()

        batch = load_calib_dataset(out, chain, link_names)
        assert batch.n_frames == 4
        assert batch.has_gt
        np.testing.assert_allclose(batch.Tc_c2b_gt, Tc, atol=1e-5)
        np.testing.assert_allclose(batch.masks, (data["masks"] > 0.5), atol=1e-6)
        np.testing.assert_allclose(batch.qpos, data["qpos"], atol=1e-5)

    def test_split_dataset(self, rig):
        from easyhec_tpu.data.synthetic import split_dataset

        urdf, chain, renderer, link_names, tmp = rig
        Tc = default_camera(distance=1.0, azimuth_deg=30, height=0.6, target=(0, 0, 0.3))
        out = tmp / "synth_split"
        generate_dataset(out, chain, renderer, link_names, Tc, K, n_frames=5, seed=3)
        tr, va = split_dataset(out, train_fraction=0.8, seed=0)
        assert len(tr) == 4 and len(va) == 1
        assert sorted(tr + va) == list(range(5))
        # Both subsets load as self-contained datasets with GT + renumbered frames
        for name, ids in (("train", tr), ("val", va)):
            sub = load_calib_dataset(out / name, chain, link_names)
            assert sub.n_frames == len(ids)
            assert sub.has_gt
            full = load_calib_dataset(out, chain, link_names)
            np.testing.assert_allclose(sub.qpos, full.qpos[ids], atol=1e-6)
            np.testing.assert_allclose(sub.masks, full.masks[ids], atol=1e-6)

    @pytest.mark.slow
    def test_offline_calibration_recovers_gt(self, rig):
        urdf, chain, renderer, link_names, tmp = rig
        Tc = default_camera(distance=1.0, azimuth_deg=30, height=0.6, target=(0, 0, 0.3))
        out = tmp / "synth2"
        generate_dataset(out, chain, renderer, link_names, Tc, K, n_frames=5, seed=2)

        cfg = Config()
        cfg.model.urdf_path = str(urdf)
        cfg.model.use_links = link_names
        cfg.model.H, cfg.model.W = H, W
        cfg.render.tile_h, cfg.render.tile_w, cfg.render.capacity = 16, 32, 64
        cfg.solver.num_epochs = 300
        cfg.solver.max_lr = 3e-3
        cfg.dataset.data_dir = str(out)
        cfg.output_dir = str(tmp / "run")

        # Perturbed init: ~4cm + ~3deg off
        gt_dof = np.asarray(se3.log(jnp.asarray(Tc)))
        init = gt_dof + np.array([0.03, -0.02, 0.03, 0.03, -0.02, 0.04], np.float32)
        result = run_offline_calibration(cfg, init_dof=init)

        assert result.losses[-1] < 0.15 * result.losses[0]
        assert result.metrics, "GT present -> metrics must be emitted"
        assert result.metrics["err_trans_geodesic_cm"] < 1.0, result.metrics
        assert result.metrics["err_rot_geodesic_deg"] < 1.0, result.metrics
        # History = pose per step, first entry = init
        assert result.history.shape == (300, 6)
        np.testing.assert_allclose(result.history[0], init, atol=1e-6)
        # Artifacts on disk
        run_dir = tmp / "run"
        assert (run_dir / "Tc_c2b.txt").exists()
        assert (run_dir / "metrics.json").exists()
        assert (run_dir / "config.yaml").exists()
        assert (run_dir / "checkpoints" / "final.npz").exists()
        assert (run_dir / "metrics.jsonl").exists()

    def test_checkpoint_roundtrip(self, rig, tmp_path):
        from easyhec_tpu.utils import load_checkpoint, save_checkpoint, latest_checkpoint

        p = save_checkpoint(
            tmp_path / "ck" / "step_100",
            {"dof": np.arange(6.0), "losses": np.ones(10)},
            meta={"step": 100},
        )
        arrays, meta = load_checkpoint(p)
        np.testing.assert_allclose(arrays["dof"], np.arange(6.0))
        assert meta["step"] == 100
        assert latest_checkpoint(tmp_path / "ck") == p


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        from easyhec_tpu.config import load_config, save_config

        cfg = Config()
        cfg.solver.max_lr = 0.01
        cfg.model.use_links = ["a", "b"]
        save_config(cfg, tmp_path / "c.yaml")
        cfg2 = load_config(tmp_path / "c.yaml")
        assert cfg2.solver.max_lr == 0.01
        assert cfg2.model.use_links == ["a", "b"]

    def test_overrides(self):
        from easyhec_tpu.config import apply_overrides

        cfg = Config()
        apply_overrides(cfg, ["solver.max_lr=0.05", "model.H=720", "render.use_pallas=false"])
        assert cfg.solver.max_lr == 0.05
        assert cfg.model.H == 720
        assert cfg.render.use_pallas is False

    def test_unknown_key_rejected(self, tmp_path):
        from easyhec_tpu.config import load_config

        (tmp_path / "bad.yaml").write_text("solver:\n  nonsense: 1\n")
        with pytest.raises(KeyError):
            load_config(tmp_path / "bad.yaml")
