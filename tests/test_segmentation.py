"""U-Net segmenter: train on synthetic renders, predict masks, plug into the
MaskSource interface (the PointRend/SAM capability, SURVEY.md §2.3)."""
import numpy as np
import pytest

from easyhec_tpu.data import generate_dataset
from easyhec_tpu.data.synthetic import default_camera
from easyhec_tpu.models.segmentation import (
    SegmenterMaskSource,
    load_params,
    save_params,
    train_segmenter,
)

from test_e2e_calib import ARM_URDF, K


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from easyhec_tpu.render import RobotRenderer, TileConfig
    from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf

    tmp = tmp_path_factory.mktemp("seg")
    urdf = tmp / "mini.urdf"
    urdf.write_text(ARM_URDF)
    model = parse_urdf(urdf)
    chain = build_chain(model)
    links = ["base", "upper", "fore"]
    meshes = load_link_meshes(model, link_names=links)
    renderer = RobotRenderer([meshes[n] for n in links], 64, 64, tile=TileConfig(16, 32, 64))
    Kc = np.array([[70.0, 0, 32], [0, 70.0, 32], [0, 0, 1]], np.float32)
    Tc = default_camera(distance=1.0, azimuth_deg=30, height=0.6, target=(0, 0, 0.3))
    data = generate_dataset(tmp / "d", chain, renderer, links, Tc, Kc, n_frames=12, seed=0)
    return data


class TestSegmenter:
    @pytest.mark.slow
    def test_train_and_predict(self, synth, tmp_path):
        params, loss = train_segmenter(
            synth["rgb"], (synth["masks"] > 0.5).astype(np.float32),
            steps=300, batch_size=4, base=8, seed=0,
        )
        assert np.isfinite(loss) and loss < 0.25, loss

        src = SegmenterMaskSource(params, base=8)
        pred = src.predict(synth["rgb"][0])
        gt = synth["masks"][0] > 0.5
        inter = (pred.astype(bool) & gt).sum()
        union = (pred.astype(bool) | gt).sum()
        assert inter / max(union, 1) > 0.6, inter / max(union, 1)

        # params roundtrip
        save_params(tmp_path / "seg.pkl", params)
        params2 = load_params(tmp_path / "seg.pkl")
        src2 = SegmenterMaskSource(params2, base=8)
        np.testing.assert_allclose(src2.predict(synth["rgb"][0]), pred)

    @pytest.mark.slow
    def test_predicted_masks_calibrate_closed_loop(self, synth, tmp_path):
        """The full markerless story WITHOUT GT masks: train the segmenter on
        synthetic renders, calibrate against its PREDICTED masks on held-out
        frames, recover the camera pose (reference workflow: PointRend masks
        feed RBSolver, rbsolve_iter.py:243-256 -> rb_solver.py:70)."""
        import jax.numpy as jnp

        from easyhec_tpu.data.synthetic import default_camera
        from easyhec_tpu.geometry import se3
        from easyhec_tpu.models.calib import calibrate
        from easyhec_tpu.render import RobotRenderer, TileConfig
        from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf

        urdf = tmp_path / "mini.urdf"
        urdf.write_text(ARM_URDF)
        model = parse_urdf(urdf)
        chain = build_chain(model)
        links = ["base", "upper", "fore"]
        meshes = load_link_meshes(model, link_names=links)
        # cap 192 covers this rig's true bin loads (~96 + drift headroom;
        # calibrate raises on overflow since r4 — the old cap 64 truncated)
        renderer = RobotRenderer(
            [meshes[n] for n in links], 64, 64, tile=TileConfig(16, 32, 192)
        )
        Kc = np.array([[70.0, 0, 32], [0, 70.0, 32], [0, 0, 1]], np.float32)
        Tc = default_camera(distance=1.0, azimuth_deg=30, height=0.6,
                            target=(0, 0, 0.3))
        held = generate_dataset(
            tmp_path / "held", chain, renderer, links, Tc, Kc,
            n_frames=5, seed=7,
        )
        params, _ = train_segmenter(
            synth["rgb"], (synth["masks"] > 0.5).astype(np.float32),
            steps=300, batch_size=4, base=8, seed=0,
        )
        src = SegmenterMaskSource(params, base=8)
        pred = np.stack([src.predict(f) for f in held["rgb"]])
        ious = [
            ((p.astype(bool) & (m > 0.5)).sum()
             / max((p.astype(bool) | (m > 0.5)).sum(), 1))
            for p, m in zip(pred, held["masks"])
        ]
        assert min(ious) > 0.5, ious

        import jax

        link_idx = jnp.asarray([chain.link_index(n) for n in links])
        lp = jax.vmap(chain.fk)(jnp.asarray(held["qpos"]))[:, link_idx]
        gt_dof = np.asarray(se3.log(jnp.asarray(Tc)))
        init = gt_dof + np.array([0.02, -0.02, 0.02, 0.02, -0.02, 0.03],
                                 np.float32)
        res = calibrate(
            init, renderer, np.asarray(lp), Kc, pred,
            num_steps=300, max_lr=3e-3, Tc_c2b_gt=Tc,
        )
        assert res.metrics["err_trans_geodesic_cm"] < 2.0, res.metrics
        assert res.metrics["err_rot_geodesic_deg"] < 2.0, res.metrics
