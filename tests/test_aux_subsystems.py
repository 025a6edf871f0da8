"""Workspace boundary, LR finder, ring pose dataset (SURVEY.md §2 aux items)."""
import jax.numpy as jnp
import numpy as np

from easyhec_tpu.io.workspace import (
    box_surface_points,
    table_points,
    workspace_boundary_points,
)
from easyhec_tpu.solver.lr_finder import find_lr


def test_box_surface_points_on_faces():
    pts = box_surface_points((-1, -2, 0), (1, 2, 3), n=2000, seed=0)
    assert pts.shape == (2000, 3)
    lo, hi = np.array([-1, -2, 0]), np.array([1, 2, 3])
    assert (pts >= lo - 1e-5).all() and (pts <= hi + 1e-5).all()
    on_face = np.zeros(len(pts), bool)
    for ax in range(3):
        on_face |= np.isclose(pts[:, ax], lo[ax]) | np.isclose(pts[:, ax], hi[ax])
    assert on_face.all()


def test_workspace_boundary_composition():
    pts = workspace_boundary_points(n_box=500, n_table=200, table_z=-0.01)
    # table points within base_clear_radius of the robot base are dropped
    # (reference keeps norm > 0.1, workspace_boundary.py:19-20)
    assert 650 <= pts.shape[0] <= 700
    table = pts[500:]
    assert np.isclose(table[:, 2], -0.01).all()  # table samples at z
    assert (np.linalg.norm(table[:, :2], axis=1) > 0.2).all()


def test_table_points_plane():
    pts = table_points(z=0.5, n=100)
    assert np.isclose(pts[:, 2], 0.5).all()


def test_lr_finder_quadratic():
    # loss = ||x - c||^2: stable for lr < 1 (GD), diverges at lr >= 1.
    c = jnp.asarray([1.0, -2.0, 0.5])

    def loss(x):
        return jnp.sum((x - c) ** 2)

    res = find_lr(
        loss, jnp.zeros(3), start_lr=1e-5, end_lr=10.0, num_steps=80,
        optimizer="sgd",
    )
    assert res.losses.shape == (80,)
    assert 1e-4 < res.suggestion < 1.01  # in the stable range
    assert res.diverged_at < 80  # picks up the divergence at large lr


def test_ring_pose_dataset(mini_rig, tmp_path):
    import jax

    from easyhec_tpu.data.synthetic import generate_pose_dataset

    chain, renderer, link_idx = mini_rig
    K = np.array([[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]], np.float32)
    out = generate_pose_dataset(
        tmp_path / "ring", chain, renderer, ["base", "upper", "fore"], K,
        n_views=6, radius=0.9, height=0.6,
    )
    assert out["poses"].shape == (6, 4, 4)
    assert out["masks"].shape[0] == 6
    assert out["masks"].sum() > 0  # the arm is visible
    assert out["diameter"] > 0.3
    for sub in ("color", "mask", "pose"):
        assert len(list((tmp_path / "ring" / sub).iterdir())) == 6
    assert (tmp_path / "ring" / "model.ply").exists()
    # poses look at the target: camera z-axis points toward the arm
    for i in range(6):
        P = np.loadtxt(tmp_path / "ring" / "pose" / f"{i:06d}.txt")
        c = -P[:3, :3].T @ P[:3, 3]
        assert 0.8 < np.linalg.norm(c[:2]) < 1.0  # on the ring radius


def test_live_dashboard_and_server(tmp_path):
    # live monitor (utils/live.py): dashboard file + stdlib server with the
    # /api/ls endpoint — the reference's TB-during-training role.
    import json as _json
    import urllib.request

    from easyhec_tpu.utils.live import write_dashboard, serve
    from easyhec_tpu.utils.logging import MetricsWriter

    run = tmp_path / "run"
    w = MetricsWriter(run)
    for s in range(5):
        w.scalars(s, mask_loss=1.0 / (s + 1))
    w.image(3, "panel", np.zeros((8, 8)))
    w.close()
    page = write_dashboard(run)
    assert page.exists() and "metrics.jsonl" in page.read_text()

    import socket

    with socket.socket() as sck:
        sck.bind(("127.0.0.1", 0))
        port = sck.getsockname()[1]
    srv = serve(run, port=port, background=True)
    try:
        base = f"http://127.0.0.1:{port}"
        html = urllib.request.urlopen(f"{base}/live.html", timeout=5).read()
        assert b"easyhec_tpu live" in html
        ls = _json.loads(
            urllib.request.urlopen(f"{base}/api/ls", timeout=5).read()
        )
        assert any(f.startswith("panel_") for f in ls)
        lines = urllib.request.urlopen(
            f"{base}/metrics.jsonl", timeout=5
        ).read().decode().strip().splitlines()
        assert len(lines) == 5
    finally:
        srv.shutdown()
