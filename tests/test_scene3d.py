"""Scene3D recorder + profiling probe tests (Vis3D-equivalent, SURVEY.md §2 L8)."""
import json

import numpy as np

from easyhec_tpu.utils.profiling import EvalTimer, raster_roofline
from easyhec_tpu.utils.scene3d import Scene3D


def _manifest(d):
    return [json.loads(l) for l in (d / "manifest.jsonl").read_text().splitlines()]


def test_scene3d_adders(tmp_path):
    viz = Scene3D(tmp_path, enable=True)
    viz.set_scene_id(3)
    viz.add_point_cloud(np.random.default_rng(0).random((10, 3)), name="pc")
    viz.add_mesh(np.eye(3), np.array([[0, 1, 2]]), name="tri")
    viz.add_boxes([[0, 0, 0]], [[1, 1, 1]])
    viz.add_lines([[0, 0, 0]], [[1, 0, 0]])
    viz.add_spheres([[0, 0, 1]], [0.1])
    viz.add_camera(np.eye(4), K=np.eye(3))
    viz.add_image(np.zeros((4, 4)))
    d = tmp_path / "scenes" / "00003"
    entries = _manifest(d)
    kinds = [e["type"] for e in entries]
    for k in ["point_cloud", "mesh", "boxes", "lines", "spheres", "camera", "image"]:
        assert k in kinds
    ply = (d / "pc.ply").read_text()
    assert ply.startswith("ply") and "element vertex 10" in ply
    mesh_ply = (d / "tri.ply").read_text()
    assert "element face 1" in mesh_ply


def test_scene3d_disabled_writes_nothing(tmp_path):
    viz = Scene3D(tmp_path, enable=False)
    viz.add_point_cloud(np.zeros((3, 3)))
    assert not (tmp_path / "scenes").exists()


def test_scene3d_robot(tmp_path, mini_rig):
    chain, renderer, link_idx = mini_rig
    viz = Scene3D(tmp_path, enable=True)
    viz.add_robot(chain, renderer, np.asarray(link_idx), np.eye(4),
                  np.zeros(chain.n_dof))
    d = tmp_path / "scenes" / "00000"
    (entry,) = _manifest(d)
    assert entry["type"] == "robot"
    text = (d / entry["file"]).read_text()
    n_verts = int(text.split("element vertex ")[1].split()[0])
    total = sum(len(renderer.link_vertices(i)) for i in range(renderer.n_links))
    assert n_verts == total


def test_link_accessors_roundtrip(mini_rig):
    _, renderer, _ = mini_rig
    for li in range(renderer.n_links):
        v = renderer.link_vertices(li)
        f = renderer.link_faces(li)
        assert len(v) > 0 and f.min() >= 0 and f.max() < len(v)


def test_eval_timer_and_roofline():
    t = EvalTimer(enabled=True)
    t("start")
    t("step")
    assert "step" in t.summary()
    r = raster_roofline(n_pixels=640 * 480, n_triangles=20000, capacity=256)
    assert r["speed_of_light_pix_s"] > 0
    assert r["speed_of_light_pix_s"] <= r["compute_bound_pix_s"] + 1
