import struct
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyhec_tpu.robot import (
    build_chain,
    load_mesh,
    make_box,
    make_cylinder,
    pack_meshes,
    parse_urdf,
)

XARM_URDF = Path("/root/reference/assets/xarm7_with_gripper_reduced_dof.urdf")

TWO_LINK_URDF = """<?xml version="1.0"?>
<robot name="two_link">
  <link name="base"/>
  <link name="upper"/>
  <link name="fore"/>
  <link name="tool"/>
  <joint name="shoulder" type="revolute">
    <origin xyz="0 0 0.5" rpy="0 0 0"/>
    <parent link="base"/>
    <child link="upper"/>
    <axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14" velocity="1.0" effort="10"/>
  </joint>
  <joint name="elbow" type="revolute">
    <origin xyz="1 0 0" rpy="0 0 0"/>
    <parent link="upper"/>
    <child link="fore"/>
    <axis xyz="0 0 1"/>
    <limit lower="-2.0" upper="2.0" velocity="1.0" effort="10"/>
  </joint>
  <joint name="wrist" type="prismatic">
    <origin xyz="1 0 0" rpy="0 0 0"/>
    <parent link="fore"/>
    <child link="tool"/>
    <axis xyz="1 0 0"/>
    <limit lower="0" upper="0.5" velocity="1.0" effort="10"/>
  </joint>
</robot>
"""


@pytest.fixture
def two_link(tmp_path):
    p = tmp_path / "two_link.urdf"
    p.write_text(TWO_LINK_URDF)
    return parse_urdf(p)


class TestURDF:
    def test_parse(self, two_link):
        assert two_link.name == "two_link"
        assert two_link.link_names == ["base", "upper", "fore", "tool"]
        assert len(two_link.joints) == 3
        assert len(two_link.actuated_joints) == 3
        np.testing.assert_allclose(
            two_link.joint_limits,
            [[-3.14, 3.14], [-2.0, 2.0], [0, 0.5]],
            atol=1e-6,
        )

    def test_fk_zero(self, two_link):
        chain = build_chain(two_link)
        poses = chain.fk(jnp.zeros(3))
        assert poses.shape == (4, 4, 4)
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
        np.testing.assert_allclose(poses[1][:3, 3], [0, 0, 0.5], atol=1e-6)
        np.testing.assert_allclose(poses[2][:3, 3], [1, 0, 0.5], atol=1e-6)
        np.testing.assert_allclose(poses[3][:3, 3], [2, 0, 0.5], atol=1e-6)

    def test_fk_bent(self, two_link):
        chain = build_chain(two_link)
        q = jnp.array([np.pi / 2, -np.pi / 2, 0.25])
        poses = chain.fk(q)
        # shoulder +90°: upper link +x becomes +y
        np.testing.assert_allclose(poses[2][:3, 3], [0, 1, 0.5], atol=1e-5)
        # elbow -90° cancels; prismatic extends 0.25 along local x (now +x world)
        np.testing.assert_allclose(poses[3][:3, 3], [1.25, 1, 0.5], atol=1e-5)

    def test_fk_np_matches_jax(self, two_link):
        chain = build_chain(two_link)
        q = np.array([0.3, -0.7, 0.1])
        np.testing.assert_allclose(chain.fk_np(q), chain.fk(jnp.asarray(q)), atol=1e-5)

    def test_fk_vmap_jit(self, two_link):
        chain = build_chain(two_link)
        qs = jax.random.uniform(jax.random.PRNGKey(0), (16, 3), minval=-1, maxval=1)
        batched = jax.jit(jax.vmap(chain.fk))(qs)
        assert batched.shape == (16, 4, 4, 4)
        single = chain.fk(qs[3])
        np.testing.assert_allclose(batched[3], single, atol=1e-6)

    def test_fk_grad(self, two_link):
        chain = build_chain(two_link)

        def tool_x(q):
            return chain.fk(q)[3, 0, 3]

        g = jax.grad(tool_x)(jnp.array([0.0, 0.0, 0.0]))
        # d(tool x)/d(shoulder) at zero: tool at (2,0), rotating about z moves x by -y = 0...
        # analytic: x = cos(q0+q1)*(1+q2) + cos(q0); dx/dq0 at 0 = 0 is wrong:
        # x(q0,q1,q2) = cos(q0) + (1+q2)cos(q0+q1); dx/dq0 = -sin(q0) - (1+q2)sin(q0+q1) = 0 at 0
        np.testing.assert_allclose(g, [0.0, 0.0, 1.0], atol=1e-5)


@pytest.mark.skipif(not XARM_URDF.exists(), reason="reference assets unavailable")
class TestRealURDF:
    def test_parse_xarm(self):
        model = parse_urdf(XARM_URDF)
        # 7 arm revolute + gripper drive (prismatic x2, one may mimic)
        assert len([j for j in model.joints if j.joint_type != 0]) == 9
        chain = build_chain(model)
        assert chain.n_dof >= 7
        poses = chain.fk(jnp.zeros(chain.n_dof))
        assert poses.shape[0] == len(model.links)
        assert np.all(np.isfinite(np.asarray(poses)))
        # xArm7 zero pose: link7 (flange) should be above the base, z in ~[0.1, 1.0]
        idx = chain.link_index("link7")
        z = float(poses[idx][2, 3])
        assert 0.1 < z < 1.2, z

    def test_load_glb_meshes(self):
        from easyhec_tpu.robot import load_link_meshes

        model = parse_urdf(XARM_URDF)
        meshes = load_link_meshes(model, link_names=["link1"])
        if not meshes:
            pytest.skip("mesh files not present")
        m = meshes["link1"]
        assert m.n_vertices > 100 and m.n_faces > 100
        lo, hi = m.bounds()
        assert np.all(hi - lo < 1.0)  # a robot link is well under 1 m


class TestMeshIO:
    def test_box_and_pack(self):
        b = make_box((1, 2, 3))
        assert b.n_vertices == 8 and b.n_faces == 12
        lo, hi = b.bounds()
        np.testing.assert_allclose(hi - lo, [1, 2, 3])
        c = make_cylinder(0.5, 2.0, sections=8)
        packed = pack_meshes([b, c])
        assert packed.n_meshes == 2
        assert packed.vertices.shape[0] == b.n_vertices + c.n_vertices
        assert packed.faces.max() < packed.vertices.shape[0]
        assert (packed.face_mesh_id[: b.n_faces] == 0).all()
        assert (packed.face_mesh_id[b.n_faces :] == 1).all()

    def test_stl_binary_roundtrip(self, tmp_path):
        box = make_box((1, 1, 1))
        tri = box.vertices[box.faces]  # [M,3,3]
        path = tmp_path / "box.stl"
        with open(path, "wb") as f:
            f.write(b"\x00" * 80)
            f.write(struct.pack("<I", len(tri)))
            for t in tri:
                f.write(b"\x00" * 12)
                f.write(t.astype("<f4").tobytes())
                f.write(b"\x00\x00")
        loaded = load_mesh(path)
        assert loaded.n_faces == 12
        lo, hi = loaded.bounds()
        np.testing.assert_allclose(hi - lo, [1, 1, 1])

    def test_stl_ascii(self, tmp_path):
        lines = ["solid test"]
        box = make_box((2, 2, 2))
        for t in box.vertices[box.faces]:
            lines.append(" facet normal 0 0 0")
            lines.append("  outer loop")
            for v in t:
                lines.append(f"   vertex {v[0]} {v[1]} {v[2]}")
            lines.append("  endloop")
            lines.append(" endfacet")
        lines.append("endsolid test")
        path = tmp_path / "box_ascii.stl"
        path.write_text("\n".join(lines))
        loaded = load_mesh(path)
        assert loaded.n_faces == 12
        lo, hi = loaded.bounds()
        np.testing.assert_allclose(hi - lo, [2, 2, 2])

    def test_obj(self, tmp_path):
        path = tmp_path / "tri.obj"
        path.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2/1 4/2 3/3\n")
        m = load_mesh(path)
        assert m.n_vertices == 4 and m.n_faces == 2

    def test_ply_ascii(self, tmp_path):
        path = tmp_path / "tri.ply"
        path.write_text(
            "ply\nformat ascii 1.0\nelement vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\nproperty list uchar int vertex_indices\n"
            "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
        )
        m = load_mesh(path)
        assert m.n_vertices == 3 and m.n_faces == 1

    def test_transform(self):
        b = make_box((1, 1, 1))
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [5, 0, 0]
        lo, hi = b.transformed(T).bounds()
        np.testing.assert_allclose((lo + hi) / 2, [5, 0, 0], atol=1e-6)


@pytest.mark.skipif(not XARM_URDF.exists(), reason="reference assets unavailable")
class TestZeroPoseParity:
    def test_fk_posed_meshes_match_reference_zeropos_ply(self):
        """Independent ground truth: the reference ships the xArm7 zero-pose
        geometry as a PLY (assets/xarm7_zeropos.ply). FK-posing our parsed
        link meshes must reproduce its spatial extent."""
        from easyhec_tpu.robot import load_link_meshes, load_mesh

        ply = load_mesh("/root/reference/assets/xarm7_zeropos.ply")
        ref_lo, ref_hi = ply.bounds()

        model = parse_urdf(XARM_URDF)
        chain = build_chain(model)
        names = [f"link{i}" for i in range(1, 8)]
        meshes = load_link_meshes(model, link_names=names)
        if len(meshes) < 7:
            pytest.skip("mesh files not present")
        poses = np.asarray(chain.fk(jnp.zeros(chain.n_dof)))
        los, his = [], []
        for n in names:
            T = poses[chain.link_index(n)]
            lo, hi = meshes[n].transformed(T).bounds()
            los.append(lo)
            his.append(hi)
        lo = np.min(los, axis=0)
        hi = np.max(his, axis=0)
        # The PLY also contains the base + gripper; allow ~6cm slack
        np.testing.assert_allclose(hi, ref_hi, atol=0.06)
        assert lo[2] > ref_lo[2] - 0.02  # nothing below the base plane
