"""Bin-load audit for the BASELINE config-(5) ring: 4 views x 20 frames
@ 1920x1080 f=1400, xArm7 meshes (decimate 0.004), per-view max over the
ring — budgets for the real-chip config-5 stage (scripts/config5_chip.py).

Usage: python scripts/audit_config5_ring.py [margin] [tiles]
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from bin_audit import audit_scene  # scripts/bin_audit.py

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from easyhec_tpu.geometry import camera, se3
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
from easyhec_tpu.robot.mesh import decimate_vertex_clustering

REFERENCE_ASSETS = pathlib.Path("/root/reference/assets")


def main() -> int:
    margin = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    tiles = sys.argv[2] if len(sys.argv) > 2 else "16x64"
    H, W, f = 1080, 1920, 1400.0
    n_views, n_frames = 4, 20

    model = parse_urdf(REFERENCE_ASSETS / "xarm7_with_gripper_reduced_dof.urdf")
    chain = build_chain(model)
    names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    mesh_list = [decimate_vertex_clustering(meshes[n], 0.004) for n in names]
    link_idx = jnp.asarray([chain.link_index(n) for n in names])

    K = np.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    rings = camera.ring_poses(
        n_views, 1.2, 0.8, target=jnp.asarray([0.0, 0.0, 0.3])
    )
    Tcs = jax.vmap(se3.inverse)(rings)
    lo = jnp.asarray(chain.joint_limits[:, 0] * 0.4)
    hi = jnp.asarray(chain.joint_limits[:, 1] * 0.4)
    qs = jax.random.uniform(
        jax.random.PRNGKey(0), (n_frames, chain.n_dof), minval=lo, maxval=hi
    )

    for spec in tiles.split(","):
        th, tw = (int(x) for x in spec.split("x"))
        r = RobotRenderer(
            mesh_list, H, W, tile=TileConfig(th, tw, 128, cull_backfaces=True)
        )
        agg: dict = {}
        for v in range(n_views):
            rep = audit_scene(r, chain, link_idx, K, Tcs[v], qs, margin)
            for k in ("max_load", "big_span_count", "max_span_y", "max_span_x",
                      "compact_chunks_needed"):
                agg[k] = max(agg.get(k, 0), rep[k])
            print(f"view {v}: {json.dumps(rep)}", flush=True)
        print(
            f"RING MAX {spec} margin={margin}: {json.dumps(agg)}", flush=True
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
