"""BASELINE config (4): space-exploration scoring benchmark.

Reference workload (easyhec/modeling/models/rb_solve/space_explorer.py:99-164):
1000 candidate qposes x 10 hypothesis renders + per-candidate CPU planning,
iterated in Python — each candidate issues 10 packed CUDA renders.

Here the whole scoring pass (FK for 1000 candidates, feasibility gates,
1000 x 10 silhouette renders, variance reduction) is ONE compiled program.
Timed with the same scan+readback discipline as bench.py. Prints one JSON
line; run on the real chip.

Usage: python scripts/bench_explorer.py [n_candidates] [downscale]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

REFERENCE_ASSETS = pathlib.Path("/root/reference/assets")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from easyhec_tpu.geometry import camera, se3
    from easyhec_tpu.models.calib import downscale_K
    from easyhec_tpu.models.explorer import SpaceExplorer, build_link_spheres
    from easyhec_tpu.render import RobotRenderer
    from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
    from easyhec_tpu.robot.mesh import decimate_vertex_clustering

    n_cand = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    ds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_hyp = 10
    H, W = 720 // ds, 1280 // ds  # xArm7 online resolution / downscale

    urdf = REFERENCE_ASSETS / "xarm7_with_gripper_reduced_dof.urdf"
    model = parse_urdf(urdf)
    chain = build_chain(model)
    names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    mesh_list = [decimate_vertex_clustering(meshes[n], 0.004) for n in names]
    from easyhec_tpu.render import TileConfig

    renderer = RobotRenderer(
        mesh_list, H, W,
        tile=TileConfig(16, 128, 512, True, binner="count", rect_y=5,
                        rect_x=2, margin=2.0, cull_backfaces=True),
    )
    spheres = build_link_spheres(chain, {n: meshes[n] for n in names})
    K = downscale_K(
        np.asarray([[906.8, 0, 650.2], [0, 906.7, 367.7], [0, 0, 1]]), ds
    )

    explorer = SpaceExplorer(
        chain, renderer, names, spheres=spheres,
        n_sample_qposes=n_cand, n_hypotheses=n_hyp, history_start=0,
    )

    # History: a cloud of poses around a plausible camera.
    Tcam = camera.look_at(
        jnp.asarray([1.1, 0.8, 0.9]), jnp.asarray([0.0, 0.0, 0.3]),
        jnp.asarray([0.0, 0.0, 1.0]),
    )
    xi = np.asarray(se3.log(se3.inverse(Tcam)))
    rng = np.random.default_rng(0)
    history = xi + 0.01 * rng.normal(size=(400, 6)).astype(np.float32)

    # Warm (compile) + timed run.
    res = explorer.explore(history, K, key=0)
    t0 = time.time()
    res = explorer.explore(history, K, key=1)
    dt = time.time() - t0
    n_feasible = int(res.feasible.sum())
    renders_per_s = n_cand * n_hyp / dt
    print(json.dumps({
        "metric": "explorer_scoring_candidates_per_s",
        "n_candidates": n_cand,
        "n_hypotheses": n_hyp,
        "resolution": f"{W}x{H} (1280x720 / {ds})",
        "n_feasible": n_feasible,
        "wall_s": round(dt, 2),
        "candidates_per_s": round(n_cand / dt, 1),
        "renders_per_s": round(renders_per_s, 1),
        "best_variance": round(float(res.variance), 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
