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

    import os

    n_cand = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    ds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_hyp = 10
    H, W = 720 // ds, 1280 // ds  # xArm7 online resolution / downscale

    urdf = REFERENCE_ASSETS / "xarm7_with_gripper_reduced_dof.urdf"
    model = parse_urdf(urdf)
    chain = build_chain(model)
    names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    # LOD-matched mesh: at 320x180 the full-detail (0.004-voxel) mesh packs
    # up to 6900 triangles into ONE tile (scripts/bin_audit.py) — the r2-era
    # cap-512 bench config silently truncated ~93% of the densest bins.
    # Variance scoring reads binary silhouettes, so the mesh LOD matches the
    # downscaled pixels (0.004 * ds), and the budgets below cover the
    # audited TRUE loads of the decimated scene (16x32 @ 0.016: max 964,
    # big 473, span 2x2). run asserts overflow on sampled candidates.
    vox = float(os.environ.get("EXP_DECIMATE", 0.004 * ds))
    mesh_list = [decimate_vertex_clustering(meshes[n], vox) for n in names]
    from easyhec_tpu.render import TileConfig

    # margin 8 lets the SHARED-BIN fast path engage (hypothesis clouds a
    # few px wide render against one binning per candidate — see
    # SpaceExplorer.hypothesis_spread_px); budgets re-audited at margin 8:
    # max load 1336, big 1290, span 3x2.
    # Round-5 budgets: the r4 defaults (cap 1792 / rect 3x2) OVERFLOWED on
    # every scoring pass — random candidate qposes at limit_fraction 0.9
    # swing links close to the camera where triangle spans exceed the rect
    # window (the audit gate's 8 sampled candidates missed it; the old
    # stderr warning was swallowed by 2>/dev/null). These are the budgets
    # SpaceExplorer's overflow escalation converges to (one 2x step);
    # shipping them directly keeps the timed run clean + escalation-free.
    th = int(os.environ.get("EXP_TILE_H", "16"))
    tw = int(os.environ.get("EXP_TILE_W", "32"))
    cap = int(os.environ.get("EXP_CAP", "3584"))
    big_k = int(os.environ.get("EXP_BIG_K", "3584"))
    margin = float(os.environ.get("EXP_MARGIN", "8.0"))
    fused = os.environ.get("EXP_FUSED", "1") == "1"
    nc = int(os.environ.get("EXP_COMPACT", "192"))
    ry = int(os.environ.get("EXP_RECT_Y", "6"))
    rx = int(os.environ.get("EXP_RECT_X", "4"))
    renderer = RobotRenderer(
        mesh_list, H, W,
        tile=TileConfig(th, tw, cap, True, binner="count", rect_y=ry,
                        rect_x=rx, margin=margin, cull_backfaces=True,
                        fused=fused, bin_big_k=big_k,
                        compact_chunks=nc if fused else 0),
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

    # Honesty gate: true bin loads for a sample of candidate qposes at the
    # hypothesis pose must fit the static budgets — a truncating bin would
    # drop silhouette area and quietly corrupt the variance scores.
    lo = jnp.asarray(chain.joint_limits[:, 0]) * explorer.limit_fraction
    hi = jnp.asarray(chain.joint_limits[:, 1]) * explorer.limit_fraction
    qs_chk = jax.random.uniform(
        jax.random.PRNGKey(9), (8, chain.n_dof), minval=lo, maxval=hi
    )
    lp_chk = jax.vmap(chain.fk)(qs_chk)[:, explorer.link_idx]
    st = renderer.bin_state(
        se3.exp(jnp.asarray(xi, jnp.float32)), lp_chk, jnp.asarray(K, jnp.float32)
    )
    assert not bool(np.asarray(jnp.any(st.overflow))), (
        "explorer bin overflow: raise EXP_CAP / EXP_BIG_K or EXP_DECIMATE"
    )

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
        "shared_bins": bool(getattr(explorer, "last_shared", False)),
        "hyp_spread_px": round(float(getattr(explorer, "last_spread_px", -1)), 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
