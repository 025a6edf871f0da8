"""TPU session 4: tile-shape sweep + Franka pairing repair + explorer batch sweep.

One process, phases serial, incremental prints. Launch solo:
    nohup python -u scripts/tpu_session4.py > /tmp/tpu_session4.log 2>&1 &
"""
from __future__ import annotations

import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax


def phase(name):
    print(f"\n===== PHASE {name} @ {time.strftime('%H:%M:%S')} =====", flush=True)


def run_file(name, argv=None):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        name, pathlib.Path(__file__).parent / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if argv is not None:
        sys.argv = [name] + argv
    return mod.main()


def phase_tiles():
    run_file("profile_tiles")


def phase_franka_repair():
    from easyhec_tpu.cli.diagnose import main as diag

    diag([
        "-c", "configs/franka_offline.yaml",
        "--out", "runs/franka_repair",
        "--repair",
    ])


def phase_explorer_batches():
    import importlib.util

    import numpy as np

    from easyhec_tpu.geometry import camera, se3
    from easyhec_tpu.models.calib import downscale_K
    from easyhec_tpu.models.explorer import SpaceExplorer, build_link_spheres
    from easyhec_tpu.render import RobotRenderer, TileConfig
    from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
    from easyhec_tpu.robot.mesh import decimate_vertex_clustering
    import jax.numpy as jnp

    urdf = pathlib.Path(
        "/root/reference/assets/xarm7_with_gripper_reduced_dof.urdf"
    )
    model = parse_urdf(urdf)
    chain = build_chain(model)
    names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    mesh_list = [decimate_vertex_clustering(meshes[n], 0.004) for n in names]
    ds = 4
    H, W = 720 // ds, 1280 // ds
    renderer = RobotRenderer(
        mesh_list, H, W,
        tile=TileConfig(16, 128, 512, True, binner="count", rect_y=5,
                        rect_x=2, margin=2.0, cull_backfaces=True),
    )
    spheres = build_link_spheres(chain, {n: meshes[n] for n in names})
    K = downscale_K(
        np.asarray([[906.8, 0, 650.2], [0, 906.7, 367.7], [0, 0, 1]]), ds
    )
    Tcam = camera.look_at(
        jnp.asarray([1.1, 0.8, 0.9]), jnp.asarray([0.0, 0.0, 0.3]),
        jnp.asarray([0.0, 0.0, 1.0]),
    )
    xi = np.asarray(se3.log(se3.inverse(Tcam)))
    rng = np.random.default_rng(0)
    history = xi + 0.01 * rng.normal(size=(400, 6)).astype(np.float32)

    for sb in (1, 5, 10, 50):
        ex = SpaceExplorer(
            chain, renderer, names, spheres=spheres,
            n_sample_qposes=1000, n_hypotheses=10, history_start=0,
            score_batch=sb,
        )
        ex.explore(history, K, key=0)  # compile+warm
        t0 = time.time()
        res = ex.explore(history, K, key=1)
        dt = time.time() - t0
        print(f"[score_batch={sb}] {dt:.2f} s "
              f"({1000/dt:.1f} cand/s), best_var {res.variance:.1f}",
              flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for name, fn in (
        ("tiles", phase_tiles),
        ("franka-repair", phase_franka_repair),
        ("explorer-batches", phase_explorer_batches),
    ):
        if only and not name.startswith(only):
            continue
        phase(name)
        try:
            fn()
        except Exception:
            traceback.print_exc()
            print(f"PHASE {name} FAILED (continuing)", flush=True)
    print("\nSESSION DONE", flush=True)
