"""One-shot TPU measurement session, round 2 (run when the tunnel is up).

STRICTLY one jax process at a time on this machine (concurrent sessions can
wedge the relay; a killed mid-flight client wedges it for ~25 min). Each
phase is independent and prints incrementally, so a wedge mid-run still
leaves earlier results in the log.

Phases:
 1. micro-profile of the bench config: rebin cost, fwd and fwd+bwd at
    aligned/misaligned poses, band_only on/off (validates the chunk-cull)
 2. the real bench (full 1000-step loop, hard targets) -> JSON line
 3. explorer scoring benchmark (BASELINE config (4))
 4. Franka offline diagnostics (baseline fit + robust + cross-pair + LOO +
    multistart) -> runs/franka_diag_tpu/report.{json,md}

Usage: nohup python -u scripts/tpu_session2.py > /tmp/tpu_session2.log 2>&1 &
"""
from __future__ import annotations

import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def phase(name):
    print(f"\n===== PHASE {name} @ {time.strftime('%H:%M:%S')} =====", flush=True)


def scan_time(make_step, init, n=20):
    @jax.jit
    def run(c0):
        def step(c, _):
            return make_step(c), 0
        c, _ = jax.lax.scan(step, c0, None, length=n)
        return c

    c = run(init)
    np.asarray(jax.tree_util.tree_leaves(c)[0])
    t0 = time.time()
    c = run(init)
    np.asarray(jax.tree_util.tree_leaves(c)[0])
    return (time.time() - t0) / n


def phase1_micro():
    from easyhec_tpu.geometry import camera, se3
    from easyhec_tpu.models.calib import mask_loss, tile_masks
    from easyhec_tpu.render import RobotRenderer, TileConfig
    from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
    from easyhec_tpu.robot.mesh import decimate_vertex_clustering

    urdf = pathlib.Path("/root/reference/assets/xarm7_with_gripper_reduced_dof.urdf")
    model = parse_urdf(urdf)
    chain = build_chain(model)
    names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    mesh_list = [decimate_vertex_clustering(meshes[n], 0.004) for n in names]
    H, W = 480, 640
    B = 10
    base = TileConfig(
        16, 128, 512, True, binner="count", rect_y=5, rect_x=2, margin=2.0,
        cull_backfaces=True, fused=True, bin_big_k=2048,
    )
    link_idx = jnp.asarray([chain.link_index(n) for n in names])

    K = jnp.asarray([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]])
    Tcam = camera.look_at(
        jnp.asarray([1.0, 0.7, 0.8]), jnp.asarray([0.0, 0.0, 0.3]),
        jnp.asarray([0.0, 0.0, 1.0]),
    )
    xi = se3.log(se3.inverse(Tcam))
    lo = jnp.asarray(chain.joint_limits[:, 0] * 0.4)
    hi = jnp.asarray(chain.joint_limits[:, 1] * 0.4)
    qs = jax.random.uniform(
        jax.random.PRNGKey(0), (B, chain.n_dof), minval=lo, maxval=hi
    )
    lp = jax.vmap(chain.fk)(qs)[:, link_idx]

    variants = [
        ("band=T", RobotRenderer(
            mesh_list, H, W, tile=base._replace(bwd_band_only=True))),
        ("band=F", RobotRenderer(mesh_list, H, W, tile=base)),
    ]

    for label, r in variants:
        target = jax.jit(
            lambda x: (r.silhouette(se3.exp(x), lp, K) > 0.5).astype(jnp.float32)
        )(xi)
        jax.block_until_ready(target)
        rt = tile_masks(np.asarray(target), r)
        dt_rebin = scan_time(
            lambda c, r=r: (r.bin_state(se3.exp(c[0]), lp, K).rec[0, 0, 0] * 0 + c[0],),
            (xi,), n=10,
        )
        print(f"[{label}] rebin: {dt_rebin*1e3:.2f} ms", flush=True)
        for dl, d0 in (("aligned", xi), ("misal", xi + 0.01)):
            stt = jax.jit(lambda x, r=r: r.bin_state(se3.exp(x), lp, K))(d0)
            jax.block_until_ready(stt)
            f = jax.jit(lambda d, r=r, s=stt: mask_loss(
                d, r, lp, K, target, bin_state=s, ref_tiles=rt))
            dtf = scan_time(lambda c, f=f: (c[0] + 0.0 * f(c[0]),), (d0,), n=20)
            g = jax.grad(lambda d, r=r, s=stt: mask_loss(
                d, r, lp, K, target, bin_state=s, ref_tiles=rt))
            dt = scan_time(lambda c, g=g: (c[0] + 0.0 * g(c[0]),), (d0,), n=20)
            print(
                f"[{label}] {dl}: fwd {dtf*1e3:.2f} ms, "
                f"fwd+bwd {dt*1e3:.2f} ms", flush=True,
            )


def phase2_bench():
    import bench

    bench.main()


def phase3_explorer():
    import importlib.util

    sys.argv = ["bench_explorer"]
    spec = importlib.util.spec_from_file_location(
        "bench_explorer",
        pathlib.Path(__file__).parent / "bench_explorer.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def phase4_franka():
    from easyhec_tpu.cli.diagnose import main as diag

    diag([
        "-c", "configs/franka_offline.yaml",
        "--out", "runs/franka_diag_tpu",
        "--loo", "--multistart", "4",
    ])


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for name, fn in (
        ("1-micro", phase1_micro),
        ("2-bench", phase2_bench),
        ("3-explorer", phase3_explorer),
        ("4-franka", phase4_franka),
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
