"""One-shot TPU measurement session (run whenever the tunnel is up).

Incremental prints (run with python -u); each phase is independent so a
tunnel wedge mid-run still leaves earlier results on stdout.

Phases:
 1. tile/capacity variant selection for the bench scene (overflow + timing)
 2. bench-equivalent optimizer-loop timing at the best config
 3. explorer scoring benchmark (BASELINE config (4))
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from easyhec_tpu.geometry import camera, se3
from easyhec_tpu.models.calib import mask_loss, tile_masks
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
from easyhec_tpu.robot.mesh import decimate_vertex_clustering
from easyhec_tpu.solver.optim import make_optimizer

REFERENCE_ASSETS = pathlib.Path("/root/reference/assets")


def scan_time(make_step, init, n=30):
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


def build_base():
    urdf = REFERENCE_ASSETS / "xarm7_with_gripper_reduced_dof.urdf"
    model = parse_urdf(urdf)
    chain = build_chain(model)
    names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    mesh_list = [decimate_vertex_clustering(meshes[n], 0.004) for n in names]
    return chain, names, mesh_list


def scene(chain, names, mesh_list, tile, H=480, W=640, B=10):
    renderer = RobotRenderer(mesh_list, H, W, tile=tile)
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
    link_idx = jnp.asarray([chain.link_index(n) for n in names])
    lp = jax.vmap(chain.fk)(qs)[:, link_idx]
    return renderer, xi, lp, K


def phase1(chain, names, mesh_list):
    print("=== phase 1: variants ===", flush=True)
    variants = [
        ("16x128c512bk2048", TileConfig(16, 128, 512, True, binner="count",
            rect_y=5, rect_x=2, margin=2.0, cull_backfaces=True, fused=True,
            bin_big_k=2048)),
        ("16x128c640bk2048", TileConfig(16, 128, 640, True, binner="count",
            rect_y=5, rect_x=2, margin=2.0, cull_backfaces=True, fused=True,
            bin_big_k=2048)),
        ("8x128c384bk3072", TileConfig(8, 128, 384, True, binner="count",
            rect_y=7, rect_x=2, margin=2.0, cull_backfaces=True, fused=True,
            bin_big_k=3072)),
    ]
    results = {}
    for label, tile in variants:
        try:
            renderer, xi, lp, K = scene(chain, names, mesh_list, tile)
            st = jax.jit(lambda x: renderer.bin_state(se3.exp(x), lp, K))(xi)
            ov = bool(np.asarray(jnp.any(st.overflow)))
            mx = int(jnp.max(st.counts))
            print(f"[{label}] overflow={ov} max_count={mx}", flush=True)
            dt_rebin = scan_time(
                lambda c, r=renderer: (
                    r.bin_state(se3.exp(c[0]), lp, K).rec[0, 0, 0] * 0 + c[0],
                ), (xi,), n=10)
            print(f"[{label}] rebin {dt_rebin*1e3:.2f} ms", flush=True)
            target = jax.jit(
                lambda x, r=renderer: r.silhouette(se3.exp(x), lp, K)
            )(xi)
            jax.block_until_ready(target)
            rt = tile_masks(np.asarray(target), renderer)
            for dl, d0 in (("aligned", xi), ("misal", xi + 0.01)):
                stt = jax.jit(
                    lambda x, r=renderer: r.bin_state(se3.exp(x), lp, K)
                )(d0)
                jax.block_until_ready(stt)
                g = jax.grad(lambda d, r=renderer, s=stt: mask_loss(
                    d, r, lp, K, target, bin_state=s, ref_tiles=rt))
                dt = scan_time(
                    lambda c, g=g: (c[0] + 0.0 * g(c[0]),), (d0,), n=30
                )
                print(f"[{label}] loss fwd+bwd {dl}: {dt*1e3:.2f} ms",
                      flush=True)
                results.setdefault(label, {})[dl] = dt
            results[label]["rebin"] = dt_rebin
            results[label]["overflow"] = ov
        except Exception as e:
            print(f"[{label}] FAILED: {type(e).__name__}: {e}", flush=True)
    return results


def phase2(chain, names, mesh_list, tile, rebin=12, label=""):
    print(f"=== phase 2: bench loop ({label}, rebin={rebin}) ===", flush=True)
    H, W, B = 480, 640, 10
    renderer, xi, lp, K = scene(chain, names, mesh_list, tile, H, W, B)
    target = jax.jit(lambda x: renderer.silhouette(se3.exp(x), lp, K))(xi)
    jax.block_until_ready(target)
    ref_tiles = tile_masks(np.asarray(target), renderer)
    N_OUTER = 4
    n_steps = rebin * N_OUTER
    opt = make_optimizer("adam", max_lr=3e-3, total_steps=n_steps,
                         scheduler="constant")

    @jax.jit
    def run(d0):
        opt_state = opt.init(d0)

        def outer(carry, _):
            dof, opt_state = carry
            state = renderer.bin_state(se3.exp(dof), lp, K)

            def step(c, _):
                dof, opt_state = c
                loss, g = jax.value_and_grad(
                    lambda d: mask_loss(d, renderer, lp, K, target,
                                        bin_state=state, ref_tiles=ref_tiles)
                )(dof)
                u, opt_state2 = opt.update(g, opt_state, dof)
                return (dof + u, opt_state2), loss

            return jax.lax.scan(step, (dof, opt_state), None, length=rebin)

        (dof, _), losses = jax.lax.scan(outer, (d0, opt_state), None,
                                        length=N_OUTER)
        return dof, losses.reshape(-1)

    d0 = xi + 0.01
    dof, losses = run(d0)
    np.asarray(dof)
    t0 = time.time()
    dof, losses = run(d0)
    dof = np.asarray(dof)
    dt = (time.time() - t0) / n_steps
    losses = np.asarray(losses)
    pix = B * H * W / dt
    print(f"[{label}] {dt*1e3:.2f} ms/step -> {pix/1e6:.1f} Mpix/s "
          f"({pix/34e6:.2f}x vs 34M baseline); "
          f"loss {losses[0]:.1f}->{losses[-1]:.1f}", flush=True)
    return pix


def phase3(chain, names, mesh_list):
    print("=== phase 3: explorer scoring (config 4) ===", flush=True)
    from easyhec_tpu.models.explorer import SpaceExplorer

    # reference workload: 1000 candidates x 10 hypotheses; scoring at
    # downscale 2 of 1280x720
    H, W = 360, 640
    tile = TileConfig(16, 128, 512, True, binner="count", rect_y=5, rect_x=2,
                      margin=2.0, cull_backfaces=True, fused=True,
                      bin_big_k=2048)
    renderer = RobotRenderer(mesh_list, H, W, tile=tile)
    explorer = SpaceExplorer(
        chain, renderer, names, spheres=None, n_sample_qposes=1000,
        n_hypotheses=10, history_start=0, max_dist=None,
    )
    K = np.asarray([[453.4, 0, 325.1], [0, 453.35, 183.85], [0, 0, 1]],
                   np.float32)
    Tcam = camera.look_at(
        jnp.asarray([1.2, 0.8, 0.9]), jnp.asarray([0.2, 0.0, 0.3]),
        jnp.asarray([0.0, 0.0, 1.0]),
    )
    gt = np.asarray(se3.log(se3.inverse(Tcam)))
    hist = (gt[None] + np.random.default_rng(0).normal(0, 0.01, (400, 6))
            ).astype(np.float32)
    t0 = time.time()
    res = explorer.explore(hist, K, key=0)
    dt1 = time.time() - t0
    t0 = time.time()
    res = explorer.explore(hist, K, key=1)
    dt2 = time.time() - t0
    print(f"explorer scoring: first {dt1:.1f}s (compile), steady {dt2:.1f}s "
          f"for 1000 cand x 10 hyp @ {W}x{H}; best var {res.variance:.1f}",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    chain, names, mesh_list = build_base()
    results = phase1(chain, names, mesh_list)
    # choose best non-overflowing variant
    best = None
    for label, r in results.items():
        if r.get("overflow", True):
            continue
        score = r.get("misal", 1.0) + r.get("rebin", 1.0) / 12
        if best is None or score < best[1]:
            best = (label, score)
    tiles = {
        "16x128c512bk2048": TileConfig(16, 128, 512, True, binner="count",
            rect_y=5, rect_x=2, margin=2.0, cull_backfaces=True, fused=True,
            bin_big_k=2048),
        "16x128c640bk2048": TileConfig(16, 128, 640, True, binner="count",
            rect_y=5, rect_x=2, margin=2.0, cull_backfaces=True, fused=True,
            bin_big_k=2048),
        "8x128c384bk3072": TileConfig(8, 128, 384, True, binner="count",
            rect_y=7, rect_x=2, margin=2.0, cull_backfaces=True, fused=True,
            bin_big_k=3072),
    }
    label = best[0] if best else "16x128c640bk2048"
    print("selected variant:", label, flush=True)
    for rebin in (12, 16, 24):
        phase2(chain, names, mesh_list, tiles[label], rebin=rebin, label=label)
    phase3(chain, names, mesh_list)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
