"""Tile-shape sweep for the fused loss kernel (bench scene, hard targets).

Boundary tiles dominate the backward; smaller tile_h cuts pixel-block work
per boundary tile but raises program count. Measures rebin + fwd + fwd+bwd
per variant. Run solo (one TPU session).
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


def main():
    urdf = pathlib.Path("/root/reference/assets/xarm7_with_gripper_reduced_dof.urdf")
    model = parse_urdf(urdf)
    chain = build_chain(model)
    names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    mesh_list = [decimate_vertex_clustering(meshes[n], 0.004) for n in names]
    H, W = 480, 640
    B = 10
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

    # Caps sized to the TRUE max bin loads (measured on CPU: 16x128 -> 1720,
    # 8x128 -> 1273, 32x128 -> 2549); anything smaller silently truncates.
    common = dict(binner="count", margin=2.0, cull_backfaces=True,
                  fused=True, bwd_band_only=True)
    variants = [
        ("16x128 cap1792 bk2048", TileConfig(16, 128, 1792, True, rect_y=5,
                                             rect_x=2, bin_big_k=2048, **common)),
        ("8x128 cap1280 dense", TileConfig(8, 128, 1280, True, rect_y=9,
                                           rect_x=2, bin_big_k=0, **common)),
        ("8x128 cap1280 bk12288", TileConfig(8, 128, 1280, True, rect_y=9,
                                             rect_x=2, bin_big_k=12288, **common)),
        ("16x128 cap512 bk2048 (truncating r2 cfg)",
         TileConfig(16, 128, 512, True, rect_y=5, rect_x=2, bin_big_k=2048,
                    **common)),
    ]
    for label, tile in variants:
        try:
            r = RobotRenderer(mesh_list, H, W, tile=tile)
            st0 = jax.jit(lambda x: r.bin_state(se3.exp(x), lp, K))(xi)
            ov = bool(np.asarray(jnp.any(st0.overflow)))
            mx = int(jnp.max(st0.counts))
            print(f"[{label}] overflow={ov} max_count={mx}", flush=True)
            target = jax.jit(
                lambda x: (r.silhouette(se3.exp(x), lp, K) > 0.5).astype(jnp.float32)
            )(xi)
            jax.block_until_ready(target)
            rt = tile_masks(np.asarray(target), r)
            dt_rebin = scan_time(
                lambda c: (r.bin_state(se3.exp(c[0]), lp, K).rec[0, 0, 0] * 0 + c[0],),
                (xi,), n=10,
            )
            d0 = xi + 0.005
            stt = jax.jit(lambda x: r.bin_state(se3.exp(x), lp, K))(d0)
            jax.block_until_ready(stt)
            f = jax.jit(lambda d, s=stt: mask_loss(d, r, lp, K, target,
                                                   bin_state=s, ref_tiles=rt))
            dtf = scan_time(lambda c, f=f: (c[0] + 0.0 * f(c[0]),), (d0,), n=20)
            g = jax.grad(lambda d, s=stt: mask_loss(d, r, lp, K, target,
                                                    bin_state=s, ref_tiles=rt))
            dt = scan_time(lambda c, g=g: (c[0] + 0.0 * g(c[0]),), (d0,), n=20)
            step_ms = dt * 1e3 + dt_rebin * 1e3 / 12
            mpixs = B * H * W / (dt + dt_rebin / 12) / 1e6
            print(
                f"[{label}] rebin {dt_rebin*1e3:.2f} fwd {dtf*1e3:.2f} "
                f"fwd+bwd {dt*1e3:.2f} ms -> step {step_ms:.2f} ms "
                f"({mpixs:.0f} Mpix/s)", flush=True,
            )
        except Exception as e:
            print(f"[{label}] FAILED: {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
