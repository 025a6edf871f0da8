"""Round-2 pass D: bench-config step decomposition + bwd_band_only effect.

Unbuffered prints; one renderer per TileConfig variant, minimal compiles.
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

REFERENCE_ASSETS = pathlib.Path("/root/reference/assets")


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
    urdf = REFERENCE_ASSETS / "xarm7_with_gripper_reduced_dof.urdf"
    model = parse_urdf(urdf)
    chain = build_chain(model)
    names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    mesh_list = [decimate_vertex_clustering(meshes[n], 0.004) for n in names]
    H, W = 480, 640
    B = 10
    K = jnp.asarray([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]])
    Tcam = camera.look_at(
        jnp.asarray([1.0, 0.7, 0.8]), jnp.asarray([0.0, 0.0, 0.3]),
        jnp.asarray([0.0, 0.0, 1.0]),
    )
    xi = se3.log(se3.inverse(Tcam))
    lo = jnp.asarray(chain.joint_limits[:, 0] * 0.4)
    hi = jnp.asarray(chain.joint_limits[:, 1] * 0.4)
    qs = jax.random.uniform(jax.random.PRNGKey(0), (B, chain.n_dof), minval=lo, maxval=hi)

    base = dict(binner="count", rect_y=5, rect_x=2, margin=2.0,
                cull_backfaces=True, fused=True, bin_big_k=2048)
    variants = [
        ("bench (band=F)", TileConfig(16, 128, 512, True, **base)),
        ("band=T", TileConfig(16, 128, 512, True, bwd_band_only=True, **base)),
    ]
    for label, tile in variants:
        renderer = RobotRenderer(mesh_list, H, W, tile=tile)
        link_idx = jnp.asarray([chain.link_index(n) for n in names])
        lp = jax.vmap(chain.fk)(qs)[:, link_idx]
        st0 = jax.jit(lambda x, r=renderer: r.bin_state(se3.exp(x), lp, K))(xi)
        mx = int(jnp.max(st0.counts)) if hasattr(st0, "counts") else -1
        print(f"[{label}] max_count={mx}", flush=True)
        target = jax.jit(lambda x, r=renderer: r.silhouette(se3.exp(x), lp, K))(xi)
        jax.block_until_ready(target)
        rt = tile_masks(np.asarray(target), renderer)

        # rebin cost
        dt_rebin = scan_time(
            lambda c, r=renderer: (
                r.bin_state(se3.exp(c[0]), lp, K).rec[0, 0, 0] * 0 + c[0],),
            (xi,), n=10,
        )
        print(f"[{label}] rebin: {dt_rebin*1e3:.2f} ms", flush=True)

        for dl, d0 in (("aligned", xi), ("misal", xi + 0.01)):
            stt = jax.jit(lambda x, r=renderer: r.bin_state(se3.exp(x), lp, K))(d0)
            jax.block_until_ready(stt)
            # forward only
            f = jax.jit(lambda d, r=renderer, s=stt: mask_loss(
                d, r, lp, K, target, bin_state=s, ref_tiles=rt))
            dtf = scan_time(lambda c, f=f: (c[0] + 0.0 * f(c[0]),), (d0,), n=20)
            g = jax.grad(lambda d, r=renderer, s=stt: mask_loss(
                d, r, lp, K, target, bin_state=s, ref_tiles=rt))
            dt = scan_time(lambda c, g=g: (c[0] + 0.0 * g(c[0]),), (d0,), n=20)
            print(f"[{label}] {dl}: fwd {dtf*1e3:.2f} ms, fwd+bwd {dt*1e3:.2f} ms",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
