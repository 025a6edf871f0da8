"""Micro: scan floor + isolated Pallas kernel fwd/bwd + pack bwd timings."""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(fn, n, label):
    @jax.jit
    def run():
        def step(carry, _):
            out = fn(carry * 1e-30)
            return out * 0.0 + carry, out

        c, outs = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c + outs[-1]

    np.asarray(run())
    t0 = time.time()
    np.asarray(run())
    dt = (time.time() - t0) / n
    print(f"{label:34s} {dt * 1e3:8.3f} ms/iter")
    return dt


def main():
    import bench

    from easyhec_tpu.geometry import camera, se3
    from easyhec_tpu.ops.tile_raster import TRI_RECORD, tile_silhouette
    from easyhec_tpu.render.binning import fields_and_bins, pack_records_counted
    from easyhec_tpu.render.tiled import _edge_fields_soa

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    chain, renderer, link_idx, H, W = bench.build_scene()
    B = 10
    K = jnp.asarray([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]])
    Tcam = camera.look_at(
        jnp.asarray([1.0, 0.7, 0.8]),
        jnp.asarray([0.0, 0.0, 0.3]),
        jnp.asarray([0.0, 0.0, 1.0]),
    )
    xi = se3.log(se3.inverse(Tcam))
    lo = jnp.asarray(chain.joint_limits[:, 0] * 0.4)
    hi = jnp.asarray(chain.joint_limits[:, 1] * 0.4)
    qs = jax.random.uniform(
        jax.random.PRNGKey(0), (B, chain.n_dof), minval=lo, maxval=hi
    )
    lp = jax.vmap(chain.fk)(qs)[:, link_idx]
    cfg = renderer.tile
    n_tx = -(-W // cfg.tile_w)

    Tc_c2l = renderer.camera_link_poses(se3.exp(xi), lp)
    tris = renderer._triangles_soa(Tc_c2l, K)
    batch = tris.valid.shape[:-1]
    flat = jax.tree.map(
        lambda a: a.reshape((-1,) + a.shape[len(batch):]), tris
    )
    fields0, state = jax.jit(
        lambda t: fields_and_bins(t, H, W, cfg)
    )(flat)
    rec0 = jax.jit(
        lambda f: pack_records_counted(
            f, state.idx, state.q, n_tx, cfg.tile_h, cfg.tile_w, TRI_RECORD
        )
    )(fields0)
    rec0 = jax.block_until_ready(rec0)
    print(f"rec {rec0.shape}  counts max {int(jnp.max(state.counts))} "
          f"mean {float(jnp.mean(state.counts)):.0f}")

    timed_scan(lambda e: e * 2.0 + 1.0, n, "scan floor (null op)")

    def kfwd(e):
        tiles = tile_silhouette(
            rec0 + e, state.counts, cfg.tile_h, cfg.tile_w, 1.0
        )
        return jnp.sum(tiles)

    timed_scan(kfwd, n, "kernel fwd (fixed rec)")

    def kbwd(e):
        l, g = jax.value_and_grad(kfwd)(e)
        return l + g

    timed_scan(kbwd, n, "kernel fwd+bwd (fixed rec)")

    def packbwd(e):
        def f(fields):
            rec = pack_records_counted(
                fields, state.idx, state.q, n_tx, cfg.tile_h, cfg.tile_w,
                TRI_RECORD,
            )
            return jnp.sum(rec[..., 0, :])

        l, g = jax.value_and_grad(f)(fields0 + e)
        return l + jnp.sum(g)

    timed_scan(packbwd, n, "pack fwd+bwd (fixed bins)")

    def setupbwd(e):
        def f(eps):
            t = renderer._triangles_soa(
                renderer.camera_link_poses(se3.exp(xi + eps), lp), K
            )
            fl = jnp.stack(_edge_fields_soa(
                jax.tree.map(
                    lambda a: a.reshape((-1,) + a.shape[len(batch):]), t
                )
            ), axis=-2)
            return jnp.sum(fl)

        l, g = jax.value_and_grad(f)(e)
        return l + jnp.sum(g)

    timed_scan(setupbwd, n, "setup+fields fwd+bwd")


if __name__ == "__main__":
    main()
