"""Attribute the rebin cost at honest capacity (cap 1792): bin_count alone
vs full build_fused_state (bin + field build + pack gather), plus setup.

Run solo: nohup python -u scripts/profile_rebin.py > /tmp/prof_rebin.log 2>&1 &
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
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.render.binning import bin_count
from easyhec_tpu.render.projection import setup_triangles_corners
from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
from easyhec_tpu.robot.mesh import decimate_vertex_clustering


def scan_time(make_step, init, n=10, label=""):
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
    dt = (time.time() - t0) / n
    print(f"{label:42s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    urdf = pathlib.Path("/root/reference/assets/xarm7_with_gripper_reduced_dof.urdf")
    model = parse_urdf(urdf)
    chain = build_chain(model)
    names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    mesh_list = [decimate_vertex_clustering(meshes[n], 0.004) for n in names]
    H, W = 480, 640
    B = 10
    for cap in (512, 1792):
        tile = TileConfig(16, 128, cap, True, binner="count", rect_y=5,
                          rect_x=2, margin=2.0, cull_backfaces=True,
                          fused=True, bwd_band_only=True, bin_big_k=2048)
        r = RobotRenderer(mesh_list, H, W, tile=tile)
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
        print(f"--- cap {cap} ---", flush=True)

        def setup_of(c):
            Tc = se3.exp(c[0])
            Tcl = jnp.einsum("ij,bljk->blik", Tc, lp)
            tris = setup_triangles_corners(
                r.corners_rest, r.face_link_onehot, Tcl, K,
                cull_backfaces=True,
            )
            return (c[0] + 0.0 * tris.u.reshape(-1)[0],)

        scan_time(setup_of, (xi,), label="triangle setup only")

        def bins_of(c):
            Tc = se3.exp(c[0])
            Tcl = jnp.einsum("ij,bljk->blik", Tc, lp)
            tris = setup_triangles_corners(
                r.corners_rest, r.face_link_onehot, Tcl, K,
                cull_backfaces=True,
            )
            lox = jnp.min(tris.u, axis=-2) - 2.0
            hix = jnp.max(tris.u, axis=-2) + 2.0
            loy = jnp.min(tris.v, axis=-2) - 2.0
            hiy = jnp.max(tris.v, axis=-2) + 2.0
            st = bin_count(lox, loy, hix, hiy, tris.valid, H=H, W=W,
                           tile_h=16, tile_w=128, cap=cap, ry=5, rx=2,
                           big_k=2048)
            return (c[0] + 0.0 * st.counts[0, 0],)

        scan_time(bins_of, (xi,), label="setup + bin_count")

        def bins_idx(c):
            Tc = se3.exp(c[0])
            Tcl = jnp.einsum("ij,bljk->blik", Tc, lp)
            tris = setup_triangles_corners(
                r.corners_rest, r.face_link_onehot, Tcl, K,
                cull_backfaces=True,
            )
            lox = jnp.min(tris.u, axis=-2) - 2.0
            hix = jnp.max(tris.u, axis=-2) + 2.0
            loy = jnp.min(tris.v, axis=-2) - 2.0
            hiy = jnp.max(tris.v, axis=-2) + 2.0
            st = bin_count(lox, loy, hix, hiy, tris.valid, H=H, W=W,
                           tile_h=16, tile_w=128, cap=cap, ry=5, rx=2,
                           big_k=2048)
            # consume idx: forces the bin-inversion scatter
            return (c[0] + 0.0 * st.idx.reshape(-1)[0].astype(jnp.float32),)

        scan_time(bins_idx, (xi,), label="setup + bin_count + idx scatter")

        # gather with REAL idx, fixed across iterations (isolates the pack)
        st_fixed = jax.jit(lambda x: r.bin_state(se3.exp(x), lp, K))(xi)
        jax.block_until_ready(st_fixed.rec)
        from easyhec_tpu.render.binning import bin_count as _bc  # noqa
        stb = jax.jit(
            lambda x: _bins_only(r, x, lp, K, cap)
        )(xi)
        jax.block_until_ready(stb.idx)

        def pack_only(c):
            from easyhec_tpu.render.fused import _base_corner_fields

            rows = _base_corner_fields(r.corners_rest, r.face_link_onehot, lp)
            vrow = jnp.ones((lp.shape[0], r.faces.shape[0]), jnp.float32)
            fields = jnp.stack(
                [vrow if x is None else x for x in rows], axis=1
            ) * (1.0 + 0.0 * c[0][0])
            fpad = jnp.concatenate(
                [fields, jnp.zeros((lp.shape[0], 12, 1), fields.dtype)],
                axis=-1,
            )
            fpad = jax.lax.optimization_barrier(fpad)
            rec = jax.vmap(
                lambda f, i: jnp.take(f, i.reshape(-1), axis=-1)
            )(fpad, stb.idx)
            return (c[0] + 0.0 * rec[0, 0],)

        scan_time(pack_only, (xi,), label="fields + pack gather (fixed idx)")

        def full_state(c):
            st = r.bin_state(se3.exp(c[0]), lp, K)
            return (c[0] + 0.0 * st.rec[0, 0, 0],)

        scan_time(full_state, (xi,), label="full build_fused_state")
    return 0


def _bins_only(r, x, lp, K, cap):
    from easyhec_tpu.geometry import se3 as _se3

    Tc = _se3.exp(x)
    Tcl = jnp.einsum("ij,bljk->blik", Tc, lp)
    tris = setup_triangles_corners(
        r.corners_rest, r.face_link_onehot, Tcl, K, cull_backfaces=True
    )
    lox = jnp.min(tris.u, axis=-2) - 2.0
    hix = jnp.max(tris.u, axis=-2) + 2.0
    loy = jnp.min(tris.v, axis=-2) - 2.0
    hiy = jnp.max(tris.v, axis=-2) + 2.0
    return bin_count(lox, loy, hix, hiy, tris.valid, H=480, W=640,
                     tile_h=16, tile_w=128, cap=cap, ry=5, rx=2, big_k=2048)


if __name__ == "__main__":
    raise SystemExit(main())
