"""Consolidated TPU profiling CLI for the calibration hot path.

Replaces the round-1/2 one-off pile (tpu_session*.py, profile_r2*.py,
profile_{rebin,kernel,step,tiles}.py, bench_pallas.py — all superseded;
their results live in BASELINE.md). ONE process, serial phases,
incremental flushed prints (axon tunnel discipline: probe first, launch
solo on an idle machine via
  nohup python -u scripts/tpu_profile.py > /tmp/prof.log 2>&1 &
and never kill it mid-flight).

Environment knobs (all optional):
  R3_PHASES   comma list of: p1 (rebin attribution), p2 (step timings
              dense+compact), p2c (compact only), p3/p3c (324-step mini
              bench), p4 (1000-step full-bench equivalent). Default all.
  R3_TILE_H/R3_TILE_W/R3_CAP/R3_BIG_K/R3_RY/R3_RX  tile config sweep
  R3_NC       compact chunk budget; "auto" probes sum(ceil(count/128))
  R3_SUBSORT  1 = row-sub-classed bins
  EASYHEC_BWD_REDUCE / EASYHEC_SUB_ROWS  kernel A/B switches (see
              ops/pose_raster.py)
Each phase is exception-guarded so a failure doesn't waste the session.
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

from easyhec_tpu.geometry import camera, se3
from easyhec_tpu.models.calib import mask_loss, tile_masks
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.render.binning import bin_count
from easyhec_tpu.render.fused import build_compact_state, build_fused_state
from easyhec_tpu.render.projection import setup_triangles_corners
from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
from easyhec_tpu.robot.mesh import decimate_vertex_clustering
from easyhec_tpu.solver.optim import make_optimizer

import os as _os

H, W, B = 480, 640, 10
TH = int(_os.environ.get("R3_TILE_H", "16"))
TW = int(_os.environ.get("R3_TILE_W", "128"))
CAP = int(_os.environ.get("R3_CAP", "1792"))
BIG_K = int(_os.environ.get("R3_BIG_K", "2048"))
RY = int(_os.environ.get("R3_RY", "5"))
RX = int(_os.environ.get("R3_RX", "2"))


def phase(name):
    print(f"\n=== {name} === ({time.strftime('%H:%M:%S')})", flush=True)


def guarded(fn):
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print("PHASE FAILED (continuing)", flush=True)


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
    print(f"{label:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def build(compact_chunks=0, cap=CAP):
    import os

    subsort = bool(int(os.environ.get("R3_SUBSORT", "0")))
    urdf = pathlib.Path(
        "/root/reference/assets/xarm7_with_gripper_reduced_dof.urdf"
    )
    model = parse_urdf(urdf)
    chain = build_chain(model)
    names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    mesh_list = [decimate_vertex_clustering(meshes[n], 0.004) for n in names]
    tile = TileConfig(
        TH, TW, cap, True, binner="count", rect_y=RY, rect_x=RX,
        margin=2.0, cull_backfaces=True, fused=True, bwd_band_only=True,
        bin_big_k=BIG_K, compact_chunks=compact_chunks,
        bin_subsort_rows=subsort,
    )
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
    return r, xi, lp, K


def p1_attribution():
    r, xi, lp, K = build()

    def tris_of(x):
        Tc = se3.exp(x)
        Tcl = jnp.einsum("ij,bljk->blik", Tc, lp)
        return setup_triangles_corners(
            r.corners_rest, r.face_link_onehot, Tcl, K, cull_backfaces=True
        )

    def bbox_of(tris):
        return (
            jnp.min(tris.u, axis=-2) - 2.0, jnp.min(tris.v, axis=-2) - 2.0,
            jnp.max(tris.u, axis=-2) + 2.0, jnp.max(tris.v, axis=-2) + 2.0,
        )

    def bins_of(x):
        tris = tris_of(x)
        lox, loy, hix, hiy = bbox_of(tris)
        return bin_count(
            lox, loy, hix, hiy, tris.valid, H=H, W=W, tile_h=16, tile_w=128,
            cap=CAP, ry=RY, rx=RX, big_k=BIG_K,
        )

    def setup_only(c):
        return (c[0] + 0.0 * tris_of(c[0]).u.reshape(-1)[0],)

    scan_time(setup_only, (xi,), label="triangle setup only")

    def bc_counts(c):
        st = bins_of(c[0])
        return (c[0] + 0.0 * st.counts.reshape(-1)[0].astype(jnp.float32),)

    scan_time(bc_counts, (xi,), label="setup + bin_count (counts only)")

    def bc_q(c):
        st = bins_of(c[0])
        return (c[0] + 0.0 * st.q.reshape(-1)[0].astype(jnp.float32),)

    scan_time(bc_q, (xi,), label="setup + bin_count (q slots)")

    def bc_idx(c):
        st = bins_of(c[0])
        return (c[0] + 0.0 * st.idx.reshape(-1)[0].astype(jnp.float32),)

    scan_time(bc_idx, (xi,), label="setup + bin_count (idx scatter)")

    # pack gather on FIXED idx (isolates the gather from the bins)
    stb = jax.jit(lambda x: bins_of(x))(xi)
    jax.block_until_ready(stb.idx)

    from easyhec_tpu.render.fused import _base_corner_fields

    def pack_only(c):
        rows = _base_corner_fields(r.corners_rest, r.face_link_onehot, lp)
        vrow = jnp.ones((B, r.faces.shape[0]), jnp.float32)
        fields = jnp.stack(
            [vrow if x is None else x for x in rows], axis=1
        ) * (1.0 + 0.0 * c[0][0])
        fpad = jnp.concatenate(
            [fields, jnp.zeros((B, 12, 1), fields.dtype)], axis=-1
        )
        fpad = jax.lax.optimization_barrier(fpad)
        rec = jax.vmap(lambda f, i: jnp.take(f, i.reshape(-1), axis=-1))(
            fpad, stb.idx
        )
        return (c[0] + 0.0 * rec[0, 0, 0],)

    scan_time(pack_only, (xi,), label="fields + pack gather (fixed idx)")

    def full_dense(c):
        st = build_fused_state(r, se3.exp(c[0]), lp, K)
        return (c[0] + 0.0 * st.rec[0, 0, 0],)

    scan_time(full_dense, (xi,), label="full dense build_fused_state")

    # compact: report ncu, then time the build
    st0 = jax.jit(
        lambda x: build_compact_state(r, se3.exp(x), lp, K, nc=640)
    )(xi)
    ncu = np.asarray(st0.ncu)
    print(f"compact used chunks per frame: {ncu.tolist()}  max={ncu.max()}",
          flush=True)
    nc = int(-(-int(ncu.max()) * 13 // 10 // 8) * 8)  # +30%, /8 align
    print(f"chosen nc = {nc}", flush=True)

    def full_compact(c):
        st = build_compact_state(r, se3.exp(c[0]), lp, K, nc=nc)
        return (c[0] + 0.0 * st.rec[0, 0, 0],)

    scan_time(full_compact, (xi,), label=f"full compact build (nc={nc})")
    return nc


def step_timings(r, xi, lp, K, label):
    target = jax.jit(
        lambda x: (r.silhouette(se3.exp(x), lp, K) > 0.5).astype(jnp.float32)
    )(xi)
    jax.block_until_ready(target)
    ref_tiles = tile_masks(np.asarray(target), r)
    st = jax.jit(lambda x: r.bin_state(se3.exp(x), lp, K))(xi)
    ov = bool(np.asarray(jnp.any(st.overflow)))
    print(f"[{label}] overflow={ov}", flush=True)
    d0 = xi + 0.005

    def fwd_only(c):
        v = mask_loss(c[0], r, lp, K, target, bin_state=st,
                      ref_tiles=ref_tiles)
        return (c[0] + 0.0 * v,)

    scan_time(fwd_only, (d0,), label=f"[{label}] loss fwd only")

    opt = make_optimizer("adam", max_lr=3e-3, total_steps=1000,
                         scheduler="constant")

    def fwd_bwd(c):
        dof, os_ = c
        v, g = jax.value_and_grad(
            lambda d: mask_loss(d, r, lp, K, target, bin_state=st,
                                ref_tiles=ref_tiles)
        )(dof)
        u, os2 = opt.update(g, os_, dof)
        return (dof + u, os2)

    scan_time(fwd_bwd, (d0, opt.init(d0)), label=f"[{label}] fwd+bwd+adam")


def mini_bench(r, xi, lp, K, label, steps=324, rebin=12):
    target = jax.jit(
        lambda x: (r.silhouette(se3.exp(x), lp, K) > 0.5).astype(jnp.float32)
    )(xi)
    jax.block_until_ready(target)
    ref_tiles = tile_masks(np.asarray(target), r)
    opt = make_optimizer("adam", max_lr=3e-3, total_steps=1000,
                         scheduler="constant")

    @jax.jit
    def run_chunk(dof, opt_state):
        def outer(carry, _):
            dof, opt_state = carry
            state = r.bin_state(se3.exp(dof), lp, K)

            def step(c, _):
                dof, opt_state = c
                loss, g = jax.value_and_grad(
                    lambda d: mask_loss(d, r, lp, K, target, bin_state=state,
                                        ref_tiles=ref_tiles)
                )(dof)
                u, opt_state2 = opt.update(g, opt_state, dof)
                return (dof + u, opt_state2), loss

            inner, losses = jax.lax.scan(
                step, (dof, opt_state), None, length=rebin
            )
            return inner, (losses, jnp.any(state.overflow))

        (dof, opt_state), (losses, ovs) = jax.lax.scan(
            outer, (dof, opt_state), None, length=108 // rebin
        )
        return dof, opt_state, losses.reshape(-1), jnp.any(ovs)

    d0 = xi + 0.01
    dof, opt_state, _, ov0 = run_chunk(d0, opt.init(d0))
    np.asarray(dof)
    n_chunks = -(-steps // 108)
    dof, opt_state = d0, opt.init(d0)
    ovs, losses = [ov0], []
    t0 = time.time()
    for _ in range(n_chunks):
        dof, opt_state, ls, ov = run_chunk(dof, opt_state)
        losses.append(ls)
        ovs.append(ov)
    dof = np.asarray(dof)
    dt = time.time() - t0
    n = n_chunks * 108
    ls = np.concatenate([np.asarray(x) for x in losses])
    ovany = any(bool(np.asarray(o)) for o in ovs)
    pix = n * B * H * W / dt
    print(
        f"[{label}] {n} steps in {dt:.2f}s = {dt/n*1e3:.2f} ms/step = "
        f"{pix/1e6:.1f} Mpix/s (x{pix/34e6:.2f}) loss {ls[0]:.1f}->{ls[-1]:.3f} "
        f"overflow={ovany}",
        flush=True,
    )


def main():
    import os

    phases = set(os.environ.get("R3_PHASES", "p1,p2,p3").split(","))
    phase("P0 warmup")
    x = jnp.ones((256, 256))
    print(float((x @ x).sum()), flush=True)

    nc_env = os.environ.get("R3_NC", "184")
    if nc_env == "auto":
        phase("auto-nc probe")
        from easyhec_tpu.render.fused import build_compact_state

        r, xi, lp, K = build(compact_chunks=768)
        st = jax.jit(
            lambda x: build_compact_state(r, se3.exp(x), lp, K, nc=768)
        )(xi)
        ncu = np.asarray(st.ncu)
        ov = bool(np.asarray(st.overflow))
        nc = (int(ncu.max()) * 13 // 10 // 8 + 1) * 8
        print(f"ncu={ncu.tolist()} overflow={ov} -> nc={nc}", flush=True)
    else:
        nc = int(nc_env)
    if "p1" in phases:
        phase("P1 rebin attribution (cap 1792)")
        nc_holder = {}

        def p1():
            nc_holder["nc"] = p1_attribution()

        guarded(p1)
        nc = nc_holder.get("nc", nc)

    if "p2" in phases:
        phase("P2 step timings dense")

        def p2d():
            r, xi, lp, K = build(compact_chunks=0)
            step_timings(r, xi, lp, K, "dense")

        guarded(p2d)

    if "p2" in phases or "p2c" in phases:
        phase("P2 step timings compact")

        def p2c():
            r, xi, lp, K = build(compact_chunks=nc)
            step_timings(r, xi, lp, K, f"compact nc={nc}")

        guarded(p2c)

    if "p3" in phases:
        phase("P3 mini bench dense")

        def p3d():
            r, xi, lp, K = build(compact_chunks=0)
            mini_bench(r, xi, lp, K, "dense")

        guarded(p3d)

    if "p3" in phases or "p3c" in phases:
        phase("P3 mini bench compact")

        def p3c():
            r, xi, lp, K = build(compact_chunks=nc)
            mini_bench(r, xi, lp, K, f"compact nc={nc}")

        guarded(p3c)

    if "p4" in phases:
        # 1000-step full-bench equivalents (driver-identical workload)
        phase("P4 full bench compact")

        def p4c():
            r, xi, lp, K = build(compact_chunks=nc)
            mini_bench(r, xi, lp, K, f"compact nc={nc}", steps=1000)

        guarded(p4c)

    phase("DONE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
