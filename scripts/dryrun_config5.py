"""BASELINE config (5) rehearsal: 4 views x 20 frames @ 1920x1080, sharded.

Runs the PRODUCTION sharded optimizer (parallel.sharding.sharded_calibrate —
fused-pose loss kernel, span-classed counting binner, amortized rebin) over
an 8-device virtual CPU mesh (4 "data" x 2 "tile"): the 80 frame-views are
sharded across the data axis, each 1080-row image splits into two 540-row
bands across the tile axis. Executes real optimizer steps and writes
CONFIG5_DRYRUN.json.

This validates that the multi-camera multi-host BASELINE config compiles and
executes end-to-end with the exact production program shapes; throughput on
virtual CPU devices is NOT meaningful (see BENCH_r*.json for real-chip perf;
the FULL 80-frame config-5 workload runs on the real chip via
scripts/config5_chip.py, merged into the same CONFIG5_DRYRUN.json).

Usage: python scripts/dryrun_config5.py [steps] [frames_per_view]

frames_per_view < 20 shrinks the sharded full-res stage (this box has 2
CPU cores; the honest-cap full-res backward costs ~7 CPU-minutes per
frame-step, so the full 80-frame x 2-step stage would run ~9 h — the
record labels the reduced frame count explicitly and the full workload is
the chip stage).
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from easyhec_tpu.geometry import camera, se3
from easyhec_tpu.parallel.sharding import make_mesh, sharded_calibrate
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
from easyhec_tpu.robot.mesh import decimate_vertex_clustering

REFERENCE_ASSETS = pathlib.Path("/root/reference/assets")


def compact_mesh_stage(chain, mesh_list, link_idx) -> dict:
    """Certify the PRODUCTION compact-chunk fused kernels under the sharded
    mesh with the real xArm7 geometry (reduced resolution — Pallas interpret
    mode on CPU is a Python loop, unusable at full 1080p scale; the full
    scale runs below on the vectorized XLA path, and the same compact
    program shapes run at full scale on the real chip in bench.py)."""
    Hc, Wc, n_tile = 128, 192, 2
    band_h = Hc // n_tile
    # Budgets from scripts/bin_audit.py at 128x192 f=160 (max load 4220 —
    # the full-detail arm concentrates in few tiles at this resolution;
    # big-span 2105, chunks 121, max span 2x2). Overflow is asserted by
    # sharded_calibrate at every rebin.
    tile = TileConfig(
        16, 32, 5376, True, binner="count", margin=2.0, cull_backfaces=True,
        fused=True, bwd_band_only=True, bin_big_k=2816,
        bin_subsort_rows=True, compact_chunks=176, bwd_chunks=176,
    )
    band = RobotRenderer(mesh_list, band_h, Wc, tile=tile)
    K = np.asarray(
        [[160.0, 0, Wc / 2], [0, 160.0, Hc / 2], [0, 0, 1]], np.float32
    )
    Tcam = camera.look_at(
        jnp.asarray([1.0, 0.7, 0.8]),
        jnp.asarray([0.0, 0.0, 0.3]),
        jnp.asarray([0.0, 0.0, 1.0]),
    )
    gt_dof = se3.log(se3.inverse(Tcam))
    B = 4
    lo = jnp.asarray(chain.joint_limits[:, 0] * 0.4)
    hi = jnp.asarray(chain.joint_limits[:, 1] * 0.4)
    qs = jax.random.uniform(
        jax.random.PRNGKey(1), (B, chain.n_dof), minval=lo, maxval=hi
    )
    lp = jax.vmap(chain.fk)(qs)[:, link_idx]
    mesh = make_mesh(4, n_tile)
    from easyhec_tpu.parallel.sharding import sharded_silhouette

    render = sharded_silhouette(band, mesh, band_h)
    masks = np.asarray(
        jax.jit(lambda d: render(se3.exp(d), lp, jnp.asarray(K)))(gt_dof)
    )
    init = np.asarray(gt_dof) + np.asarray(
        [0.01, -0.01, 0.01, 0.005, -0.005, 0.01], np.float32
    )
    t0 = time.time()
    dof, losses, _ = sharded_calibrate(
        init, band, mesh, np.asarray(lp), K, masks,
        num_steps=2, max_lr=3e-3, chunk=2, rebin_every=2,
    )
    jax.block_until_ready(dof)
    losses = np.asarray(losses)
    ok = bool(np.isfinite(losses).all() and losses[-1] <= losses[0])
    return {
        "kernel_backend": (
            "Pallas compact-chunk fused (interpret), band-only backward + "
            "boundary-prefix bwd map, overflow-asserted"
        ),
        "resolution": f"{Hc}x{Wc}",
        "mesh": "4 data x 2 tile",
        "losses": [round(float(x), 2) for x in losses],
        "wall_s": round(time.time() - t0, 1),
        "ok": ok,
    }


def main() -> int:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    frames_per_view = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    H, W = 1080, 1920
    n_views, n_frames = 4, frames_per_view
    n_data, n_tile = 4, 2
    band_h = H // n_tile

    urdf = REFERENCE_ASSETS / "xarm7_with_gripper_reduced_dof.urdf"
    model = parse_urdf(urdf)
    chain = build_chain(model)
    names = [f"link{i}" for i in range(1, 8)]
    meshes = load_link_meshes(model, link_names=names)
    mesh_list = [decimate_vertex_clustering(meshes[n], 0.004) for n in names]
    # Kernel backend notes (CPU virtual devices; production program shapes
    # are exercised on the real chip by bench.py and by dryrun_multichip):
    # - Pallas interpret mode is a Python loop over ~40k grid programs per
    #   pass — measured 71 min for ONE forward at this scale. Unusable.
    # - The XLA tiled path is vectorized, but its unchunked backward
    #   materializes per-triangle coverage intermediates for every local
    #   frame at once — OOM-killed at 130 GB. frame_chunk=1 (remat over
    #   frame blocks, parallel.sharding) bounds it to one frame's render.
    # cap 1664 covers the audited TRUE loads of this scene with headroom
    # (scripts/audit_config5_ring.py, exact per-view ring audit at 16x128
    # margin 2: max load 1298, span 9x2, big-span 1454) — the r3 record
    # (CONFIG5_DRYRUN.json) ran cap 512, i.e. its XLA-path renders
    # truncated dense tiles; its memory-bounded-execution conclusion
    # stands but its wall times were optimistic. rect 9x3 covers the span.
    tile = TileConfig(
        16, 128, 1664, False, binner="count", rect_y=9, rect_x=3, margin=2.0,
        cull_backfaces=True, bin_big_k=2048,
    )
    band = RobotRenderer(mesh_list, band_h, W, tile=tile)
    link_idx = jnp.asarray([chain.link_index(n) for n in names])

    # 4 cameras on a ring; 20 qposes; flat view x frame batch of 80.
    K = np.asarray(
        [[1400.0, 0, W / 2], [0, 1400.0, H / 2], [0, 0, 1]], np.float32
    )
    rings = camera.ring_poses(n_views, 1.2, 0.8, target=jnp.asarray([0.0, 0.0, 0.3]))
    Tcs = jax.vmap(se3.inverse)(rings)  # [V, 4, 4] camera-from-base
    lo = jnp.asarray(chain.joint_limits[:, 0] * 0.4)
    hi = jnp.asarray(chain.joint_limits[:, 1] * 0.4)
    qs = jax.random.uniform(
        jax.random.PRNGKey(0), (n_frames, chain.n_dof), minval=lo, maxval=hi
    )
    lp1 = jax.vmap(chain.fk)(qs)[:, link_idx]  # [F, L, 4, 4]

    # Single-camera calibration contract: solve ONE Tc. Express the 4-view
    # problem in camera-0 frame by folding each view's KNOWN rig offset
    # into the link poses: lp'_vf = (inv(Tc0) @ Tc_v) @ lp_f, so rendering
    # pose P = Tc0 gives P @ lp'_vf == Tc_v @ lp_f — view v renders its
    # TRUE ring image and the per-view audit budgets above are exact.
    T0inv = se3.inverse(Tcs[0])
    offs = jnp.einsum("ij,vjk->vik", T0inv, Tcs)  # [V, 4, 4]
    lp = jnp.einsum(
        "vij,fljk->vflik", offs, lp1
    ).reshape(n_views * n_frames, lp1.shape[1], 4, 4)

    # Stage 0: the production compact-chunk kernels under the same mesh
    # (reduced resolution; see compact_mesh_stage docstring).
    compact_rep = compact_mesh_stage(chain, mesh_list, link_idx)
    print("compact stage:", json.dumps(compact_rep), flush=True)

    t0 = time.time()
    # GT masks via the SHARDED band renderer (8 virtual devices) — the
    # unsharded full-height CPU render alone takes ~7 min.
    from easyhec_tpu.parallel.sharding import sharded_silhouette

    gt_dof = se3.log(Tcs[0])
    mesh0 = make_mesh(n_data, n_tile)
    render = sharded_silhouette(band, mesh0, band_h)
    sil = jax.jit(
        lambda d: render(se3.exp(d), lp, jnp.asarray(K))
    )(gt_dof)
    masks = np.asarray(sil)
    t_render = time.time() - t0
    cov = float((masks > 0.5).mean())
    print(f"GT render: {t_render:.1f}s, coverage {cov:.4f}", flush=True)

    mesh = mesh0
    init = np.asarray(gt_dof) + np.asarray(
        [0.01, -0.01, 0.01, 0.005, -0.005, 0.01], np.float32
    )
    t0 = time.time()
    dof, losses, history = sharded_calibrate(
        init, band, mesh, np.asarray(lp), K, masks,
        num_steps=steps, max_lr=3e-3, chunk=steps, frame_chunk=1,
    )
    jax.block_until_ready(dof)
    t_opt = time.time() - t0
    losses = np.asarray(losses)
    ok = bool(
        np.isfinite(losses).all()
        and losses[-1] <= losses[0]
        and compact_rep["ok"]
    )
    out = {
        "config": "BASELINE config (5): 4 views x 20 frames @ 1920x1080",
        "compact_kernel_stage": compact_rep,
        "sharded_fullres_stage": {
            "workload": f"4 views x {n_frames} frames @ 1920x1080"
            + ("" if n_frames == 20 else
               " (reduced frame count for the 2-core CPU box; full 80-frame"
               " workload = chip_stage)"),
            "kernel_backend": "XLA tiled + frame_chunk=1 remat (CPU devices),"
                              " cap 1664 / rect 9x3 (ring-audited)",
            "mesh": f"{n_data} data x {n_tile} tile (virtual CPU devices)",
            "steps": steps,
            "losses": [round(float(x), 2) for x in losses],
            "loss_decreasing": ok,
            "gt_render_s": round(t_render, 1),
            "opt_wall_s": round(t_opt, 1),
            "ok": ok,
        },
        "ok": ok,
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "CONFIG5_DRYRUN.json"
    prev = json.loads(path.read_text()) if path.exists() else {}
    # Keep only the real-chip stage from any previous record (the r3-era
    # flat truncating-cap record is superseded wholesale).
    merged = {k: prev[k] for k in ("chip_stage",) if k in prev}
    merged.update(out)
    if "chip_stage" in merged:
        merged["ok"] = bool(ok and merged["chip_stage"].get("ok"))
    path.write_text(json.dumps(merged, indent=2))
    print(json.dumps(out), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
