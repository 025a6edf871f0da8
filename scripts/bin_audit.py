"""CPU audit of TRUE rasterizer bin loads for a scene + tile shape.

Computes exact, uncapped per-tile triangle counts (margin-dilated bboxes,
the same enumeration the counting binner performs — render/binning.py
fields_and_bins) over a batch of sampled joint poses, and recommends
honest static budgets:

- capacity: max per-tile load + drift headroom, rounded to 128
- bin_big_k: count of "big" triangles (bbox spans > 2 tile rows or > 1
  column — the span-classed binning's full-window class) + headroom
- compact_chunks: max over frames of sum(ceil(count/128)) + headroom
- bwd_chunks: band-capable chunk count at the audit pose (tiles whose
  dilated bbox region can touch the silhouette boundary; conservatively
  reported as == compact_chunks when not computed)

The r2 honesty audit (BASELINE.md) showed every shipped config truncated
bins silently at 640x480; this tool is how caps are set per-resolution
BEFORE a config ships. Caps below the audited max now raise
BinOverflowError at run time (models/calib.opt_scan threads the flag out
of every rebin).

Usage:
    python scripts/bin_audit.py --urdf /root/reference/assets/xarm7_with_gripper_reduced_dof.urdf \
        --links link1..link7 --H 720 --W 1280 --f 906.8 --decimate 0.004 \
        --tiles 16x32,16x64 --frames 10
    python scripts/bin_audit.py --config configs/xarm7_example.yaml --frames 10
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-int(x) // m) * m


def audit_scene(
    renderer, chain, link_idx, K, Tc_c2b, qposes, margin: float
) -> dict:
    """True bin-load statistics for one (tile_h, tile_w) renderer config."""
    from easyhec_tpu.render.tiled import _edge_fields_soa

    th, tw = renderer.tile.tile_h, renderer.tile.tile_w
    H, W = renderer.H, renderer.W
    n_ty, n_tx = -(-H // th), -(-W // tw)

    lp = jax.vmap(chain.fk)(qposes)[:, link_idx]
    Tc_c2l = renderer.camera_link_poses(jnp.asarray(Tc_c2b), lp)
    soa = renderer._triangles_soa(Tc_c2l, jnp.asarray(K))
    fl = _edge_fields_soa(jax.tree.map(jnp.asarray, soa))
    lox, loy, hix, hiy = (np.asarray(fl[i]) for i in (9, 10, 11, 12))
    valid = np.asarray(soa.valid)

    lox, loy, hix, hiy = lox - margin, loy - margin, hix + margin, hiy + margin
    on = valid & (hix > 0) & (lox < W) & (hiy > 0) & (loy < H)

    ty0 = np.clip(np.floor(loy / th).astype(np.int64), 0, n_ty - 1)
    ty1 = np.clip(np.floor(hiy / th).astype(np.int64), 0, n_ty - 1)
    tx0 = np.clip(np.floor(lox / tw).astype(np.int64), 0, n_tx - 1)
    tx1 = np.clip(np.floor(hix / tw).astype(np.int64), 0, n_tx - 1)
    span_y, span_x = ty1 - ty0 + 1, tx1 - tx0 + 1

    B = valid.shape[0]
    max_load = 0
    loads_all = []
    chunks_needed = 0
    big_max = 0
    for b in range(B):
        ob = on[b]
        big_max = max(big_max, int(((span_y[b] > 2) | (span_x[b] > 1))[ob].sum()))
        counts = np.zeros(n_ty * n_tx, np.int64)
        ids = np.nonzero(ob)[0]
        for i in ids:
            tiles_y = np.arange(ty0[b, i], ty1[b, i] + 1)
            tiles_x = np.arange(tx0[b, i], tx1[b, i] + 1)
            counts[(tiles_y[:, None] * n_tx + tiles_x[None, :]).ravel()] += 1
        max_load = max(max_load, int(counts.max()))
        loads_all.append(counts[counts > 0])
        chunks_needed = max(chunks_needed, int(np.ceil(counts / 128).sum()))
    occ = np.concatenate(loads_all) if loads_all else np.zeros(1)
    return {
        "tile": f"{th}x{tw}",
        "grid": f"{n_ty}x{n_tx}",
        "n_tiles": n_ty * n_tx,
        "frames": B,
        "max_load": max_load,
        "p99_load": int(np.percentile(occ, 99)),
        "mean_occupancy_pct": round(
            100.0 * float(np.concatenate(loads_all).sum())
            / (B * n_ty * n_tx * max(max_load, 1)), 2),
        "big_span_count": big_max,
        "max_span_y": int(span_y[on].max()) if on.any() else 0,
        "max_span_x": int(span_x[on].max()) if on.any() else 0,
        "compact_chunks_needed": chunks_needed,
        "recommend": {
            "capacity": _round_up(max_load * 1.25, 128),
            "bin_big_k": _round_up(max(big_max * 1.25, 256), 256),
            "compact_chunks": _round_up(chunks_needed * 1.3, 8),
            "bwd_chunks": _round_up(chunks_needed * 1.3, 8),
        },
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="")
    ap.add_argument("--urdf", default="")
    ap.add_argument("--links", default="")
    ap.add_argument("--H", type=int, default=0)
    ap.add_argument("--W", type=int, default=0)
    ap.add_argument("--f", type=float, default=0.0, help="focal px (0: 906.8*W/1280)")
    ap.add_argument("--decimate", type=float, default=-1.0)
    ap.add_argument("--tiles", default="16x32", help="comma list thxtw")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--margin", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--qpos-scale", type=float, default=0.4)
    ap.add_argument("--cam", default="1.0,0.7,0.8",
                    help="camera eye xyz (looks at 0,0,0.3)")
    args = ap.parse_args()

    from easyhec_tpu.geometry import camera, se3
    from easyhec_tpu.render import RobotRenderer, TileConfig
    from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
    from easyhec_tpu.robot.mesh import decimate_vertex_clustering

    if args.config:
        from easyhec_tpu.config.config import load_config

        cfg = load_config(args.config)
        urdf = cfg.model.urdf_path
        links = list(cfg.model.use_links)
        H = args.H or cfg.model.H
        W = args.W or cfg.model.W
        dec = cfg.model.decimate_voxel if args.decimate < 0 else args.decimate
    else:
        urdf = args.urdf
        links = args.links.split(",") if args.links else []
        H, W = args.H, args.W
        dec = max(args.decimate, 0.0)
    if not urdf or not H or not W:
        ap.error("need --config or (--urdf --H --W)")

    model = parse_urdf(urdf)
    chain = build_chain(model)
    mesh_map = load_link_meshes(model, link_names=links or None)
    links = [n for n in (links or mesh_map) if n in mesh_map]
    meshes = [mesh_map[n] for n in links]
    if dec > 0:
        meshes = [decimate_vertex_clustering(m, dec) for m in meshes]
    f = args.f or 906.8 * W / 1280.0
    K = np.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    eye = jnp.asarray([float(x) for x in args.cam.split(",")])
    Tcam = camera.look_at(eye, jnp.asarray([0.0, 0.0, 0.3]),
                          jnp.asarray([0.0, 0.0, 1.0]))
    Tc = se3.inverse(Tcam)
    lo = jnp.asarray(chain.joint_limits[:, 0] * args.qpos_scale)
    hi = jnp.asarray(chain.joint_limits[:, 1] * args.qpos_scale)
    qs = jax.random.uniform(
        jax.random.PRNGKey(args.seed), (args.frames, chain.n_dof),
        minval=lo, maxval=hi,
    )
    link_idx = jnp.asarray([chain.link_index(n) for n in links])

    ntris = sum(m.faces.shape[0] for m in meshes)
    print(f"scene: {len(links)} links, {ntris} tris, {H}x{W}, f={f:.1f}, "
          f"decimate={dec}", flush=True)
    for spec in args.tiles.split(","):
        th, tw = (int(x) for x in spec.split("x"))
        r = RobotRenderer(
            meshes, H, W,
            tile=TileConfig(th, tw, 128, cull_backfaces=True),
        )
        rep = audit_scene(r, chain, link_idx, K, Tc, qs, args.margin)
        print(json.dumps(rep), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
