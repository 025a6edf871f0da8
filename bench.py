"""Benchmark: pixels rasterized per second per chip, forward+backward.

The driver runs this on real TPU hardware and records the JSON line.

Workload = BASELINE.md config (2): xArm7-class arm, 10 joint poses,
640x480, the FULL 1000-step calibration optimizer loop — mask-loss
forward + SE(3) pose gradient + Adam update per step, exactly the
reference's documented convergence budget (docs/usage.md:41,
configs/xarm7/example.yaml num_epochs: 1000; the reference runs this as
B x L serial nvdiffrast CUDA launches per step,
easyhec/modeling/models/rb_solve/rb_solver.py:60-67).

Honesty notes:
- The target masks are HARD thresholded (like real captures), so the
  converged tail keeps ~half-pixel band mismatch everywhere and the
  backward's zero-cotangent/band tile skips only engage where tiles
  genuinely match — no self-consistent-target shortcut.
- Timing is scan+readback: the remote-TPU tunnel's block_until_ready can
  return early, so the loop runs as chunked lax.scans with the carry
  resident on device and the clock stops on a host readback of the final
  pose after ALL chunks (per-dispatch watchdogs preclude one 1000-step
  program).
- Bin overflow is asserted over EVERY rebin of the run (the flag is
  threaded out of the scans), not just the initial pose — a truncating
  bin would silently drop work and inflate the number.

Fault tolerance (the round-2 driver run died with rc=1 on a transient
TPU FAILED_PRECONDITION before any JSON was emitted): the module now
runs the measurement in a CHILD process. The parent never touches jax;
it probes the backend with a tiny subprocess matmul, launches the child,
and on failure retries within a wall-clock budget. If nothing succeeds
it still emits ONE parseable JSON line with an "error" field and exits
0, so the driver's record is never a bare traceback.

vs_baseline: the reference publishes no number (BASELINE.md). The estimate
used is the reference's practical fwd+bwd throughput implied by its
documented convergence budget (1000 iters x 10 frames x 640x480 in ~90 s on
the recommended >=10 GB GPU ~= 34 Mpix/s); vs_baseline = value / 34e6.
"""
from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

REFERENCE_ASSETS = pathlib.Path("/root/reference/assets")
BASELINE_PIX_S = 34e6
NUM_STEPS = int(os.environ.get("BENCH_STEPS", "1000"))
CHUNK = 100
# Rebin policy: ADAPTIVE (default) rebuilds the tile bins inside the scan
# whenever per-link mesh-AABB probe drift exceeds the budget
# margin - soft_band(sharpness) - safety (models.calib.adaptive_drift_
# budget) from the state's build pose — checked BEFORE every render, so
# no render ever uses stale bins. BENCH_REBIN=N selects the legacy fixed cadence, which
# a post-run guard now audits: at N=12 (the r1-r3 operating point) the
# EARLY windows of the misaligned trajectory drift up to ~8 px past the
# 2 px margin (measured via the probe-point guard) — the adaptive policy
# replaces that silent staleness with per-step exactness and rebins the
# converged tail essentially never.
REBIN = int(os.environ.get("BENCH_REBIN", "0"))  # 0 = adaptive
METRIC = "pixels_rasterized_per_s_per_chip_fwd_bwd"

_CHILD_ENV = "EASYHEC_BENCH_CHILD"


def build_scene():
    import jax.numpy as jnp

    from easyhec_tpu.render import RobotRenderer, TileConfig
    from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf
    from easyhec_tpu.robot.mesh import decimate_vertex_clustering

    urdf = REFERENCE_ASSETS / "xarm7_with_gripper_reduced_dof.urdf"
    if urdf.exists():
        model = parse_urdf(urdf)
        chain = build_chain(model)
        names = [f"link{i}" for i in range(1, 8)]
        meshes = load_link_meshes(model, link_names=names)
        mesh_list = [
            decimate_vertex_clustering(meshes[n], 0.004) for n in names
        ]
    else:  # self-contained fallback: procedural arm with a similar tri count
        import tempfile

        from __graft_entry__ import MINI_URDF

        with tempfile.NamedTemporaryFile("w", suffix=".urdf", delete=False) as f:
            f.write(MINI_URDF)
            urdf = f.name
        model = parse_urdf(urdf)
        chain = build_chain(model)
        names = ["base", "upper", "fore"]
        meshes = load_link_meshes(model, link_names=names)
        mesh_list = [meshes[n] for n in names]

    # Resolution override for the per-resolution ledger rows (BASELINE.md):
    # the focal length scales with W so the framing (and thus occupancy
    # structure) stays comparable across resolutions. Defaults = BASELINE
    # config (2). Budgets for non-default resolutions come from
    # scripts/bin_audit.py at the target H/W (the run asserts overflow, so
    # an under-budgeted sweep fails loudly rather than inflating numbers).
    H = int(os.environ.get("BENCH_H", "480"))
    W = int(os.environ.get("BENCH_W", "640"))
    # Winning round-3 config (BASELINE.md ledger): 16x32 tiles + the
    # compact-chunk grid. Small tile AREA is the big lever — coverage work
    # is (tile pixels x chunk lanes) per chunk, mostly waste for sub-pixel
    # triangles — and the compact grid absorbs the smaller bins'
    # raggedness. Cap 1280 covers the TRUE max bin load (CPU audit: 996 at
    # the target pose + drift headroom; caps below the real load silently
    # truncate dense tiles and inflate the number — the r2 lesson).
    # run_bench() asserts the overflow flag stays False at every rebin.
    th = int(os.environ.get("BENCH_TILE_H", "16"))
    tw = int(os.environ.get("BENCH_TILE_W", "32"))
    cap = int(os.environ.get("BENCH_CAP", "1280"))
    big_k = int(os.environ.get("BENCH_BIG_K", "6144"))
    rect_y = int(os.environ.get("BENCH_RECT_Y", {8: "9", 16: "5", 32: "3"}.get(th, "5")))
    rect_x = int(os.environ.get("BENCH_RECT_X", "3"))
    compact = int(os.environ.get("BENCH_COMPACT", "256"))
    bwdc = int(os.environ.get("BENCH_BWD_CHUNKS", "0"))
    # Binning margin: larger margins widen the adaptive drift budget
    # (margin - band - safety), which matters at high resolution where the
    # converged tail's Adam oscillation amplitude in PIXELS scales with
    # focal length — a budget below the oscillation amplitude locks the
    # tail into rebinning every few steps (self-sustaining: each rebuild
    # reorders float summation and re-perturbs the pose).
    mar = float(os.environ.get("BENCH_MARGIN", "2.0"))
    tile = TileConfig(
        th, tw, cap, True, binner="count", rect_y=rect_y, rect_x=rect_x,
        margin=mar,
        cull_backfaces=True,  # closed CAD meshes: exact, halves bin loads
        fused=True,
        bwd_band_only=True,  # exact (tests/test_fused.py TestBandOnlyBackward)
        bin_big_k=big_k,  # span-classed binning: ~4x cheaper rebin scatter
        bin_subsort_rows=True,  # row-coherent bins for the sub-block guards
        compact_chunks=compact,  # compact-chunk-grid loss path
        bwd_chunks=bwdc,  # boundary-prefix backward map (0 = full map)
    )
    renderer = RobotRenderer(mesh_list, H, W, tile=tile)
    link_idx = jnp.asarray([chain.link_index(n) for n in names])
    return chain, renderer, link_idx, H, W


def run_bench() -> dict:
    import jax
    import jax.numpy as jnp

    from easyhec_tpu.geometry import camera, se3
    from easyhec_tpu.models.calib import mask_loss, tile_masks
    from easyhec_tpu.solver.optim import make_optimizer

    chain, renderer, link_idx, H, W = build_scene()
    B = 10
    f = 600.0 * W / 640.0
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    Tcam = camera.look_at(
        jnp.asarray([1.0, 0.7, 0.8]), jnp.asarray([0.0, 0.0, 0.3]), jnp.asarray([0.0, 0.0, 1.0])
    )
    xi = se3.log(se3.inverse(Tcam))
    lo = jnp.asarray(chain.joint_limits[:, 0] * 0.4)
    hi = jnp.asarray(chain.joint_limits[:, 1] * 0.4)
    qs = jax.random.uniform(jax.random.PRNGKey(0), (B, chain.n_dof), minval=lo, maxval=hi)
    lp = jax.vmap(chain.fk)(qs)[:, link_idx]

    st0 = jax.jit(lambda x: renderer.bin_state(se3.exp(x), lp, K))(xi)
    assert not bool(np.asarray(jnp.any(st0.overflow))), (
        "bin overflow: the bench would silently drop triangles — raise "
        "BENCH_CAP / BENCH_RECT_Y"
    )
    target = jax.jit(
        lambda x: (renderer.silhouette(se3.exp(x), lp, K) > 0.5).astype(
            jnp.float32
        )
    )(xi)
    jax.block_until_ready(target)
    # Pre-tiled reference masks for the fused loss kernel (scan-invariant).
    ref_tiles = tile_masks(np.asarray(target), renderer)

    opt = make_optimizer(
        "adam", max_lr=3e-3, total_steps=NUM_STEPS, scheduler="constant"
    )

    # Probe points for the rebin DRIFT guard: bins built at the window's
    # start pose stay exact only while projected geometry moves less than
    # the binning margin; overflow flags do NOT catch drift past it. The
    # guard projects per-link mesh AABB corners under every frame's FK
    # (lever-arm-aware — link origins alone underestimate drift for
    # rotation-dominant updates; r4 advisor) under the start and end poses
    # of every rebin window and asserts the max pixel displacement stays
    # inside margin minus the soft-coverage band — making LARGER
    # rebin_every values honest rather than silently stale. Identical
    # policy to the product path (models.calib).
    from easyhec_tpu.models.calib import (
        adaptive_drift_budget,
        drift_probe_points,
        make_drift_probe_fn,
    )

    probe_pix = make_drift_probe_fn(drift_probe_points(renderer, lp), K)
    drift_budget = adaptive_drift_budget(renderer.tile, 1.0)
    assert drift_budget > 0, "bench margin/sharpness leave no drift budget"

    if REBIN > 0:

        @jax.jit
        def run_chunk(dof, opt_state, state, pix0):
            def outer(carry, _):
                dof, opt_state = carry
                state = renderer.bin_state(se3.exp(dof), lp, K)
                pix0 = probe_pix(dof)

                def step(c, _):
                    dof, opt_state = c
                    loss, g = jax.value_and_grad(
                        lambda d: mask_loss(d, renderer, lp, K, target,
                                            bin_state=state,
                                            ref_tiles=ref_tiles)
                    )(dof)
                    u, opt_state2 = opt.update(g, opt_state, dof)
                    return (dof + u, opt_state2), loss

                inner, losses = jax.lax.scan(
                    step, (dof, opt_state), None, length=REBIN
                )
                drift = jnp.max(jnp.abs(probe_pix(inner[0]) - pix0))
                return inner, (losses, jnp.any(state.overflow), drift)

            (dof, opt_state), (losses, ovs, drifts) = jax.lax.scan(
                outer, (dof, opt_state), None, length=CHUNK // REBIN + 1
            )
            # ALL executed steps' losses are reported and counted:
            # (CHUNK//REBIN+1)*REBIN steps per chunk, matching
            # steps_per_chunk below. Per-rebin overflow flags and the max
            # in-window drift come out so the caller can assert the bins
            # never truncated NOR went stale anywhere in the trajectory.
            return (
                dof, opt_state, state, pix0, losses.reshape(-1),
                jnp.zeros((), jnp.int32), jnp.any(ovs), jnp.max(drifts),
            )

        steps_per_chunk = (CHUNK // REBIN + 1) * REBIN
    else:

        @jax.jit
        def run_chunk(dof, opt_state, state, pix0):
            def step(c, _):
                dof, opt_state, state, pix0, nreb, ov = c
                drift = jnp.max(jnp.abs(probe_pix(dof) - pix0))
                need = drift > drift_budget

                def rebuild(_):
                    return (
                        renderer.bin_state(se3.exp(dof), lp, K),
                        probe_pix(dof),
                    )

                def keep(_):
                    return state, pix0

                state2, pix2 = jax.lax.cond(need, rebuild, keep, None)
                loss, g = jax.value_and_grad(
                    lambda d: mask_loss(d, renderer, lp, K, target,
                                        bin_state=state2,
                                        ref_tiles=ref_tiles)
                )(dof)
                u, opt_state2 = opt.update(g, opt_state, dof)
                return (
                    dof + u, opt_state2, state2, pix2,
                    nreb + need.astype(jnp.int32),
                    ov | jnp.any(state2.overflow),
                ), loss

            (dof, opt_state, state, pix0, nreb, ov), losses = jax.lax.scan(
                step,
                (dof, opt_state, state, pix0, jnp.zeros((), jnp.int32),
                 jnp.zeros((), bool)),
                None, length=CHUNK,
            )
            # Every render is drift-exact by construction (the budget is
            # checked against the CURRENT pose before each render); the
            # reported drift is bounded by the budget, so only overflow
            # and the rebin count come out.
            return (
                dof, opt_state, state, pix0, losses, nreb, ov,
                jnp.zeros(()),
            )

        steps_per_chunk = CHUNK

    d0 = xi + 0.01
    n_chunks = -(-NUM_STEPS // steps_per_chunk)
    pix00 = jax.jit(probe_pix)(xi)

    # warm/compile
    out = run_chunk(d0, opt.init(d0), st0, pix00)
    np.asarray(out[0])

    dof, opt_state, state, pix0 = d0, opt.init(d0), st0, pix00
    all_losses, all_ov, all_dr, all_nreb = [], [], [], []
    t0 = time.time()
    for _ in range(n_chunks):
        dof, opt_state, state, pix0, losses, nreb, ov, dr = run_chunk(
            dof, opt_state, state, pix0
        )
        all_losses.append(losses)  # device arrays; no sync inside the loop
        all_ov.append(ov)
        all_dr.append(dr)
        all_nreb.append(nreb)
    dof = np.asarray(dof)  # readback = true completion
    dt = time.time() - t0
    n_steps = n_chunks * steps_per_chunk

    assert not any(bool(np.asarray(o)) for o in all_ov), (
        "bin overflow during the optimization trajectory — raise BENCH_CAP"
    )
    margin = float(renderer.tile.margin)
    if REBIN > 0:
        max_drift = max(float(np.asarray(d)) for d in all_dr)
        assert max_drift < margin - 0.6, (
            "pose drift exceeded the binning margin within a rebin window "
            "— bins went stale (use adaptive BENCH_REBIN=0 or raise "
            "margin)", max_drift, margin,
        )
    n_rebins = int(sum(int(np.asarray(n)) for n in all_nreb))
    losses = np.concatenate([np.asarray(l) for l in all_losses])
    assert np.isfinite(dof).all() and losses[-1] < 0.2 * losses[0], (
        "loop not converging", float(losses[0]), float(losses[-1]),
    )

    pix_per_s = n_steps * B * H * W / dt
    return {
        "metric": METRIC,
        "value": round(pix_per_s),
        "unit": "pixels/s",
        "vs_baseline": round(pix_per_s / BASELINE_PIX_S, 3),
        "rebin_policy": "adaptive" if REBIN == 0 else f"every {REBIN}",
        "n_rebins": n_rebins,
    }


# ---------------------------------------------------------------------------
# Fault-tolerant driver entry: probe -> child run -> bounded retry -> JSON.
# ---------------------------------------------------------------------------


def _probe_backend(timeout_s: float) -> tuple[bool, str]:
    """Tiny matmul in a fresh process: is the backend dispatchable?"""
    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((128, 128));"
        "print(float((x @ x).sum()))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, "probe timeout (backend wedged)"
    if r.returncode != 0:
        return False, (r.stderr or "probe failed").strip()[-400:]
    return True, ""


def _run_child(timeout_s: float) -> tuple[dict | None, str]:
    env = dict(os.environ, **{_CHILD_ENV: "1"})
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
    except subprocess.TimeoutExpired:
        return None, "bench child timeout"
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if d.get("metric") == METRIC and r.returncode == 0:
            return d, ""
        if "bench_error" in d:
            return None, str(d["bench_error"])[:400]
    return None, (r.stderr or "no JSON from child").strip()[-400:]


def _child_main() -> int:
    try:
        print(json.dumps(run_bench()), flush=True)
        return 0
    except BaseException as e:  # noqa: BLE001 — must report, not traceback
        print(json.dumps({"bench_error": repr(e)[:500]}), flush=True)
        return 1


def main() -> int:
    if os.environ.get(_CHILD_ENV):
        return _child_main()

    budget = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    child_timeout = float(os.environ.get("BENCH_CHILD_TIMEOUT_S", "1200"))
    deadline = time.time() + budget
    last_err = "no attempt made"
    attempt = 0
    while time.time() < deadline and attempt < 6:
        ok, err = _probe_backend(timeout_s=120)
        if not ok:
            # Wedged relays on this box take minutes to clear; probe
            # roughly once a minute until the budget runs out.
            last_err = f"backend probe: {err}"
            print(f"[bench] {last_err}; retrying", file=sys.stderr, flush=True)
            time.sleep(min(60, max(1, deadline - time.time())))
            continue
        attempt += 1
        result, err = _run_child(
            timeout_s=min(child_timeout, max(60, deadline - time.time()))
        )
        if result is not None:
            print(json.dumps(result), flush=True)
            return 0
        last_err = err
        print(
            f"[bench] attempt {attempt} failed: {err}; retrying",
            file=sys.stderr, flush=True,
        )
        time.sleep(min(120, max(1, deadline - time.time())))
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": 0,
                "unit": "pixels/s",
                "vs_baseline": 0.0,
                "error": last_err[:400],
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
