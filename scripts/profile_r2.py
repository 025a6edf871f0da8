"""Round-2 profiling: decompose the per-step cost of the bench workload.

Times (readback-based, N-iteration scan loops like bench.py):
  - fused fwd only
  - fused fwd+bwd, aligned + misaligned, band_only on/off
  - build_fused_state (the rebin)
  - full optimizer step at various rebin_every
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_scene
from easyhec_tpu.geometry import camera, se3
from easyhec_tpu.models.calib import mask_loss


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    # leaf readback to defeat any tunnel async
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)
    return (time.time() - t0)


def scan_time(make_step, init, n=30):
    """Time n sequential steps under one jit'd scan; returns s/step."""

    @jax.jit
    def run(c0):
        def step(c, _):
            return make_step(c), 0
        c, _ = jax.lax.scan(step, c0, None, length=n)
        return c

    c = run(init)
    jax.block_until_ready(c)
    np.asarray(jax.tree_util.tree_leaves(c)[0])
    t0 = time.time()
    c = run(init)
    np.asarray(jax.tree_util.tree_leaves(c)[0])
    return (time.time() - t0) / n


def main():
    chain, renderer, link_idx, H, W = build_scene()
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
    lp = jax.vmap(chain.fk)(qs)[:, link_idx]
    print(f"triangles: {renderer.faces.shape[0]}, links: {renderer.n_links}")

    target = jax.jit(lambda x: renderer.silhouette(se3.exp(x), lp, K))(xi)
    jax.block_until_ready(target)

    state = jax.jit(lambda x: renderer.bin_state(se3.exp(x), lp, K))(xi)
    jax.block_until_ready(state)
    print("rec shape:", state.rec.shape, "counts:", state.counts.shape,
          "max count:", int(jnp.max(state.counts)), "mean count:",
          float(jnp.mean(state.counts)))

    # --- rebin cost ---
    dt = scan_time(
        lambda c: (renderer.bin_state(se3.exp(c[0]), lp, K).rec[0, 0, 0] * 0 + c[0],),
        (xi,), n=10,
    )
    # note: scan carries dof only; each step does a full rebin
    print(f"rebin (build_fused_state): {dt*1e3:.2f} ms")

    # --- fwd only (aligned) ---
    dt = scan_time(
        lambda c: (c[0] + 0.0 * jnp.sum(
            renderer.silhouette(se3.exp(c[0]), lp, K, bin_state=state)),),
        (xi,), n=30,
    )
    print(f"fwd only (aligned): {dt*1e3:.2f} ms")

    # --- fwd+bwd via grad, band off/on, aligned + misaligned ---
    from easyhec_tpu.render.tiled import TileConfig
    for band in (False, True):
        tile = renderer.tile._replace(bwd_band_only=band)
        r2 = type(renderer).__new__(type(renderer))
        r2.__dict__.update(renderer.__dict__)
        r2.tile = tile
        for label, d0 in (("aligned", xi), ("misaligned", xi + 0.01)):
            st = jax.jit(lambda x: r2.bin_state(se3.exp(x), lp, K))(d0)
            jax.block_until_ready(st)
            g = jax.grad(
                lambda d: mask_loss(d, r2, lp, K, target, bin_state=st)
            )
            dt = scan_time(lambda c, g=g: (c[0] + 0.0 * g(c[0]),), (d0,), n=30)
            print(f"fwd+bwd band_only={band} {label}: {dt*1e3:.2f} ms")

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
