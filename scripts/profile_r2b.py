"""Round-2 profiling pass B: fused loss kernel + span-classed binning."""
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
from easyhec_tpu.models.calib import mask_loss, tile_masks


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

    target = jax.jit(lambda x: renderer.silhouette(se3.exp(x), lp, K))(xi)
    jax.block_until_ready(target)

    # bin overflow / count sanity on the bench scene
    st0 = jax.jit(lambda x: renderer.bin_state(se3.exp(x), lp, K))(xi)
    print("overflow at target pose:", bool(np.asarray(jnp.any(st0.overflow))),
          "max count:", int(jnp.max(st0.counts)))

    for big_k in (0, 1024, 2048):
        r2 = type(renderer).__new__(type(renderer))
        r2.__dict__.update(renderer.__dict__)
        r2.tile = renderer.tile._replace(bin_big_k=big_k)
        st = jax.jit(lambda x: r2.bin_state(se3.exp(x), lp, K))(xi)
        ov = bool(np.asarray(jnp.any(st.overflow)))
        dt = scan_time(
            lambda c, r2=r2: (r2.bin_state(se3.exp(c[0]), lp, K).rec[0, 0, 0] * 0 + c[0],),
            (xi,), n=10,
        )
        print(f"rebin big_k={big_k}: {dt*1e3:.2f} ms, overflow={ov}")

    # fused loss kernel vs old path, aligned/misaligned
    ref_tiles = tile_masks(np.asarray(target), renderer)
    for label, d0 in (("aligned", xi), ("misaligned", xi + 0.01)):
        st = jax.jit(lambda x: renderer.bin_state(se3.exp(x), lp, K))(d0)
        jax.block_until_ready(st)
        g_new = jax.grad(
            lambda d: mask_loss(d, renderer, lp, K, target, bin_state=st,
                                ref_tiles=ref_tiles)
        )
        dt = scan_time(lambda c, g=g_new: (c[0] + 0.0 * g(c[0]),), (d0,), n=30)
        print(f"fused-loss fwd+bwd {label}: {dt*1e3:.2f} ms")

        # old image-based path for comparison
        from easyhec_tpu.render.fused import silhouette_fused

        def old_loss(d):
            sil = silhouette_fused(renderer, se3.exp(d), lp, K, 1.0, state=st)
            return jnp.mean(jnp.sum((sil - target) ** 2, axis=(-2, -1)))

        g_old = jax.grad(old_loss)
        dt = scan_time(lambda c, g=g_old: (c[0] + 0.0 * g(c[0]),), (d0,), n=30)
        print(f"old-image fwd+bwd {label}: {dt*1e3:.2f} ms")

    # numerics: fused-loss grad vs old path grad on TPU
    d0 = xi + 0.01
    st = jax.jit(lambda x: renderer.bin_state(se3.exp(x), lp, K))(d0)
    gn = np.asarray(jax.jit(jax.grad(
        lambda d: mask_loss(d, renderer, lp, K, target, bin_state=st,
                            ref_tiles=ref_tiles)))(d0))
    from easyhec_tpu.render.fused import silhouette_fused

    go = np.asarray(jax.jit(jax.grad(
        lambda d: jnp.mean(jnp.sum(
            (silhouette_fused(renderer, se3.exp(d), lp, K, 1.0, state=st)
             - target) ** 2, axis=(-2, -1)))))(d0))
    print("grad new:", gn)
    print("grad old:", go)
    print("rel err:", np.abs(gn - go).max() / np.abs(go).max())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
