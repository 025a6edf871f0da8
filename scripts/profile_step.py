"""Per-stage honest timing of the calibration optimizer step on TPU.

block_until_ready can return early over this machine's remote-TPU tunnel,
so every stage is timed as a scan of N iterations with a sequential data
dependence (a scalar derived from the stage output is folded back into the
input), and the clock stops on a host readback of the final carry.

Usage: python scripts/profile_step.py [N]
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(fn, n, label, per=None):
    """fn: (eps scalar) -> scalar. Chained via carry; readback at end."""

    @jax.jit
    def run():
        def step(carry, _):
            out = fn(carry * 1e-30)
            return out * 0.0 + carry, out

        c, outs = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c + outs[-1]

    np.asarray(run())  # compile+warm
    t0 = time.time()
    np.asarray(run())
    dt = (time.time() - t0) / n
    extra = f"  ({per(dt):.1f} {per.__doc__})" if per else ""
    print(f"{label:34s} {dt * 1e3:8.2f} ms/iter{extra}")
    return dt


def main():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import bench

    from easyhec_tpu.geometry import camera, se3
    from easyhec_tpu.models.calib import mask_loss
    from easyhec_tpu.render.binning import (
        fields_and_bins,
        pack_records_counted,
        silhouette_counted,
    )
    from easyhec_tpu.ops.tile_raster import TRI_RECORD, tile_silhouette

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

    print(
        f"scene: F={renderer.faces.shape[0]} tris, B={B}, {H}x{W}, "
        f"tile={cfg.tile_h}x{cfg.tile_w} cap={cfg.capacity} "
        f"rect=({cfg.rect_y},{cfg.rect_x})"
    )

    target = jax.jit(lambda x: renderer.silhouette(se3.exp(x), lp, K))(xi)
    target = jax.block_until_ready(target)
    state0 = jax.jit(lambda x: renderer.bin_state(se3.exp(x), lp, K))(xi)

    def tris_of(eps):
        return renderer._triangles_soa(
            renderer.camera_link_poses(se3.exp(xi + eps), lp), K
        )

    def flat(soa):
        batch = soa.valid.shape[:-1]
        return jax.tree.map(
            lambda a: a.reshape((-1,) + a.shape[len(batch):]), soa
        )

    # --- stages -----------------------------------------------------------
    timed_scan(
        lambda e: jnp.sum(jax.vmap(chain.fk)(qs + e)), n, "fk (B qposes)"
    )
    timed_scan(lambda e: jnp.sum(tris_of(e).u), n, "vertex transform+setup")

    def bins_only(e):
        fields, state = fields_and_bins(flat(tris_of(e)), H, W, cfg)
        return jnp.sum(state.counts).astype(jnp.float32)

    timed_scan(bins_only, n, "fields+bin_count")

    n_tx = -(-W // cfg.tile_w)

    def pack_only(e):
        from easyhec_tpu.render.tiled import _edge_fields_soa

        fields = jnp.stack(_edge_fields_soa(flat(tris_of(e))), axis=-2)
        rec = pack_records_counted(
            fields, state0.idx, state0.q, n_tx, cfg.tile_h, cfg.tile_w,
            TRI_RECORD,
        )
        return jnp.sum(rec[..., 0, :])

    timed_scan(pack_only, n, "setup+pack_records (fwd)")

    def kernel_fwd(e):
        from easyhec_tpu.render.tiled import _edge_fields_soa

        fields = jnp.stack(_edge_fields_soa(flat(tris_of(e))), axis=-2)
        rec = pack_records_counted(
            fields, state0.idx, state0.q, n_tx, cfg.tile_h, cfg.tile_w,
            TRI_RECORD,
        )
        tiles = tile_silhouette(
            rec, state0.counts, cfg.tile_h, cfg.tile_w, 1.0
        )
        return jnp.sum(tiles)

    timed_scan(kernel_fwd, n, "fwd total (pack+kernel)")

    def loss_fwd(e):
        return mask_loss(xi + e, renderer, lp, K, target, bin_state=state0)

    timed_scan(loss_fwd, n, "loss fwd")

    def loss_grad(e):
        l, g = jax.value_and_grad(loss_fwd)(e)
        return l + jnp.sum(g)

    timed_scan(loss_grad, n, "loss fwd+bwd")

    def rebin_step(e):
        st = renderer.bin_state(se3.exp(xi + e), lp, K)
        l, g = jax.value_and_grad(
            lambda d: mask_loss(d, renderer, lp, K, target, bin_state=st)
        )(xi + e)
        return l + jnp.sum(g)

    timed_scan(rebin_step, n, "fwd+bwd incl. rebin")


if __name__ == "__main__":
    main()
