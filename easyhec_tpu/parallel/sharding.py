"""Multi-chip sharding for calibration and rendering.

The reference's only scaling mechanism is template DDP that its shipped
configs never use (SURVEY.md §2.4). Here scaling is native SPMD over a
`jax.sharding.Mesh` with two axes:

- "data": frames × cameras sharded across devices (each device rasterizes
  its own frames; the 6-DoF pose gradient is psum-reduced over ICI).
- "tile": horizontal image bands within a frame. A band render needs NO
  special rasterizer support: rendering rows [y0, y0+bh) of an image equals
  rendering a bh-tall image with the principal point shifted by
  cy -= y0 — each device renders a shifted crop and bands concatenate.

This is the rasterizer analog of context parallelism: pixels are the
"sequence", bands are its shards (SURVEY.md §5 long-context).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import se3
from ..render.renderer import RobotRenderer
from ..solver.optim import make_optimizer

__all__ = [
    "make_mesh",
    "pad_frames",
    "sharded_mask_loss",
    "sharded_calibrate",
    "sharded_silhouette",
]


def make_mesh(n_data: int, n_tile: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    need = n_data * n_tile
    if devices.size < need:
        raise ValueError(f"need {need} devices, have {devices.size}")
    return Mesh(devices[:need].reshape(n_data, n_tile), axis_names=("data", "tile"))


def pad_frames(arr: np.ndarray, n_shards: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad the frame axis to a multiple of n_shards. Returns (padded, weight)
    with weight 1 for real frames, 0 for padding."""
    b = arr.shape[0]
    pad = (-b) % n_shards
    w = np.concatenate([np.ones(b, np.float32), np.zeros(pad, np.float32)])
    if pad:
        arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
    return arr, w


def _band_K(K: jax.Array, y0: jax.Array) -> jax.Array:
    """Shift the principal point so a band render covers rows [y0, y0+bh)."""
    return K.at[1, 2].add(-y0)


def sharded_silhouette(
    renderer: RobotRenderer, mesh: Mesh, band_h: int
):
    """Build a sharded render fn: (Tc_c2b, link_poses[B,L,4,4], K) -> [B,H,W]
    with frames over "data" and image bands over "tile".

    `renderer` must be built with H = band_h (each device renders one band);
    the full image height is band_h * mesh.shape["tile"].
    """
    n_tile = mesh.shape["tile"]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=P("data", "tile"),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )
    def render(Tc_c2b, link_poses, K):
        ti = jax.lax.axis_index("tile")
        Kb = _band_K(K, ti.astype(jnp.float32) * band_h)
        sil = renderer.silhouette(Tc_c2b, link_poses, Kb)  # [b_local, band_h, W]
        return sil[:, None]  # [b_local, 1(tile), band_h, W]

    def full(Tc_c2b, link_poses, K):
        out = render(Tc_c2b, link_poses, K)  # [B, n_tile, band_h, W]
        B = out.shape[0]
        return out.reshape(B, n_tile * band_h, out.shape[-1])

    return full


def sharded_mask_loss(renderer: RobotRenderer, mesh: Mesh, band_h: int, sharpness: float = 1.0):
    """Build the sharded loss: frames over "data", bands over "tile";
    per-frame SUM of squared error over the full image, weighted MEAN over
    real frames (identical semantics to models.calib.mask_loss)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("data"), P(), P("data", "tile"), P("data")),
        out_specs=P(),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )
    def loss(dof, link_poses, K, masks_ref, weight):
        ti = jax.lax.axis_index("tile")
        Kb = _band_K(K, ti.astype(jnp.float32) * band_h)
        sil = renderer.silhouette(se3.exp(dof), link_poses, Kb, sharpness)
        per_frame = jnp.sum((sil - masks_ref) ** 2, axis=(-2, -1))  # local band
        per_frame = jax.lax.psum(per_frame, "tile")  # full-image per-frame sum
        num = jnp.sum(per_frame * weight)
        den = jnp.sum(weight)
        num = jax.lax.psum(num, "data")
        den = jax.lax.psum(den, "data")
        return num / den

    return loss


def sharded_calibrate(
    init_dof,
    renderer: RobotRenderer,
    mesh: Mesh,
    link_poses: np.ndarray,
    K: np.ndarray,
    masks_ref: np.ndarray,
    num_steps: int = 1000,
    max_lr: float = 3e-3,
    optimizer: str = "adam",
    scheduler: str = "constant",
    sharpness: float = 1.0,
    robust_delta: float = 0.0,
    grad_clip: float = 0.0,
    rebin_every: int = 1,
    chunk: int = 50,
    frame_chunk: int = 0,
    on_overflow: str = "raise",
):
    """Multi-chip calibrate(): the SAME optimizer machinery as the
    single-chip path (models.calib.opt_scan — fused loss kernel, amortized
    rebinning, robust delta, grad clip, chunked dispatch), with the loss
    psum-reduced over the ("data", "tile") mesh inside shard_map.

    masks_ref: [B, H, W] with H = band_h * n_tile (`renderer` built with
    H = band_h). Returns (dof, losses, history) as in
    models.calib._calibrate_scan.

    frame_chunk > 0 evaluates each device's local per-frame losses in
    blocks of that many frames under jax.checkpoint (lax.map over blocks):
    backward memory drops from O(local_frames) to O(frame_chunk) renders at
    the cost of recomputing the forward per block — the rasterizer analog
    of activation rematerialization for memory-bound configs (e.g. many
    1080p frames per device on hosts with modest RAM). Exact for the
    gradient. Disables bin-state reuse (bins are rebuilt per block).
    """
    from ..models.calib import (
        adaptive_drift_budget,
        drift_probe_points,
        make_drift_probe_fn,
        mask_loss_per_frame,
        opt_scan,
        reuse_bins_ok,
        tile_masks,
    )

    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]
    H_full = masks_ref.shape[-2]
    band_h = H_full // n_tile
    if band_h != renderer.H:
        raise ValueError(
            f"renderer H ({renderer.H}) must equal band height "
            f"({H_full}//{n_tile}={band_h})"
        )

    lp, w = pad_frames(np.asarray(link_poses, np.float32), n_data)
    masks, _ = pad_frames(np.asarray(masks_ref, np.float32), n_data)
    B = masks.shape[0]
    masks_bands = masks.reshape(B, n_tile, band_h, masks.shape[-1])

    def put(arr, spec):
        # make_array_from_callback works in BOTH single- and multi-process
        # SPMD (device_put with a global sharding does not once devices
        # span processes): every process holds the full host array and each
        # device picks its shard.
        a = np.asarray(arr, np.float32)
        return jax.make_array_from_callback(
            a.shape, NamedSharding(mesh, spec), lambda idx: a[idx]
        )

    lp = put(lp, P("data"))
    masks_bands = put(masks_bands, P("data", "tile"))
    wj = put(w, P("data"))
    Kj = put(K, P())
    dof = put(init_dof, P())

    opt = make_optimizer(
        optimizer, max_lr=max_lr, total_steps=num_steps,
        scheduler=scheduler, grad_clip=grad_clip,
    )
    # Explicit bin states whenever the renderer supports them (threads the
    # per-rebin overflow flag out of the scan); rebin_every == 0 selects
    # ADAPTIVE rebinning (drift-gated, see models.calib.opt_scan; each
    # shard gates on its own local probe points — shards may rebin at
    # different steps, which is exact since every shard's state covers its
    # own frames). eff 0 = no bin state (the frame-chunked remat path
    # rebuilds bins inside each block).
    use_states = reuse_bins_ok(renderer) and frame_chunk <= 0
    adaptive = use_states and rebin_every == 0
    eff_rebin = max(1, rebin_every) if use_states else 0

    def chunk_fn(n):
        @jax.jit
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P(), P("data", "tile"), P("data")),
            out_specs=(P(), P(), P(), P(), P(), P()),
            check_vma=False,  # pallas_call out_shapes carry no vma info
        )
        def run(dof, opt_state, lp, K, mb, w):
            ti = jax.lax.axis_index("tile")
            Kb = _band_K(K, ti.astype(jnp.float32) * band_h)
            m_local = mb[:, 0]  # [b_local, band_h, W]
            ref_tiles = tile_masks(m_local, renderer)
            # full-image mask area per frame (for robust normalization);
            # forward-only psum — never differentiated.
            area = jnp.maximum(
                jax.lax.psum(jnp.sum(m_local, axis=(-2, -1)), "tile"), 1.0
            )

            # Inside shard_map with check_vma=False, grad-through-psum
            # silently mis-transposes (loses the cross-device accumulation).
            # So the differentiated objective stays LOCAL (this device's
            # frames × band) and opt_scan's combine psums the gradient —
            # exact because the full loss is a sum of local terms with
            # stop-gradient robust weights (rho' = the Huber slope).
            def _pf(d, bin_state):
                if frame_chunk <= 0:
                    return mask_loss_per_frame(
                        d, renderer, lp, Kb, m_local, sharpness,
                        bin_state=bin_state, ref_tiles=ref_tiles,
                    )
                bl = lp.shape[0]
                fc = min(frame_chunk, bl)
                pad = (-bl) % fc
                lp_p = jnp.concatenate(
                    [lp, jnp.broadcast_to(lp[:1], (pad,) + lp.shape[1:])]
                ) if pad else lp
                m_p = jnp.concatenate(
                    [m_local,
                     jnp.zeros((pad,) + m_local.shape[1:], m_local.dtype)]
                ) if pad else m_local

                @jax.checkpoint
                def block(args):
                    lp_c, m_c = args
                    return mask_loss_per_frame(
                        d, renderer, lp_c, Kb, m_c, sharpness,
                        bin_state=None, ref_tiles=None,
                    )

                pf = jax.lax.map(
                    block,
                    (lp_p.reshape((-1, fc) + lp.shape[1:]),
                     m_p.reshape((-1, fc) + m_local.shape[1:])),
                )
                return pf.reshape(-1)[:bl]

            def loss_of(d, bin_state):
                pf_local = _pf(d, bin_state)
                if robust_delta > 0:
                    pf_full = jax.lax.psum(
                        jax.lax.stop_gradient(pf_local), "tile"
                    )
                    norm = pf_full / area
                    dlt = robust_delta
                    slope = jnp.where(
                        norm <= dlt, 1.0,
                        jnp.sqrt(dlt / jnp.maximum(norm, 1e-20)),
                    )
                    rho = jnp.where(
                        norm <= dlt, norm, 2.0 * jnp.sqrt(norm * dlt) - dlt
                    )
                    obj = jnp.sum(pf_local * w * slope)
                    true_local = jnp.sum(w * rho * area) / n_tile
                else:
                    obj = jnp.sum(pf_local * w)
                    true_local = obj
                return obj, true_local

            def combine(true_local, g):
                den = jax.lax.psum(jnp.sum(w), "data")
                loss = jax.lax.psum(true_local, ("data", "tile")) / den
                gsum = jax.lax.psum(g, ("data", "tile")) / den
                return loss, gsum

            def bin_state_of(d):
                return renderer.bin_state(
                    se3.exp(d), lp, Kb, sharpness=sharpness
                )

            probe_fn = None
            budget = 0.0
            if adaptive:
                # Lever-arm-aware probes (per-link mesh AABB corners under
                # this shard's local frames) + sharpness-derived budget —
                # identical policy to the single-chip path; each shard
                # gates on its own local probe drift. Non-positive budget
                # -> this config can't do adaptive; rebin every step.
                budget = adaptive_drift_budget(renderer.tile, sharpness)
                if budget > 0:
                    probe_fn = make_drift_probe_fn(
                        drift_probe_points(renderer, lp), Kb
                    )
                else:
                    budget = 0.0

            dof, opt_state, losses, history, ov, nrb = opt_scan(
                dof, opt_state, opt, loss_of, bin_state_of, n, eff_rebin,
                combine=combine, probe_fn=probe_fn, drift_budget=budget,
            )
            # Any shard overflowing truncates the psum'd gradient — reduce
            # the flag across the whole mesh (forward-only). Rebins are
            # reported as the mesh-wide max (the hot-path cost driver).
            ov = (
                jax.lax.psum(ov.astype(jnp.float32), ("data", "tile")) > 0
            )
            nrb = jax.lax.pmax(nrb, ("data", "tile"))
            return dof, opt_state, losses, history, ov, nrb

        return run

    opt_state = jax.jit(opt.init)(dof)
    losses, history = [], []
    done = 0
    run_full = chunk_fn(min(chunk, num_steps))
    for_last = None
    while done < num_steps:
        n = min(chunk, num_steps - done)
        if n == min(chunk, num_steps):
            fn = run_full
        else:
            for_last = for_last or chunk_fn(n)
            fn = for_last
        dof, opt_state, l, h, ov, _nrb = fn(
            dof, opt_state, lp, Kj, masks_bands, wj
        )
        losses.append(l)
        history.append(h)
        done += n
        if on_overflow != "ignore" and bool(np.asarray(ov)):
            from ..models.calib import BinOverflowError

            msg = (
                f"sharded calibrate: bin overflow at step ~{done} on some "
                "shard — raise render.capacity / compact_chunks or "
                "decimate more"
            )
            if on_overflow == "raise":
                raise BinOverflowError(msg)
            import logging

            logging.getLogger("easyhec_tpu").warning(msg)
    return dof, jnp.concatenate(losses), jnp.concatenate(history)
