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
):
    """Multi-chip calibrate(): the full Adam scan with the sharded loss.
    masks_ref: [B, H, W] with H = band_h * n_tile. Returns (dof, losses,
    history) as in models.calib._calibrate_scan."""
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]
    band_h = masks_ref.shape[-2] // n_tile

    lp, w = pad_frames(np.asarray(link_poses, np.float32), n_data)
    masks, _ = pad_frames(np.asarray(masks_ref, np.float32), n_data)
    loss_fn = sharded_mask_loss(renderer, mesh, band_h, sharpness)

    data_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    lp = jax.device_put(lp, data_sh)
    masks = jax.device_put(masks, NamedSharding(mesh, P("data", "tile")))
    wj = jax.device_put(jnp.asarray(w), data_sh)
    Kj = jax.device_put(jnp.asarray(K, jnp.float32), rep)
    dof0 = jax.device_put(jnp.asarray(init_dof, jnp.float32), rep)

    opt = make_optimizer(optimizer, max_lr=max_lr, total_steps=num_steps, scheduler=scheduler)

    @jax.jit
    def run(dof0, lp, Kj, masks, wj):
        lg = jax.value_and_grad(lambda d: loss_fn(d, lp, Kj, masks, wj))

        def step(carry, _):
            dof, opt_state = carry
            loss, g = lg(dof)
            updates, opt_state = opt.update(g, opt_state, dof)
            return (dof + updates, opt_state), (loss, dof)

        (dof, _), (losses, history) = jax.lax.scan(
            step, (dof0, opt.init(dof0)), None, length=num_steps
        )
        return dof, losses, history

    return run(dof0, lp, Kj, masks, wj)
