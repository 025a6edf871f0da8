"""Benchmark: pixels rasterized per second per chip, forward+backward.

The driver runs this on real TPU hardware and records the JSON line.

Workload = BASELINE.md config (2): xArm7-class arm, 10 joint poses,
640x480, full mask-loss forward + SE(3) pose gradient — the exact hot loop
of the calibration (reference does this as B×L serial nvdiffrast CUDA
launches per step, easyhec/modeling/models/rb_solve/rb_solver.py:60-67).

vs_baseline: the reference publishes no number (BASELINE.md). The estimate
used here is the reference's practical fwd+bwd throughput implied by its
documented convergence budget (1000 iters × 10 frames × 640×480 in ~90 s on
the recommended ≥10 GB GPU ≈ 34 Mpix/s); vs_baseline = value / 34e6.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

REFERENCE_ASSETS = pathlib.Path("/root/reference/assets")
BASELINE_PIX_S = 34e6


def build_scene():
    import jax.numpy as jnp

    from easyhec_tpu.render import RobotRenderer, TileConfig
    from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf

    urdf = REFERENCE_ASSETS / "xarm7_with_gripper_reduced_dof.urdf"
    if urdf.exists():
        model = parse_urdf(urdf)
        chain = build_chain(model)
        names = [f"link{i}" for i in range(1, 8)]
        meshes = load_link_meshes(model, link_names=names)
        mesh_list = [meshes[n] for n in names]
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

    H, W = 480, 640
    renderer = RobotRenderer(mesh_list, H, W, tile=TileConfig(8, 128, 256))
    link_idx = jnp.asarray([chain.link_index(n) for n in names])
    return chain, renderer, link_idx, H, W


def main() -> int:
    import jax
    import jax.numpy as jnp

    from easyhec_tpu.geometry import camera, se3
    from easyhec_tpu.models.calib import mask_loss

    chain, renderer, link_idx, H, W = build_scene()
    B = 10
    K = jnp.asarray([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]])
    Tcam = camera.look_at(
        jnp.asarray([1.0, 0.7, 0.8]), jnp.asarray([0.0, 0.0, 0.3]), jnp.asarray([0.0, 0.0, 1.0])
    )
    xi = se3.log(se3.inverse(Tcam))
    lo = jnp.asarray(chain.joint_limits[:, 0] * 0.4)
    hi = jnp.asarray(chain.joint_limits[:, 1] * 0.4)
    qs = jax.random.uniform(jax.random.PRNGKey(0), (B, chain.n_dof), minval=lo, maxval=hi)

    @jax.jit
    def fwd(xi, qs):
        lp = jax.vmap(chain.fk)(qs)[:, link_idx]
        return renderer.silhouette(se3.exp(xi), lp, K)

    @jax.jit
    def fwd_bwd(xi, qs, target):
        def loss(x):
            lp = jax.vmap(chain.fk)(qs)[:, link_idx]
            return mask_loss(x, renderer, lp, K, target)

        return jax.value_and_grad(loss)(xi)

    target = jax.block_until_ready(fwd(xi, qs))
    v, g = fwd_bwd(xi + 0.01, qs, target)
    jax.block_until_ready(g)  # compile

    n_iters = 10
    t0 = time.time()
    for _ in range(n_iters):
        v, g = fwd_bwd(xi + 0.01, qs, target)
    jax.block_until_ready(g)
    dt = (time.time() - t0) / n_iters

    pix_per_s = B * H * W / dt
    print(
        json.dumps(
            {
                "metric": "pixels_rasterized_per_s_per_chip_fwd_bwd",
                "value": round(pix_per_s),
                "unit": "pixels/s",
                "vs_baseline": round(pix_per_s / BASELINE_PIX_S, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
