"""Offline calibration runner — the RBSolverTrainer-equivalent path.

Reference flow (SURVEY.md §3.4): build_trainer('rbsolver') → 1000 Python-loop
epochs of B×L rasterizer launches → get_preds. Here: build robot + renderer +
dataset from the config, run ONE compiled `calibrate` scan, write artifacts
(solved pose, metrics, loss trace, error maps, checkpoint).
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import numpy as np

from ..config.config import Config, save_config
from ..data.dataset import CalibBatch, load_calib_dataset
from ..models.calib import (
    BinOverflowError,
    CalibResult,
    calibrate,
    pose_metrics,
    render_outputs,
)
from ..render.renderer import RobotRenderer
from ..render.tiled import TileConfig
from ..robot import build_chain, load_link_meshes, load_mesh, parse_urdf
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricsWriter, setup_logger

__all__ = ["build_runtime", "run_offline_calibration"]


@dataclasses.dataclass
class Runtime:
    """Everything the trainers need, built once from config."""

    chain: object
    renderer: RobotRenderer
    link_names: list[str]
    cfg: Config
    meshes: list = dataclasses.field(default_factory=list)  # processed link meshes


def build_runtime(cfg: Config) -> Runtime:
    model = parse_urdf(cfg.model.urdf_path)
    chain = build_chain(model)

    if cfg.model.mesh_paths:
        # Explicit per-link mesh files (reference style: cfg mesh_paths list,
        # one per entry of use_links)
        if not cfg.model.use_links:
            raise ValueError("mesh_paths given but use_links empty")
        link_names = list(cfg.model.use_links)
        meshes = [load_mesh(p) for p in cfg.model.mesh_paths]
    else:
        link_names = list(cfg.model.use_links) or [
            l.name for l in model.links if l.visuals
        ]
        mesh_map = load_link_meshes(model, link_names=link_names)
        link_names = [n for n in link_names if n in mesh_map]
        meshes = [mesh_map[n] for n in link_names]
    if not meshes:
        raise ValueError("no link meshes resolved; check urdf/mesh_paths config")
    if cfg.model.decimate_voxel > 0:
        from ..robot.mesh import decimate_vertex_clustering

        meshes = [
            decimate_vertex_clustering(m, cfg.model.decimate_voxel) for m in meshes
        ]
    if cfg.model.subdivide_max_edge > 0:
        from ..robot.mesh import subdivide_to_max_edge

        meshes = [
            subdivide_to_max_edge(m, cfg.model.subdivide_max_edge) for m in meshes
        ]

    tile = TileConfig(
        cfg.render.tile_h,
        cfg.render.tile_w,
        cfg.render.capacity,
        cfg.render.use_pallas,
        binner=cfg.render.binner,
        rect_y=cfg.render.rect_y,
        rect_x=cfg.render.rect_x,
        margin=cfg.render.margin,
        cull_backfaces=cfg.render.cull_backfaces,
        fused=cfg.render.fused,
        bwd_band_only=cfg.render.bwd_band_only,
        bin_big_k=cfg.render.bin_big_k,
        bin_subsort_rows=cfg.render.bin_subsort_rows,
        compact_chunks=cfg.render.compact_chunks,
        bwd_chunks=cfg.render.bwd_chunks,
    )
    renderer = RobotRenderer(
        meshes, cfg.model.H, cfg.model.W, tile=tile, mode=cfg.render.mode
    )
    return Runtime(
        chain=chain, renderer=renderer, link_names=link_names, cfg=cfg,
        meshes=meshes,
    )


def _warn_if_bins_overflow(rt: Runtime, batch: CalibBatch, init_dof) -> None:
    """One-shot render with overflow reporting: a saturated tile bin or a
    triangle rect beyond the static window silently degrades silhouettes, so
    surface it loudly with the knobs to fix (render.capacity / rect_y/x /
    model.decimate_voxel)."""
    import logging

    import jax.numpy as jnp

    from ..geometry import se3
    from ..render.tiled import silhouette_tiled

    logger = logging.getLogger("easyhec_tpu")
    r = rt.renderer
    if r.mode != "tiled":
        return
    try:
        Tc = se3.exp(jnp.asarray(init_dof, jnp.float32))
        lp = jnp.asarray(batch.link_poses[:1], jnp.float32)
        soa = r._triangles_soa(r.camera_link_poses(Tc, lp), jnp.asarray(batch.K))
        _, ov = silhouette_tiled(
            soa, r.H, r.W, r.tile, return_overflow=True
        )
        if bool(ov):
            logger.warning(
                "rasterizer bin overflow at the initial pose: some triangles "
                "were dropped. Raise render.capacity (<=512), set "
                "render.rect_y/rect_x to cover larger triangles, or increase "
                "model.decimate_voxel."
            )
    except Exception as e:  # pragma: no cover - advisory only
        logger.debug("overflow pre-check skipped: %s", e)


def escalate_render_budgets(cfg: Config) -> None:
    """Double the static bin budgets after a BinOverflowError (capacity to
    the next multiple of 128; compact/bwd chunk budgets and the big-span
    class along with it). Shared by the offline and iterative trainers."""
    r = cfg.render
    r.capacity = -(-r.capacity * 2 // 128) * 128
    if r.compact_chunks > 0:
        r.compact_chunks *= 2
    if r.bwd_chunks > 0:
        r.bwd_chunks *= 2
    if r.bin_big_k > 0:
        r.bin_big_k *= 2


def _init_dof(cfg: Config, batch: CalibBatch, rt: Runtime | None = None) -> np.ndarray:
    """Initial pose per cfg.model.init_method (the reference's three
    bootstrap paths: yaml init / dataset GT / PVNet subprocess — here the
    PVNet role is a render-and-score global search, models/pose_init.py)."""
    from ..geometry import se3
    import jax.numpy as jnp

    method = cfg.model.init_method
    T = None
    if method in ("manual", "auto") and cfg.model.init_Tc_c2b is not None:
        T = np.asarray(cfg.model.init_Tc_c2b, dtype=np.float32).reshape(4, 4)
    elif method == "lookat":
        from ..models.pose_init import lookat_init

        if cfg.model.init_lookat_eye is None or cfg.model.init_lookat_target is None:
            raise ValueError("init_method=lookat needs init_lookat_eye/target")
        T = lookat_init(cfg.model.init_lookat_eye, cfg.model.init_lookat_target)
    elif method in ("gt", "auto") and batch.has_gt:
        T = batch.Tc_c2b_gt  # e.g. synthetic smoke runs; perturb upstream
    if T is None and method in ("global_search", "auto") and rt is not None:
        from ..models.pose_init import global_search_init

        res = global_search_init(
            rt.renderer, batch.link_poses[0], batch.K, batch.masks[0]
        )
        T = res.Tc_c2b
    if T is None:
        raise ValueError(
            f"no initial pose for init_method={method!r}: set model.init_Tc_c2b, "
            "provide dataset GT, or use init_method=global_search"
        )
    return np.asarray(se3.log(jnp.asarray(T)))


def run_offline_calibration(
    cfg: Config, batch: CalibBatch | None = None, init_dof: np.ndarray | None = None
) -> CalibResult:
    logger = setup_logger(cfg.output_dir)
    out = Path(cfg.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_config(cfg, out / "config.yaml")

    rt = build_runtime(cfg)
    if batch is None:
        batch = load_calib_dataset(cfg.dataset.data_dir, rt.chain, rt.link_names)
    logger.info(
        "dataset: %d frames %dx%d, links=%s",
        batch.n_frames,
        cfg.model.H,
        cfg.model.W,
        rt.link_names,
    )
    if init_dof is None:
        init_dof = _init_dof(cfg, batch, rt)

    _warn_if_bins_overflow(rt, batch, init_dof)

    # Resume (reference cfg.solver.load='latest' convention,
    # base.py:420-440): restore the mid-run state saved by the step hook.
    ckpt_dir = out / "checkpoints"
    resume_state = None
    if cfg.solver.load == "latest":
        from ..utils.checkpoint import load_checkpoint

        mid = ckpt_dir / "midrun.npz"
        if mid.exists():
            resume_state, meta = load_checkpoint(mid)
            logger.info(
                "resuming from %s at step %d", mid, int(resume_state["step"])
            )

    mid_writer = MetricsWriter(out, tensorboard=False)
    # Live observability: drop the self-contained dashboard next to the
    # metrics stream (watch with `python -m easyhec_tpu.cli.watch <out>`;
    # the reference's equivalent is TensorBoard, rbsolver.py:58-65).
    from ..utils.live import write_dashboard

    write_dashboard(out)

    def step_hook(done, state):
        # live scalar stream (the per-step TB scalars role)
        ls = state.get("losses")
        if ls is not None and len(ls):
            mid_writer.scalars(done, mask_loss=float(ls[-1]))
        # Periodic resumable checkpoint (reference try_to_save cadence,
        # base.py:442-455) ...
        if cfg.solver.save_freq and (
            done % cfg.solver.save_freq == 0 or done >= cfg.solver.num_epochs
        ):
            save_checkpoint(ckpt_dir / "midrun", state, meta={"step": done})
        # ... and mid-run image observability (reference pushes rendered/
        # ref/error grids to TB every 100-200 steps, rbsolver.py:58-65).
        if cfg.solver.log_interval and done % cfg.solver.log_interval == 0:
            try:
                outs = render_outputs(
                    state["dof"], rt.renderer, batch.link_poses[:1],
                    batch.K, batch.masks[:1],
                )
                mid_writer.image(done, "error_map", outs["error_maps"][0])
                mid_writer.image(done, "rendered", outs["rendered_masks"][0])
            except Exception as e:  # pragma: no cover
                logger.debug("mid-run panel skipped: %s", e)

    t0 = time.time()
    # Overflow is asserted at EVERY rebin of the trajectory (threaded out of
    # the optimizer scans — models/calib.opt_scan); on overflow the bin
    # budgets escalate 2x and the run restarts, up to 3 attempts. Silent
    # truncation (the pre-r3 one-shot warning) is no longer possible on
    # this path.
    for attempt in range(3):
        try:
            result = calibrate(
                init_dof,
                rt.renderer,
                batch.link_poses,
                batch.K,
                batch.masks,
                num_steps=cfg.solver.num_epochs,
                max_lr=cfg.solver.max_lr,
                optimizer=cfg.solver.optimizer,
                scheduler=cfg.solver.scheduler,
                grad_clip=cfg.solver.grad_clip,
                sharpness=cfg.render.sharpness,
                robust_delta=cfg.solver.robust_delta,
                rebin_every=cfg.solver.rebin_every,
                Tc_c2b_gt=batch.Tc_c2b_gt if batch.has_gt else None,
                resume_state=resume_state,
                step_hook=step_hook,
            )
            break
        except BinOverflowError as e:
            if resume_state is not None or attempt == 2:
                raise
            escalate_render_budgets(cfg)
            logger.warning(
                "%s — escalating to capacity=%d compact_chunks=%d and "
                "restarting", e, cfg.render.capacity,
                cfg.render.compact_chunks,
            )
            rt = build_runtime(cfg)
    mid_writer.close()
    dt = time.time() - t0
    logger.info(
        "calibrated %d steps in %.1fs (%.1f steps/s); final loss %.4f",
        cfg.solver.num_epochs,
        dt,
        cfg.solver.num_epochs / dt,
        result.losses[-1],
    )
    if result.metrics:
        logger.info("metrics vs GT: %s", json.dumps(result.metrics))

    # Artifacts
    writer = MetricsWriter(out, tensorboard=False)
    stride = max(1, cfg.solver.log_interval)
    for s in range(0, len(result.losses), stride):
        writer.scalars(s, mask_loss=float(result.losses[s]))
    writer.close()
    np.savetxt(out / "Tc_c2b.txt", result.Tc_c2b)
    (out / "metrics.json").write_text(json.dumps(result.metrics, indent=2))
    save_checkpoint(
        out / "checkpoints" / "final",
        {"dof": result.dof, "history": result.history, "losses": result.losses},
        meta={"num_steps": cfg.solver.num_epochs, "wall_time_s": dt},
    )
    try:
        outputs = render_outputs(
            result.dof, rt.renderer, batch.link_poses, batch.K, batch.masks
        )
        _save_error_panel(out / "error_maps.png", outputs)
        # Registry-driven post-fit evaluators (the hook the reference has but
        # never populates; easyhec/evaluators/build.py:5-9).
        from ..evaluators import build_evaluators

        eval_metrics: dict[str, float] = {}
        outputs["dof"] = result.dof
        for ev in build_evaluators(["mask_iou", "pose_error"]):
            eval_metrics.update(ev(outputs, batch))
        if eval_metrics:
            logger.info("evaluators: %s", json.dumps(eval_metrics))
            (out / "eval.json").write_text(json.dumps(eval_metrics, indent=2))
    except Exception as e:  # pragma: no cover - viz is best-effort
        logger.warning("error-map panel failed: %s", e)
    return result


def _save_error_panel(path: Path, outputs: dict, max_frames: int = 4) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(max_frames, outputs["rendered_masks"].shape[0])
    fig, axes = plt.subplots(3, n, figsize=(3 * n, 9), squeeze=False)
    for i in range(n):
        axes[0][i].imshow(outputs["rendered_masks"][i], cmap="gray")
        axes[0][i].set_title(f"rendered {i}")
        axes[1][i].imshow(outputs["ref_masks"][i], cmap="gray")
        axes[1][i].set_title(f"reference {i}")
        axes[2][i].imshow(outputs["error_maps"][i], cmap="hot")
        axes[2][i].set_title(f"|error| {i}")
        for r in range(3):
            axes[r][i].axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=60)
    plt.close(fig)
