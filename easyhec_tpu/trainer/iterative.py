"""Iterative (online) calibration — capture → optimize → explore → move.

The RBSolverIterTrainer equivalent (reference easyhec/trainer/rbsolve_iter.py:
34-340, call stack SURVEY.md §3.1): each round captures a frame at the
current arm pose, re-optimizes the camera-from-base pose over ALL frames so
far, then picks the next joint pose by consistency-based exploration and
drives the arm there (through the host-side RRT planner).

Hardware is injected through the interfaces in easyhec_tpu.io — by default a
fully simulated rig (SimArm + SimCamera with a hidden GT extrinsic) so the
whole loop runs closed-loop without a robot; real adapters plug in the same
way the reference wires the xArm SDK / MoveIt / RealSense.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from ..config.config import Config, save_config
from ..data.dataset import save_calib_frame
from ..models.calib import (
    BinOverflowError,
    CalibResult,
    calibrate,
    pose_metrics,
)
from ..models.explorer import SpaceExplorer, build_link_spheres
from ..io.interfaces import Camera, MaskSource, RobotArm
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricsWriter, setup_logger
from .offline import Runtime, build_runtime, _init_dof

__all__ = ["run_iterative"]


def run_iterative(
    cfg: Config,
    arm: RobotArm | None = None,
    camera: Camera | None = None,
    mask_source: MaskSource | None = None,
    Tc_c2b_gt: np.ndarray | None = None,
    K: np.ndarray | None = None,
) -> CalibResult:
    logger = setup_logger(cfg.output_dir)
    out = Path(cfg.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_config(cfg, out / "config.yaml")
    writer = MetricsWriter(out)

    rt: Runtime = build_runtime(cfg)
    chain = rt.chain

    if arm is None or camera is None or mask_source is None:
        # Fully simulated closed loop (no hardware): GT extrinsic hidden in
        # the camera; required K and GT pose.
        from ..io.interfaces import RendererMaskSource, SimArm, SimCamera

        if Tc_c2b_gt is None or K is None:
            raise ValueError("simulated run needs Tc_c2b_gt and K")
        arm = arm or SimArm(chain.n_dof)
        camera = camera or SimCamera(
            rt.renderer, chain, rt.link_names, Tc_c2b_gt, K, arm
        )
        mask_source = mask_source or RendererMaskSource()

    spheres = None
    workspace_pts = None
    if cfg.explorer.self_collision_check:
        from ..robot import load_link_meshes, parse_urdf

        model = parse_urdf(cfg.model.urdf_path)
        mesh_map = load_link_meshes(model, link_names=rt.link_names)
        spheres = build_link_spheres(chain, mesh_map)
        if cfg.explorer.use_workspace_boundary:
            # Env obstacle cloud for the planner (reference feeds the lab
            # workspace boundary to planner.add_point_cloud,
            # space_explorer.py:97-98).
            from ..io.workspace import workspace_boundary_points

            workspace_pts = workspace_boundary_points(
                table_z=cfg.explorer.workspace_table_z
            )

    def make_explorer(rt):
        # Variance scoring at 1/ds resolution (cfg.explorer.render_downscale):
        # the argmax over candidates is scale-stable and the scoring pass
        # gets ds^2 cheaper (reference scores at full res, its #2 hot loop —
        # SURVEY.md §3.3).
        ds = max(1, cfg.explorer.render_downscale)
        if ds > 1 and rt.meshes:
            from ..render.renderer import RobotRenderer

            # LOD-matched meshes: at 1/ds resolution the full-detail mesh
            # packs thousands of sub-pixel triangles into single tiles
            # (audited 6900/tile at 320x180) — truncation territory. The
            # variance score only reads binary silhouettes, so decimate to
            # the downscaled pixel scale (explorer.decimate_voxel, auto =
            # model voxel * ds).
            vox = cfg.explorer.decimate_voxel or (
                cfg.model.decimate_voxel * ds
            )
            emeshes = rt.meshes
            if vox > 0:
                from ..robot.mesh import decimate_vertex_clustering

                emeshes = [
                    decimate_vertex_clustering(m, vox) for m in rt.meshes
                ]
            # 2x capacity-class headroom over the model config: the model
            # budgets are audited for ITS resolution, and explored poses at
            # 1/ds with ds-decimated meshes concentrate loads differently
            # (the r5 flagship re-record hit a live scoring overflow at
            # round 0's wide hypothesis cloud). Cheap here — scoring is
            # forward-only and compact-path work scales with occupancy,
            # not capacity. SpaceExplorer still escalates 2x and re-scores
            # if this headroom is ever exceeded.
            t = rt.renderer.tile
            tile2 = t._replace(
                capacity=t.capacity * 2,
                bin_big_k=t.bin_big_k * 2 if t.bin_big_k else t.bin_big_k,
                compact_chunks=(
                    t.compact_chunks * 2
                    if getattr(t, "compact_chunks", 0) else 0
                ),
                bwd_chunks=(
                    t.bwd_chunks * 2 if getattr(t, "bwd_chunks", 0) else 0
                ),
            )
            er = RobotRenderer(
                emeshes, rt.renderer.H // ds, rt.renderer.W // ds,
                tile=tile2,
            )
        else:
            ds = 1
            er = rt.renderer
        return SpaceExplorer(
            chain,
            er,
            rt.link_names,
            spheres=spheres,
            n_sample_qposes=cfg.explorer.n_sample_qposes,
            n_hypotheses=cfg.explorer.n_hypotheses,
            history_start=cfg.explorer.history_start,
            max_dist=cfg.explorer.max_dist
            if cfg.explorer.max_dist_constraint else None,
        ), ds

    explorer, explore_ds = make_explorer(rt)

    from ..utils.scene3d import Scene3D

    # 3D debug recording per round (the reference's Wis3D inspection of each
    # proposed pose before driving the arm, docs/usage.md:47-49), gated by
    # cfg.dbg like the reference.
    viz = Scene3D(out, enable=cfg.dbg)
    link_idx_np = np.asarray([chain.link_index(n) for n in rt.link_names])

    data_dir = Path(cfg.dataset.data_dir or (out / "captures"))
    masks, qposes = [], []
    result: CalibResult | None = None
    dof = None
    K_live = None

    for it in range(cfg.solver.explore_iters):
        t0 = time.time()
        q = arm.get_qpos()
        rgb, K_live = camera.capture()
        # Adapt render geometry to the live frame (the reference defrosts
        # cfg and overwrites H/W/K from the first capture,
        # rbsolve_iter.py:230-234). A silent mismatch would corrupt the
        # loss — rebuild the renderer at the captured resolution instead.
        cap_h, cap_w = rgb.shape[:2]
        if (cap_h, cap_w) != (rt.renderer.H, rt.renderer.W):
            if masks:
                raise RuntimeError(
                    f"camera resolution changed mid-run: captured "
                    f"{cap_h}x{cap_w}, dataset is "
                    f"{masks[0].shape[0]}x{masks[0].shape[1]}"
                )
            logger.warning(
                "captured frame %dx%d != configured %dx%d; rebuilding "
                "renderer at the live resolution",
                cap_h, cap_w, rt.renderer.H, rt.renderer.W,
            )
            cfg.model.H, cfg.model.W = int(cap_h), int(cap_w)
            rt = build_runtime(cfg)
            explorer, explore_ds = make_explorer(rt)
        mask = mask_source.predict(rgb)
        save_calib_frame(data_dir, it, rgb, mask, q)
        masks.append(mask)
        qposes.append(q)
        np.savetxt(data_dir / "K.txt", K_live)

        link_idx = [chain.link_index(n) for n in rt.link_names]
        link_poses = np.stack([chain.fk_np(qq) for qq in qposes])[:, link_idx]

        if dof is None:
            from ..data.dataset import CalibBatch

            batch_stub = CalibBatch(
                rgb=np.zeros((1, 1, 1, 3), np.uint8),
                masks=np.asarray(masks),
                qpos=np.asarray(qposes),
                link_poses=link_poses.astype(np.float32),
                K=np.asarray(K_live, np.float32),
                Tc_c2b_gt=np.eye(4, dtype=np.float32),
            )
            dof = _init_dof(cfg, batch_stub, rt)

        # Overflow is asserted at every rebin; explored poses are chosen to
        # MAXIMIZE render disagreement and can concentrate loads beyond any
        # random-pose audit (a 720p run measured max load 1309 at an
        # explored pose vs 824-925 over random audits), so on overflow the
        # bin budgets escalate 2x and the round restarts instead of dying.
        for attempt in range(3):
            try:
                result = calibrate(
                    dof,
                    rt.renderer,
                    link_poses.astype(np.float32),
                    np.asarray(K_live, np.float32),
                    np.stack(masks).astype(np.float32),
                    num_steps=cfg.solver.num_epochs,
                    max_lr=cfg.solver.max_lr,
                    optimizer=cfg.solver.optimizer,
                    scheduler=cfg.solver.scheduler,
                    grad_clip=cfg.solver.grad_clip,
                    sharpness=cfg.render.sharpness,
                    robust_delta=cfg.solver.robust_delta,
                    rebin_every=cfg.solver.rebin_every,
                    Tc_c2b_gt=Tc_c2b_gt,
                )
                break
            except BinOverflowError as e:
                if attempt == 2:
                    raise
                from .offline import escalate_render_budgets

                escalate_render_budgets(cfg)
                logger.warning(
                    "%s — escalating to capacity=%d compact_chunks=%d and "
                    "rebuilding", e, cfg.render.capacity,
                    cfg.render.compact_chunks,
                )
                rt = build_runtime(cfg)
                explorer, explore_ds = make_explorer(rt)
        dof = result.dof  # warm start the next round
        writer.scalars(
            it,
            round_loss=float(result.losses[-1]),
            n_frames=len(masks),
            **{f"round_{k}": v for k, v in result.metrics.items()},
        )
        logger.info(
            "round %d: %d frames, loss %.4f -> %.4f (%.1fs)%s",
            it,
            len(masks),
            result.losses[0],
            result.losses[-1],
            time.time() - t0,
            f" metrics={json.dumps(result.metrics)}" if result.metrics else "",
        )
        save_checkpoint(
            out / "checkpoints" / f"round_{it:03d}",
            {"dof": result.dof, "history": result.history, "losses": result.losses},
            meta={"round": it, "n_frames": len(masks)},
        )

        last = it == cfg.solver.explore_iters - 1
        if last:
            target = np.zeros(chain.n_dof, np.float32)  # reference to_zero mode
            plan_candidates = [target]
        else:
            if explore_ds > 1:
                from ..models.calib import downscale_K

                K_explore = downscale_K(np.asarray(K_live), explore_ds)
            else:
                K_explore = K_live
            res = explorer.explore(result.history, K_explore, key=it)
            logger.info(
                "explore %d: variance %.2f, %d/%d feasible",
                it,
                res.variance,
                int(res.feasible.sum()),
                len(res.feasible),
            )
            # Plan-feasibility gate (reference space_explorer.py:123-137
            # scores only candidates it can plan to; planning the top-k by
            # variance until one succeeds preserves that contract at a
            # fraction of the planning cost).
            order = np.argsort(-res.var_all)
            top = [
                res.qpos_all[i]
                for i in order[: max(1, cfg.explorer.plan_top_k)]
                if np.isfinite(res.var_all[i])
            ]
            target = res.qpos
            plan_candidates = top or [res.qpos]
        if cfg.dbg:
            viz.set_scene_id(it)
            viz.add_image(rgb, name="capture")
            viz.add_image(mask, name="mask")
            from ..geometry import se3
            import jax.numpy as jnp

            Tc = np.asarray(se3.exp(jnp.asarray(dof)))
            viz.add_camera(Tc, K=K_live, name="solved_camera")
            viz.add_robot(chain, rt.renderer, link_idx_np, np.eye(4), q,
                          name="robot_current")
            viz.add_robot(chain, rt.renderer, link_idx_np, np.eye(4), target,
                          name="robot_proposed")

        if spheres is None:
            # Planning disabled by config (e.g. pure-sim smoke runs):
            # direct joint move, the caller opted out of collision safety.
            arm.move_to(target, None)
        else:
            # Plan-or-skip (reference behavior: an unplannable pose is never
            # commanded — rbsolve_iter.py only drives along planner output).
            from ..io.planner import plan_first_feasible

            env_pts = workspace_pts if cfg.explorer.use_workspace_boundary else None
            chosen, plan = plan_first_feasible(
                chain, spheres, q, plan_candidates, env_points=env_pts, seed=it
            )
            if chosen is not None:
                target = chosen
                arm.move_to(target, plan)
            else:
                logger.warning(
                    "no plannable candidate among top %d; staying at current "
                    "qpos this round", len(plan_candidates),
                )

    np.savetxt(out / "Tc_c2b.txt", result.Tc_c2b)
    (out / "metrics.json").write_text(json.dumps(result.metrics, indent=2))
    writer.close()
    return result
