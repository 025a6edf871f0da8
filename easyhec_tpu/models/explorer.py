"""Consistency-based space exploration — next joint-pose selection.

Reference: easyhec/modeling/models/rb_solve/space_explorer.py:21-235. Its hot
loop iterates 1000 candidate qposes in Python, each doing C++ collision
checks, an RRT feasibility plan, and 10 CUDA renders (SURVEY.md §3.3 hot
loop #2). Here the whole scoring pass is one compiled program:

    variance[c] = Σ_pixels Var_h( silhouette(candidate c, hypothesis h) )

with candidates × hypotheses rendered batched, self-collision and
workspace-distance gates computed as vectorized sphere tests in JAX, and
only the FINAL chosen candidate handed to the host-side motion planner
(easyhec_tpu.io.planner) for a trajectory — instead of planning all 1000.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..render.renderer import RobotRenderer
from ..robot import KinematicChain
from ..robot.mesh import TriMesh

__all__ = ["LinkSpheres", "build_link_spheres", "SpaceExplorer", "ExploreResult"]


@dataclass(frozen=True)
class LinkSpheres:
    """Sphere approximation of the robot's links for fast collision tests.

    centers: [L, S, 3] in link frame; radii: [L, S] (0-radius = unused slot);
    pair_mask: [L, L] bool — True where a pair must be CHECKED (non-adjacent,
    non-self; the reference gets this from the SRDF's allowed-collision list).
    """

    centers: np.ndarray
    radii: np.ndarray
    pair_mask: np.ndarray
    link_indices: np.ndarray  # chain link index per row


def build_link_spheres(
    chain: KinematicChain,
    link_meshes: dict[str, TriMesh],
    spheres_per_link: int = 4,
    adjacent_skip: int = 1,
) -> LinkSpheres:
    """Fit a few bounding spheres per link by slicing the mesh along its
    longest axis. Crude but conservative — right shape for a feasibility GATE
    (the reference's pymp/FCL check serves the same role)."""
    names = [n for n in link_meshes]
    L, S = len(names), spheres_per_link
    centers = np.zeros((L, S, 3), np.float32)
    radii = np.zeros((L, S), np.float32)
    for i, n in enumerate(names):
        v = link_meshes[n].vertices
        lo, hi = v.min(0), v.max(0)
        axis = int(np.argmax(hi - lo))
        order = np.argsort(v[:, axis])
        chunks = np.array_split(order, S)
        for s, idx in enumerate(chunks):
            if len(idx) == 0:
                continue
            pts = v[idx]
            c = (pts.min(0) + pts.max(0)) / 2
            centers[i, s] = c
            radii[i, s] = float(np.linalg.norm(pts - c, axis=1).max())
    link_indices = np.asarray([chain.link_index(n) for n in names], np.int32)
    # Check only pairs more than `adjacent_skip` apart in the serial chain —
    # neighbours legitimately touch (SRDF-allowed collisions in the reference).
    pair = np.zeros((L, L), bool)
    for i in range(L):
        for j in range(L):
            pair[i, j] = (j - i) > adjacent_skip
    return LinkSpheres(centers, radii, pair, link_indices)


@dataclass
class ExploreResult:
    qpos: np.ndarray  # chosen next joint configuration
    variance: float
    var_all: np.ndarray  # [C] variance per candidate (-inf = infeasible)
    feasible: np.ndarray  # [C] bool
    qpos_all: np.ndarray  # [C, n_dof]


class SpaceExplorer:
    def __init__(
        self,
        chain: KinematicChain,
        renderer: RobotRenderer,
        link_names: list[str],
        spheres: LinkSpheres | None = None,
        n_sample_qposes: int = 1000,
        n_hypotheses: int = 10,
        history_start: int = 200,
        max_dist: float | None = 0.5,
        limit_fraction: float = 0.9,
        collision_margin: float = 0.0,
        score_batch: int = 5,  # measured optimum on v5e (scripts/tpu_session4)
    ):
        self.chain = chain
        self.renderer = renderer
        self.link_idx = jnp.asarray([chain.link_index(n) for n in link_names])
        self.spheres = spheres
        self.n_sample_qposes = n_sample_qposes
        self.n_hypotheses = n_hypotheses
        self.history_start = history_start
        self.max_dist = max_dist
        self.limit_fraction = limit_fraction
        self.collision_margin = collision_margin
        self.score_batch = score_batch

    # -- feasibility gates (vectorized over candidates) --------------------

    def _self_collision_free(self, link_poses: jax.Array) -> jax.Array:
        """link_poses: [C, n_links, 4, 4] -> [C] bool."""
        if self.spheres is None:
            return jnp.ones(link_poses.shape[0], bool)
        sp = self.spheres
        idx = jnp.asarray(sp.link_indices)
        poses = link_poses[:, idx]  # [C, L, 4, 4]
        R = poses[..., :3, :3]
        t = poses[..., :3, 3]
        c = jnp.einsum("clij,lsj->clsi", R, jnp.asarray(sp.centers)) + t[:, :, None, :]
        r = jnp.asarray(sp.radii)  # [L, S]
        # Pairwise: [C, L, S, L', S']
        d = jnp.linalg.norm(
            c[:, :, :, None, None, :] - c[:, None, None, :, :, :], axis=-1
        )
        rsum = r[:, :, None, None] + r[None, None, :, :]
        # Only count spheres that exist (radius > 0) and checked pairs
        exists = (r > 0)[:, :, None, None] & (r > 0)[None, None, :, :]
        pair = jnp.asarray(sp.pair_mask)[:, None, :, None]
        viol = (d - rsum < self.collision_margin) & exists & pair
        return ~jnp.any(viol, axis=(1, 2, 3, 4))

    def _within_workspace(self, link_poses: jax.Array) -> jax.Array:
        if self.max_dist is None:
            return jnp.ones(link_poses.shape[0], bool)
        origins = link_poses[..., :3, 3]  # [C, n_links, 3]
        base = origins[:, :1]
        return jnp.all(
            jnp.linalg.norm(origins - base, axis=-1) <= self.max_dist, axis=-1
        )

    # -- scoring -----------------------------------------------------------

    def _can_share_bins(self) -> bool:
        """Shared-bin scoring needs a reusable bin-state path: the count
        binner (BinState → counted silhouette) or the fused compact-chunk
        grid (CompactState → render.fused.silhouette_compact, the fastest:
        work scales with occupancy)."""
        t = self.renderer.tile
        return (
            self.renderer.mode != "brute"
            and t.use_pallas
            and t.binner == "count"
        )

    def hypothesis_spread_px(self, hyp_dofs: np.ndarray, K: np.ndarray) -> float:
        """Max pixel displacement of robot-workspace probe points across the
        hypothesis poses (host-side). Decides whether one tile binning per
        candidate can serve every hypothesis (rebin-reuse contract: bboxes
        drift less than the binning margin)."""
        probes = self._probe_points()
        Kn = np.asarray(K, np.float64)

        def project(dof):
            T = np.asarray(se3.exp(jnp.asarray(dof, jnp.float32)), np.float64)
            pc = probes @ T[:3, :3].T + T[:3, 3]
            z = np.maximum(pc[:, 2], 0.05)
            return np.stack(
                [Kn[0, 0] * pc[:, 0] / z + Kn[0, 2],
                 Kn[1, 1] * pc[:, 1] / z + Kn[1, 2]], axis=-1)

        dofs = np.asarray(hyp_dofs, np.float64)
        # The binning contract bounds bbox DRIFT from the state's build
        # pose (the mean dof): max per-point displacement vs the mean-pose
        # projection, not the cloud diameter.
        pix_mean = project(dofs.mean(axis=0))
        pix = np.stack([project(d) for d in dofs])  # [Hh, P, 2]
        return float(np.abs(pix - pix_mean[None]).max())

    def _probe_points(self) -> np.ndarray:
        """Base-frame probe cloud for hypothesis_spread_px.

        Covers FK at several workspace configurations (zero, scaled joint
        limits, mid) and each renderer link's mesh AABB corners under
        those configurations — not just zero-qpos link origins: shared-bin
        scoring renders CANDIDATE qposes whose links can sit closer to the
        camera (larger px motion per pose delta), and mesh geometry
        extends past link origins by the lever arm (advisor r4). A richer
        probe cloud raises the measured spread, which only pushes wide
        cases to the exact per-pair path — the safe direction."""
        if not hasattr(self, "_probes"):
            lim = np.asarray(self.chain.joint_limits, np.float64)
            lo = np.where(np.isfinite(lim[:, 0]), lim[:, 0], -np.pi)
            hi = np.where(np.isfinite(lim[:, 1]), lim[:, 1], np.pi)
            f = self.limit_fraction
            qs = [np.zeros(self.chain.n_dof), f * lo, f * hi, (lo + hi) / 2]
            corners = np.asarray(
                self.renderer.link_aabb_corners(), np.float64
            )  # [L, 8, 3]
            li = np.asarray(self.link_idx)
            pts = []
            for q in qs:
                lp = self.chain.fk_np(np.asarray(q, np.float32))
                pts.append(np.asarray(lp[:, :3, 3], np.float64))
                sel = np.asarray(lp[li], np.float64)  # [L, 4, 4]
                c = (
                    np.einsum("lij,lcj->lci", sel[:, :3, :3], corners)
                    + sel[:, None, :3, 3]
                )
                pts.append(c.reshape(-1, 3))
            self._probes = np.concatenate(pts, axis=0)
        return self._probes

    def _escalate_budgets(self) -> None:
        """Double the capacity-class bin budgets (capacity, bin_big_k, the
        compact chunk budgets when in use) AND grow the rect enumeration
        window, then rebuild the renderer + compiled scoring programs.
        The overflow flag covers BOTH bin saturation and rect-window
        misses — candidate qposes can swing links close to the camera
        where triangle spans exceed any capacity-only escalation (the r5
        bench_explorer forensic: rect 3x2 overflow persisted through 8x
        caps, re-escalating + recompiling on every explore() call). The
        one-off recompile only ever happens when a pass actually
        truncated."""
        t = self.renderer.tile
        n_ty = -(-self.renderer.H // t.tile_h)
        n_tx = -(-self.renderer.W // t.tile_w)
        t2 = t._replace(
            capacity=t.capacity * 2,
            bin_big_k=t.bin_big_k * 2 if t.bin_big_k else t.bin_big_k,
            compact_chunks=(
                t.compact_chunks * 2 if getattr(t, "compact_chunks", 0) else 0
            ),
            bwd_chunks=(
                t.bwd_chunks * 2 if getattr(t, "bwd_chunks", 0) else 0
            ),
            rect_y=min(t.rect_y * 2, n_ty) if t.rect_y else t.rect_y,
            rect_x=min(t.rect_x * 2, n_tx) if t.rect_x else t.rect_x,
        )
        self.renderer = RobotRenderer(
            self.renderer.meshes, self.renderer.H, self.renderer.W, tile=t2
        )
        if hasattr(self, "_score_jit"):
            self._score_jit.clear()

    def _score(self, qposes: jax.Array, hyp_dofs: jax.Array, K: jax.Array,
               shared: bool = False):
        """Variance score per candidate + feasibility. One compiled program
        (jitted once per (explorer, shared-mode))."""
        if not hasattr(self, "_score_jit"):
            self._score_jit = {}
        if shared not in self._score_jit:

            @jax.jit
            def run(qposes, hyp_dofs, K):
                all_poses = jax.vmap(self.chain.fk)(qposes)  # [C, n_links, 4, 4]
                feasible = self._self_collision_free(
                    all_poses
                ) & self._within_workspace(all_poses)
                lp = all_poses[:, self.link_idx]  # [C, L, 4, 4]
                Ts = se3.exp(hyp_dofs)  # [Hh, 4, 4]
                C = lp.shape[0]
                Hh = Ts.shape[0]
                # Candidates scored in batches of `score_batch`: one bin+
                # render dispatch covers cb*Hh frames (the per-candidate
                # lax.map ran 10-frame renders back-to-back and left the
                # chip under-occupied — measured 5x slower at 1000x10).
                cb = max(1, min(self.score_batch, C))
                pad = (-C) % cb
                lp_p = jnp.concatenate(
                    [lp, jnp.broadcast_to(lp[:1], (pad,) + lp.shape[1:])]
                ) if pad else lp

                from ..render.fused import CompactState, silhouette_compact

                compact_renderer = self.renderer.tile.fused and int(
                    getattr(self.renderer.tile, "compact_chunks", 0)
                ) > 0
                # Any count-binner renderer exposes an explicit bin state,
                # which is the only way the per-render overflow flag is
                # observable (the batched dense fallback below silently
                # truncates) — route those through the state-driven branch.
                counted = (
                    self.renderer.tile.binner == "count"
                    and self.renderer.mode != "brute"
                )

                if shared or compact_renderer or counted:
                    # State-driven scoring, scanning hypotheses:
                    # - shared: bin ONCE per candidate at the MEAN
                    #   hypothesis pose and render all Hh hypotheses
                    #   against the same bins (caller gated on
                    #   hypothesis_spread_px <= margin-2 — the optimizer's
                    #   rebin-reuse contract). The inversion scatter runs
                    #   Hh times less.
                    # - exact (wide clouds) with a compact renderer: bin
                    #   at EACH hypothesis pose — exact for any spread,
                    #   and the compact render path (work ∝ occupancy)
                    #   avoids materializing the dense [cb·Hh, 12,
                    #   n_tiles·cap] fused records the plain silhouette
                    #   fallback would build.
                    T_mean = se3.exp(jnp.mean(hyp_dofs, axis=0))

                    def per_batch(lp_b):  # [cb, L, 4, 4]
                        zero = jnp.zeros(
                            (cb, self.renderer.H, self.renderer.W)
                        )
                        st0 = (
                            self.renderer.bin_state(T_mean, lp_b, K)
                            if shared else None
                        )

                        def render(T_h):
                            state = st0 if shared else (
                                self.renderer.bin_state(T_h, lp_b, K)
                            )
                            if isinstance(state, CompactState):
                                sil = silhouette_compact(
                                    self.renderer, T_h, K, state
                                )
                            else:
                                sil = self.renderer.silhouette(
                                    T_h, lp_b, K, bin_state=state
                                )
                            return sil, jnp.any(state.overflow)

                        # Variance via sums of deviations from hypothesis
                        # 0's silhouette: E[d^2] - E[d]^2 with d_0 = 0.
                        # The uncentered E[x^2] - E[x]^2 form cancels two
                        # O(1) quantities and left ~3e-5 of float noise on
                        # IDENTICAL hypotheses; deviations are O(disagree-
                        # ment), so the subtraction is benign.
                        sil0, ov0 = render(Ts[0])

                        def hyp_step(carry, T_h):
                            s, s2, ov = carry
                            sil, ov_h = render(T_h)
                            d = sil - sil0
                            return (s + d, s2 + d * d, ov | ov_h), None

                        (s, s2, ov), _ = jax.lax.scan(
                            hyp_step, (zero, zero, ov0), Ts[1:]
                        )
                        var = s2 / Hh - (s / Hh) ** 2
                        return jnp.sum(var, axis=(-2, -1)), ov

                    var, ovs = jax.lax.map(
                        per_batch, lp_p.reshape((-1, cb) + lp.shape[1:])
                    )
                    var = var.reshape(-1)[:C]
                    overflow = jnp.any(ovs)
                else:

                    def per_batch(lp_b):  # [cb, L, 4, 4]
                        L = lp_b.shape[1]
                        lp_full = jnp.broadcast_to(
                            lp_b[:, None], (cb, Hh, L, 4, 4)
                        ).reshape(cb * Hh, L, 4, 4)
                        Ts_full = jnp.broadcast_to(
                            Ts[None], (cb, Hh, 4, 4)
                        ).reshape(cb * Hh, 4, 4)
                        sils = self.renderer.silhouette(Ts_full, lp_full, K)
                        sils = sils.reshape((cb, Hh) + sils.shape[-2:])
                        return jnp.sum(jnp.var(sils, axis=1), axis=(-2, -1))

                    var = jax.lax.map(
                        per_batch, lp_p.reshape((-1, cb) + lp.shape[1:])
                    ).reshape(-1)[:C]
                    overflow = jnp.zeros((), bool)
                return jnp.where(feasible, var, -jnp.inf), feasible, overflow

            self._score_jit[shared] = run
        return self._score_jit[shared](qposes, hyp_dofs, K)

    def explore(
        self,
        history: np.ndarray,
        K: np.ndarray,
        key: jax.Array | int = 0,
        qpos_candidates: np.ndarray | None = None,
    ) -> ExploreResult:
        """Pick the next qpos maximizing render disagreement across the pose
        history (reference forward(), space_explorer.py:49-197)."""
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        k1, k2 = jax.random.split(key)

        hist = np.asarray(history)
        hist = hist[min(self.history_start, max(len(hist) - 1, 0)):]
        if len(hist) == 0:
            raise ValueError("empty pose history")
        sel = jax.random.randint(k1, (self.n_hypotheses,), 0, len(hist))
        hyp_dofs = jnp.asarray(hist)[sel]

        if qpos_candidates is None:
            lo = jnp.asarray(self.chain.joint_limits[:, 0]) * self.limit_fraction
            hi = jnp.asarray(self.chain.joint_limits[:, 1]) * self.limit_fraction
            qposes = jax.random.uniform(
                k2, (self.n_sample_qposes, self.chain.n_dof), minval=lo, maxval=hi
            )
        else:
            qposes = jnp.asarray(qpos_candidates, jnp.float32)

        # Shared-bin fast path when every hypothesis stays within the
        # binning margin of their mean (minus soft-band slack) — typical
        # once the optimizer has burned in; early wide clouds take the
        # exact per-pair path.
        shared = False
        spread = float("nan")
        if self._can_share_bins():
            spread = self.hypothesis_spread_px(np.asarray(hyp_dofs), K)
            shared = spread <= float(self.renderer.tile.margin) - 2.0
        # introspection for benchmarks/logs
        self.last_shared = shared
        self.last_spread_px = spread
        var, feasible, overflow = self._score(
            qposes, hyp_dofs, jnp.asarray(K, jnp.float32), shared=shared
        )
        # Truncated bins rank variance on wrong silhouettes. Same contract
        # as the trainers (BinOverflowError -> 2x escalation,
        # trainer/offline.py): escalate capacity-class budgets and
        # re-score; explored poses concentrate loads past any static audit
        # (the r4 online run measured 1309 vs a random-pose audit of 824).
        tries = 0
        while bool(np.asarray(overflow)) and tries < 3:
            tries += 1
            import logging

            logging.getLogger("easyhec_tpu").warning(
                "explorer: tile-bin overflow during candidate scoring — "
                "escalating budgets 2x and re-scoring (attempt %d)", tries,
            )
            self._escalate_budgets()
            var, feasible, overflow = self._score(
                qposes, hyp_dofs, jnp.asarray(K, jnp.float32), shared=shared
            )
        if bool(np.asarray(overflow)):
            import logging

            logging.getLogger("easyhec_tpu").warning(
                "explorer: tile-bin overflow persists after escalation — "
                "variance ranking may be degraded; decimate more"
            )
        var_np = np.asarray(var)
        if not np.isfinite(var_np).any():
            raise RuntimeError("no feasible qpos among candidates")
        best = int(np.argmax(var_np))
        return ExploreResult(
            qpos=np.asarray(qposes[best]),
            variance=float(var_np[best]),
            var_all=var_np,
            feasible=np.asarray(feasible),
            qpos_all=np.asarray(qposes),
        )
