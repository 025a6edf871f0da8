"""Tracing & wall-clock probes.

The reference's observability is minimal (EvalTime probes gated by
cfg.evaltime + cuda.synchronize before timing; SURVEY.md §5 tracing). Here
profiling is first-class for TPU work:

- `trace(logdir)`: jax.profiler trace context (view in TensorBoard/XProf or
  Perfetto) around any region.
- `EvalTimer`: named wall-clock probes with block_until_ready semantics.
- `raster_roofline(...)`: analytic FLOPs/bytes/arithmetic-intensity estimate
  for a rasterization workload, to compare measured pixels/s against the
  chip's speed-of-light.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

__all__ = ["trace", "EvalTimer", "raster_roofline"]


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """Profile a region: `with trace(out/'trace'): step()`."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class EvalTimer:
    """Named wall-clock probes (the reference's EvalTime, cfg.evaltime).

    >>> t = EvalTimer(enabled=True)
    >>> t("start"); work(); t("render")   # records time since previous mark
    """

    enabled: bool = True
    marks: dict[str, list[float]] = field(default_factory=dict)
    _last: float | None = None

    def __call__(self, name: str, sync=None) -> None:
        if not self.enabled:
            return
        if sync is not None:  # block on a jax array for honest device timing
            import jax

            jax.block_until_ready(sync)
        now = time.perf_counter()
        if self._last is not None:
            self.marks.setdefault(name, []).append(now - self._last)
        self._last = now

    def summary(self) -> dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.marks.items() if v}


def raster_roofline(
    n_pixels: int,
    n_triangles: int,
    capacity: int,
    flops_per_pix_tri: float = 24.0,
    bytes_per_pixel: float = 8.0,
    peak_flops: float = 197e12 * 0.5,  # v5e bf16 peak * f32 derate
    peak_bw: float = 8.1e11,  # v5e HBM ~810 GB/s
) -> dict[str, float]:
    """Estimate the speed-of-light for one silhouette fwd pass.

    The tiled kernel evaluates `capacity` candidate triangles per pixel
    (edge functions + soft coverage ≈ flops_per_pix_tri each) and writes the
    coverage image once. Returns arithmetic intensity and the compute/memory
    bound in pixels/s.
    """
    flops = n_pixels * capacity * flops_per_pix_tri
    bytes_moved = n_pixels * bytes_per_pixel + n_triangles * 64.0
    ai = flops / bytes_moved
    t_compute = flops / peak_flops
    t_memory = bytes_moved / peak_bw
    bound = max(t_compute, t_memory)
    return {
        "flops": flops,
        "bytes": bytes_moved,
        "arith_intensity": ai,
        "compute_bound_pix_s": n_pixels / t_compute,
        "memory_bound_pix_s": n_pixels / t_memory,
        "speed_of_light_pix_s": n_pixels / bound,
    }
