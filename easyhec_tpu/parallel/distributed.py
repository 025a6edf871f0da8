"""Multi-host (multi-process) initialization.

The reference bootstraps torch.distributed from WORLD_SIZE/LOCAL_RANK env
vars with an NCCL process group (tools/run_easyhec.py:41-50). The JAX
equivalent is ONE call — jax.distributed.initialize — after which every
jitted program is SPMD across all processes and XLA compiles the
collectives (psum over ICI within a slice, DCN across slices). This module
wraps that call with the same env-var-rendezvous ergonomics:

    EASYHEC_COORDINATOR=host:port EASYHEC_NUM_PROCESSES=2 \
    EASYHEC_PROCESS_ID=0 python -m easyhec_tpu.cli.run -c cfg.yaml

On TPU pods the three values are auto-detected by JAX from the TPU
metadata — plain `init_distributed()` with no env vars is correct there.
For CPU-based multi-process testing, set EASYHEC_CPU_COLLECTIVES=gloo.
"""
from __future__ import annotations

import os

import jax

__all__ = ["init_distributed", "maybe_init_from_env"]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
    cpu_collectives: str | None = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments on a TPU pod, JAX auto-detects everything. On
    CPU/GPU or under explicit rendezvous, pass (or env-configure) the
    coordinator address, process count and process id.
    """
    # Idempotence probe that does NOT touch the XLA backend
    # (jax.process_count() would initialize it, which breaks initialize()).
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return
    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def maybe_init_from_env() -> bool:
    """Initialize from EASYHEC_* env vars if present (the reference's
    WORLD_SIZE/LOCAL_RANK pattern, run_easyhec.py:41-50). Returns True if
    distributed mode was initialized."""
    coord = os.environ.get("EASYHEC_COORDINATOR")
    nproc = os.environ.get("EASYHEC_NUM_PROCESSES")
    if not coord and not nproc:
        return False
    init_distributed(
        coordinator_address=coord,
        num_processes=int(nproc) if nproc else None,
        process_id=int(os.environ["EASYHEC_PROCESS_ID"])
        if "EASYHEC_PROCESS_ID" in os.environ
        else None,
        cpu_collectives=os.environ.get("EASYHEC_CPU_COLLECTIVES"),
    )
    return True
