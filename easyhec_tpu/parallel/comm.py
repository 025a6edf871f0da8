"""Multihost communication helpers.

The reference carries a detectron2-derived comm layer
(easyhec/utils/comm.py:25-279: rank/world-size plumbing, a gloo side-group,
pickle->ByteTensor->pad->all_gather object transport, reduce_dict) because
torch.distributed only moves tensors. Under JAX SPMD most of it vanishes —
collectives live INSIDE jitted programs (psum/pmean over mesh axes) — but
host-side code still occasionally needs cross-process exchange: gathering
eval outputs, averaging metric dicts, barriers. These wrappers cover that
with jax.experimental.multihost_utils, degrading to no-ops in the common
single-process case.
"""
from __future__ import annotations

import pickle

import jax
import numpy as np

__all__ = [
    "process_count",
    "process_index",
    "is_main_process",
    "sync",
    "all_gather_arrays",
    "all_gather_objects",
    "reduce_dict",
]


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def sync() -> None:
    """Cross-process barrier (reference comm.synchronize, comm.py:70-83)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("easyhec_tpu.sync")


def all_gather_arrays(x: np.ndarray) -> np.ndarray:
    """Gather a same-shaped array from every process -> [P, ...]."""
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def all_gather_objects(obj) -> list:
    """Gather arbitrary picklable objects from every process.

    The reference's pickle->tensor->pad->all_gather dance (comm.py:98-180)
    expressed with one padded byte-array allgather.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    n = np.asarray([payload.size], np.int64)
    sizes = all_gather_arrays(n)[:, 0]
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    return [
        pickle.loads(gathered[p, : int(sizes[p])].tobytes())
        for p in range(gathered.shape[0])
    ]


def reduce_dict(metrics: dict[str, float], average: bool = True) -> dict[str, float]:
    """Average (or sum) a {name: scalar} dict across processes
    (reference comm.reduce_dict, comm.py:240-269)."""
    if jax.process_count() == 1:
        return dict(metrics)
    keys = sorted(metrics)
    vec = np.asarray([float(metrics[k]) for k in keys], np.float64)
    allv = all_gather_arrays(vec)
    red = allv.mean(axis=0) if average else allv.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, red)}
