"""TPU session 6 (round-2 final): gather formulation micro-test + honest bench.

Launch solo on an idle machine:
    nohup python -u scripts/tpu_session6.py > /tmp/tpu_session6.log 2>&1 &
"""
from __future__ import annotations

import os
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def phase(name):
    print(f"\n===== PHASE {name} @ {time.strftime('%H:%M:%S')} =====", flush=True)


def timed(fn, *args, n=20):
    r = jax.jit(fn)(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = jax.jit(fn)(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def phase_gather():
    """Which gather layout is faster for the record pack?
    g1 (current): field-major [12, F] gathered along lanes per slot.
    g2: row-major [F, 12] row-gather then transpose.
    """
    B, F, N = 10, 19080, 150 * 1792
    key = jax.random.PRNGKey(0)
    f12 = jax.random.normal(key, (B, 12, F + 1), jnp.float32)
    fT = jnp.swapaxes(f12, -1, -2)  # [B, F+1, 12]
    idx = jax.random.randint(key, (B, N), 0, F + 1)

    def g1(f, i):
        return jax.vmap(lambda a, b: jnp.take(a, b, axis=-1))(f, i)

    def g2(fr, i):
        y = jax.vmap(lambda a, b: a[b])(fr, i)  # [B, N, 12]
        return jnp.swapaxes(y, -1, -2)

    t1 = timed(lambda a, b: g1(a, b).sum(), f12, idx, n=10)
    print(f"g1 field-major take: {t1*1e3:.2f} ms", flush=True)
    t2 = timed(lambda a, b: g2(a, b).sum(), fT, idx, n=10)
    print(f"g2 row gather+T:     {t2*1e3:.2f} ms", flush=True)
    # correctness
    a = np.asarray(g1(f12, idx))
    b = np.asarray(g2(fT, idx))
    print("equal:", np.allclose(a, b), flush=True)


def phase_bench():
    import bench

    bench.main()


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for name, fn in (
        ("gather", phase_gather),
        ("bench", phase_bench),
    ):
        if only and not name.startswith(only):
            continue
        phase(name)
        try:
            fn()
        except Exception:
            traceback.print_exc()
            print(f"PHASE {name} FAILED (continuing)", flush=True)
    print("\nSESSION DONE", flush=True)
