"""TPU session 5: honest-cap tile sweep + full bench at the best config.

Launch solo on an idle machine:
    nohup python -u scripts/tpu_session5.py > /tmp/tpu_session5.log 2>&1 &
"""
from __future__ import annotations

import os
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax


def phase(name):
    print(f"\n===== PHASE {name} @ {time.strftime('%H:%M:%S')} =====", flush=True)


def run_file(name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        name, pathlib.Path(__file__).parent / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main()


def phase_tiles():
    run_file("profile_tiles")


def phase_bench_16():
    os.environ["BENCH_TILE_H"] = "16"
    os.environ["BENCH_CAP"] = "1792"
    import bench

    bench.main()


def phase_bench_8():
    os.environ["BENCH_TILE_H"] = "8"
    os.environ["BENCH_CAP"] = "1280"
    os.environ["BENCH_BIG_K"] = "0"
    import importlib

    import bench

    importlib.reload(bench)
    bench.main()


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for name, fn in (
        ("tiles", phase_tiles),
        ("bench16", phase_bench_16),
        ("bench8", phase_bench_8),
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
