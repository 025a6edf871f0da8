"""Run-directory management: archiving, source snapshots, determinism.

Capability match for the reference's os_utils (easyhec/utils/os_utils.py:
archive_runs :61-82, make_source_code_snapshot :90-106, deterministic
:109-113). Pure stdlib — no rsync subprocess.
"""
from __future__ import annotations

import shutil
import time
from pathlib import Path

__all__ = ["archive_runs", "make_source_snapshot", "deterministic_seed"]


def archive_runs(output_dir: str | Path, keep: int = 20) -> Path | None:
    """Move the previous contents of output_dir into
    output_dir/archive/<timestamp>/ so each run starts clean but history is
    kept (reference os_utils.py:61-82). Returns the archive path (or None)."""
    out = Path(output_dir)
    if not out.exists():
        return None
    entries = [p for p in out.iterdir() if p.name != "archive"]
    if not entries:
        return None
    stamp = time.strftime("%Y%m%d_%H%M%S")
    dst = out / "archive" / stamp
    dst.mkdir(parents=True, exist_ok=True)
    for p in entries:
        shutil.move(str(p), str(dst / p.name))
    # bound archive growth
    archives = sorted((out / "archive").iterdir())
    for old in archives[:-keep]:
        shutil.rmtree(old, ignore_errors=True)
    return dst


def make_source_snapshot(output_dir: str | Path, package_root: str | Path | None = None) -> Path:
    """Copy the framework source into the run dir for reproducibility
    (reference os_utils.py:90-106)."""
    root = Path(package_root) if package_root else Path(__file__).resolve().parents[1]
    dst = Path(output_dir) / "source_snapshot" / root.name
    if dst.exists():
        shutil.rmtree(dst)
    shutil.copytree(
        root,
        dst,
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc", ".git"),
    )
    return dst


def deterministic_seed(seed: int = 0) -> None:
    """Seed every host-side RNG in play (reference os_utils.py:109-113).
    JAX randomness is already explicit via PRNG keys."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    try:  # torch only matters if the torch-based tooling is used
        import torch

        torch.manual_seed(seed)
    except ImportError:  # pragma: no cover
        pass
