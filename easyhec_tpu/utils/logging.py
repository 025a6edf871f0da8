"""Logging + metrics sinks.

Replaces loguru + tensorboardX in the reference (easyhec/utils/logger.py,
easyhec/utils/tb_utils.py) with stdlib logging, a JSONL metrics stream (the
machine-readable record the reference lacked), and an optional TensorBoard
writer (torch.utils.tensorboard) when available.
"""
from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

__all__ = ["setup_logger", "MetricsWriter"]

_FMT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def setup_logger(output_dir: str | Path | None = None, name: str = "easyhec_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(logging.Formatter(_FMT, datefmt="%H:%M:%S"))
    logger.addHandler(sh)
    if output_dir is not None:
        Path(output_dir).mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(Path(output_dir) / "log.txt")
        fh.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricsWriter:
    """JSONL metrics stream + optional TensorBoard scalars/images."""

    def __init__(self, output_dir: str | Path, tensorboard: bool = False):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.dir / "metrics.jsonl", "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.dir / "tb"))
            except Exception:  # pragma: no cover - TB genuinely optional
                self._tb = None

    def scalars(self, step: int, **values: float) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), int(step))

    def image(self, step: int, tag: str, img) -> None:
        """Record an image panel: always as a PNG under images/ (the
        mid-run observability the reference gets from TB image grids,
        trainer/rbsolver.py:58-65), plus TensorBoard when enabled."""
        import numpy as np

        arr = np.asarray(img)
        png_dir = self.dir / "images"
        png_dir.mkdir(exist_ok=True)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            a2 = arr if arr.ndim in (2, 3) else arr.reshape(arr.shape[-2:])
            plt.imsave(
                png_dir / f"{tag}_{int(step):06d}.png",
                np.clip(a2, 0, 1) if a2.dtype != np.uint8 else a2,
                cmap="viridis" if a2.ndim == 2 else None,
            )
        except Exception:  # pragma: no cover - best-effort observability
            pass
        if self._tb is not None:
            tb_arr = arr
            if tb_arr.ndim == 2:
                tb_arr = tb_arr[None]
            elif tb_arr.ndim == 3 and tb_arr.shape[-1] in (1, 3):
                tb_arr = tb_arr.transpose(2, 0, 1)
            self._tb.add_image(tag, tb_arr, int(step))

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
