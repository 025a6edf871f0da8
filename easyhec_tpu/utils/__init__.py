from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .logging import MetricsWriter, setup_logger

__all__ = [
    "latest_checkpoint", "load_checkpoint", "save_checkpoint",
    "MetricsWriter", "setup_logger",
]
