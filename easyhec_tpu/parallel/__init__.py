from .distributed import init_distributed, maybe_init_from_env
from .sharding import (
    make_mesh,
    pad_frames,
    sharded_calibrate,
    sharded_mask_loss,
    sharded_silhouette,
)

__all__ = [
    "make_mesh", "pad_frames", "sharded_calibrate", "sharded_mask_loss",
    "sharded_silhouette", "init_distributed", "maybe_init_from_env",
]
