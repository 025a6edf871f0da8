from .sharding import (
    make_mesh,
    pad_frames,
    sharded_calibrate,
    sharded_mask_loss,
    sharded_silhouette,
)

__all__ = [
    "make_mesh", "pad_frames", "sharded_calibrate", "sharded_mask_loss",
    "sharded_silhouette",
]
