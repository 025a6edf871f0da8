from .dataset import CalibBatch, load_calib_dataset, save_calib_dataset, save_calib_frame
from .synthetic import default_camera, generate_dataset, sample_qposes

__all__ = [
    "CalibBatch", "load_calib_dataset", "save_calib_dataset", "save_calib_frame",
    "default_camera", "generate_dataset", "sample_qposes",
]
