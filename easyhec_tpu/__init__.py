"""easyhec_tpu — TPU-native markerless hand-eye calibration framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of ootts/EasyHeC
(differentiable-rendering camera-to-robot-base calibration with
consistency-based space exploration). See SURVEY.md for the reference layer
map this framework mirrors, and README.md for the architecture.
"""

__version__ = "0.1.0"

from . import geometry  # noqa: F401
