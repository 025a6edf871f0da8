"""easyhec_tpu — TPU-native markerless hand-eye calibration framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of ootts/EasyHeC
(differentiable-rendering camera-to-robot-base calibration with
consistency-based space exploration). See SURVEY.md for the reference layer
map this framework mirrors, and README.md for the architecture.
"""

__version__ = "0.1.0"

import os as _os

# Persistent compilation cache: TPU compiles of the tiled rasterizer take
# minutes over a remote-compile tunnel; cache them across processes.
if not _os.environ.get("EASYHEC_NO_COMPILE_CACHE"):
    import jax as _jax_cc

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/easyhec_tpu_jax"),
    )
    try:
        _jax_cc.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax_cc.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

if _os.environ.get("EASYHEC_PLATFORM"):
    # Escape hatch for environments where jax is pre-imported by a
    # sitecustomize hook (so JAX_PLATFORMS is read too early to matter):
    # EASYHEC_PLATFORM=cpu forces the backend before any computation runs.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["EASYHEC_PLATFORM"])

from . import geometry  # noqa: F401,E402
