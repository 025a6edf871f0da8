from .interfaces import (
    Camera,
    MaskSource,
    PrecomputedMaskSource,
    RealSenseAdapter,
    RendererMaskSource,
    RobotArm,
    SimArm,
    SimCamera,
    XArmAdapter,
)
from .planner import CollisionModel, RRTPlanner, plan_to_qpos, time_parameterize

__all__ = [
    "Camera", "MaskSource", "PrecomputedMaskSource", "RealSenseAdapter",
    "RendererMaskSource", "RobotArm", "SimArm", "SimCamera", "XArmAdapter",
    "CollisionModel", "RRTPlanner", "plan_to_qpos", "time_parameterize",
]
