from pingpong_tpu.env.physics import collide_sphere_with_moving_plane
from pingpong_tpu.env.pong import (
    EnvParams,
    EnvState,
    StepOut,
    env_params_from_config,
    observe,
    observe_a,
    observe_b,
    reset,
    step,
    step_autoreset,
)

__all__ = [
    "collide_sphere_with_moving_plane",
    "EnvParams",
    "EnvState",
    "StepOut",
    "env_params_from_config",
    "observe",
    "observe_a",
    "observe_b",
    "reset",
    "step",
    "step_autoreset",
]
