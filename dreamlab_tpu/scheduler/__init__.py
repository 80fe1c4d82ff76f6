from .lcm import (
    LCMConfig,
    LCMSchedule,
    load_scheduler_config,
    make_lcm_schedule,
    lcm_step,
    guidance_scale_embedding,
)

__all__ = [
    "LCMConfig",
    "LCMSchedule",
    "load_scheduler_config",
    "make_lcm_schedule",
    "lcm_step",
    "guidance_scale_embedding",
]
