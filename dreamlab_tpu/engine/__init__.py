from .base import GenSpec, ModelPaths, PipelineWorker
from .model_registry import ModelRegistry, get_model_registry
from .mode_config import ModeConfigManager, get_mode_config, reload_mode_config
from .worker_pool import (
    Job,
    JobType,
    GenerationJob,
    ModeSwitchJob,
    CustomJob,
    WorkerPool,
    get_worker_pool,
    reset_worker_pool,
)

__all__ = [
    "GenSpec", "ModelPaths", "PipelineWorker",
    "ModelRegistry", "get_model_registry",
    "ModeConfigManager", "get_mode_config", "reload_mode_config",
    "Job", "JobType", "GenerationJob", "ModeSwitchJob", "CustomJob",
    "WorkerPool", "get_worker_pool", "reset_worker_pool",
]
