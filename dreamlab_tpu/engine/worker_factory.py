"""Worker factory: checkpoint path → detected arch → loaded TPU worker.

Behavioral port of /root/reference/backends/worker_factory.py:17-100, with
explicit parameters instead of the reference's env-var IPC wart
(worker_pool.py:221-222 — flagged in SURVEY.md §7.3 as not to replicate).
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional, Tuple

from ..lora import StyleDef
from ..utils.model_detector import DetectionError, detect_model

logger = logging.getLogger(__name__)


class WorkerCreationError(Exception):
    pass


def detect_worker_type(model_path: str) -> str:
    """'sd15' | 'sdxl' from tensor shapes (reference worker_factory.py:17-70)."""
    try:
        info = detect_model(model_path)
    except DetectionError as e:
        raise WorkerCreationError(str(e)) from e
    if info.is_lora:
        raise WorkerCreationError(f"{model_path} is a LoRA, not a checkpoint")
    if info.arch is None:
        raise WorkerCreationError(
            f"unsupported model (cross_attention_dim="
            f"{info.cross_attention_dim}): {model_path}"
        )
    return info.arch


def create_tpu_worker(
    worker_id: int,
    model_path: str,
    *,
    styles: Optional[Dict[str, StyleDef]] = None,
    dtype=None,
    mesh=None,
    tensor_parallel: bool = False,
    warmup_size: Optional[Tuple[int, int]] = None,
    pipeline_factory=None,
):
    """Load a checkpoint dir and wrap it in a TPUPipelineWorker.

    pipeline_factory: injectable for tests (returns an LCMPipeline-like).
    """
    import jax.numpy as jnp

    from ..loader import load_pipeline
    from ..pipeline import LCMPipeline
    from .tpu_worker import TPUPipelineWorker

    arch = detect_worker_type(model_path)
    t0 = time.time()
    if pipeline_factory is not None:
        pipeline = pipeline_factory(model_path)
    else:
        # load_vae_encoder: production workers must serve /v1/img2img and
        # /v1/inpaint, which need encoder weights; the loader skips them
        # gracefully when the vae file carries no encoder.* tensors.
        bundle = load_pipeline(model_path, load_vae_encoder=True)
        pipeline = LCMPipeline(
            bundle,
            dtype=dtype or jnp.bfloat16,
            mesh=mesh,
            tensor_parallel=tensor_parallel,
        )
    logger.info(
        "worker %d: loaded %s (%s) in %.1fs",
        worker_id, model_path, arch, time.time() - t0,
    )
    if styles is None:
        from .styles import get_style_registry

        styles = get_style_registry()
    worker = TPUPipelineWorker(pipeline, worker_id, styles=styles)
    if warmup_size:
        w, h = warmup_size
        pipeline.warmup(h, w)
    return worker
