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
    if info.is_controlnet:
        raise WorkerCreationError(
            f"{model_path} is a ControlNet — attach it to a mode via the "
            "modes.yaml 'controlnet:' key, it cannot serve standalone"
        )
    if info.arch is None:
        raise WorkerCreationError(
            f"unsupported model (cross_attention_dim="
            f"{info.cross_attention_dim}): {model_path}"
        )
    return info.arch


def apply_mode_loras(pipeline, loras) -> None:
    """Merge a mode's LoRAs (with per-LoRA strengths) into pipeline weights.

    The reference loads LoRAs at worker init but never applies the per-mode
    strengths (worker_pool.py:234-237 TODO; cuda_worker.py:123-147) —
    SURVEY §7.2(8) told this rebuild to close that gap. Merging here, before
    the worker snapshots its style baseline, means per-request style LoRAs
    compose on top of the mode's adapters.
    """
    from ..lora import load_lora, merge_lora_into_tree

    for entry in loras or []:
        t0 = time.time()
        try:
            tensors = load_lora(entry.file)
            pipeline.unet_params = merge_lora_into_tree(
                pipeline.unet_params, tensors.unet, entry.strength
            )
            if tensors.text:
                pipeline.text_params = merge_lora_into_tree(
                    pipeline.text_params, tensors.text, entry.strength
                )
        except Exception as e:
            # warn-don't-raise: missing/unreadable mode LoRAs degrade to the
            # base model, matching mode_config's path validation policy —
            # never fail pool startup or a mode switch over an adapter
            logger.warning(
                "mode lora %s not applied (%s); serving base weights",
                entry.file, e,
            )
            continue
        logger.info(
            "mode lora %s (strength %.2f, %d modules) merged in %.0f ms",
            entry.file, entry.strength, tensors.num_modules,
            1e3 * (time.time() - t0),
        )


def attach_mode_controlnet(pipeline, controlnet) -> float:
    """Load a mode's ControlNet (diffusers-layout dir) and attach it.

    Returns the mode's default conditioning scale. Warn-don't-raise like
    mode LoRAs: a missing/incompatible ControlNet degrades to the bare
    model instead of failing the mode switch.
    """
    from ..loader import load_controlnet

    try:
        t0 = time.time()
        params, cfg = load_controlnet(controlnet.file)
        pipeline.set_controlnet(params, cfg)
        logger.info(
            "controlnet %s attached (scale %.2f) in %.0f ms",
            controlnet.file, controlnet.scale, 1e3 * (time.time() - t0),
        )
        return controlnet.scale
    except Exception as e:
        logger.warning(
            "controlnet %s not attached (%s); serving without conditioning",
            controlnet.file, e,
        )
        return 1.0


def create_tpu_worker(
    worker_id: int,
    model_path: str,
    *,
    styles: Optional[Dict[str, StyleDef]] = None,
    loras=None,
    embeddings=None,
    controlnet=None,
    refiner=None,
    dtype=None,
    mesh=None,
    tensor_parallel: bool = False,
    warmup_size: Optional[Tuple[int, int]] = None,
    pipeline_factory=None,
):
    """Load a checkpoint dir and wrap it in a TPUPipelineWorker.

    loras: sequence of mode LoRA configs ({file, strength}) merged into the
    loaded weights before the worker snapshots its style baseline.
    controlnet: optional mode ControlNet config ({file, scale}) attached to
    the pipeline; requests opt in per call via ``control_image``.
    refiner: optional mode refiner config ({file, switch_at}) — loads a
    second checkpoint and serves base→refiner ensemble requests (the
    latent hands off on device between the two XLA programs).
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
        if embeddings:
            # textual inversions extend the tokenizer + embedding table
            # BEFORE the pipeline device-puts the text params
            from ..textual_inversion import apply_embeddings

            apply_embeddings(bundle, embeddings)
        pipeline = LCMPipeline(
            bundle,
            dtype=dtype or jnp.bfloat16,
            mesh=mesh,
            tensor_parallel=tensor_parallel,
        )
    if loras:
        apply_mode_loras(pipeline, loras)
    cn_scale = 1.0
    if controlnet is not None:
        cn_scale = attach_mode_controlnet(pipeline, controlnet)
    refiner_pipe = None
    switch_at = 0.8
    if refiner is not None:
        # warn-don't-raise like LoRAs/ControlNets: a broken refiner degrades
        # to base-only serving instead of failing the mode switch
        try:
            rt0 = time.time()
            rbundle = load_pipeline(refiner.file, load_vae_encoder=True)
            refiner_pipe = LCMPipeline(
                rbundle, dtype=dtype or jnp.bfloat16, mesh=mesh,
                tensor_parallel=tensor_parallel,
            )
            switch_at = refiner.switch_at
            logger.info(
                "refiner %s loaded (switch_at %.2f) in %.1fs",
                refiner.file, switch_at, time.time() - rt0,
            )
        except Exception as e:
            logger.warning(
                "refiner %s not loaded (%s); serving base only",
                refiner.file, e,
            )
            refiner_pipe = None
    logger.info(
        "worker %d: loaded %s (%s) in %.1fs",
        worker_id, model_path, arch, time.time() - t0,
    )
    if styles is None:
        from .styles import get_style_registry

        styles = get_style_registry()
    worker = TPUPipelineWorker(pipeline, worker_id, styles=styles,
                               controlnet_scale=cn_scale,
                               refiner=refiner_pipe,
                               refiner_switch_at=switch_at)
    if warmup_size:
        w, h = warmup_size
        pipeline.warmup(h, w)
    return worker
