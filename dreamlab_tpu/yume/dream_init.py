"""Yume wiring: Redis + scorer + generation worker → DreamWorker.

Port of /root/reference/yume/dream_init.py:19-166 with the same degradation
ladder: CLIP unavailable → aesthetic heuristic scoring; Redis unreachable →
in-memory only (the reference disables Yume entirely without Redis; serving
degraded-but-on is strictly more available).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

from .dream_worker import DreamWorker, set_dream_worker
from .scoring import AestheticScorer, CLIPScorer, HFCLIPAdapter

logger = logging.getLogger(__name__)


def _try_redis():
    from ..utils.resp import RespClient

    host = os.environ.get("REDIS_HOST", "127.0.0.1")
    port = int(os.environ.get("REDIS_PORT", "6379"))
    try:
        client = RespClient(host, port)
        client.ping()
        logger.info("yume: redis connected at %s:%d", host, port)
        return client
    except Exception as e:
        logger.warning("yume: redis unavailable (%s); dreams stay in-memory", e)
        return None


def _try_clip_scorer():
    """Degradation ladder (reference dream_init.py:104-126 adapted TPU-first):
    native JAX CLIP (local HF CLIPModel dir) → transformers CLIPModel
    (hub name / torch) → aesthetic heuristic."""
    model_name = os.environ.get("YUME_CLIP_MODEL", "openai/clip-vit-base-patch32")
    if os.path.isdir(model_name):
        try:
            from ..loader import load_clip_model

            native = load_clip_model(model_name)
            logger.info("yume: native CLIP scorer loaded (%s)", model_name)
            return CLIPScorer(native)
        except Exception as e:
            logger.warning("yume: native CLIP load failed (%s)", e)
    try:
        from transformers import CLIPModel, CLIPProcessor

        model = CLIPModel.from_pretrained(model_name)
        processor = CLIPProcessor.from_pretrained(model_name)
        logger.info("yume: CLIP scorer loaded (%s)", model_name)
        return CLIPScorer(HFCLIPAdapter(model, processor))
    except Exception as e:
        logger.warning("yume: CLIP unavailable (%s); using aesthetic heuristic", e)
        return AestheticScorer()


async def initialize_dream_system(worker, *, scorer=None, redis=None) -> DreamWorker:
    dream = DreamWorker(
        worker,
        scorer=scorer if scorer is not None else _try_clip_scorer(),
        redis=redis if redis is not None else _try_redis(),
    )
    set_dream_worker(dream)
    return dream
