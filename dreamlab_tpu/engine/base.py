"""Worker protocol + job spec shared across backends.

Behavioral port of the reference's worker contract
(/root/reference/backends/base.py:29-58): a worker owns one loaded pipeline
and turns a generation spec into PNG bytes; ``run_job_with_latents``
additionally returns a compact [1, 4, 8, 8] float16 latent fingerprint
(512 bytes) used by the UI's latent-exploration features.

The reference protocol's latent quirks fixed here (SURVEY.md §7.3): specs
are typed dataclasses, not the request object itself.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Callable, Optional, Protocol, Tuple


_SIZE_RE = re.compile(r"^(\d+)\s*[xX]\s*(\d+)$")


def parse_size(size: str) -> Tuple[int, int]:
    """'WxH' → (width, height); mirrors rknn_worker.py:15-20."""
    m = _SIZE_RE.match(size.strip())
    if not m:
        raise ValueError(f"invalid size {size!r}; expected 'WxH'")
    return int(m.group(1)), int(m.group(2))


@dataclasses.dataclass
class GenSpec:
    """One generation request (servers map their request schemas onto this)."""

    prompt: str
    size: str = "512x512"
    num_inference_steps: int = 4
    guidance_scale: float = 1.0
    seed: Optional[int] = None
    negative_prompt: Optional[str] = None
    style: Optional[str] = None
    style_level: int = 0
    original_inference_steps: Optional[int] = None
    aesthetic_score: float = 6.0  # refiner micro-conditioning (n_ids == 5)
    # per-step progress hook: called (step, timestep) from the device
    # callback thread; excluded from equality so specs stay comparable
    progress_cb: Optional[Callable[[int, int], None]] = dataclasses.field(
        default=None, compare=False, repr=False
    )
    # ControlNet conditioning: hint image [H, W, 3] uint8 at the output
    # size (servers decode/resize before building the spec) + residual
    # scale (None = the mode's configured default)
    control_image: Optional[object] = dataclasses.field(
        default=None, compare=False, repr=False
    )
    controlnet_scale: Optional[float] = None
    # multi-tenant target mode: None = the pool's active mode. Set by the
    # serving layer when DREAMLAB_MODE_CACHE > 1 — the pool routes the job
    # to that mode's warm resident worker instead of switching globally.
    mode: Optional[str] = None

    def dims(self) -> Tuple[int, int]:
        return parse_size(self.size)


@dataclasses.dataclass
class ModelPaths:
    """On-disk layout contract for a servable checkpoint directory
    (reference base.py:40-58: scheduler/, text_encoder/, unet/, vae_decoder/)."""

    root: str

    @property
    def scheduler_config(self) -> str:
        return os.path.join(self.root, "scheduler", "scheduler_config.json")

    @property
    def tokenizer_dir(self) -> str:
        return os.path.join(self.root, "tokenizer")

    @property
    def text_encoder_dir(self) -> str:
        return os.path.join(self.root, "text_encoder")

    @property
    def unet_dir(self) -> str:
        return os.path.join(self.root, "unet")

    @property
    def vae_dir(self) -> str:
        v = os.path.join(self.root, "vae")
        return v if os.path.isdir(v) else os.path.join(self.root, "vae_decoder")

    def validate(self) -> bool:
        return all(
            os.path.isdir(p)
            for p in (self.tokenizer_dir, self.text_encoder_dir, self.unet_dir)
        )


class PipelineWorker(Protocol):
    """Worker protocol (reference base.py:29-38)."""

    worker_id: int

    def run_job(self, spec: GenSpec) -> Tuple[bytes, int]:
        """Generate; returns (png_bytes, seed_used)."""
        ...

    def run_job_with_latents(self, spec: GenSpec) -> Tuple[bytes, int, bytes]:
        """Generate; returns (png_bytes, seed_used, latents_f16_bytes) where
        latents are [1, 4, 8, 8] float16 (512 bytes)."""
        ...
