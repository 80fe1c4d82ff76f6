"""TPU pipeline worker — the ``tpu_worker`` beside the reference's
cuda_worker/rknn_worker (BASELINE.json north star).

One worker owns one loaded ``LCMPipeline`` (one checkpoint on one device /
mesh) and implements the ``PipelineWorker`` protocol:
``run_job(spec) -> (png, seed)`` and ``run_job_with_latents`` returning the
[1, 4, 8, 8] float16 fingerprint (512 bytes) the latent-exploration UI
expects (reference rknn_worker.py:161-248, cuda_worker.py:241-304).

Style LoRAs apply *exclusively* per request (reference
cuda_worker.py:165-196) by merging into the base UNet pytree on device —
identical tree shapes, so no recompile; un-styling restores the base tree.
"""

from __future__ import annotations

import io
import logging
import os
import threading
import time
from collections import OrderedDict
from typing import Dict, Optional, Tuple

import numpy as np

from ..lora import StyleDef, load_lora, merge_lora_into_tree, parse_style_request
from ..pipeline import LCMPipeline
from .base import GenSpec

logger = logging.getLogger(__name__)


def _text_chunk(keyword: str, value: str) -> bytes:
    """A PNG tEXt chunk (latin-1 payload per the spec)."""
    import struct
    import zlib

    payload = keyword.encode("latin-1") + b"\x00" + value.encode(
        "latin-1", errors="replace"
    )
    data = b"tEXt" + payload
    return struct.pack(">I", len(payload)) + data + struct.pack(
        ">I", zlib.crc32(data) & 0xFFFFFFFF
    )


def png_encode(arr: np.ndarray, metadata: Optional[Dict[str, str]] = None) -> bytes:
    """[H, W, 3] uint8 → PNG bytes, with optional tEXt generation metadata
    (the parameter-resume contract the UI reads — reference
    lcm-sr-ui/src/lib/pngMeta.js).

    Uses the native zlib encoder (dreamlab_tpu.native) when available —
    2-5× faster than PIL on this host — splicing tEXt chunks after IHDR;
    falls back to PIL otherwise.
    """
    from ..native import encode_png as native_encode

    png = native_encode(arr)
    if png is not None:
        if metadata:
            # signature (8) + IHDR chunk (25) = 33-byte prefix
            chunks = b"".join(_text_chunk(k, v) for k, v in metadata.items())
            png = png[:33] + chunks + png[33:]
        return png

    from PIL import Image
    from PIL.PngImagePlugin import PngInfo

    img = Image.fromarray(arr)
    pnginfo = None
    if metadata:
        pnginfo = PngInfo()
        for k, v in metadata.items():
            pnginfo.add_text(k, v)
    buf = io.BytesIO()
    img.save(buf, format="PNG", pnginfo=pnginfo)
    return buf.getvalue()


def latents_to_fingerprint(latents_nhwc: np.ndarray) -> bytes:
    """Final denoised latents [1, h, w, 4] → [1, 4, 8, 8] f16 bytes via
    block-mean downsampling (reference rknn_worker.py:223-248)."""
    x = latents_nhwc[0]  # [h, w, 4]
    h, w, _ = x.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    th, tw = 8 * bh, 8 * bw
    x = x[:th, :tw]
    x = x.reshape(8, bh, 8, bw, 4).mean(axis=(1, 3))  # [8, 8, 4]
    nchw = x.transpose(2, 0, 1)[None].astype(np.float16)
    return nchw.tobytes()


class TPUPipelineWorker:
    """A single-checkpoint serving worker on one TPU device/mesh."""

    def __init__(
        self,
        pipeline: LCMPipeline,
        worker_id: int = 0,
        *,
        styles: Optional[Dict[str, StyleDef]] = None,
        default_size: Tuple[int, int] = (512, 512),
        warmup: bool = False,
        controlnet_scale: float = 1.0,
        refiner: Optional[LCMPipeline] = None,
        refiner_switch_at: float = 0.8,
    ):
        self.pipeline = pipeline
        self.worker_id = worker_id
        # mode-default ControlNet conditioning scale (modes.yaml
        # controlnet.scale); per-request controlnet_scale overrides it
        self.controlnet_scale = controlnet_scale
        # SDXL base→refiner ensemble (diffusers denoising_end/start):
        # the base runs steps [0, k), hands its scan-carry latent to the
        # refiner ON DEVICE, and the refiner runs [k, S) + decode
        self.refiner = refiner
        self.refiner_switch_at = refiner_switch_at
        # ensemble requests run solo: the coalescing path drives one
        # pipeline with explicit noise and would bypass the handoff
        self.supports_batching = refiner is None
        self.styles = dict(styles or {})
        self._style_cache: Dict[str, object] = {}  # path -> LoRATensors
        self._base_unet_params = pipeline.unet_params
        self._active: Tuple[Optional[str], int] = (None, 0)
        self._lock = threading.Lock()
        # merged-weights LRU: (lora_path, scale) -> (registry_name, pytree).
        # A styled request flips to a cached merged tree by pointer swap
        # instead of re-running the on-device merge (~1.1 s for SD1.5) —
        # the reference's per-request exclusive-style contract
        # (cuda_worker.py:165-196 + reset at :232) makes alternating
        # styled/unstyled traffic the common case. HBM-bounded: each entry
        # is a full UNet weight set, registered with the model registry
        # under "lora:*" so /api/vram and can_fit() see it.
        self._merged_cache: "OrderedDict[Tuple[str, float], Tuple[str, object]]" = (
            OrderedDict()
        )
        self._merged_cache_max = int(os.environ.get("DREAMLAB_LORA_CACHE", "2"))
        self._unet_hbm_bytes: Optional[int] = None
        if warmup:
            w, h = default_size
            pipeline.warmup(h, w)

    # ------------------------------------------------------------------
    def _apply_style(self, style: Optional[str], level: int):
        """Exclusive style application; (None, 0) restores base weights."""
        style, level = parse_style_request(style, level)
        if (style, level) == self._active:
            return
        # multi-host facade: RouterPipeline.apply_lora replays the merge on
        # every controller — a raw unet_params write there would change
        # process 0's weights only (parallel/multihost_router.py)
        broadcast = getattr(self.pipeline, "apply_lora", None)
        if style is None:
            if broadcast is not None:
                broadcast(None)
            else:
                self.pipeline.unet_params = self._base_unet_params
            self._active = (None, 0)
            return
        sdef = self.styles.get(style)
        if sdef is None:
            raise ValueError(f"unknown style {style!r}")
        cad = self.pipeline.bundle.unet_cfg.cross_attention_dim
        if (
            sdef.required_cross_attention_dim is not None
            and sdef.required_cross_attention_dim != cad
        ):
            raise ValueError(
                f"style {style!r} requires cross_attention_dim="
                f"{sdef.required_cross_attention_dim}, model has {cad}"
            )
        scale = sdef.strength_for_level(level)
        t0 = time.time()
        if broadcast is not None:
            try:
                broadcast(sdef.path, scale)
            except Exception:
                # a failed fleet merge restores BASE weights everywhere
                # (multihost_router._apply_lora_sync) — track that, or a
                # retry of the previous style would no-op on base weights
                self._active = (None, 0)
                raise
        else:
            key = (sdef.path, scale)
            cached = self._merged_cache.get(key)
            if cached is not None:
                self._merged_cache.move_to_end(key)
                self.pipeline.unet_params = cached[1]
            else:
                if sdef.path not in self._style_cache:
                    self._style_cache[sdef.path] = load_lora(sdef.path)
                tensors = self._style_cache[sdef.path]
                merged = merge_lora_into_tree(
                    self._base_unet_params, tensors.unet, scale
                )
                self.pipeline.unet_params = merged
                self._merged_put(key, style, level, merged)
        self._active = (style, level)
        logger.info(
            "style %s level %d (scale %.2f) merged in %.0f ms",
            style, level, scale, 1e3 * (time.time() - t0),
        )

    # ------------------------------------------------------------------
    def _unet_bytes(self) -> int:
        if self._unet_hbm_bytes is None:
            import jax

            self._unet_hbm_bytes = sum(
                x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(self._base_unet_params)
            )
        return self._unet_hbm_bytes

    def _merged_put(self, key, style: str, level: int, merged) -> None:
        """Cache a merged weight set, evicting LRU entries to stay within
        both the entry cap (DREAMLAB_LORA_CACHE) and HBM headroom.

        Register-then-bound: the merged tree is ALREADY allocated when we
        get here (merge_lora_into_tree ran), so the right headroom question
        is "can we afford to KEEP it" — can_fit(0) with the entry
        registered — not "is there room for a second copy" (which would
        wrongly drain the cache on large models). On real-HBM-stats
        backends the allocation is already in get_used_hbm(); on the
        registered-sum fallback the registration adds it. If the device is
        over headroom even after evicting older entries, the NEWEST entry
        (this one) is dropped last and we fall back to merge-and-drop."""
        if self._merged_cache_max <= 0:
            return
        from .model_registry import get_model_registry

        registry = get_model_registry()
        nbytes = self._unet_bytes()
        # instance-unique tag: multi-tenant pools build every worker with
        # worker_id=0, so a per-id name would collide across resident
        # tenants (register_model overwrites; one worker's close() would
        # silently unregister another's cache accounting)
        name = f"lora:{self.worker_id}:{id(self):x}:{style}:{level}"
        registry.register_model(
            name, model_path=key[0], worker_id=self.worker_id, hbm_bytes=nbytes,
        )
        self._merged_cache[key] = (name, merged)
        while self._merged_cache and (
            len(self._merged_cache) > self._merged_cache_max
            or not registry.can_fit(0)
        ):
            victim_key, (victim_name, _) = self._merged_cache.popitem(
                last=False
            )
            registry.unregister_model(victim_name)
            if victim_key == key:
                break  # dropped self: nothing left this cache can free

    def _merged_clear(self) -> None:
        from .model_registry import get_model_registry

        registry = get_model_registry()
        for name, _ in self._merged_cache.values():
            registry.unregister_model(name)
        self._merged_cache.clear()

    # ------------------------------------------------------------------
    def _generate(self, spec: GenSpec, *, pipelined: bool = False):
        width, height = spec.dims()
        seed = spec.seed
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        cb_kw = {}
        if spec.progress_cb is not None:
            pcb = spec.progress_cb
            cb_kw = dict(
                callback=lambda i, t, lat: pcb(i, t),
                callback_latents=False,
            )
        if spec.control_image is not None:
            cb_kw.update(
                control_image=spec.control_image,
                controlnet_scale=(
                    spec.controlnet_scale
                    if spec.controlnet_scale is not None
                    else self.controlnet_scale
                ),
            )
        common = dict(
            height=height,
            width=width,
            num_inference_steps=spec.num_inference_steps,
            original_inference_steps=spec.original_inference_steps,
            guidance_scale=spec.guidance_scale,
            negative_prompt=spec.negative_prompt,
            seed=seed,
        )
        with self._lock:
            self._apply_style(spec.style, spec.style_level)
            try:
                S = spec.num_inference_steps
                if self.refiner is not None and S >= 2:
                    # ensemble handoff: the base's carry latent goes straight
                    # into the refiner as a device array — zero host traffic.
                    # ControlNet hints condition the base segment; progress
                    # callbacks ride the refiner segment.
                    k = min(max(int(round(S * self.refiner_switch_at)), 1),
                            S - 1)
                    base_kw = {
                        key: cb_kw[key]
                        for key in ("control_image", "controlnet_scale")
                        if key in cb_kw
                    }
                    ref_kw = {k2: v for k2, v in cb_kw.items()
                              if k2 not in base_kw}
                    base = self.pipeline.generate(
                        spec.prompt, segment=(0, k), **common, **base_kw,
                    )
                    res = self.refiner.generate(
                        spec.prompt, segment=(k, S),
                        latents_state=base.state_device,
                        pipelined=pipelined,
                        aesthetic_score=spec.aesthetic_score,
                        **common, **ref_kw,
                    )
                else:
                    res = self.pipeline.generate(
                        spec.prompt,
                        pipelined=pipelined,
                        aesthetic_score=spec.aesthetic_score,
                        **common, **cb_kw,
                    )
            finally:
                self._apply_style(None, 0)
        return res

    def _encode_result(self, spec: GenSpec, res) -> Tuple[bytes, int]:
        png = png_encode(
            res.images[0],
            metadata={
                "parameters": (
                    f"{spec.prompt}\nSteps: {spec.num_inference_steps}, "
                    f"CFG scale: {spec.guidance_scale}, Seed: {res.seed}, "
                    f"Size: {spec.size}"
                )
            },
        )
        return png, res.seed

    def run_job(self, spec: GenSpec) -> Tuple[bytes, int]:
        return self._encode_result(spec, self._generate(spec))

    def run_job_pipelined(self, spec: GenSpec):
        """Dispatch now, finalize later (solo variant of run_jobs_pipelined):
        the legacy service overlaps request i's image d2h + PNG encode with
        request i+1's compute."""
        res = self._generate(spec, pipelined=True)

        def finalize() -> Tuple[bytes, int]:
            res.wait()
            return self._encode_result(spec, res)

        return finalize

    def run_job_with_latents(self, spec: GenSpec) -> Tuple[bytes, int, bytes]:
        res = self._generate(spec)
        png = png_encode(res.images[0])
        return png, res.seed, latents_to_fingerprint(res.latents)

    # ------------------------------------------------------------------
    def run_img2img(
        self,
        spec: GenSpec,
        image: np.ndarray,
        *,
        strength: float = 0.5,
        mask: Optional[np.ndarray] = None,
    ) -> Tuple[bytes, int]:
        """img2img / inpaint job (image dims define the output size)."""
        seed = spec.seed
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        with self._lock:
            self._apply_style(spec.style, spec.style_level)
            try:
                res = self.pipeline.img2img(
                    spec.prompt, image,
                    mask=mask,
                    strength=strength,
                    aesthetic_score=spec.aesthetic_score,
                    num_inference_steps=spec.num_inference_steps,
                    original_inference_steps=spec.original_inference_steps,
                    guidance_scale=spec.guidance_scale,
                    negative_prompt=spec.negative_prompt,
                    seed=seed,
                )
            finally:
                self._apply_style(None, 0)
        png = png_encode(
            res.images[0],
            metadata={
                "parameters": (
                    f"{spec.prompt}\nSteps: {spec.num_inference_steps}, "
                    f"CFG scale: {spec.guidance_scale}, Seed: {res.seed}, "
                    f"Strength: {strength}"
                )
            },
        )
        return png, res.seed

    # ------------------------------------------------------------------
    def batchable(self, a: GenSpec, b: GenSpec) -> bool:
        """Specs that can share one compiled call: same shape bucket,
        schedule, guidance *program*, and style.

        Guidance values and negative prompts coalesce per-row (round 4):
        the compiled program takes per-row w-embeddings ([B, 256]), per-row
        guidance ([B]) and per-row negative ids — so LCM traffic with
        different sliders shares one batch, and classic-CFG traffic with
        different negatives/scales does too. The only guidance boundary left
        is the cfg/no-cfg *program* split (g=1 through the CFG mix formula
        is not bit-equal to the cond-only program, and batching must never
        change a request's output — CLAUDE.md invariant)."""
        if not (
            a.size == b.size
            and a.num_inference_steps == b.num_inference_steps
            and a.original_inference_steps == b.original_inference_steps
            and (a.style, a.style_level) == (b.style, b.style_level)
            # progress jobs run solo: the per-request hook must see only
            # its own steps, not a coalesced batch's
            and a.progress_cb is None
            and b.progress_cb is None
            # ControlNet jobs run solo: coalescing would have to stack
            # per-request hints and share a scale — not worth the bucket
            and a.control_image is None
            and b.control_image is None
        ):
            return False
        lcm_mode = (
            self.pipeline.bundle.unet_cfg.time_cond_proj_dim is not None
        )
        if lcm_mode:
            # guidance rides the per-row w-embedding; negatives are unused
            # in LCM mode (cfg is off, ids_neg aliases ids)
            return True
        return (a.guidance_scale > 1.0) == (b.guidance_scale > 1.0)

    def run_jobs(self, specs) -> list:
        """Coalesced execution: one batched XLA call for N compatible specs.
        Returns [(png, seed), ...] in input order."""
        if len(specs) == 1:
            return [self.run_job(specs[0])]
        return self.run_jobs_pipelined(specs)()

    def run_jobs_pipelined(self, specs):
        """Dispatch a coalesced batch NOW, finalize later.

        Returns a zero-arg callable producing [(png, seed), ...]: the device
        call is issued immediately (JAX async dispatch), and the image d2h +
        PNG encode happen inside the returned finalizer — the pool overlaps
        the next batch's compute with this one's transfer/encode.

        Per-request determinism is preserved — each row's initial latents
        and step noises are sampled from that request's own seed, exactly as
        a solo run would (so batching never changes anyone's image). Style
        swaps between dispatches are safe: the in-flight computation holds
        the param buffers captured at dispatch.
        """
        if len(specs) == 1:
            spec = specs[0]
            return lambda: [self.run_job(spec)]
        first = specs[0]
        assert all(self.batchable(first, s) for s in specs[1:])
        width, height = first.dims()
        seeds = [
            s.seed if s.seed is not None else int(np.random.randint(0, 2**31 - 1))
            for s in specs
        ]
        pipe = self.pipeline
        h_lat = height // pipe.vae_scale
        w_lat = width // pipe.vae_scale
        steps = first.num_inference_steps
        lats, noises = [], []
        for seed in seeds:
            l, n = pipe._sample_noise(seed, 1, h_lat, w_lat, steps, 1.0)
            lats.append(l[0])
            noises.append(n[:, 0])
        lat0 = np.stack(lats)  # [B, h, w, c] (pre-sigma; generate rescales)
        step_noises = np.stack(noises, axis=1)  # [S, B, h, w, c]

        with self._lock:
            self._apply_style(first.style, first.style_level)
            try:
                res = pipe.generate(
                    [s.prompt for s in specs],
                    height=height, width=width,
                    num_inference_steps=steps,
                    original_inference_steps=first.original_inference_steps,
                    # per-row guidance + negatives (mixed-slider coalescing)
                    guidance_scale=[float(s.guidance_scale) for s in specs],
                    negative_prompt=[s.negative_prompt or "" for s in specs],
                    seed=seeds[0],
                    latents=lat0,
                    step_noises=step_noises,
                    pipelined=True,
                )
            finally:
                self._apply_style(None, 0)

        def finalize():
            res.wait()
            out = []
            for i, (spec, seed) in enumerate(zip(specs, seeds)):
                png = png_encode(
                    res.images[i],
                    metadata={
                        "parameters": (
                            f"{spec.prompt}\nSteps: {steps}, "
                            f"CFG scale: {spec.guidance_scale}, Seed: {seed}, "
                            f"Size: {spec.size}"
                        )
                    },
                )
                out.append((png, seed))
            return out

        return finalize

    # ------------------------------------------------------------------
    def close(self):
        self._merged_clear()
        self.pipeline = None
        self.refiner = None
        self._base_unet_params = None
        self._style_cache.clear()
