"""txt2img pipeline: one XLA program per (batch, H, W, steps) bucket.

This replaces the reference's Python-orchestrated loop
(/root/reference/backends/rknnlcm.py:450-647: per-step RKNN graph calls with
host round-trips, per-image VAE decode, numpy postprocess) with a single
jitted function: CLIP encode → ``lax.scan`` over the LCM denoise steps →
VAE decode → uint8 conversion, all on device. One host→device transfer
(latents/noise/ids) and one device→host transfer (uint8 pixels) per request.

Key idiomatic choices:
- **Weights are inputs.** The jitted program closes over configs (static)
  but takes every parameter pytree as an argument — swapping a mode's
  checkpoint or LoRA-merged weights never recompiles (BASELINE.json north
  star), because the pytree structure/shapes are identical per architecture.
- **Seed compatibility.** Latents are sampled host-side from
  ``np.random.RandomState(seed)`` in NCHW then transposed, exactly like the
  reference (rknnlcm.py:423-447), so a given seed produces the same initial
  noise; per-step renoising draws from the same stream (the reference
  delegated that to torch's global RNG — here it is seed-deterministic).
- **Static shapes.** (B, H, W, steps) define a compile bucket; the worker
  warms up its mode's default bucket at load (engine.tpu_worker).
"""

from __future__ import annotations

import dataclasses
import itertools
import logging
import os
import threading
import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .loader import PipelineBundle
from .models import clip_text, controlnet as controlnet_model, unet, vae
from .models.layers import cast_tree
from .scheduler.lcm import (
    LCMSchedule,
    guidance_scale_embedding,
    lcm_step,
    make_lcm_schedule,
    slice_schedule,
)

logger = logging.getLogger(__name__)

# SDXL LCM checkpoints keep time_cond_proj; plain SDXL uses classic CFG.
_SDXL_DEFAULT_TIME_IDS = (1024, 1024, 0, 0, 1024, 1024)


def _dedupe_stage(stage: dict):
    """Split a host staging dict into (unique-arrays dict, alias map).

    Entries that are the *same object* (e.g. ids_neg aliasing ids when CFG
    is off) transfer once; callers re-point the aliases at the staged device
    array afterwards. Alias targets get identical shardings anyway (sharding
    depends only on rank, and the axis-1 'noises' entry never aliases).
    """
    unique: dict = {}
    aliases: dict = {}
    by_id: dict = {}
    for k, v in stage.items():
        src = by_id.get(id(v))
        if src is None:
            by_id[id(v)] = k
            unique[k] = v
        else:
            aliases[k] = src
    return unique, aliases


def _cache_put(d: dict, key, value, cap: int = 64):
    """Insert with drop-oldest eviction: schedule caches are keyed on
    user-supplied floats (strength, step counts), so a long-running server
    must not grow them unboundedly (entries are small, but device-resident
    ones pin HBM)."""
    if len(d) >= cap and key not in d:
        d.pop(next(iter(d)))
    d[key] = value


def _materialize_images(x):
    """Host-materialize a finished image batch.

    Multi-controller exception: a global array sharded across PROCESSES has
    non-addressable shards — ``np.asarray`` would throw. Return the device
    array instead; the multihost router gathers it with process_allgather
    (parallel/multihost_router.py)."""
    x = jax.block_until_ready(x)
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    return x


@dataclasses.dataclass
class GenerationResult:
    """images materialize on construction (or on .wait() in pipelined mode);
    latents stay on device until first access — txt2img serving never pays
    their d2h unless the caller wants the fingerprint."""

    images: np.ndarray  # [B, H, W, 3] uint8 (jax array until wait() when pipelined)
    seed: int
    timings: Dict[str, float]
    latents_device: Any = None  # [B, h, w, 4] fp32 device array
    # scan-carry latent state after a partial segment (ensemble base →
    # refiner handoff); stays on device, never round-trips through host
    state_device: Any = None

    _latents_np: Optional[np.ndarray] = dataclasses.field(
        default=None, repr=False
    )

    @property
    def latents(self) -> np.ndarray:
        """Final denoised latents, fetched from device on first access."""
        if self._latents_np is None:
            self._latents_np = np.asarray(self.latents_device)
            self.latents_device = None
        return self._latents_np

    def wait(self) -> "GenerationResult":
        """Materialize images to host (no-op unless pipelined=True)."""
        if not isinstance(self.images, np.ndarray):
            self.images = np.asarray(jax.block_until_ready(self.images))
        return self


class LCMPipeline:
    """Serving pipeline for one loaded checkpoint.

    Args:
        bundle: loaded checkpoint (loader.load_pipeline).
        dtype: compute/param dtype for the big matmuls (bf16 on TPU).
        attention_impl: 'auto' | 'flash' | 'xla'.
    """

    def __init__(
        self,
        bundle: PipelineBundle,
        *,
        dtype=jnp.bfloat16,
        attention_impl: str = "auto",
        device=None,
        mesh=None,
        tensor_parallel: bool = False,
    ):
        if attention_impl != "auto":
            # thread the override into the static model configs — they are
            # part of every traced program, so 'flash'/'xla' actually bind
            bundle = dataclasses.replace(
                bundle,
                unet_cfg=dataclasses.replace(
                    bundle.unet_cfg, attention_impl=attention_impl
                ),
                vae_cfg=dataclasses.replace(
                    bundle.vae_cfg, attention_impl=attention_impl
                ),
            )
        self.bundle = bundle
        self.arch = bundle.arch
        self.dtype = dtype
        self.attention_impl = attention_impl
        self.mesh = mesh
        self.device = device or jax.devices()[0]

        if mesh is not None:
            from .parallel.sharding import (
                replicated,
                unet_tp_shardings,
                shard_params,
            )

            rep = replicated(mesh)
            put = lambda tree: jax.device_put(cast_tree(tree, dtype), rep)
            unet_put = (
                (lambda tree: shard_params(
                    cast_tree(tree, dtype),
                    unet_tp_shardings(tree, mesh),
                ))
                if tensor_parallel
                else put
            )
        else:
            put = lambda tree: jax.device_put(cast_tree(tree, dtype), self.device)
            unet_put = put
        # pack q/k/v (self) and k/v (cross) projections into single stacked
        # weights at placement time: one MXU matmul per attention site instead
        # of three/two — the loaders and init keep the diffusers-shaped layout
        from .models.unet import pack_attention_params

        self.text_params = put(bundle.text_params)
        self.unet_params = unet_put(pack_attention_params(bundle.unet_params))
        self.vae_params = put(bundle.vae_params)
        self.text_params_2 = (
            put(bundle.text_params_2) if bundle.text_params_2 else None
        )
        self.vae_encoder_params = (
            put(bundle.vae_encoder_params) if bundle.vae_encoder_params else None
        )
        self._compiled: Dict[Tuple, Any] = {}
        self._schedules: Dict[Tuple[int, Optional[int]], LCMSchedule] = {}
        # device-resident schedule pytrees (request-independent per bucket;
        # caching them skips several per-request tunnel round trips)
        self._dev_schedules: Dict[Tuple, Any] = {}
        # per-step progress callbacks: the traced program carries only an
        # int32 token; the host-side registry maps it to the live callable,
        # so one compiled progress bucket serves every callback
        self._progress_registry: Dict[int, Tuple[Callable, int, dict]] = {}
        self._progress_tokens = itertools.count(1)
        self._progress_lock = threading.Lock()
        self.vae_scale = bundle.vae_cfg.scale_factor
        self.latent_channels = bundle.vae_cfg.latent_channels
        # spatially-chunked VAE decode for HBM-bound sizes (diffusers
        # vae.enable_tiling analogue — cuda_worker.py:91,391). Latent
        # extents ABOVE the threshold decode via vae.decode_tiled, bounding
        # peak decoder activations by the tile instead of the frame.
        # DREAMLAB_VAE_CHUNK: "off"/"0" disables, an int sets the latent
        # threshold, "auto" (default) = 160 (SDXL 1024² = 128 stays
        # full-frame; anything larger chunks). Read once at init — the
        # chunk decision is a deterministic function of (h, w), so compile
        # buckets need no extra key.
        chunk_env = os.environ.get("DREAMLAB_VAE_CHUNK", "auto")
        if chunk_env.lower() in ("0", "off", "false", "no"):
            self._vae_chunk: Optional[int] = None
        else:
            self._vae_chunk = 160 if chunk_env == "auto" else int(chunk_env)
        self._vae_tile = int(os.environ.get("DREAMLAB_VAE_TILE", "64"))
        # optional ControlNet (set_controlnet) — weights are jit arguments,
        # so swapping canny/depth/pose nets never recompiles
        self.controlnet_params = None
        self.controlnet_cfg = None

    def set_controlnet(self, params, cfg) -> None:
        """Attach a ControlNet (models.controlnet layout + UNetConfig).

        Pass ``params=None`` to detach. Generation requests opt in per call
        via ``generate(control_image=...)`` — the no-hint program is a
        separate compile bucket, so plain traffic never pays for the trunk.
        """
        if params is None:
            self.controlnet_params = None
            self.controlnet_cfg = None
            return
        # validate the net against the *pipeline's* UNet before accepting it:
        # residual taps must match the UNet's skip connections one-for-one
        # (load_controlnet only checks the ControlNet's self-consistency)
        ucfg = self.bundle.unet_cfg
        n_skips = 1 + ucfg.num_blocks * ucfg.layers_per_block + (ucfg.num_blocks - 1)
        taps = params.get("zero_down", ())
        if len(taps) != n_skips:
            raise ValueError(
                f"ControlNet has {len(taps)} down taps but this UNet has "
                f"{n_skips} skip connections — architecture mismatch"
            )
        c0 = taps[0]["w"].shape[-1]
        if c0 != ucfg.block_out_channels[0]:
            raise ValueError(
                f"ControlNet tap channels ({c0}) != UNet "
                f"block_out_channels[0] ({ucfg.block_out_channels[0]})"
            )
        if cfg.cross_attention_dim != ucfg.cross_attention_dim:
            raise ValueError(
                f"ControlNet cross_attention_dim {cfg.cross_attention_dim} "
                f"!= UNet {ucfg.cross_attention_dim}"
            )
        from .models.unet import pack_attention_params

        params = pack_attention_params(params)
        if self.mesh is not None:
            from .parallel.sharding import replicated

            self.controlnet_params = jax.device_put(
                cast_tree(params, self.dtype), replicated(self.mesh)
            )
        else:
            self.controlnet_params = jax.device_put(
                cast_tree(params, self.dtype), self.device
            )
        self.controlnet_cfg = cfg

    # ------------------------------------------------------------------
    # host-side preparation
    # ------------------------------------------------------------------

    def _micro_cond_ids(self) -> int:
        """SDXL micro-conditioning id count, derived from the UNet config
        (pcei = pooled_dim + n_ids x add_dim): 6 for base models (orig wh,
        crop, target wh), 5 for the refiner (orig wh, crop, aesthetic)."""
        cfg = self.bundle.unet_cfg
        pooled_dim = (
            self.bundle.text_cfg_2.projection_dim
            if self.bundle.text_cfg_2 is not None
            else (self.bundle.text_cfg.projection_dim or 0)
        ) or 0
        if cfg.projection_class_embeddings_input_dim and cfg.addition_time_embed_dim:
            return (
                cfg.projection_class_embeddings_input_dim - pooled_dim
            ) // cfg.addition_time_embed_dim
        return 6

    def _time_ids(self, height: int, width: int, bsz: int,
                  aesthetic_score: float = 6.0,
                  negative_aesthetic_score: float = 2.5,
                  cfg_mode: str = "none"):
        """SDXL micro-conditioning ids.

        Shape [B, n] normally; [2, B, n] for CFG buckets, where row 0 is the
        uncond branch — for refiners (n=5) it carries the negative aesthetic
        score (diffusers' requires_aesthetics_score convention)."""
        n_ids = self._micro_cond_ids()
        if n_ids == 5:
            cond = [height, width, 0, 0, aesthetic_score]
            uncond = [height, width, 0, 0, negative_aesthetic_score]
        else:
            cond = [height, width, 0, 0, height, width]
            uncond = cond
        if cfg_mode == "cfg":
            return np.asarray(
                [[uncond] * bsz, [cond] * bsz], np.float32
            )
        return np.asarray([cond] * bsz, np.float32)

    def _schedule(
        self, steps: int, original_steps: Optional[int], strength: float = 1.0
    ) -> LCMSchedule:
        key = (steps, original_steps, strength)
        if key not in self._schedules:
            _cache_put(self._schedules, key, make_lcm_schedule(
                self.bundle.scheduler_cfg, steps, original_steps, strength
            ))
        return self._schedules[key]

    def _sample_noise(
        self, seed: int, batch: int, h_lat: int, w_lat: int, steps: int,
        init_noise_sigma: float,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host-side NCHW sampling for reference seed compatibility."""
        rs = np.random.RandomState(seed & 0x7FFFFFFF)
        c = self.latent_channels
        lat = rs.randn(batch, c, h_lat, w_lat).astype(np.float32)
        lat = lat.transpose(0, 2, 3, 1) * init_noise_sigma
        noises = rs.randn(steps, batch, c, h_lat, w_lat).astype(np.float32)
        noises = noises.transpose(0, 1, 3, 4, 2)
        return np.ascontiguousarray(lat), np.ascontiguousarray(noises)

    # ------------------------------------------------------------------
    # input staging
    # ------------------------------------------------------------------

    def _put_inputs(self, stage: Dict[str, Any], bsz: int, *,
                    axes: Optional[Dict[str, int]] = None):
        """Mesh-aware h2d staging for one grouped request upload.

        With a mesh, batch-carrying inputs shard over the data axis only
        when the batch divides it; otherwise they replicate (correct, no DP
        speedup) — serving deployments set DREAMLAB_MAX_BATCH to a mesh
        multiple for the fast path. ``axes`` overrides the batch dimension
        per key (step noises carry batch on axis 1)."""
        if self.mesh is None:
            return jax.device_put(stage, self.device)
        from .parallel.sharding import data_sharding, replicated

        rep = replicated(self.mesh)
        n_data = self.mesh.shape.get("data", 1)
        shard_batch = bsz % n_data == 0
        sh = lambda x, axis: (
            data_sharding(self.mesh, np.ndim(x), axis)
            if (np.ndim(x) and shard_batch) else rep
        )
        shardings = {
            k: sh(v, (axes or {}).get(k, 0)) for k, v in stage.items()
        }
        return jax.device_put(stage, shardings)

    def _put_replicated(self, x):
        """Stage a request-independent pytree (schedules) on device."""
        if self.mesh is None:
            return jax.device_put(x, self.device)
        from .parallel.sharding import replicated

        return jax.device_put(x, replicated(self.mesh))

    # ------------------------------------------------------------------
    # per-step progress (reference callback contract, rknnlcm.py:464-604)
    # ------------------------------------------------------------------

    def _progress_emit(self, token, step, timestep, latents=None):
        """Host-side trampoline invoked by jax.debug.callback from inside the
        denoise scan. Looks the live callback up by token so the compiled
        program is callback-agnostic. Mirrors the reference's
        ``callback(step, timestep, latents)`` with latents in NCHW
        (rknnlcm.py:601-604); filtering by callback_steps happens here
        (``i % callback_steps == 0``, same rule)."""
        step = int(step)
        with self._progress_lock:
            entry = self._progress_registry.get(int(token))
            if entry is None:
                return
            cb, every, state = entry
            if step % every != 0:
                return
            # ordered=False debug callbacks may deliver steps out of order
            # AND concurrently; the stream contract is strictly-increasing
            # steps (clients may render latent previews — a late frame
            # would flash backwards), so late/duplicate steps are dropped
            # and cb itself is invoked UNDER the lock — gating outside it
            # would let a gated-in earlier step overtake a later one
            # between the gate and the call
            if step <= state["last"]:
                return
            state["last"] = step
            try:
                lat = None
                if latents is not None:
                    lat = np.asarray(latents).transpose(0, 3, 1, 2)
                cb(step, int(timestep), lat)
            except Exception:
                # a broken callback must never kill the device loop
                logger.exception("progress callback failed at step %d", step)

    # ------------------------------------------------------------------
    # traced program
    # ------------------------------------------------------------------

    def _build(self, batch: int, h_lat: int, w_lat: int, steps: int, cfg_mode: str,
               rng_mode: str, task: str = "txt2img", progress: str = "none",
               ctrl: bool = False):
        """Trace + jit the full txt2img program for one shape bucket.

        cfg_mode: 'wcond' (LCM guidance embedding) or 'cfg' (classifier-free
        guidance with doubled batch) or 'none'.
        rng_mode: 'host' — initial/step noise sampled on host from
        np.random.RandomState (bit-compatible with the reference's latents,
        rknnlcm.py:423-447) and shipped to the device; 'device' — noise
        generated inside the program from the seed (saves the h2d transfer;
        deterministic per seed on a given backend). The seed/noise are
        *arguments*, so neither mode recompiles across requests.
        """
        b = self.bundle
        text_cfg, unet_cfg, vae_cfg = b.text_cfg, b.unet_cfg, b.vae_cfg
        is_xl = self.arch == "sdxl"
        text_cfg_2 = b.text_cfg_2
        lat_c = self.latent_channels

        def encode(text_params, text_params_2, ids, ids_2):
            if not is_xl:
                seq, _ = clip_text.encode_text(text_params, ids, text_cfg)
                return seq, None
            if text_params_2 is None:
                # SDXL-refiner: single bigG tower — its sequence IS the
                # 1280-wide context and its projected pooled output feeds
                # the micro-conditioning
                seq, pooled = clip_text.encode_text(text_params, ids, text_cfg)
                return seq, pooled
            seq1, _ = clip_text.encode_text(text_params, ids, text_cfg)
            seq2, pooled = clip_text.encode_text(text_params_2, ids_2, text_cfg_2)
            return jnp.concatenate([seq1, seq2], axis=-1), pooled

        cn_cfg = self.controlnet_cfg

        def denoise_decode(
            unet_params, vae_params, ctx, pooled, ctx_neg, pooled_neg,
            latents0, noises, schedule: LCMSchedule, w_emb, guidance, time_ids,
            inpaint=None, progress_token=None, control=None,
        ):
            """inpaint: optional (known_x0, mask_lat, noises_known) — legacy
            inpainting blends the known region back at each step, renoised
            to the upcoming timestep (mask 1 = regenerate).
            control: optional (cn_params, cond_emb, scale) — cond_emb is the
            hint embedding precomputed OUTSIDE the scan (latent-independent),
            already batch-doubled for cfg buckets."""

            added_kw = {}
            if is_xl:
                added_kw = dict(added_text_embeds=pooled, added_time_ids=time_ids)

            def ctrl_kw(lat_, t_, ctx_, tc, add_kw):
                """ControlNet residual taps for one UNet invocation."""
                if control is None:
                    return {}
                cn_params, cond_emb, scale = control
                kw = {}
                if cn_cfg.time_cond_proj_dim is not None and tc is not None:
                    kw["timestep_cond"] = tc
                if cn_cfg.addition_embed_type == "text_time":
                    kw.update(add_kw)
                down_r, mid_r = controlnet_model.forward(
                    cn_params, cn_cfg, lat_, t_, ctx_, cond_emb,
                    conditioning_scale=scale, **kw,
                )
                return {"down_residuals": down_r, "mid_residual": mid_r}

            def unet_step(lat, i):
                t = jnp.full((batch,), schedule.timesteps[i], jnp.int32)
                if cfg_mode == "wcond":
                    return unet.forward(
                        unet_params, unet_cfg, lat, t, ctx,
                        timestep_cond=w_emb, **added_kw,
                        **ctrl_kw(lat, t, ctx, w_emb, added_kw),
                    )
                if cfg_mode == "cfg":
                    # batch-doubled classifier-free guidance
                    lat2 = jnp.concatenate([lat, lat], axis=0)
                    t2 = jnp.concatenate([t, t], axis=0)
                    ctx2 = jnp.concatenate([ctx_neg, ctx], axis=0)
                    kw = {}
                    if is_xl:
                        # time_ids is [2, B, n] in cfg buckets: row 0 uncond
                        # (negative aesthetic for refiners), row 1 cond
                        kw = dict(
                            added_text_embeds=jnp.concatenate(
                                [pooled_neg, pooled], axis=0
                            ),
                            added_time_ids=jnp.concatenate(
                                [time_ids[0], time_ids[1]], axis=0
                            ),
                        )
                    out = unet.forward(
                        unet_params, unet_cfg, lat2, t2, ctx2, **kw,
                        **ctrl_kw(lat2, t2, ctx2, None, kw),
                    )
                    uncond, cond = jnp.split(out, 2, axis=0)
                    # guidance is per-row [B] (mixed-guidance coalescing)
                    g = guidance.reshape(-1, 1, 1, 1).astype(cond.dtype)
                    return uncond + g * (cond - uncond)
                return unet.forward(
                    unet_params, unet_cfg, lat, t, ctx, **added_kw,
                    **ctrl_kw(lat, t, ctx, None, added_kw),
                )

            def body(carry, inp):
                i, lat = carry
                noise_pred = unet_step(lat, i)
                lat, denoised = lcm_step(
                    schedule, i, noise_pred, lat, inp,
                    prediction_type=b.scheduler_cfg.prediction_type,
                )
                if inpaint is not None:
                    known_x0, mask, noises_known = inpaint
                    known_next = (
                        schedule.sqrt_alpha_prod_prev[i] * known_x0
                        + schedule.sqrt_beta_prod_prev[i] * noises_known[i]
                    )
                    lat = mask * lat + (1.0 - mask) * known_next
                if progress == "latents":
                    jax.debug.callback(
                        self._progress_emit, progress_token, i,
                        schedule.timesteps[i], lat, ordered=False,
                    )
                elif progress == "steps":
                    # progress-only: no per-step latent d2h baked into the
                    # program — streaming progress stays ~free
                    jax.debug.callback(
                        self._progress_emit, progress_token, i,
                        schedule.timesteps[i], ordered=False,
                    )
                return (i + 1, lat), denoised

            (_, lat_final), denoised_seq = jax.lax.scan(
                body, (jnp.int32(0), latents0), noises
            )
            denoised = denoised_seq[-1]
            if task == "latent":
                # ensemble base segment: hand the scan carry (the renoised
                # state entering the next segment) to the refiner — no VAE,
                # no d2h; the latent stays on device across the handoff
                return lat_final, denoised
            if inpaint is not None:
                known_x0, mask, _ = inpaint
                denoised = mask * denoised + (1.0 - mask) * known_x0

            if (
                self._vae_chunk is not None
                and max(h_lat, w_lat) > self._vae_chunk
            ):
                img = vae.decode_tiled(
                    vae_params, vae_cfg, denoised / vae_cfg.scaling_factor,
                    tile=self._vae_tile, overlap=max(self._vae_tile // 4, 1),
                )
            else:
                img = vae.decode(
                    vae_params, vae_cfg, denoised / vae_cfg.scaling_factor
                )
            img = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
            img_u8 = jnp.round(img * 255.0).astype(jnp.uint8)
            return img_u8, denoised

        def encode_both(text_params, text_params_2, ids, ids_neg, ids_2, ids_2_neg):
            ctx, pooled = encode(text_params, text_params_2, ids, ids_2)
            ctx_neg = pooled_neg = None
            if cfg_mode == "cfg":
                ctx_neg, pooled_neg = encode(
                    text_params, text_params_2, ids_neg, ids_2_neg
                )
            return ctx, pooled, ctx_neg, pooled_neg

        if task in ("img2img", "inpaint"):

            def encode_x0(vae_enc_params, image, eps_post):
                moments = vae.encode_moments(vae_enc_params, vae_cfg, image)
                mean = moments[..., :lat_c]
                logvar = jnp.clip(moments[..., lat_c:], -30.0, 20.0)
                return (mean + jnp.exp(0.5 * logvar) * eps_post) * vae_cfg.scaling_factor

            if task == "inpaint":

                def program_inp(
                    text_params, text_params_2, unet_params, vae_params,
                    vae_enc_params,
                    ids, ids_neg, ids_2, ids_2_neg,
                    image, mask_lat, eps_post, noise0, noises, noises_known,
                    schedule: LCMSchedule, w_emb, guidance, time_ids,
                ):
                    ctx, pooled, ctx_neg, pooled_neg = encode_both(
                        text_params, text_params_2, ids, ids_neg, ids_2, ids_2_neg
                    )
                    x0 = encode_x0(vae_enc_params, image, eps_post)
                    lat0 = (
                        schedule.sqrt_alpha_prod[0] * x0
                        + schedule.sqrt_beta_prod[0] * noise0
                    )
                    return denoise_decode(
                        unet_params, vae_params, ctx, pooled, ctx_neg,
                        pooled_neg, lat0, noises, schedule, w_emb, guidance,
                        time_ids, inpaint=(x0, mask_lat, noises_known),
                    )

                # donate exactly one [B,h,w,4] f32 input — it aliases the
                # denoised output; step-noise stacks have no matching output
                # buffer and donating them only triggers XLA warnings
                return jax.jit(program_inp, donate_argnums=(12,))

            def program_i2i(
                text_params, text_params_2, unet_params, vae_params,
                vae_enc_params,
                ids, ids_neg, ids_2, ids_2_neg,
                image, eps_post, noise0, noises,
                schedule: LCMSchedule, w_emb, guidance, time_ids,
            ):
                ctx, pooled, ctx_neg, pooled_neg = encode_both(
                    text_params, text_params_2, ids, ids_neg, ids_2, ids_2_neg
                )
                x0 = encode_x0(vae_enc_params, image, eps_post)
                # renoise to the strength-truncated ladder's first timestep
                lat0 = (
                    schedule.sqrt_alpha_prod[0] * x0
                    + schedule.sqrt_beta_prod[0] * noise0
                )
                return denoise_decode(
                    unet_params, vae_params, ctx, pooled, ctx_neg, pooled_neg,
                    lat0, noises, schedule, w_emb, guidance, time_ids,
                )

            return jax.jit(program_i2i, donate_argnums=(11,))

        def program(
            text_params, text_params_2, unet_params, vae_params,
            ids, ids_neg, ids_2, ids_2_neg,
            latents0, noises, schedule: LCMSchedule, w_emb, guidance, time_ids,
            progress_token=None, cn_params=None, hint=None, ctrl_scale=None,
        ):
            if rng_mode == "device":
                # latents0 is the scalar seed; noises the init sigma
                key = jax.random.PRNGKey(latents0.astype(jnp.uint32))
                lat_key, step_key = jax.random.split(key)
                init_sigma = noises
                latents0 = (
                    jax.random.normal(
                        lat_key, (batch, h_lat, w_lat, lat_c), jnp.float32
                    ) * init_sigma
                )
                noises = jax.random.normal(
                    step_key, (steps, batch, h_lat, w_lat, lat_c), jnp.float32
                )
            ctx, pooled, ctx_neg, pooled_neg = encode_both(
                text_params, text_params_2, ids, ids_neg, ids_2, ids_2_neg
            )
            control = None
            if ctrl:
                # hint embedding is latent-independent: computed once here,
                # outside the scan — only the trunk runs per step
                cond_emb = controlnet_model.embed_cond(
                    cn_params["cond_embedding"], hint
                )
                if cfg_mode == "cfg":
                    cond_emb = jnp.concatenate([cond_emb, cond_emb], axis=0)
                control = (cn_params, cond_emb, ctrl_scale)
            return denoise_decode(
                unet_params, vae_params, ctx, pooled, ctx_neg, pooled_neg,
                latents0, noises, schedule, w_emb, guidance, time_ids,
                progress_token=progress_token, control=control,
            )

        donate = (8,) if rng_mode == "host" else ()
        return jax.jit(program, donate_argnums=donate)

    def _get_compiled(self, batch, h_lat, w_lat, steps, cfg_mode,
                      rng_mode="host", task="txt2img", progress="none",
                      ctrl=False):
        # _build closes over controlnet_cfg at trace time, so the cfg (a
        # frozen, hashable dataclass) must be part of the bucket key —
        # otherwise swapping in a structurally different ControlNet
        # (time_cond_proj / addition_embed differences) would silently
        # reuse a program traced for the old one
        cn_key = self.controlnet_cfg if ctrl else None
        key = (batch, h_lat, w_lat, steps, cfg_mode, rng_mode, task, progress,
               ctrl, cn_key)
        if key not in self._compiled:
            self._compiled[key] = self._build(
                batch, h_lat, w_lat, steps, cfg_mode, rng_mode, task, progress,
                ctrl,
            )
        return self._compiled[key]

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def warmup(self, height: int, width: int, steps: int = 4, batch: int = 1):
        """Ahead-of-time compile for a bucket (mode-switch budget management;
        see SURVEY.md §7.3 recompilation management)."""
        t0 = time.time()
        self.generate("warmup", height=height, width=width,
                      num_inference_steps=steps, seed=0, batch=batch)
        logger.info(
            "warmup %dx%dx%d steps=%d in %.1fs",
            batch, height, width, steps, time.time() - t0,
        )

    def generate(
        self,
        prompt,
        *,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 4,
        original_inference_steps: Optional[int] = None,
        guidance_scale: float = 1.0,
        negative_prompt: Optional[Any] = None,
        seed: Optional[int] = None,
        batch: Optional[int] = None,
        latents: Optional[np.ndarray] = None,
        step_noises: Optional[np.ndarray] = None,
        rng: Optional[str] = None,
        pipelined: bool = False,
        aesthetic_score: float = 6.0,
        callback: Optional[Callable] = None,
        callback_steps: int = 1,
        callback_latents: bool = True,
        control_image: Optional[np.ndarray] = None,
        controlnet_scale: float = 1.0,
        segment: Optional[Tuple[int, int]] = None,
        latents_state: Optional[Any] = None,
        prefetch: bool = True,
    ) -> GenerationResult:
        """Generate images. Returns uint8 [B, H, W, 3] + final latents.

        Guidance semantics follow the reference: for LCM checkpoints
        (time_cond_proj_dim set) guidance conditions via the w-embedding and
        CFG is disabled (rknnlcm.py:526-528); otherwise classic CFG applies
        when guidance_scale > 1.

        callback/callback_steps mirror the reference pipeline's per-step
        hook (rknnlcm.py:464-604): ``callback(step, timestep, latents)``
        fires every ``callback_steps`` steps from inside the denoise scan
        (via jax.debug.callback — the scan itself stays one XLA program).
        ``callback_latents=False`` omits the per-step latent device→host
        transfer and passes ``latents=None`` — the cheap form streaming
        progress endpoints use. Progress requests compile their own bucket,
        so callback-free serving traffic never pays for the hook.

        control_image: optional [H, W, 3] (or [B, H, W, 3]) hint image at
        the output size — uint8 or float in [0, 1] (the reference's
        prepare_controlnet_cond contract, rknnlcm.py:693-697). Requires a
        ControlNet attached via ``set_controlnet``; ``controlnet_scale``
        scales the residual taps (diffusers conditioning_scale semantics).

        segment: run only steps [start, stop) of the num_inference_steps
        ladder — the diffusers denoising_end/denoising_start ensemble
        contract (SDXL base → refiner handoff). A segment ending before the
        ladder's end returns the scan-carry latent state in
        ``result.state_device`` (no VAE decode, no d2h); a segment starting
        after 0 requires ``latents_state`` (the previous segment's
        ``state_device`` — a device array; it is donated to the program).
        Step noises for the segment come from the same seed stream a full
        run would use, so base[:k] + refiner[k:] traverse the exact ladder
        a single S-step run on one model would.
        """
        # latents must survive every UNet downsample without odd dims
        divisor = self.vae_scale * 2 ** (self.bundle.unet_cfg.num_blocks - 1)
        if height % divisor or width % divisor:
            raise ValueError(
                f"height/width must be multiples of {divisor} "
                f"(got {width}x{height})"
            )
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        if batch is not None and len(prompts) == 1:
            prompts = prompts * batch
        bsz = len(prompts)
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))

        t_start = time.time()
        b = self.bundle
        is_xl = self.arch == "sdxl"
        lcm_mode = b.unet_cfg.time_cond_proj_dim is not None
        # guidance_scale may be per-row (request coalescing: LCM guidance is
        # a per-row w-embedding; classic CFG mixes per-row) — a scalar
        # broadcasts, a sequence must match the batch
        gs_arr = np.asarray(guidance_scale, np.float32).reshape(-1)
        if gs_arr.size == 1:
            gs_arr = np.full((bsz,), float(gs_arr[0]), np.float32)
        elif gs_arr.size != bsz:
            raise ValueError(
                f"guidance_scale has {gs_arr.size} entries for batch {bsz}"
            )
        if lcm_mode:
            cfg_mode = "wcond"
        elif float(gs_arr.max()) > 1.0:
            cfg_mode = "cfg"
        else:
            cfg_mode = "none"

        # tokenize on host; device staging happens in ONE grouped transfer
        # below (through a remote tunnel every transfer pays a fixed ~30 ms
        # round trip regardless of size — scripts/latency_probe.py)
        ids = b.tokenizer(prompts)
        neg = negative_prompt
        negs = (
            [""] * bsz if neg is None
            else ([neg] * bsz if isinstance(neg, str) else list(neg))
        )
        if len(negs) != bsz:
            raise ValueError(
                f"negative_prompt has {len(negs)} entries for batch {bsz}"
            )
        ids_neg = b.tokenizer(negs) if cfg_mode == "cfg" else ids
        if is_xl and b.tokenizer_2 is not None:
            ids_2 = b.tokenizer_2(prompts)
            ids_2_neg = (
                b.tokenizer_2(negs) if cfg_mode == "cfg" else ids_2
            )
        else:
            ids_2 = ids_2_neg = ids

        seg_start, seg_stop = segment or (0, num_inference_steps)
        if segment is not None:
            if not 0 <= seg_start < seg_stop <= num_inference_steps:
                raise ValueError(
                    f"segment {segment} out of range for "
                    f"{num_inference_steps} steps"
                )
            if (seg_start > 0) != (latents_state is not None):
                raise ValueError(
                    "segments starting after 0 require latents_state (and "
                    "only they may pass one)"
                )
            if latents is not None or step_noises is not None:
                raise ValueError(
                    "segment is incompatible with explicit latents/step_noises"
                )
        scan_steps = seg_stop - seg_start
        task = "latent" if seg_stop < num_inference_steps else "txt2img"

        schedule = self._schedule(num_inference_steps, original_inference_steps)
        if segment is not None:
            schedule = slice_schedule(schedule, seg_start, seg_stop)
        h_lat, w_lat = height // self.vae_scale, width // self.vae_scale
        rng_mode = rng or os.environ.get("DREAMLAB_RNG", "host")
        if latents is not None or step_noises is not None or segment is not None:
            rng_mode = "host"  # explicit noise / segments force the host path
        if rng_mode == "host":
            lat0, noises = self._sample_noise(
                seed, bsz, h_lat, w_lat, num_inference_steps,
                schedule.init_noise_sigma,
            )
            # segment noise comes from the same stream a full run draws
            noises = noises[seg_start:seg_stop]
            if latents_state is not None:
                lat0 = latents_state  # device fp32 carry from the previous segment
                if tuple(lat0.shape) != (bsz, h_lat, w_lat, self.latent_channels):
                    raise ValueError(
                        f"unexpected latents_state shape {lat0.shape}"
                    )
            if latents is not None:
                # provided latents are raw noise; scale by init sigma exactly
                # as the reference does (rknnlcm.py:444-447)
                lat0 = np.asarray(latents, np.float32) * schedule.init_noise_sigma
                if lat0.shape != (bsz, h_lat, w_lat, self.latent_channels):
                    raise ValueError(f"unexpected latents shape {lat0.shape}")
            if step_noises is not None:
                # explicit per-row step noise: keeps each batched request's
                # trajectory identical to its solo run (request coalescing)
                noises = np.asarray(step_noises, np.float32)
                want = (num_inference_steps, bsz, h_lat, w_lat,
                        self.latent_channels)
                if noises.shape != want:
                    raise ValueError(
                        f"unexpected step_noises shape {noises.shape}; want {want}"
                    )
        else:
            # device RNG: the program takes (seed, init_sigma) in the noise
            # argument slots — no noise h2d at all
            lat0 = np.int64(seed & 0x7FFFFFFF)
            noises = np.float32(schedule.init_noise_sigma)

        if lcm_mode:
            w_emb = np.asarray(guidance_scale_embedding(
                gs_arr - 1.0, b.unet_cfg.time_cond_proj_dim
            ))
        else:
            w_emb = np.zeros((bsz, 1), np.float32)

        time_ids = self._time_ids(height, width, bsz, aesthetic_score,
                                  cfg_mode=cfg_mode)

        hint = None
        if control_image is not None:
            if self.controlnet_params is None:
                raise ValueError(
                    "control_image given but no ControlNet is attached "
                    "(set_controlnet)"
                )
            hint = np.asarray(control_image)
            if hint.ndim == 3:
                hint = hint[None]
            if np.issubdtype(hint.dtype, np.integer):
                # the reference's hint preprocessing contract:
                # HWC/255.0 (rknnlcm.py:693-697) — resizing happens upstream.
                # Any integer dtype is treated as 0-255 pixels; floats are
                # already on the documented [0, 1] contract.
                hint = hint.astype(np.float32) / 255.0
            if hint.shape[1:3] != (height, width):
                raise ValueError(
                    f"control_image dims {hint.shape[1:3]} != output "
                    f"{(height, width)} — resize the hint to the output size"
                )
            if hint.shape[0] == 1 and bsz > 1:
                hint = np.broadcast_to(hint, (bsz,) + hint.shape[1:])
            hint = np.ascontiguousarray(hint, np.float32)
        t_prep = time.time()

        # ---- device staging: ONE grouped device_put for every per-request
        # tensor (the tunnel charges a fixed per-transfer round trip, so
        # grouped staging is ~35% cheaper than per-array jnp.asarray —
        # scripts/latency_probe2.py), plus a device-resident cache for the
        # request-independent schedule pytree.
        stage = {
            "ids": ids, "ids_neg": ids_neg,
            "ids_2": ids_2, "ids_2_neg": ids_2_neg,
            "lat0": lat0, "noises": noises, "w_emb": w_emb,
            "gs": np.ascontiguousarray(gs_arr), "time_ids": time_ids,
        }
        if hint is not None:
            stage["hint"] = hint
            stage["ctrl_scale"] = np.float32(controlnet_scale)
        # cfg-off (and SD1.5) requests alias ids_neg/ids_2/ids_2_neg to the
        # same array as ids — upload each distinct buffer once and re-alias
        # the device array, instead of paying the tunnel for 4 copies
        stage, aliases = _dedupe_stage(stage)
        sched_key = (num_inference_steps, original_inference_steps,
                     seg_start, seg_stop)
        schedule_dev = self._dev_schedules.get(sched_key)
        stage = self._put_inputs(stage, bsz, axes={"noises": 1})
        if schedule_dev is None:
            schedule_dev = self._put_replicated(schedule)
            _cache_put(self._dev_schedules, sched_key, schedule_dev)
        for k_alias, k_src in aliases.items():
            stage[k_alias] = stage[k_src]
        ids, ids_neg = stage["ids"], stage["ids_neg"]
        ids_2, ids_2_neg = stage["ids_2"], stage["ids_2_neg"]
        lat0, noises, w_emb = stage["lat0"], stage["noises"], stage["w_emb"]
        time_ids = stage["time_ids"]
        hint = stage.get("hint")
        schedule = schedule_dev

        progress_mode = "none"
        token = 0
        if callback is not None:
            progress_mode = "latents" if callback_latents else "steps"
            pipelined = False  # callbacks imply synchronous completion
            token = next(self._progress_tokens)
            with self._progress_lock:
                self._progress_registry[token] = (
                    callback, max(1, callback_steps), {"last": -1},
                )

        fn = self._get_compiled(
            bsz, h_lat, w_lat, scan_steps, cfg_mode, rng_mode,
            task=task, progress=progress_mode, ctrl=hint is not None,
        )
        try:
            args = [
                self.text_params, self.text_params_2, self.unet_params,
                self.vae_params,
                ids, ids_neg, ids_2, ids_2_neg,
                lat0, noises, schedule, w_emb,
                stage["gs"], time_ids,
            ]
            kw = {}
            if progress_mode != "none":
                kw["progress_token"] = jnp.int32(token)
            if hint is not None:
                kw.update(
                    cn_params=self.controlnet_params, hint=hint,
                    ctrl_scale=stage["ctrl_scale"],
                )
            out_main, denoised = fn(*args, **kw)
            if task == "latent":
                # ensemble base segment: out_main is the fp32 scan carry —
                # leave it on device for the refiner segment
                images = None
            else:
                # enqueue the image d2h NOW, while compute is still running:
                # the transfer starts the moment the program retires instead
                # of after a host "is it done?" round trip (~25 ms saved
                # through the tunnel — scripts/latency_probe2.py).
                # prefetch=False skips the eager copy for callers that may
                # never read the pixels (bench compute-only measurement,
                # speculative pipelined dispatches) — through a slow link
                # the unwanted transfers would throttle the whole queue.
                if prefetch and getattr(out_main, "is_fully_addressable", True):
                    try:
                        out_main.copy_to_host_async()
                    except AttributeError:
                        pass  # non-jax array (tests stub the program)
                # pipelined: return the in-flight device arrays — the caller
                # overlaps the next request's dispatch/compute with this
                # one's d2h (wait())
                images = (
                    out_main if pipelined else _materialize_images(out_main)
                )
        finally:
            if progress_mode != "none":
                jax.effects_barrier()  # flush pending debug callbacks
                with self._progress_lock:
                    self._progress_registry.pop(token, None)
        t_done = time.time()

        return GenerationResult(
            images=images,
            seed=seed,
            latents_device=denoised,
            state_device=out_main if task == "latent" else None,
            timings={
                "prep": t_prep - t_start,
                "device": t_done - t_prep,
                "total": t_done - t_start,
            },
        )

    def profile_stages(
        self, *, height: int = 512, width: int = 512, steps: int = 4,
        batch: int = 1, iters: int = 5,
    ) -> Dict[str, float]:
        """Per-stage wall-clock breakdown (ms): the reference's built-in
        profiler contract (prompt-encode / per-step UNet / VAE decode,
        rknnlcm.py:546-642), measured as separately-jitted stages. The
        production path fuses all stages into one program — this exists for
        diagnosis, not serving.
        """
        b = self.bundle
        rs = np.random.RandomState(0)
        h_lat, w_lat = height // self.vae_scale, width // self.vae_scale
        ids = jnp.asarray(b.tokenizer(["profile"] * batch))
        lat = jnp.asarray(
            rs.randn(batch, h_lat, w_lat, self.latent_channels), jnp.float32
        )
        ctx_dim = b.unet_cfg.cross_attention_dim
        ctx = jnp.asarray(rs.randn(batch, 77, ctx_dim), jnp.float32)
        t = jnp.full((batch,), 999, jnp.int32)
        kw = {}
        if b.unet_cfg.time_cond_proj_dim:
            kw["timestep_cond"] = jnp.zeros(
                (batch, b.unet_cfg.time_cond_proj_dim), jnp.float32
            )
        if b.unet_cfg.addition_embed_type:
            n_ids = self._micro_cond_ids()
            pooled_dim = (
                b.unet_cfg.projection_class_embeddings_input_dim
                - n_ids * b.unet_cfg.addition_time_embed_dim
            )
            kw["added_text_embeds"] = jnp.zeros((batch, pooled_dim), jnp.float32)
            kw["added_time_ids"] = jnp.zeros((batch, n_ids), jnp.float32)

        from .models import clip_text as ct, unet as un, vae as va

        stages = {
            "text_encode": (
                jax.jit(lambda p, i: ct.encode_text(p, i, b.text_cfg)[0]),
                (self.text_params, ids),
            ),
            "unet_step": (
                jax.jit(lambda p, s, tt, c: un.forward(
                    p, b.unet_cfg, s, tt, c, **kw
                )),
                (self.unet_params, lat, t, ctx),
            ),
            "vae_decode": (
                jax.jit(lambda p, z: va.decode(p, b.vae_cfg, z)),
                (self.vae_params, lat),
            ),
        }
        def settle(x):
            # scalar d2h: through the remote-TPU tunnel block_until_ready
            # alone does not wait for completion (CLAUDE.md gotcha)
            leaf = jax.tree_util.tree_leaves(x)[0]
            return float(jnp.sum(leaf.astype(jnp.float32)))

        out: Dict[str, float] = {}
        for name, (fn, args) in stages.items():
            settle(fn(*args))  # compile
            t0 = time.time()
            for _ in range(iters):
                r = fn(*args)
            settle(r)
            out[name + "_ms"] = 1e3 * (time.time() - t0) / iters
        out["denoise_loop_ms"] = out["unet_step_ms"] * steps
        return out

    def inpaint(
        self,
        prompt,
        init_image: np.ndarray,
        mask: np.ndarray,
        *,
        strength: float = 1.0,
        **kwargs,
    ) -> GenerationResult:
        """Legacy inpainting (the reference ecosystem's ImageInpaintLegacy
        pipeline type): img2img where the unmasked region is blended back
        each step, renoised to the upcoming timestep.

        mask: [H, W] or [H, W, 1]; nonzero = regenerate that region.
        """
        return self.img2img(
            prompt, init_image, mask=mask, strength=strength, **kwargs
        )

    def img2img(
        self,
        prompt,
        init_image: np.ndarray,
        *,
        mask: Optional[np.ndarray] = None,
        strength: float = 0.5,
        aesthetic_score: float = 6.0,
        num_inference_steps: int = 4,
        original_inference_steps: Optional[int] = None,
        guidance_scale: float = 1.0,
        negative_prompt: Optional[str] = None,
        seed: Optional[int] = None,
    ) -> GenerationResult:
        """Image-to-image: VAE-encode → renoise to the strength-truncated
        LCM ladder → denoise → decode, one XLA program.

        init_image: [H, W, 3] uint8 (or [B, H, W, 3]); H/W set the output
        size and must satisfy the same divisibility rule as txt2img.
        strength ∈ (0, 1]: fraction of the trained ladder to traverse
        (diffusers img2img semantics) — 1.0 ≈ full txt2img noise.
        mask: optional [H, W]/[H, W, 1] repaint mask → legacy inpainting.
        """
        if self.vae_encoder_params is None:
            raise ValueError("checkpoint has no VAE encoder weights")
        if not 0.0 < strength <= 1.0:
            raise ValueError("strength must be in (0, 1]")
        img = np.asarray(init_image)
        if img.ndim == 3:
            img = img[None]
        bsz, height, width, _ = img.shape
        divisor = self.vae_scale * 2 ** (self.bundle.unet_cfg.num_blocks - 1)
        if height % divisor or width % divisor:
            raise ValueError(f"image dims must be multiples of {divisor}")
        prompts = [prompt] * bsz if isinstance(prompt, str) else list(prompt)
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))

        b = self.bundle
        t_start = time.time()
        lcm_mode = b.unet_cfg.time_cond_proj_dim is not None
        gs_arr = np.asarray(guidance_scale, np.float32).reshape(-1)
        if gs_arr.size == 1:
            gs_arr = np.full((bsz,), float(gs_arr[0]), np.float32)
        elif gs_arr.size != bsz:
            raise ValueError(
                f"guidance_scale has {gs_arr.size} entries for batch {bsz}"
            )
        cfg_mode = (
            "wcond" if lcm_mode
            else ("cfg" if float(gs_arr.max()) > 1.0 else "none")
        )
        ids = b.tokenizer(prompts)
        negs = (
            [""] * bsz if negative_prompt is None
            else ([negative_prompt] * bsz if isinstance(negative_prompt, str)
                  else list(negative_prompt))
        )
        if len(negs) != bsz:
            raise ValueError(
                f"negative_prompt has {len(negs)} entries for batch {bsz}"
            )
        ids_neg = b.tokenizer(negs) if cfg_mode == "cfg" else ids
        if self.arch == "sdxl" and b.tokenizer_2 is not None:
            ids_2 = b.tokenizer_2(prompts)
            ids_2_neg = (
                b.tokenizer_2(negs) if cfg_mode == "cfg" else ids_2
            )
        else:
            ids_2 = ids_2_neg = ids

        schedule = self._schedule(
            num_inference_steps, original_inference_steps, strength
        )
        h_lat, w_lat = height // self.vae_scale, width // self.vae_scale
        rs = np.random.RandomState(seed & 0x7FFFFFFF)
        c = self.latent_channels
        shape = (bsz, c, h_lat, w_lat)
        eps_post = rs.randn(*shape).astype(np.float32).transpose(0, 2, 3, 1)
        noise0 = rs.randn(*shape).astype(np.float32).transpose(0, 2, 3, 1)
        noises = (
            rs.randn(num_inference_steps, *shape)
            .astype(np.float32).transpose(0, 1, 3, 4, 2)
        )
        image_f = (img.astype(np.float32) / 255.0) * 2.0 - 1.0

        task = "img2img"
        mask_lat = noises_known = None
        if mask is not None:
            task = "inpaint"
            m = np.asarray(mask, np.float32)
            if m.ndim == 3:
                m = m[..., 0]
            if m.shape != (height, width):
                raise ValueError(
                    f"mask shape {m.shape} != image dims {(height, width)}"
                )
            m = (m > 0).astype(np.float32)
            # area-downsample to latent resolution: any repainted pixel in a
            # latent cell marks the cell for regeneration
            s = self.vae_scale
            m_lat = m.reshape(h_lat, s, w_lat, s).max(axis=(1, 3))
            mask_lat = np.broadcast_to(
                m_lat[None, :, :, None], (bsz, h_lat, w_lat, 1)
            ).astype(np.float32)
            noises_known = (
                rs.randn(num_inference_steps, *shape)
                .astype(np.float32).transpose(0, 1, 3, 4, 2)
            )

        if lcm_mode:
            w_emb = np.asarray(guidance_scale_embedding(
                gs_arr - 1.0, b.unet_cfg.time_cond_proj_dim,
            ))
        else:
            w_emb = np.zeros((bsz, 1), np.float32)
        time_ids = self._time_ids(height, width, bsz, aesthetic_score,
                                  cfg_mode=cfg_mode)
        t_prep = time.time()

        fn = self._get_compiled(
            bsz, h_lat, w_lat, num_inference_steps, cfg_mode, "host", task
        )
        # single grouped h2d + device-cached schedule (same tunnel round-trip
        # economics as generate(); scripts/latency_probe2.py)
        stage = {
            "ids": ids, "ids_neg": ids_neg,
            "ids_2": ids_2, "ids_2_neg": ids_2_neg,
            "image": np.ascontiguousarray(image_f),
            "eps_post": np.ascontiguousarray(eps_post),
            "noise0": np.ascontiguousarray(noise0),
            "noises": np.ascontiguousarray(noises),
            "w_emb": w_emb, "gs": np.ascontiguousarray(gs_arr),
            "time_ids": time_ids,
        }
        if task == "inpaint":
            stage["mask_lat"] = np.ascontiguousarray(mask_lat)
            stage["noises_known"] = np.ascontiguousarray(noises_known)
        stage, aliases = _dedupe_stage(stage)
        stage = self._put_inputs(
            stage, bsz, axes={"noises": 1, "noises_known": 1}
        )
        for k_alias, k_src in aliases.items():
            stage[k_alias] = stage[k_src]
        sched_key = ("strength", num_inference_steps,
                     original_inference_steps, strength)
        schedule_dev = self._dev_schedules.get(sched_key)
        if schedule_dev is None:
            schedule_dev = self._put_replicated(schedule)
            _cache_put(self._dev_schedules, sched_key, schedule_dev)

        common = (
            self.text_params, self.text_params_2, self.unet_params,
            self.vae_params, self.vae_encoder_params,
            stage["ids"], stage["ids_neg"], stage["ids_2"],
            stage["ids_2_neg"], stage["image"],
        )
        tail = (
            schedule_dev, stage["w_emb"], stage["gs"], stage["time_ids"],
        )
        if task == "inpaint":
            img_u8, denoised = fn(
                *common,
                stage["mask_lat"], stage["eps_post"], stage["noise0"],
                stage["noises"], stage["noises_known"],
                *tail,
            )
        else:
            img_u8, denoised = fn(
                *common,
                stage["eps_post"], stage["noise0"], stage["noises"],
                *tail,
            )
        if getattr(img_u8, "is_fully_addressable", True):
            try:
                img_u8.copy_to_host_async()
            except AttributeError:
                pass
        images = _materialize_images(img_u8)
        t_done = time.time()
        return GenerationResult(
            images=images,
            seed=seed,
            latents_device=denoised,
            timings={
                "prep": t_prep - t_start,
                "device": t_done - t_prep,
                "total": t_done - t_start,
            },
        )
