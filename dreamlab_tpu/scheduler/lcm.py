"""Latent Consistency Model scheduler as pure JAX functions.

The reference drives diffusers' stateful ``LCMScheduler`` from a Python loop
(``/root/reference/backends/rknnlcm.py:559-604``). On TPU the whole denoise
loop lives inside one XLA program, so the scheduler is refactored into:

1. ``make_lcm_schedule`` — host-side (numpy) precomputation of everything that
   depends only on (config, num_inference_steps): the timestep ladder and all
   per-step scalar coefficients. Runs once per request shape-bucket; its
   output is a small pytree of arrays fed *into* the jitted program.
2. ``lcm_step`` — the per-step update as a pure function of
   ``(schedule, step_index, model_output, sample, noise)``. jit/scan-safe:
   no Python control flow on traced values, static shapes throughout.

Semantics match diffusers' ``LCMScheduler`` (the consistency-model boundary
condition, epsilon/v/sample prediction, linspace timestep selection) so that
checkpoints distilled for LCM (e.g. LCM-Dreamshaper-V7) sample identically.

Scalar precomputation is exact float64 numpy; the jitted step uses float32
for the latent math (weights may be bfloat16, but scheduler coefficients and
the latent state stay fp32 — this is free on TPU and preserves the 1e-2
pixel-fidelity budget).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LCMConfig:
    """Static scheduler configuration (diffusers ``scheduler_config.json``)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # "linear" | "scaled_linear" | "squaredcos_cap_v2"
    original_inference_steps: int = 50
    timestep_scaling: float = 10.0
    prediction_type: str = "epsilon"  # "epsilon" | "v_prediction" | "sample"
    set_alpha_to_one: bool = True
    init_noise_sigma: float = 1.0
    sigma_data: float = 0.5  # fixed by the consistency-model parameterisation
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0

    def betas(self) -> np.ndarray:
        n = self.num_train_timesteps
        if self.beta_schedule == "linear":
            return np.linspace(self.beta_start, self.beta_end, n, dtype=np.float64)
        if self.beta_schedule == "scaled_linear":
            return (
                np.linspace(
                    self.beta_start**0.5, self.beta_end**0.5, n, dtype=np.float64
                )
                ** 2
            )
        if self.beta_schedule == "squaredcos_cap_v2":
            # alpha_bar(t) = cos^2((t + 0.008) / 1.008 * pi/2), beta capped at 0.999
            def alpha_bar(t):
                return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

            return np.array(
                [
                    min(1 - alpha_bar((i + 1) / n) / alpha_bar(i / n), 0.999)
                    for i in range(n)
                ],
                dtype=np.float64,
            )
        raise ValueError(f"unknown beta_schedule: {self.beta_schedule}")

    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas())


def load_scheduler_config(model_dir: str) -> LCMConfig:
    """Read a diffusers-layout ``scheduler/scheduler_config.json``.

    Keeps the reference's on-disk layout contract
    (``/root/reference/backends/base.py:40-58``).
    """
    path = os.path.join(model_dir, "scheduler", "scheduler_config.json")
    with open(path) as f:
        raw = json.load(f)
    known = {f.name for f in dataclasses.fields(LCMConfig)}
    kwargs = {k: v for k, v in raw.items() if k in known}
    return LCMConfig(**kwargs)


@dataclasses.dataclass(frozen=True)
class LCMSchedule:
    """Per-request precomputed schedule: small arrays indexed by step.

    Every field has leading dimension ``num_inference_steps``; all are
    device-transferable and shape-stable for a given step count, so a jitted
    program compiled for S steps accepts any schedule with S steps (e.g. a
    different ``original_inference_steps``) without recompiling. Registered
    as a pytree so it can cross the jit boundary as one argument.
    """

    timesteps: jnp.ndarray  # int32 [S] — training-timestep index fed to the UNet
    sqrt_alpha_prod: jnp.ndarray  # f32 [S] — sqrt(alphas_cumprod[t])
    sqrt_beta_prod: jnp.ndarray  # f32 [S] — sqrt(1 - alphas_cumprod[t])
    sqrt_alpha_prod_prev: jnp.ndarray  # f32 [S]
    sqrt_beta_prod_prev: jnp.ndarray  # f32 [S]
    c_skip: jnp.ndarray  # f32 [S] — consistency boundary scaling
    c_out: jnp.ndarray  # f32 [S]
    add_noise: jnp.ndarray  # f32 [S] — 1.0 except at the final step
    init_noise_sigma: float = 1.0

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


jax.tree_util.register_dataclass(
    LCMSchedule,
    data_fields=[
        "timesteps", "sqrt_alpha_prod", "sqrt_beta_prod",
        "sqrt_alpha_prod_prev", "sqrt_beta_prod_prev",
        "c_skip", "c_out", "add_noise",
    ],
    meta_fields=["init_noise_sigma"],
)


def lcm_timesteps(
    config: LCMConfig,
    num_inference_steps: int,
    original_inference_steps: Optional[int] = None,
    strength: float = 1.0,
) -> np.ndarray:
    """The LCM timestep ladder (descending int32).

    The distilled model was trained on ``original_inference_steps`` evenly
    spaced timesteps; inference subsamples that ladder with even (linspace,
    floor) indexing — e.g. 4 steps from the default 50-step / 1000-timestep
    schedule gives [999, 759, 499, 259].
    """
    orig = original_inference_steps or config.original_inference_steps
    if orig > config.num_train_timesteps:
        raise ValueError(
            f"original_inference_steps {orig} > num_train_timesteps "
            f"{config.num_train_timesteps}"
        )
    k = config.num_train_timesteps // orig
    origin = (np.arange(1, int(orig * strength) + 1, dtype=np.int64) * k) - 1
    if num_inference_steps > len(origin):
        raise ValueError(
            f"num_inference_steps {num_inference_steps} exceeds the trained "
            f"ladder length {len(origin)}"
        )
    origin = origin[::-1]
    idx = np.floor(
        np.linspace(0, len(origin), num=num_inference_steps, endpoint=False)
    ).astype(np.int64)
    return origin[idx].astype(np.int32)


def make_lcm_schedule(
    config: LCMConfig,
    num_inference_steps: int,
    original_inference_steps: Optional[int] = None,
    strength: float = 1.0,
) -> LCMSchedule:
    """Host-side precomputation of all per-step scalars (exact float64)."""
    timesteps = lcm_timesteps(
        config, num_inference_steps, original_inference_steps, strength
    )
    acp = config.alphas_cumprod()
    final_alpha = 1.0 if config.set_alpha_to_one else float(acp[0])

    # prev timestep: the next entry in the ladder; at the last step the
    # "previous" alpha equals the current one (the last step emits `denoised`
    # directly — add_noise masks the renoising there).
    prev = np.empty_like(timesteps)
    prev[:-1] = timesteps[1:]
    prev[-1] = timesteps[-1]

    def at(t_arr):
        out = np.where(t_arr >= 0, acp[np.clip(t_arr, 0, None)], final_alpha)
        return out

    alpha_prod = at(timesteps)
    alpha_prod_prev = at(prev)

    # Consistency-model boundary conditions: c_skip + c_out interpolate
    # between identity (t→0) and the free prediction (t large).
    scaled_t = timesteps.astype(np.float64) * config.timestep_scaling
    sd2 = config.sigma_data**2
    c_skip = sd2 / (scaled_t**2 + sd2)
    c_out = scaled_t / np.sqrt(scaled_t**2 + sd2)

    add_noise = np.ones(len(timesteps))
    add_noise[-1] = 0.0

    f32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.float64), dtype=jnp.float32)
    return LCMSchedule(
        timesteps=jnp.asarray(timesteps, dtype=jnp.int32),
        sqrt_alpha_prod=f32(np.sqrt(alpha_prod)),
        sqrt_beta_prod=f32(np.sqrt(1.0 - alpha_prod)),
        sqrt_alpha_prod_prev=f32(np.sqrt(alpha_prod_prev)),
        sqrt_beta_prod_prev=f32(np.sqrt(1.0 - alpha_prod_prev)),
        c_skip=f32(c_skip),
        c_out=f32(c_out),
        add_noise=f32(add_noise),
        init_noise_sigma=float(config.init_noise_sigma),
    )


def slice_schedule(schedule: LCMSchedule, start: int, stop: int) -> LCMSchedule:
    """A contiguous segment of a schedule — the diffusers
    ``denoising_end``/``denoising_start`` ensemble contract (SDXL base →
    refiner handoff) expressed on the LCM ladder.

    Slicing the FULL schedule keeps the handoff exact: the base segment's
    last step still renoises toward ``timesteps[stop]`` (its ``add_noise``
    stays 1 and its ``*_prev`` coefficients already point into the next
    segment), so the scan carry after ``[:k]`` is bit-identical to the state
    a solo run would carry into step ``k``; only the final step of the full
    ladder emits ``denoised`` unrenoised.
    """
    sl = lambda a: a[start:stop]
    return LCMSchedule(
        timesteps=sl(schedule.timesteps),
        sqrt_alpha_prod=sl(schedule.sqrt_alpha_prod),
        sqrt_beta_prod=sl(schedule.sqrt_beta_prod),
        sqrt_alpha_prod_prev=sl(schedule.sqrt_alpha_prod_prev),
        sqrt_beta_prod_prev=sl(schedule.sqrt_beta_prod_prev),
        c_skip=sl(schedule.c_skip),
        c_out=sl(schedule.c_out),
        add_noise=sl(schedule.add_noise),
        init_noise_sigma=schedule.init_noise_sigma,
    )


def _predict_x0(
    schedule: LCMSchedule,
    i: jnp.ndarray,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    prediction_type: str,
) -> jnp.ndarray:
    sa = schedule.sqrt_alpha_prod[i]
    sb = schedule.sqrt_beta_prod[i]
    if prediction_type == "epsilon":
        return (sample - sb * model_output) / sa
    if prediction_type == "v_prediction":
        return sa * sample - sb * model_output
    if prediction_type == "sample":
        return model_output
    raise ValueError(f"unknown prediction_type: {prediction_type}")


def lcm_step(
    schedule: LCMSchedule,
    i: jnp.ndarray,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    prediction_type: str = "epsilon",
    clip_sample: bool = False,
    clip_sample_range: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LCM update. Pure; safe inside ``lax.scan`` / ``fori_loop``.

    Args:
        schedule: precomputed ``LCMSchedule``.
        i: step index (traced int32 scalar), 0-based.
        model_output: UNet output at ``schedule.timesteps[i]`` (any float dtype;
            math runs in fp32).
        sample: current latent state (fp32).
        noise: fresh unit-normal noise for the inter-step renoising. Ignored
            (masked) on the final step.

    Returns:
        ``(prev_sample, denoised)`` — the renoised next latent state and the
        consistency-model clean prediction (decode ``denoised`` of the final
        step).
    """
    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)

    x0 = _predict_x0(schedule, i, model_output, sample, prediction_type)
    if clip_sample:
        x0 = jnp.clip(x0, -clip_sample_range, clip_sample_range)

    denoised = schedule.c_out[i] * x0 + schedule.c_skip[i] * sample

    renoised = (
        schedule.sqrt_alpha_prod_prev[i] * denoised
        + schedule.sqrt_beta_prod_prev[i] * noise.astype(jnp.float32)
    )
    prev_sample = jnp.where(schedule.add_noise[i] > 0, renoised, denoised)
    return prev_sample, denoised


def guidance_scale_embedding(
    w, embedding_dim: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Sinusoidal embedding of (guidance_scale - 1), per the LCM-w conditioning.

    Matches the VDM-style embedding the reference computes on host
    (``/root/reference/backends/rknnlcm.py:651-677``): w is scaled by 1000 and
    embedded with log-spaced frequencies, [sin, cos] concatenated.

    Host-side float64 on purpose: the angles reach w·1000 radians, where fp32
    sin/cos loses ~1e-2 — float64 keeps the embedding bit-comparable to the
    reference's numpy math. This is a per-request [B, 256] computation; it is
    fed to the jitted program as an input, never traced.

    Args:
        w: [B] guidance weights, already offset by -1 (callers pass
            ``guidance_scale - 1``).
        embedding_dim: UNet ``time_cond_proj_dim`` (256 for LCM SD1.5).
    """
    w = np.asarray(w, dtype=np.float64) * 1000.0
    half = embedding_dim // 2
    freqs = np.exp(
        np.arange(half, dtype=np.float64) * (-math.log(10000.0) / (half - 1))
    )
    angles = w[:, None] * freqs[None, :]
    emb = np.concatenate([np.sin(angles), np.cos(angles)], axis=1)
    if embedding_dim % 2 == 1:
        emb = np.pad(emb, [(0, 0), (0, 1)])
    return jnp.asarray(emb, dtype=dtype)
