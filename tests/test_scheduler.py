"""LCM scheduler numerics.

Golden-tests the functional scheduler against an independent stateful numpy
reimplementation of diffusers' LCMScheduler semantics (diffusers itself is
not importable in this environment), plus known-value checks on the timestep
ladder for the canonical SD1.5-LCM configuration.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dreamlab_tpu.scheduler import (
    LCMConfig,
    guidance_scale_embedding,
    lcm_step,
    make_lcm_schedule,
)
from dreamlab_tpu.scheduler.lcm import lcm_timesteps


class RefLCM:
    """Stateful reference implementation (diffusers LCMScheduler semantics)."""

    def __init__(self, cfg: LCMConfig):
        self.cfg = cfg
        self.acp = cfg.alphas_cumprod()
        self.final_alpha = 1.0 if cfg.set_alpha_to_one else float(self.acp[0])

    def set_timesteps(self, n, original=None):
        cfg = self.cfg
        orig = original or cfg.original_inference_steps
        k = cfg.num_train_timesteps // orig
        origin = (np.arange(1, orig + 1) * k - 1)[::-1]
        idx = np.floor(np.linspace(0, len(origin), num=n, endpoint=False)).astype(int)
        self.timesteps = origin[idx]
        self.num_inference_steps = n
        self.step_index = 0

    def scalings(self, t):
        s = t * self.cfg.timestep_scaling
        sd2 = self.cfg.sigma_data**2
        return sd2 / (s**2 + sd2), s / np.sqrt(s**2 + sd2)

    def step(self, model_output, t, sample, noise):
        i = self.step_index
        if i != self.num_inference_steps - 1:
            prev_t = self.timesteps[i + 1]
        else:
            prev_t = t
        a_t = self.acp[t] if t >= 0 else self.final_alpha
        a_prev = self.acp[prev_t] if prev_t >= 0 else self.final_alpha
        b_t, b_prev = 1 - a_t, 1 - a_prev
        c_skip, c_out = self.scalings(t)
        x0 = (sample - np.sqrt(b_t) * model_output) / np.sqrt(a_t)
        denoised = c_out * x0 + c_skip * sample
        if i != self.num_inference_steps - 1:
            prev = np.sqrt(a_prev) * denoised + np.sqrt(b_prev) * noise
        else:
            prev = denoised
        self.step_index += 1
        return prev, denoised


def test_timestep_ladder_canonical():
    cfg = LCMConfig()
    np.testing.assert_array_equal(
        lcm_timesteps(cfg, 4), np.array([999, 759, 499, 259], dtype=np.int32)
    )
    np.testing.assert_array_equal(lcm_timesteps(cfg, 1), np.array([999]))
    # 50 steps uses the full trained ladder
    np.testing.assert_array_equal(
        lcm_timesteps(cfg, 50), (np.arange(1, 51) * 20 - 1)[::-1]
    )


def test_timestep_ladder_validation():
    cfg = LCMConfig()
    with pytest.raises(ValueError):
        lcm_timesteps(cfg, 51)  # more steps than the trained ladder
    with pytest.raises(ValueError):
        lcm_timesteps(cfg, 4, original_inference_steps=2000)


@pytest.mark.parametrize("steps", [1, 2, 4, 8])
@pytest.mark.parametrize("beta_schedule", ["scaled_linear", "linear", "squaredcos_cap_v2"])
def test_step_matches_reference(steps, beta_schedule):
    cfg = LCMConfig(beta_schedule=beta_schedule)
    sched = make_lcm_schedule(cfg, steps)
    ref = RefLCM(cfg)
    ref.set_timesteps(steps)
    np.testing.assert_array_equal(np.asarray(sched.timesteps), ref.timesteps)

    rs = np.random.RandomState(42)
    sample = rs.randn(1, 8, 8, 4)
    for i in range(steps):
        model_out = rs.randn(*sample.shape)
        noise = rs.randn(*sample.shape)
        want_prev, want_den = ref.step(model_out, int(ref.timesteps[i]), sample, noise)
        got_prev, got_den = lcm_step(
            sched, jnp.int32(i), jnp.asarray(model_out), jnp.asarray(sample),
            jnp.asarray(noise),
        )
        np.testing.assert_allclose(np.asarray(got_den), want_den, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(got_prev), want_prev, rtol=2e-5, atol=2e-6)
        sample = want_prev


def test_step_inside_scan_matches_eager():
    cfg = LCMConfig()
    steps = 4
    sched = make_lcm_schedule(cfg, steps)
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(1, 8, 8, 4), jnp.float32)
    outs = jnp.asarray(rs.randn(steps, 1, 8, 8, 4), jnp.float32)
    noises = jnp.asarray(rs.randn(steps, 1, 8, 8, 4), jnp.float32)

    def body(carry, inp):
        i, (mo, nz) = carry[0], inp
        prev, den = lcm_step(sched, i, mo, carry[1], nz)
        return (i + 1, prev), den

    @jax.jit
    def run(x, outs, noises):
        (_, _), dens = jax.lax.scan(body, (jnp.int32(0), x), (outs, noises))
        return dens

    dens_scan = run(x, outs, noises)

    cur, dens = x, []
    for i in range(steps):
        cur, den = lcm_step(sched, jnp.int32(i), outs[i], cur, noises[i])
        dens.append(den)
    # scan and eager fuse fp32 arithmetic differently; allow ulp-level drift
    np.testing.assert_allclose(
        np.asarray(dens_scan), np.stack([np.asarray(d) for d in dens]),
        rtol=1e-4, atol=1e-5,
    )


def test_prediction_types():
    cfg_v = LCMConfig(prediction_type="v_prediction")
    sched = make_lcm_schedule(cfg_v, 2)
    rs = np.random.RandomState(3)
    sample = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    mo = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    nz = jnp.zeros_like(sample)
    prev_v, _ = lcm_step(sched, jnp.int32(0), mo, sample, nz, prediction_type="v_prediction")
    prev_s, _ = lcm_step(sched, jnp.int32(0), mo, sample, nz, prediction_type="sample")
    assert not np.allclose(np.asarray(prev_v), np.asarray(prev_s))
    with pytest.raises(ValueError):
        lcm_step(sched, jnp.int32(0), mo, sample, nz, prediction_type="bogus")


def test_guidance_embedding_matches_reference_numpy():
    """Mirror of the host-side embedding from the reference
    (rknnlcm.py:651-677), recomputed independently in numpy."""
    w = np.array([7.5 - 1.0], dtype=np.float32)
    dim = 256
    ww = w * 1000
    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    emb = np.exp(np.arange(half, dtype=np.float32) * -emb)
    emb = ww[:, None] * emb[None, :]
    want = np.concatenate([np.sin(emb), np.cos(emb)], axis=1)

    got = guidance_scale_embedding(jnp.asarray(w), dim)
    assert got.shape == (1, dim)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_guidance_embedding_odd_dim_pads():
    got = guidance_scale_embedding(jnp.asarray([1.0]), 9)
    assert got.shape == (1, 9)
    assert float(got[0, -1]) == 0.0


def test_final_step_emits_denoised():
    cfg = LCMConfig()
    sched = make_lcm_schedule(cfg, 2)
    rs = np.random.RandomState(0)
    sample = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    mo = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    noise = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    prev, den = lcm_step(sched, jnp.int32(1), mo, sample, noise)
    np.testing.assert_array_equal(np.asarray(prev), np.asarray(den))
