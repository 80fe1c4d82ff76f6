"""End-to-end txt2img pipeline on the tiny synthetic checkpoint (CPU).

Covers the determinism / reproducibility contracts the reference asserts on
real hardware (test_sdxl_worker.py:171-298): same seed ⇒ bit-exact images,
different seeds diverge, shape/validation errors, latent output format.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dreamlab_tpu import loader
from dreamlab_tpu.pipeline import LCMPipeline
from tests.test_loader import make_tiny_checkpoint


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    d = make_tiny_checkpoint(tmp_path_factory.mktemp("ckpt") / "m")
    bundle = loader.load_pipeline(d, load_vae_encoder=True)
    # fp32 on CPU: deterministic and exercises the default test tier
    return LCMPipeline(bundle, dtype=jnp.float32)


def test_generate_shapes_and_types(pipe):
    res = pipe.generate("a cat", height=32, width=32, num_inference_steps=2, seed=7)
    assert res.images.shape == (1, 32, 32, 3)
    assert res.images.dtype == np.uint8
    assert res.latents.shape == (1, 16, 16, 4)
    assert res.seed == 7


def test_same_seed_bit_exact(pipe):
    a = pipe.generate("a cat", height=32, width=32, num_inference_steps=2, seed=123)
    b = pipe.generate("a cat", height=32, width=32, num_inference_steps=2, seed=123)
    np.testing.assert_array_equal(a.images, b.images)


def test_different_seeds_diverge(pipe):
    a = pipe.generate("a cat", height=32, width=32, num_inference_steps=2, seed=1)
    b = pipe.generate("a cat", height=32, width=32, num_inference_steps=2, seed=2)
    assert not np.array_equal(a.images, b.images)


def test_prompt_changes_output(pipe):
    a = pipe.generate("a cat", height=32, width=32, num_inference_steps=2, seed=5)
    b = pipe.generate("a dog", height=32, width=32, num_inference_steps=2, seed=5)
    assert not np.array_equal(a.images, b.images)


def test_guidance_changes_output(pipe):
    a = pipe.generate("a cat", height=32, width=32, num_inference_steps=2,
                      seed=5, guidance_scale=1.0)
    b = pipe.generate("a cat", height=32, width=32, num_inference_steps=2,
                      seed=5, guidance_scale=8.0)
    assert not np.array_equal(a.images, b.images)


def test_batched_generation(pipe):
    res = pipe.generate(["a cat", "a dog"], height=32, width=32,
                        num_inference_steps=2, seed=9)
    assert res.images.shape == (2, 32, 32, 3)
    # batch entries differ (different prompts)
    assert not np.array_equal(res.images[0], res.images[1])


def test_batch_replication(pipe):
    res = pipe.generate("a cat", batch=2, height=32, width=32,
                        num_inference_steps=2, seed=9)
    assert res.images.shape == (2, 32, 32, 3)


def test_invalid_size_rejected(pipe):
    with pytest.raises(ValueError):
        pipe.generate("a cat", height=30, width=32)


def test_explicit_latents_reproduce(pipe):
    h = w = 32
    res1 = pipe.generate("a cat", height=h, width=w, num_inference_steps=2, seed=4)
    rs = np.random.RandomState(4)
    s = pipe.vae_scale
    lat = rs.randn(1, 4, h // s, w // s).astype(np.float32).transpose(0, 2, 3, 1)
    res2 = pipe.generate("a cat", height=h, width=w, num_inference_steps=2,
                         seed=4, latents=lat)
    np.testing.assert_array_equal(res1.images, res2.images)


def test_compile_cache_reuse(pipe):
    pipe.generate("x", height=32, width=32, num_inference_steps=2, seed=0)
    n = len(pipe._compiled)
    pipe.generate("y", height=32, width=32, num_inference_steps=2, seed=1)
    assert len(pipe._compiled) == n  # same bucket, no retrace
    pipe.generate("y", height=32, width=48, num_inference_steps=2, seed=1)
    assert len(pipe._compiled) == n + 1


def test_device_rng_deterministic(pipe):
    a = pipe.generate("a cat", height=32, width=32, num_inference_steps=2,
                      seed=11, rng="device")
    b = pipe.generate("a cat", height=32, width=32, num_inference_steps=2,
                      seed=11, rng="device")
    np.testing.assert_array_equal(a.images, b.images)
    c = pipe.generate("a cat", height=32, width=32, num_inference_steps=2,
                      seed=12, rng="device")
    assert not np.array_equal(a.images, c.images)
    # host and device modes are different (documented) but both valid
    h = pipe.generate("a cat", height=32, width=32, num_inference_steps=2,
                      seed=11, rng="host")
    assert h.images.shape == a.images.shape


def test_img2img_basic(pipe):
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (32, 32, 3), np.uint8)
    res = pipe.img2img("a cat", img, strength=0.5, num_inference_steps=2, seed=3)
    assert res.images.shape == (1, 32, 32, 3)
    assert res.images.dtype == np.uint8
    # deterministic
    res2 = pipe.img2img("a cat", img, strength=0.5, num_inference_steps=2, seed=3)
    np.testing.assert_array_equal(res.images, res2.images)
    # strength changes the trajectory
    res3 = pipe.img2img("a cat", img, strength=1.0, num_inference_steps=2, seed=3)
    assert not np.array_equal(res.images, res3.images)


def test_img2img_strength_truncates_ladder(pipe):
    """Lower strength starts from an earlier (less noisy) timestep — the
    diffusers img2img semantics at the scheduler level."""
    lo = pipe._schedule(2, None, 0.1)
    hi = pipe._schedule(2, None, 1.0)
    assert int(lo.timesteps[0]) < int(hi.timesteps[0])
    # and the noising coefficient at entry is correspondingly smaller
    assert float(lo.sqrt_beta_prod[0]) < float(hi.sqrt_beta_prod[0])


def test_img2img_validation(pipe):
    img = np.zeros((32, 32, 3), np.uint8)
    with pytest.raises(ValueError):
        pipe.img2img("x", img, strength=0.0)
    with pytest.raises(ValueError):
        pipe.img2img("x", np.zeros((30, 32, 3), np.uint8))


def test_profile_stages(pipe):
    stats = pipe.profile_stages(height=32, width=32, steps=2, iters=1)
    for key in ("text_encode_ms", "unet_step_ms", "vae_decode_ms",
                "denoise_loop_ms"):
        assert key in stats and stats[key] >= 0
    assert stats["denoise_loop_ms"] == pytest.approx(2 * stats["unet_step_ms"])


def test_inpaint_basic(pipe):
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (32, 32, 3), np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    mask[8:24, 8:24] = 255
    res = pipe.inpaint("a cat", img, mask, num_inference_steps=2, seed=7)
    assert res.images.shape == (1, 32, 32, 3)
    res2 = pipe.inpaint("a cat", img, mask, num_inference_steps=2, seed=7)
    np.testing.assert_array_equal(res.images, res2.images)


def test_inpaint_preserves_known_latents(pipe):
    """With a zero mask (nothing to repaint) the final latents equal the
    encoded image latents exactly — the per-step blend pins them."""
    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (32, 32, 3), np.uint8)
    mask = np.zeros((32, 32), np.uint8)  # repaint nothing
    res = pipe.inpaint("whatever", img, mask, num_inference_steps=2, seed=3)
    # reproduce the encoder-side x0 with the same seed's posterior noise
    import jax.numpy as jnp
    from dreamlab_tpu.models import vae as vae_mod

    rs2 = np.random.RandomState(3)
    c = pipe.latent_channels
    s = pipe.vae_scale
    eps = rs2.randn(1, c, 32 // s, 32 // s).astype(np.float32).transpose(0, 2, 3, 1)
    image_f = (img[None].astype(np.float32) / 255.0) * 2 - 1
    moments = np.asarray(vae_mod.encode_moments(
        pipe.vae_encoder_params, pipe.bundle.vae_cfg, jnp.asarray(image_f)))
    mean, logvar = moments[..., :c], np.clip(moments[..., c:], -30, 20)
    x0 = (mean + np.exp(0.5 * logvar) * eps) * pipe.bundle.vae_cfg.scaling_factor
    np.testing.assert_allclose(res.latents, x0, rtol=1e-4, atol=1e-5)


def test_inpaint_mask_validation(pipe):
    img = np.zeros((32, 32, 3), np.uint8)
    with pytest.raises(ValueError):
        pipe.inpaint("x", img, np.zeros((16, 16), np.uint8))


def test_attention_impl_threads_into_configs():
    """attention_impl='xla' must actually bind into the traced programs
    (round-1 ADVICE: it was stored but never threaded)."""
    import jax.numpy as jnp

    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle

    bundle = random_bundle("sd15", tiny=True)
    pipe = LCMPipeline(bundle, dtype=jnp.float32, attention_impl="xla")
    assert pipe.bundle.unet_cfg.attention_impl == "xla"
    assert pipe.bundle.vae_cfg.attention_impl == "xla"
    res = pipe.generate("t", height=32, width=32, num_inference_steps=1, seed=0)
    assert res.images.shape == (1, 32, 32, 3)
    # default stays auto
    pipe2 = LCMPipeline(random_bundle("sd15", tiny=True), dtype=jnp.float32)
    assert pipe2.bundle.unet_cfg.attention_impl == "auto"


def test_pipelined_mode_matches_blocking():
    """pipelined=True + wait() is bit-identical to the blocking path, and
    latents stay on device until first access (lazy d2h)."""
    import jax.numpy as jnp

    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle

    pipe = LCMPipeline(random_bundle("sd15", tiny=True), dtype=jnp.float32)
    kw = dict(height=32, width=32, num_inference_steps=2, seed=11)
    blocking = pipe.generate("t", **kw)
    piped = pipe.generate("t", **kw, pipelined=True)
    assert not isinstance(piped.images, np.ndarray)  # still on device
    piped.wait()
    np.testing.assert_array_equal(piped.images, blocking.images)
    np.testing.assert_array_equal(piped.latents, blocking.latents)
