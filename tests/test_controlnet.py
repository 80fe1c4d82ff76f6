"""ControlNet conditioning: model, pipeline wiring, loader conversion.

The reference left ControlNet unfinished (README.md:529 "in progress";
backends/rknnlcm.py:693 ships only prepare_controlnet_cond). These tests pin
the completed TPU-native implementation's invariants:
- zero-initialized taps are a numeric no-op (the ControlNet training-start
  property) — bit-exact against the no-ControlNet program;
- conditioning_scale=0 restores the base output; nonzero taps change it;
- monotone effect: larger scale moves latents further from base;
- diffusers-layout checkpoint conversion round-trips through forward.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dreamlab_tpu.models import controlnet, unet
from dreamlab_tpu.pipeline import LCMPipeline
from dreamlab_tpu.testing import random_bundle, random_controlnet


@pytest.fixture(scope="module")
def sd15():
    return random_bundle("sd15", tiny=True)


@pytest.fixture(scope="module")
def pipe(sd15):
    return LCMPipeline(sd15, dtype=jnp.float32)


def _hint(h=32, w=32, seed=0):
    return (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)


def test_zero_taps_are_identity(pipe, sd15):
    base = pipe.generate("cat", height=32, width=32, num_inference_steps=2, seed=1)
    cn = random_controlnet(sd15.unet_cfg, zero_taps=True,
                           vae_scale=sd15.vae_cfg.scale_factor)
    pipe.set_controlnet(cn, sd15.unet_cfg)
    try:
        out = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                            seed=1, control_image=_hint())
    finally:
        pipe.set_controlnet(None, None)
    np.testing.assert_array_equal(base.images, out.images)


def test_scale_zero_matches_base_and_nonzero_changes(pipe, sd15):
    base = pipe.generate("cat", height=32, width=32, num_inference_steps=2, seed=1)
    cn = random_controlnet(sd15.unet_cfg, zero_taps=False,
                           vae_scale=sd15.vae_cfg.scale_factor)
    pipe.set_controlnet(cn, sd15.unet_cfg)
    try:
        r0 = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                           seed=1, control_image=_hint(), controlnet_scale=0.0)
        r1 = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                           seed=1, control_image=_hint())
    finally:
        pipe.set_controlnet(None, None)
    np.testing.assert_array_equal(base.images, r0.images)
    assert not np.array_equal(base.images, r1.images)


def test_scale_monotone_in_latents(pipe, sd15):
    base = pipe.generate("cat", height=32, width=32, num_inference_steps=2, seed=1)
    cn = random_controlnet(sd15.unet_cfg, zero_taps=False,
                           vae_scale=sd15.vae_cfg.scale_factor)
    pipe.set_controlnet(cn, sd15.unet_cfg)
    try:
        dists = []
        for s in (0.1, 0.5, 1.0):
            r = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                              seed=1, control_image=_hint(), controlnet_scale=s)
            dists.append(float(np.linalg.norm(r.latents - base.latents)))
    finally:
        pipe.set_controlnet(None, None)
    assert dists[0] < dists[1] < dists[2], dists


def test_hint_changes_output(pipe, sd15):
    cn = random_controlnet(sd15.unet_cfg, zero_taps=False,
                           vae_scale=sd15.vae_cfg.scale_factor)
    pipe.set_controlnet(cn, sd15.unet_cfg)
    try:
        a = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                          seed=1, control_image=_hint(seed=0))
        b = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                          seed=1, control_image=_hint(seed=9))
    finally:
        pipe.set_controlnet(None, None)
    assert not np.array_equal(a.images, b.images)


def test_requires_attached_controlnet(pipe):
    with pytest.raises(ValueError, match="no ControlNet"):
        pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                      seed=1, control_image=_hint())


def test_hint_size_must_match_output(pipe, sd15):
    cn = random_controlnet(sd15.unet_cfg, zero_taps=True,
                           vae_scale=sd15.vae_cfg.scale_factor)
    pipe.set_controlnet(cn, sd15.unet_cfg)
    try:
        with pytest.raises(ValueError, match="resize"):
            pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                          seed=1, control_image=_hint(16, 16))
    finally:
        pipe.set_controlnet(None, None)


def test_sdxl_cfg_path(tmp_path):
    """ControlNet under classifier-free guidance (batch-doubled) on the SDXL
    topology — exercises the doubled hint embedding + micro-conditioning."""
    b = random_bundle("sdxl", tiny=True)
    pipe = LCMPipeline(b, dtype=jnp.float32)
    base = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                         seed=3, guidance_scale=4.0)
    cn = random_controlnet(b.unet_cfg, zero_taps=True,
                           vae_scale=b.vae_cfg.scale_factor)
    pipe.set_controlnet(cn, b.unet_cfg)
    out = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                        seed=3, guidance_scale=4.0, control_image=_hint())
    np.testing.assert_array_equal(base.images, out.images)

    cn2 = random_controlnet(b.unet_cfg, zero_taps=False,
                            vae_scale=b.vae_cfg.scale_factor)
    pipe.set_controlnet(cn2, b.unet_cfg)
    out2 = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                         seed=3, guidance_scale=4.0, control_image=_hint())
    assert not np.array_equal(base.images, out2.images)


def test_batched_hint_broadcast(pipe, sd15):
    """A single hint broadcasts across a batch; per-row hints are honored.

    Batch rows draw independent noise from the shared seed stream by design
    (each row is its own trajectory), so to isolate the hint's effect the
    noise is pinned explicitly: identical latents/step-noise per row makes
    the hint the ONLY varying input."""
    cn = random_controlnet(sd15.unet_cfg, zero_taps=False,
                           vae_scale=sd15.vae_cfg.scale_factor)
    pipe.set_controlnet(cn, sd15.unet_cfg)
    try:
        h_lat = 32 // pipe.vae_scale
        rs = np.random.RandomState(7)
        lat = np.repeat(
            rs.randn(1, h_lat, h_lat, pipe.latent_channels).astype(np.float32),
            2, axis=0,
        )
        noises = np.repeat(
            rs.randn(2, 1, h_lat, h_lat, pipe.latent_channels)
            .astype(np.float32),
            2, axis=1,
        )
        r = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                          seed=1, batch=2, latents=lat, step_noises=noises,
                          control_image=_hint())
        assert r.images.shape[0] == 2
        np.testing.assert_array_equal(r.images[0], r.images[1])
        hints = np.stack([_hint(seed=0), _hint(seed=9)])
        r2 = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                           seed=1, batch=2, latents=lat, step_noises=noises,
                           control_image=hints)
        assert not np.array_equal(r2.images[0], r2.images[1])
        # row 0 of the per-row run uses the broadcast run's hint + identical
        # noise, so the trajectories must agree exactly
        np.testing.assert_array_equal(r.images[0], r2.images[0])
    finally:
        pipe.set_controlnet(None, None)


def test_set_controlnet_rejects_mismatched_architecture(pipe, sd15):
    """An architecture-mismatched ControlNet must fail fast at attach time,
    not deep inside tracing (tap count / channels vs the pipeline's UNet)."""
    import dataclasses as _dc

    bad_cfg = _dc.replace(sd15.unet_cfg,
                          layers_per_block=sd15.unet_cfg.layers_per_block + 1)
    bad = random_controlnet(bad_cfg, vae_scale=sd15.vae_cfg.scale_factor)
    with pytest.raises(ValueError, match="mismatch"):
        pipe.set_controlnet(bad, bad_cfg)
    assert pipe.controlnet_params is None


def test_int_hint_dtypes_normalized(pipe, sd15):
    """int32/int64 hints holding 0-255 pixels must match the uint8 result
    (ADVICE r2: non-uint8 ints used to pass through as raw 0-255 floats)."""
    cn = random_controlnet(sd15.unet_cfg, zero_taps=False,
                           vae_scale=sd15.vae_cfg.scale_factor)
    pipe.set_controlnet(cn, sd15.unet_cfg)
    try:
        h8 = _hint()
        a = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                          seed=1, control_image=h8)
        b = pipe.generate("cat", height=32, width=32, num_inference_steps=2,
                          seed=1, control_image=h8.astype(np.int64))
        np.testing.assert_array_equal(a.images, b.images)
    finally:
        pipe.set_controlnet(None, None)


# ---------------------------------------------------------------------------
# loader conversion
# ---------------------------------------------------------------------------


def _torch_style_tensors(params, cfg):
    """Flatten a models.controlnet pytree into diffusers-style torch-layout
    tensors (OIHW convs, [out,in] linears) to exercise convert_controlnet."""
    out = {}

    def put_conv(key, p):
        out[key + ".weight"] = np.ascontiguousarray(
            np.transpose(p["w"], (3, 2, 0, 1))
        )
        if "b" in p:
            out[key + ".bias"] = p["b"]

    def put_linear(key, p):
        out[key + ".weight"] = np.ascontiguousarray(p["w"].T)
        if "b" in p:
            out[key + ".bias"] = p["b"]

    def put_norm(key, p):
        out[key + ".weight"] = p["scale"]
        out[key + ".bias"] = p["bias"]

    def put_resnet(key, p):
        put_norm(key + ".norm1", p["norm1"])
        put_conv(key + ".conv1", p["conv1"])
        put_linear(key + ".time_emb_proj", p["time_emb_proj"])
        put_norm(key + ".norm2", p["norm2"])
        put_conv(key + ".conv2", p["conv2"])
        if "shortcut" in p:
            put_conv(key + ".conv_shortcut", p["shortcut"])

    def put_attn(key, p):
        put_linear(key + ".to_q", p["q"])
        put_linear(key + ".to_k", p["k"])
        put_linear(key + ".to_v", p["v"])
        put_linear(key + ".to_out.0", p["out"])

    def put_transformer(key, p):
        put_norm(key + ".norm", p["norm"])
        put_linear(key + ".proj_in", p["proj_in"])
        for k, blk in enumerate(p["blocks"]):
            b = f"{key}.transformer_blocks.{k}"
            put_norm(b + ".norm1", blk["ln1"])
            put_attn(b + ".attn1", blk["attn1"])
            put_norm(b + ".norm2", blk["ln2"])
            put_attn(b + ".attn2", blk["attn2"])
            put_norm(b + ".norm3", blk["ln3"])
            put_linear(b + ".ff.net.0.proj", blk["ff_geglu"])
            put_linear(b + ".ff.net.2", blk["ff_out"])
        put_linear(key + ".proj_out", p["proj_out"])

    put_conv("conv_in", params["conv_in"])
    put_linear("time_embedding.linear_1", params["time_embedding"]["linear_1"])
    put_linear("time_embedding.linear_2", params["time_embedding"]["linear_2"])
    if "cond_proj" in params["time_embedding"]:
        put_linear("time_embedding.cond_proj", params["time_embedding"]["cond_proj"])
    for i, block in enumerate(params["down"]):
        for j, res in enumerate(block["resnets"]):
            put_resnet(f"down_blocks.{i}.resnets.{j}", res)
        for j, att in enumerate(block.get("attentions", [])):
            put_transformer(f"down_blocks.{i}.attentions.{j}", att)
        if "downsample" in block:
            put_conv(f"down_blocks.{i}.downsamplers.0.conv", block["downsample"])
    put_resnet("mid_block.resnets.0", params["mid"]["resnet1"])
    put_resnet("mid_block.resnets.1", params["mid"]["resnet2"])
    if "attention" in params["mid"]:
        put_transformer("mid_block.attentions.0", params["mid"]["attention"])
    put_conv("controlnet_cond_embedding.conv_in",
             params["cond_embedding"]["conv_in"])
    for i, blk in enumerate(params["cond_embedding"]["blocks"]):
        put_conv(f"controlnet_cond_embedding.blocks.{i}", blk)
    put_conv("controlnet_cond_embedding.conv_out",
             params["cond_embedding"]["conv_out"])
    for i, tap in enumerate(params["zero_down"]):
        put_conv(f"controlnet_down_blocks.{i}", tap)
    put_conv("controlnet_mid_block", params["zero_mid"])
    return out


def test_convert_controlnet_roundtrip(sd15):
    """torch-layout tensors → convert_controlnet → identical forward."""
    from dreamlab_tpu.loader import convert_controlnet

    cfg = sd15.unet_cfg
    ref = random_controlnet(cfg, zero_taps=False, vae_scale=2)
    tensors = _torch_style_tensors(ref, cfg)
    got = convert_controlnet(tensors, cfg)

    rs = np.random.RandomState(0)
    sample = jnp.asarray(rs.randn(1, 16, 16, 4), jnp.float32)
    hint = jnp.asarray(rs.rand(1, 32, 32, 3), jnp.float32)
    ctx = jnp.asarray(rs.randn(1, 77, cfg.cross_attention_dim), jnp.float32)
    t = jnp.asarray([42], jnp.int32)
    tc = jnp.zeros((1, cfg.time_cond_proj_dim), jnp.float32)

    def run(p):
        cemb = controlnet.embed_cond(p["cond_embedding"], hint)
        return controlnet.forward(p, cfg, sample, t, ctx, cemb,
                                  timestep_cond=tc)

    d_ref, m_ref = run(ref)
    d_got, m_got = run(got)
    np.testing.assert_allclose(np.asarray(m_ref), np.asarray(m_got),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(d_ref, d_got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_tap_count_matches_unet_skips(sd15):
    """zero_down tap count must equal the UNet skip count for every config."""
    cfg = sd15.unet_cfg
    cn = random_controlnet(cfg, vae_scale=2)
    n_skips = 1 + cfg.num_blocks * cfg.layers_per_block + (cfg.num_blocks - 1)
    assert len(cn["zero_down"]) == n_skips
