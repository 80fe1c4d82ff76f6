"""Real-checkpoint validation gate (VERDICT r4 #10; BASELINE.json bar).

The rebuild's entire stack runs random weights in this offline environment
— no LCM-Dreamshaper-V7 artifact ships. This file makes real-weight
validation a ONE-COMMAND affair the day a checkpoint lands:

    DREAMLAB_MODEL_ROOT=/models/LCM-Dreamshaper-V7 python -m pytest \
        tests/test_real_weights.py -q

It generates with the production jitted pipeline AND with an independent
fp32 torch reference (the same from-diffusers-semantics graphs the
crosscheck tier validates: `_TorchUNetRef`, a torch VAE decoder, a torch
CLIP text tower — all consuming the checkpoint's raw diffusers-named
state dicts), then asserts the BASELINE fidelity bar: pixel output within
1e-2 of the fp32 reference (≤ 3/255 in uint8). The first real-weight run
also stores the reference image as a golden under tests/golden/real/ so
later runs regress against a fixed artifact.

The harness itself is NOT gated: `test_harness_on_tiny_checkpoint` runs
the identical code path against a synthetic diffusers checkpoint in CI,
so the machinery is continuously proven — only the artifact is missing.

Reference parity: the reference's value proposition is real images from
LCM-Dreamshaper-V7 (/root/reference/backends/rknnlcm.py:450-647,
model/Assets/LCM-Dreamshaper-V7-ONNX.json).
"""

import hashlib
import json
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dreamlab_tpu import loader
from dreamlab_tpu.pipeline import LCMPipeline
from dreamlab_tpu.scheduler import (
    guidance_scale_embedding,
    load_scheduler_config,
    make_lcm_schedule,
)
from dreamlab_tpu.utils.tokenizer import CLIPTokenizer

from tests.test_torch_crosscheck import _TorchUNetRef

REAL_ROOT = os.environ.get("DREAMLAB_MODEL_ROOT", "")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "real")

# fixed generation config for the golden (BASELINE config: SD1.5 LCM
# txt2img 512x512, 4 steps, guidance 1.0)
REAL_PROMPT = "a photo of a cat, highly detailed, 8k"
REAL_SEED = 12345
REAL_STEPS = 4
REAL_SIZE = 512


def _quick_gelu(x):
    return x * torch.sigmoid(1.702 * x)


def _torch_clip_text(sd, cfg_json, ids):
    """fp32 CLIP text tower from a diffusers/HF-named state dict.

    Written from the transformers CLIPTextModel semantics (embeddings +
    causal pre-LN encoder + final LayerNorm); the JAX tower is separately
    validated against real transformers in test_torch_crosscheck.py:84.
    Returns the final hidden state [B, 77, width] (the SD1.5 context).
    """
    t = {k: torch.from_numpy(np.ascontiguousarray(v)).float()
         for k, v in sd.items()}
    pre = "text_model." if any(k.startswith("text_model.") for k in t) else ""
    act = {"quick_gelu": _quick_gelu,
           "gelu": torch.nn.functional.gelu}[cfg_json.get("hidden_act",
                                                          "quick_gelu")]
    heads = cfg_json["num_attention_heads"]
    n_layers = cfg_json["num_hidden_layers"]
    eps = cfg_json.get("layer_norm_eps", 1e-5)

    def ln(key, x):
        return torch.nn.functional.layer_norm(
            x, (x.shape[-1],), t[key + ".weight"], t[key + ".bias"], eps)

    def lin(key, x):
        return torch.nn.functional.linear(x, t[key + ".weight"],
                                          t.get(key + ".bias"))

    ids_t = torch.from_numpy(np.asarray(ids, np.int64))
    n = ids_t.shape[1]
    x = t[pre + "embeddings.token_embedding.weight"][ids_t]
    x = x + t[pre + "embeddings.position_embedding.weight"][:n]
    for i in range(n_layers):
        k = f"{pre}encoder.layers.{i}."
        h = ln(k + "layer_norm1", x)
        b, _, c = h.shape
        d = c // heads
        q = lin(k + "self_attn.q_proj", h).view(b, n, heads, d).transpose(1, 2)
        key = lin(k + "self_attn.k_proj", h).view(b, n, heads, d).transpose(1, 2)
        v = lin(k + "self_attn.v_proj", h).view(b, n, heads, d).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(
            q, key, v, is_causal=True)
        x = x + lin(k + "self_attn.out_proj",
                    o.transpose(1, 2).reshape(b, n, c))
        h = ln(k + "layer_norm2", x)
        x = x + lin(k + "mlp.fc2", act(lin(k + "mlp.fc1", h)))
    return ln(pre + "final_layer_norm", x)


def _torch_vae_decode(sd, cfg, lat_nchw):
    """fp32 torch VAE decoder from the diffusers-named state dict (same
    graph as test_torch_crosscheck.test_vae_decoder_full_graph...)."""
    t = {k: torch.from_numpy(np.ascontiguousarray(v)).float()
         for k, v in sd.items()}

    def conv(key, x, stride=1):
        w = t[key + ".weight"]
        return torch.nn.functional.conv2d(x, w, t.get(key + ".bias"),
                                          stride=stride,
                                          padding=w.shape[-1] // 2)

    def gn(key, x, eps=1e-5):
        return torch.nn.functional.group_norm(
            x, cfg.norm_groups, t[key + ".weight"], t[key + ".bias"], eps)

    def resnet(key, x):
        h = conv(key + ".conv1", torch.nn.functional.silu(gn(key + ".norm1", x)))
        h = conv(key + ".conv2", torch.nn.functional.silu(gn(key + ".norm2", h)))
        if key + ".conv_shortcut.weight" in t:
            x = conv(key + ".conv_shortcut", x)
        return x + h

    def mid_attn(key, x):
        b, c, hh, ww = x.shape
        h = torch.nn.functional.group_norm(
            x, cfg.norm_groups, t[key + ".group_norm.weight"],
            t[key + ".group_norm.bias"], 1e-6)
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)

        def lin(k2, inp):
            return torch.nn.functional.linear(inp, t[k2 + ".weight"],
                                              t.get(k2 + ".bias"))

        q = lin(key + ".to_q", h)[:, None]
        k = lin(key + ".to_k", h)[:, None]
        v = lin(key + ".to_v", h)[:, None]
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)[:, 0]
        o = lin(key + ".to_out.0", o)
        return o.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + x

    x = lat_nchw
    if "post_quant_conv.weight" in t:
        x = conv("post_quant_conv", x)
    x = conv("decoder.conv_in", x)
    x = resnet("decoder.mid_block.resnets.0", x)
    if "decoder.mid_block.attentions.0.to_q.weight" in t:
        x = mid_attn("decoder.mid_block.attentions.0", x)
    x = resnet("decoder.mid_block.resnets.1", x)
    n = len(cfg.block_out_channels)
    for k in range(n):
        for j in range(cfg.layers_per_block + 1):
            x = resnet(f"decoder.up_blocks.{k}.resnets.{j}", x)
        if k < n - 1:
            x = torch.nn.functional.interpolate(x, scale_factor=2,
                                                mode="nearest")
            x = conv(f"decoder.up_blocks.{k}.upsamplers.0.conv", x)
    x = torch.nn.functional.silu(gn("decoder.conv_norm_out", x))
    return conv("decoder.conv_out", x)


def torch_reference_generate(model_dir, prompt, seed, steps, height, width,
                             guidance_scale=1.0):
    """Full fp32 torch-reference txt2img on a diffusers-layout SD1.5
    checkpoint. Independent of the JAX pipeline except for the pure
    host-side scheduler precompute (exact fp64 numpy, validated against
    the diffusers LCMScheduler formulas in tests/test_scheduler.py).

    Returns (float_image [B,H,W,3] in [0,1], uint8_image).
    """
    sub = lambda name: os.path.join(model_dir, name)
    unet_json = json.load(open(os.path.join(sub("unet"), "config.json")))
    unet_cfg = loader.unet_config_from_json(unet_json)
    unet_sd = loader._load_safetensors(
        loader.find_weights_file(sub("unet")))
    vae_dir = sub("vae") if os.path.isdir(sub("vae")) else sub("vae_decoder")
    vae_cfg = loader.vae_config_from_json(
        json.load(open(os.path.join(vae_dir, "config.json"))))
    vae_sd = loader._load_safetensors(loader.find_weights_file(vae_dir))
    text_sd = loader._load_safetensors(
        loader.find_weights_file(sub("text_encoder")))
    text_json = json.load(
        open(os.path.join(sub("text_encoder"), "config.json")))
    tokenizer = CLIPTokenizer.from_pretrained(sub("tokenizer"))
    sched_cfg = load_scheduler_config(model_dir)
    schedule = make_lcm_schedule(sched_cfg, steps, None)

    ids = tokenizer([prompt])
    with torch.no_grad():
        ctx = _torch_clip_text(text_sd, text_json, ids)

    # noise: bit-identical to LCMPipeline._sample_noise (host NCHW
    # RandomState; reference seed compatibility, rknnlcm.py:423-447)
    rs = np.random.RandomState(seed & 0x7FFFFFFF)
    # latent grid derives from the VAE downsample factor (2^(n_blocks-1))
    vs = 2 ** (len(vae_cfg.block_out_channels) - 1)
    h_lat, w_lat = height // vs, width // vs
    c = 4
    lat = rs.randn(1, c, h_lat, w_lat).astype(np.float32)
    lat = lat * np.float32(schedule.init_noise_sigma)
    noises = rs.randn(steps, 1, c, h_lat, w_lat).astype(np.float32)

    w_cond = None
    if unet_cfg.time_cond_proj_dim is not None:
        w_cond = torch.from_numpy(np.asarray(guidance_scale_embedding(
            np.asarray([guidance_scale - 1.0]), unet_cfg.time_cond_proj_dim
        ), np.float32))

    ref = _TorchUNetRef(unet_sd, unet_cfg)
    ref._ctx = ctx
    sched_np = {
        k: np.asarray(getattr(schedule, k), np.float32)
        for k in ("sqrt_alpha_prod", "sqrt_beta_prod",
                  "sqrt_alpha_prod_prev", "sqrt_beta_prod_prev",
                  "c_skip", "c_out", "add_noise")
    }
    timesteps = np.asarray(schedule.timesteps)
    sample = lat  # NCHW fp32
    assert sched_cfg.prediction_type == "epsilon", (
        "torch golden loop implements the epsilon parameterisation "
        "(LCM-Dreamshaper); extend for v_prediction checkpoints")
    with torch.no_grad():
        for i in range(steps):
            t = torch.from_numpy(
                np.asarray([timesteps[i]], np.float32))
            eps = ref.forward(torch.from_numpy(sample), t, ctx,
                              w_cond=w_cond).numpy()
            # lcm_step semantics (scheduler/lcm.py:267-307), fp32 on host
            sa, sb = sched_np["sqrt_alpha_prod"][i], sched_np["sqrt_beta_prod"][i]
            x0 = (sample - sb * eps) / sa
            denoised = (sched_np["c_out"][i] * x0
                        + sched_np["c_skip"][i] * sample)
            renoised = (sched_np["sqrt_alpha_prod_prev"][i] * denoised
                        + sched_np["sqrt_beta_prod_prev"][i] * noises[i])
            sample = np.where(sched_np["add_noise"][i] > 0, renoised,
                              denoised).astype(np.float32)
        img = _torch_vae_decode(
            vae_sd, vae_cfg,
            torch.from_numpy(denoised / np.float32(vae_cfg.scaling_factor)),
        ).numpy().transpose(0, 2, 3, 1)
    img = np.clip(img * 0.5 + 0.5, 0.0, 1.0)
    return img, np.round(img * 255.0).astype(np.uint8)


def pipeline_generate(model_dir, prompt, seed, steps, height, width,
                      guidance_scale=1.0):
    bundle = loader.load_pipeline(model_dir)
    pipe = LCMPipeline(bundle, dtype=jnp.float32)
    res = pipe.generate(prompt, height=height, width=width,
                        num_inference_steps=steps, seed=seed,
                        guidance_scale=guidance_scale)
    return np.asarray(res.images)


def _assert_pixel_bar(ours_u8, ref_float, ref_u8, *, context):
    """BASELINE.json: pixel output within 1e-2 of the fp32 reference."""
    ours = ours_u8.astype(np.float32) / 255.0
    diff = np.abs(ours - ref_float)
    # 1e-2 on [0,1] + half a uint8 quantization step of slack
    bar = 1e-2 + 0.5 / 255.0
    frac_bad = float((diff > bar).mean())
    max_diff = float(diff.max())
    u8_max = int(np.abs(ours_u8.astype(np.int16)
                        - ref_u8.astype(np.int16)).max())
    # the tail allowance (<0.01% of pixels may exceed the bar — fp
    # reassociation near hard clip edges) is NOT a loophole for broken
    # patches: even outliers must stay within a bounded magnitude
    # (code-review r5: without the cap, a corrupted 5x5 tile would pass)
    assert max_diff <= bar or (frac_bad < 1e-4 and max_diff < 0.05), (
        f"{context}: max |Δ| {max_diff:.4f} (bar {bar:.4f}), "
        f"{frac_bad:.2%} of pixels above bar, uint8 max delta {u8_max}"
    )


# ---------------------------------------------------------------------------
# CI self-check: the harness runs end-to-end on a synthetic checkpoint
# ---------------------------------------------------------------------------


def test_harness_on_tiny_checkpoint(tmp_path):
    """Proves the real-weight gate's machinery today: the torch-reference
    generator and the production pipeline agree at the BASELINE bar on a
    complete synthetic diffusers checkpoint. When a real artifact lands,
    test_real_checkpoint_pixel_bar runs this exact path at 512²."""
    from tests.test_loader import make_tiny_checkpoint

    root = make_tiny_checkpoint(tmp_path / "ckpt")
    kw = dict(prompt="a cat dog sunset", seed=77, steps=2,
              height=32, width=32)
    ref_float, ref_u8 = torch_reference_generate(root, **kw)
    ours_u8 = pipeline_generate(root, **kw)
    assert ours_u8.shape == ref_u8.shape == (1, 32, 32, 3)
    _assert_pixel_bar(ours_u8, ref_float, ref_u8, context="tiny-checkpoint")


# ---------------------------------------------------------------------------
# the real gate (skipped until an artifact exists)
# ---------------------------------------------------------------------------


requires_real = pytest.mark.skipif(
    not (REAL_ROOT and os.path.isdir(os.path.join(REAL_ROOT, "unet"))),
    reason="no real checkpoint: set DREAMLAB_MODEL_ROOT to a diffusers-layout "
           "SD1.5 LCM checkpoint (e.g. LCM-Dreamshaper-V7)",
)


def _golden_path():
    cfg_key = hashlib.sha1(
        f"{os.path.basename(REAL_ROOT.rstrip('/'))}|{REAL_PROMPT}|{REAL_SEED}"
        f"|{REAL_STEPS}|{REAL_SIZE}".encode()
    ).hexdigest()[:12]
    return os.path.join(GOLDEN_DIR, f"sd15_{cfg_key}.npz")


@requires_real
def test_real_checkpoint_pixel_bar():
    """BASELINE.json fidelity bar on the real checkpoint, 512² 4-step LCM."""
    ref_float, ref_u8 = torch_reference_generate(
        REAL_ROOT, REAL_PROMPT, REAL_SEED, REAL_STEPS, REAL_SIZE, REAL_SIZE)

    golden = _golden_path()
    if os.path.exists(golden):
        stored = np.load(golden)
        # the torch reference must be reproducible against the stored golden
        np.testing.assert_allclose(ref_float, stored["ref_float"], atol=1e-5)
    else:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(golden, ref_float=ref_float, ref_u8=ref_u8,
                            prompt=REAL_PROMPT, seed=REAL_SEED,
                            steps=REAL_STEPS, size=REAL_SIZE)

    ours_u8 = pipeline_generate(
        REAL_ROOT, REAL_PROMPT, REAL_SEED, REAL_STEPS, REAL_SIZE, REAL_SIZE)
    _assert_pixel_bar(ours_u8, ref_float, ref_u8, context="real-checkpoint")


@requires_real
def test_real_checkpoint_clip_vs_transformers():
    """The checkpoint's text tower through our converter vs real HF
    transformers loaded from the same directory."""
    transformers = pytest.importorskip("transformers")
    from dreamlab_tpu.models import clip_text

    te_dir = os.path.join(REAL_ROOT, "text_encoder")
    hf = transformers.CLIPTextModel.from_pretrained(te_dir).eval()
    text_cfg = loader.text_config_from_json(
        json.load(open(os.path.join(te_dir, "config.json"))))
    params = loader.convert_clip_text(
        loader._load_safetensors(loader.find_weights_file(te_dir)), text_cfg)
    tokenizer = CLIPTokenizer.from_pretrained(
        os.path.join(REAL_ROOT, "tokenizer"))
    ids = tokenizer([REAL_PROMPT, "low quality, blurry"])
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(
            np.asarray(ids, np.int64))).last_hidden_state.numpy()
    got, _ = clip_text.encode_text(params, jnp.asarray(ids, jnp.int32),
                                   text_cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
