"""Test/bench helpers: randomly initialized full- or tiny-size bundles.

Performance of the compiled programs is independent of weight values, so
benchmarks run the *real* architectures with random params when no checkpoint
directory is available (this environment has no model artifacts on disk).
"""

from __future__ import annotations

import numpy as np

from .loader import PipelineBundle
from .models import clip_text, configs, controlnet, unet, vae
from .scheduler.lcm import LCMConfig
from .utils.tokenizer import make_test_tokenizer


def random_bundle(arch: str = "sd15", *, tiny: bool = False, seed: int = 0) -> PipelineBundle:
    rng = np.random.RandomState(seed)
    if arch == "sd15":
        text_cfg = configs.TINY_TEXT if tiny else configs.SD15_TEXT
        unet_cfg = configs.TINY_UNET if tiny else configs.SD15_UNET
        vae_cfg = configs.TINY_VAE if tiny else configs.SD15_VAE
        if tiny:
            # tie text width to cross-attention dim as in real checkpoints
            text_cfg = configs.CLIPTextConfig(
                vocab_size=0, hidden_size=unet_cfg.cross_attention_dim,
                num_layers=2, num_heads=2, intermediate_size=64,
            )
        tok = make_test_tokenizer(["cat", "dog", "sunset", "mountain"])
        text_cfg = configs.CLIPTextConfig(
            **{**text_cfg.__dict__, "vocab_size": len(tok.encoder)}
        )
        return PipelineBundle(
            arch="sd15",
            model_dir="<random>",
            tokenizer=tok,
            text_cfg=text_cfg,
            text_params=clip_text.init_params(text_cfg, rng),
            unet_cfg=unet_cfg,
            unet_params=unet.init_params(unet_cfg, rng),
            vae_cfg=vae_cfg,
            vae_params=vae.init_decoder_params(vae_cfg, rng),
            scheduler_cfg=LCMConfig(),
            vae_encoder_params=vae.init_encoder_params(vae_cfg, rng),
        )
    if arch == "sdxl":
        unet_cfg = configs.TINY_UNET_XL if tiny else configs.SDXL_UNET
        vae_cfg = configs.TINY_VAE if tiny else configs.SDXL_VAE
        tok = make_test_tokenizer(["cat", "dog", "sunset", "mountain"])
        if tiny:
            text_cfg = configs.CLIPTextConfig(
                vocab_size=len(tok.encoder), hidden_size=32, num_layers=2,
                num_heads=2, intermediate_size=64, penultimate=True,
            )
            text_cfg_2 = configs.CLIPTextConfig(
                vocab_size=len(tok.encoder),
                hidden_size=unet_cfg.cross_attention_dim - 32,
                num_layers=2, num_heads=2, intermediate_size=64,
                penultimate=True, projection_dim=32,
            )
        else:
            text_cfg = configs.CLIPTextConfig(
                **{**configs.SDXL_TEXT_L.__dict__, "vocab_size": len(tok.encoder)}
            )
            text_cfg_2 = configs.CLIPTextConfig(
                **{**configs.SDXL_TEXT_BIGG.__dict__, "vocab_size": len(tok.encoder)}
            )
        return PipelineBundle(
            arch="sdxl",
            model_dir="<random>",
            tokenizer=tok,
            text_cfg=text_cfg,
            text_params=clip_text.init_params(text_cfg, rng),
            unet_cfg=unet_cfg,
            unet_params=unet.init_params(unet_cfg, rng),
            vae_cfg=vae_cfg,
            vae_params=vae.init_decoder_params(vae_cfg, rng),
            scheduler_cfg=LCMConfig(),
            tokenizer_2=tok,
            text_cfg_2=text_cfg_2,
            text_params_2=clip_text.init_params(text_cfg_2, rng),
        )
    raise ValueError(f"unknown arch {arch}")


def tiny_lora_state_dict(c: int, *, rank: int = 4, seed: int = 0):
    """Kohya-format single-module LoRA targeting down.0's attn1.q — the
    smallest adapter that exercises parse + merge (including the pipeline's
    packed-qkv layout). ``c`` must match the block's channel width."""
    rs = np.random.RandomState(seed)
    key = ("lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
           "_attn1_to_q")
    return {
        f"{key}.lora_down.weight": rs.randn(rank, c).astype(np.float32),
        f"{key}.lora_up.weight": rs.randn(c, rank).astype(np.float32),
        f"{key}.alpha": np.array(rank, np.float32),
    }


def random_controlnet(unet_cfg, *, seed: int = 7, zero_taps: bool = False,
                      vae_scale: int = 8):
    """Random ControlNet params matching ``unet_cfg``'s trunk.

    The hint-embedding ladder length is derived from ``vae_scale`` so the
    cond embedding lands exactly at latent resolution (tiny test VAEs use
    scale 2; production SD VAEs use 8).
    """
    import math

    n_downs = int(math.log2(vae_scale))
    chans = tuple(16 * 2**i for i in range(n_downs + 1))
    return controlnet.init_params(
        unet_cfg, np.random.RandomState(seed),
        cond_channels=chans, zero_taps=zero_taps,
    )
