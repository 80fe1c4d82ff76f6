"""SDXL-refiner serving: single bigG tower + 5-value micro-conditioning.

Beyond the reference (it only *detects* refiners): a refiner-layout
checkpoint (text_encoder_2/tokenizer_2 only, cad 1280-class) loads with
the bigG tower as THE text tower, the UNet takes [orig_wh, crop,
aesthetic_score] time-ids, and the img2img path serves the refiner's
actual task (refining an init image).
"""

import json
import os

import numpy as np

import jax.numpy as jnp

from dreamlab_tpu.loader import PipelineBundle, load_pipeline
from dreamlab_tpu.models import clip_text, configs, unet, vae
from dreamlab_tpu.pipeline import LCMPipeline
from dreamlab_tpu.scheduler.lcm import LCMConfig
from dreamlab_tpu.utils.tokenizer import make_test_tokenizer

TINY_REFINER_UNET = configs.UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    transformer_layers_per_block=(0, 2),
    num_attention_heads=(2, 2),
    cross_attention_dim=64,
    norm_groups=8,
    time_cond_proj_dim=None,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=32 + 5 * 8,  # pooled 32 + 5 ids
    mid_block_transformer_layers=1,
)


def _tiny_refiner_bundle():
    rs = np.random.RandomState(0)
    tok = make_test_tokenizer(["castle"])
    text_cfg = configs.CLIPTextConfig(
        vocab_size=len(tok.encoder), hidden_size=64, num_layers=2,
        num_heads=2, intermediate_size=64, hidden_act="gelu",
        penultimate=True, projection_dim=32,
    )
    vae_cfg = configs.TINY_VAE
    return PipelineBundle(
        arch="sdxl",
        model_dir="<memory>",
        tokenizer=tok,
        text_cfg=text_cfg,
        text_params=clip_text.init_params(text_cfg, rs),
        unet_cfg=TINY_REFINER_UNET,
        unet_params=unet.init_params(TINY_REFINER_UNET, rs),
        vae_cfg=vae_cfg,
        vae_params=vae.init_decoder_params(vae_cfg, rs),
        scheduler_cfg=LCMConfig(),
        vae_encoder_params=vae.init_encoder_params(vae_cfg, rs),
        # no second tower: the refiner signature
    )


def test_time_ids_count_derives_from_config():
    pipe = LCMPipeline(_tiny_refiner_bundle(), dtype=jnp.float32)
    ids = np.asarray(pipe._time_ids(512, 512, 2, aesthetic_score=6.5))
    assert ids.shape == (2, 5)
    assert list(ids[0]) == [512, 512, 0, 0, 6.5]

    from dreamlab_tpu.testing import random_bundle

    base = LCMPipeline(random_bundle("sdxl", tiny=True), dtype=jnp.float32)
    ids6 = np.asarray(base._time_ids(256, 256, 1))
    assert ids6.shape == (1, 6)


def test_refiner_generates_txt2img_and_img2img():
    pipe = LCMPipeline(_tiny_refiner_bundle(), dtype=jnp.float32)
    res = pipe.generate("a castle", height=16, width=16,
                        num_inference_steps=2, seed=5, guidance_scale=3.0)
    assert res.images.shape == (1, 16, 16, 3)

    # the refiner's actual job: refine an init image
    rs = np.random.RandomState(1)
    init = rs.randint(0, 256, (16, 16, 3), np.uint8)
    res2 = pipe.img2img("a castle, detailed", init, strength=0.3,
                        num_inference_steps=2, seed=6, guidance_scale=3.0)
    assert res2.images.shape == (1, 16, 16, 3)


def test_refiner_diffusers_dir_loads(tmp_path):
    """A text_encoder_2/tokenizer_2-only directory loads with the bigG
    tower as the primary text tower, and generation runs end-to-end."""
    from safetensors.numpy import save_file

    from dreamlab_tpu import loader
    from tests.test_loader import export_clip, export_unet, export_vae_decoder

    rs = np.random.RandomState(2)
    root = tmp_path / "refiner"
    tok = make_test_tokenizer(["castle"])

    # unet/ — refiner-shaped config
    os.makedirs(root / "unet")
    unet_json = {
        "block_out_channels": [32, 64],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D"],
        "transformer_layers_per_block": [1, 2],
        "attention_head_dim": 2,
        "cross_attention_dim": 1280,
        "layers_per_block": 1,
        "norm_num_groups": 8,
        "addition_embed_type": "text_time",
        "addition_time_embed_dim": 8,
        "projection_class_embeddings_input_dim": 32 + 5 * 8,
        "mid_block_type": "UNetMidBlock2DCrossAttn",
    }
    (root / "unet" / "config.json").write_text(json.dumps(unet_json))
    parsed = loader.unet_config_from_json(unet_json)
    uparams = unet.init_params(parsed, rs)
    save_file(export_unet(uparams, parsed),
              str(root / "unet" / "diffusion_pytorch_model.safetensors"))

    # vae/
    os.makedirs(root / "vae")
    (root / "vae" / "config.json").write_text(json.dumps({
        "block_out_channels": [16, 32], "layers_per_block": 1,
        "norm_num_groups": 8, "latent_channels": 4,
        "scaling_factor": 0.13025,
    }))
    vparams = vae.init_decoder_params(configs.TINY_VAE, rs)
    save_file(export_vae_decoder(vparams, configs.TINY_VAE),
              str(root / "vae" / "diffusion_pytorch_model.safetensors"))

    # ONLY text_encoder_2 / tokenizer_2 (the refiner signature)
    text_cfg = configs.CLIPTextConfig(
        vocab_size=len(tok.encoder), hidden_size=1280, num_layers=2,
        num_heads=2, intermediate_size=64, hidden_act="gelu",
        penultimate=True, projection_dim=32,
    )
    os.makedirs(root / "text_encoder_2")
    (root / "text_encoder_2" / "config.json").write_text(json.dumps({
        "vocab_size": len(tok.encoder), "hidden_size": 1280,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "intermediate_size": 64, "hidden_act": "gelu",
        "projection_dim": 32,
        "architectures": ["CLIPTextModelWithProjection"],
    }))
    tparams = clip_text.init_params(text_cfg, rs)
    save_file(export_clip(tparams, text_cfg),
              str(root / "text_encoder_2" / "model.safetensors"))
    os.makedirs(root / "tokenizer_2")
    (root / "tokenizer_2" / "vocab.json").write_text(json.dumps(tok.encoder))
    (root / "tokenizer_2" / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(
            " ".join(pair) for pair in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
        ) + "\n"
    )

    bundle = load_pipeline(str(root))
    assert bundle.arch == "sdxl"
    assert bundle.text_params_2 is None  # single-tower
    assert bundle.text_cfg.projection_dim == 32
    assert bundle.text_cfg.hidden_size == 1280

    pipe = LCMPipeline(bundle, dtype=jnp.float32)
    res = pipe.generate("a castle", height=16, width=16,
                        num_inference_steps=1, seed=1, guidance_scale=2.0)
    assert res.images.shape == (1, 16, 16, 3)
