"""Checkpoint loader: key mapping round-trips, config parsing, end-to-end
directory loading with a synthetic tiny diffusers-layout checkpoint."""

import json
import os

import numpy as np
import pytest

import jax

from dreamlab_tpu import loader
from dreamlab_tpu.models import clip_text, configs, unet, vae
from dreamlab_tpu.utils.tokenizer import make_test_tokenizer


# ---------------------------------------------------------------------------
# inverse exporters: my pytree -> torch-named flat dict (tests only)
# ---------------------------------------------------------------------------


def _put_conv(out, key, p):
    out[key + ".weight"] = np.ascontiguousarray(p["w"].transpose(3, 2, 0, 1))
    if "b" in p:
        out[key + ".bias"] = p["b"]


def _put_linear(out, key, p):
    out[key + ".weight"] = np.ascontiguousarray(p["w"].T)
    if "b" in p:
        out[key + ".bias"] = p["b"]


def _put_norm(out, key, p):
    out[key + ".weight"] = p["scale"]
    out[key + ".bias"] = p["bias"]


def export_unet(params, cfg):
    out = {}
    _put_conv(out, "conv_in", params["conv_in"])
    _put_linear(out, "time_embedding.linear_1", params["time_embedding"]["linear_1"])
    _put_linear(out, "time_embedding.linear_2", params["time_embedding"]["linear_2"])
    if "cond_proj" in params["time_embedding"]:
        _put_linear(out, "time_embedding.cond_proj", params["time_embedding"]["cond_proj"])
    if "add_embedding" in params:
        _put_linear(out, "add_embedding.linear_1", params["add_embedding"]["linear_1"])
        _put_linear(out, "add_embedding.linear_2", params["add_embedding"]["linear_2"])

    def put_attn(key, p):
        _put_linear(out, key + ".to_q", p["q"])
        _put_linear(out, key + ".to_k", p["k"])
        _put_linear(out, key + ".to_v", p["v"])
        _put_linear(out, key + ".to_out.0", p["out"])

    def put_tf(key, p):
        _put_norm(out, key + ".norm", p["norm"])
        _put_linear(out, key + ".proj_in", p["proj_in"])
        for k, blk in enumerate(p["blocks"]):
            b = f"{key}.transformer_blocks.{k}"
            _put_norm(out, b + ".norm1", blk["ln1"])
            put_attn(b + ".attn1", blk["attn1"])
            _put_norm(out, b + ".norm2", blk["ln2"])
            put_attn(b + ".attn2", blk["attn2"])
            _put_norm(out, b + ".norm3", blk["ln3"])
            _put_linear(out, b + ".ff.net.0.proj", blk["ff_geglu"])
            _put_linear(out, b + ".ff.net.2", blk["ff_out"])
        _put_linear(out, key + ".proj_out", p["proj_out"])

    def put_resnet(key, p):
        _put_norm(out, key + ".norm1", p["norm1"])
        _put_conv(out, key + ".conv1", p["conv1"])
        _put_linear(out, key + ".time_emb_proj", p["time_emb_proj"])
        _put_norm(out, key + ".norm2", p["norm2"])
        _put_conv(out, key + ".conv2", p["conv2"])
        if "shortcut" in p:
            _put_conv(out, key + ".conv_shortcut", p["shortcut"])

    for i, block in enumerate(params["down"]):
        for j, res in enumerate(block["resnets"]):
            put_resnet(f"down_blocks.{i}.resnets.{j}", res)
            if block.get("attentions"):
                put_tf(f"down_blocks.{i}.attentions.{j}", block["attentions"][j])
        if "downsample" in block:
            _put_conv(out, f"down_blocks.{i}.downsamplers.0.conv", block["downsample"])

    put_resnet("mid_block.resnets.0", params["mid"]["resnet1"])
    put_resnet("mid_block.resnets.1", params["mid"]["resnet2"])
    if "attention" in params["mid"]:
        put_tf("mid_block.attentions.0", params["mid"]["attention"])

    for k, block in enumerate(params["up"]):
        for j, res in enumerate(block["resnets"]):
            put_resnet(f"up_blocks.{k}.resnets.{j}", res)
            if block.get("attentions"):
                put_tf(f"up_blocks.{k}.attentions.{j}", block["attentions"][j])
        if "upsample" in block:
            _put_conv(out, f"up_blocks.{k}.upsamplers.0.conv", block["upsample"])

    _put_norm(out, "conv_norm_out", params["norm_out"])
    _put_conv(out, "conv_out", params["conv_out"])
    return out


def export_vae_decoder(params, cfg):
    out = {}
    if "post_quant_conv" in params:
        _put_conv(out, "post_quant_conv", params["post_quant_conv"])
    _put_conv(out, "decoder.conv_in", params["conv_in"])

    def put_resnet(key, p):
        _put_norm(out, key + ".norm1", p["norm1"])
        _put_conv(out, key + ".conv1", p["conv1"])
        _put_norm(out, key + ".norm2", p["norm2"])
        _put_conv(out, key + ".conv2", p["conv2"])
        if "shortcut" in p:
            _put_conv(out, key + ".conv_shortcut", p["shortcut"])

    put_resnet("decoder.mid_block.resnets.0", params["mid"]["resnet1"])
    put_resnet("decoder.mid_block.resnets.1", params["mid"]["resnet2"])
    a = params["mid"]["attention"]
    _put_norm(out, "decoder.mid_block.attentions.0.group_norm", a["norm"])
    _put_linear(out, "decoder.mid_block.attentions.0.to_q", a["q"])
    _put_linear(out, "decoder.mid_block.attentions.0.to_k", a["k"])
    _put_linear(out, "decoder.mid_block.attentions.0.to_v", a["v"])
    _put_linear(out, "decoder.mid_block.attentions.0.to_out.0", a["out"])
    for k, block in enumerate(params["up"]):
        for j, res in enumerate(block["resnets"]):
            put_resnet(f"decoder.up_blocks.{k}.resnets.{j}", res)
        if "upsample" in block:
            _put_conv(out, f"decoder.up_blocks.{k}.upsamplers.0.conv", block["upsample"])
    _put_norm(out, "decoder.conv_norm_out", params["norm_out"])
    _put_conv(out, "decoder.conv_out", params["conv_out"])
    return out


def export_vae_encoder(params, cfg):
    out = {}
    _put_conv(out, "encoder.conv_in", params["conv_in"])

    def put_resnet(key, p):
        _put_norm(out, key + ".norm1", p["norm1"])
        _put_conv(out, key + ".conv1", p["conv1"])
        _put_norm(out, key + ".norm2", p["norm2"])
        _put_conv(out, key + ".conv2", p["conv2"])
        if "shortcut" in p:
            _put_conv(out, key + ".conv_shortcut", p["shortcut"])

    for i, block in enumerate(params["down"]):
        for j, res in enumerate(block["resnets"]):
            put_resnet(f"encoder.down_blocks.{i}.resnets.{j}", res)
        if "downsample" in block:
            _put_conv(out, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                      block["downsample"])
    put_resnet("encoder.mid_block.resnets.0", params["mid"]["resnet1"])
    put_resnet("encoder.mid_block.resnets.1", params["mid"]["resnet2"])
    a = params["mid"]["attention"]
    _put_norm(out, "encoder.mid_block.attentions.0.group_norm", a["norm"])
    _put_linear(out, "encoder.mid_block.attentions.0.to_q", a["q"])
    _put_linear(out, "encoder.mid_block.attentions.0.to_k", a["k"])
    _put_linear(out, "encoder.mid_block.attentions.0.to_v", a["v"])
    _put_linear(out, "encoder.mid_block.attentions.0.to_out.0", a["out"])
    _put_norm(out, "encoder.conv_norm_out", params["norm_out"])
    _put_conv(out, "encoder.conv_out", params["conv_out"])
    _put_conv(out, "quant_conv", params["quant_conv"])
    return out


def export_clip(params, cfg):
    out = {}
    pre = "text_model."
    out[pre + "embeddings.token_embedding.weight"] = params["token_embedding"]["w"]
    out[pre + "embeddings.position_embedding.weight"] = params["position_embedding"]["w"]
    for i, layer in enumerate(params["layers"]):
        b = f"{pre}encoder.layers.{i}"
        _put_norm(out, b + ".layer_norm1", layer["ln1"])
        _put_linear(out, b + ".self_attn.q_proj", layer["attn"]["q"])
        _put_linear(out, b + ".self_attn.k_proj", layer["attn"]["k"])
        _put_linear(out, b + ".self_attn.v_proj", layer["attn"]["v"])
        _put_linear(out, b + ".self_attn.out_proj", layer["attn"]["out"])
        _put_norm(out, b + ".layer_norm2", layer["ln2"])
        _put_linear(out, b + ".mlp.fc1", layer["fc1"])
        _put_linear(out, b + ".mlp.fc2", layer["fc2"])
    _put_norm(out, pre + "final_layer_norm", params["final_ln"])
    if "text_projection" in params:
        _put_linear(out, "text_projection", params["text_projection"])
    return out


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_unet_conversion_roundtrip():
    cfg = configs.TINY_UNET
    params = unet.init_params(cfg, np.random.RandomState(0))
    flat = export_unet(params, cfg)
    back = loader.convert_unet(flat, cfg)
    _trees_equal(params, back)


def test_unet_sdxl_conversion_roundtrip():
    cfg = configs.TINY_UNET_XL
    params = unet.init_params(cfg, np.random.RandomState(0))
    back = loader.convert_unet(export_unet(params, cfg), cfg)
    _trees_equal(params, back)


def test_vae_conversion_roundtrip():
    cfg = configs.TINY_VAE
    params = vae.init_decoder_params(cfg, np.random.RandomState(0))
    back = loader.convert_vae_decoder(export_vae_decoder(params, cfg), cfg)
    _trees_equal(params, back)


def test_clip_conversion_roundtrip():
    cfg = configs.TINY_TEXT
    params = clip_text.init_params(cfg, np.random.RandomState(0))
    back = loader.convert_clip_text(export_clip(params, cfg), cfg)
    _trees_equal(params, back)


SD15_UNET_JSON = {
    "block_out_channels": [320, 640, 1280, 1280],
    "down_block_types": [
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D",
    ],
    "up_block_types": [
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    ],
    "attention_head_dim": 8,
    "cross_attention_dim": 768,
    "layers_per_block": 2,
    "in_channels": 4,
    "out_channels": 4,
    "norm_num_groups": 32,
    "time_cond_proj_dim": 256,
    "mid_block_type": "UNetMidBlock2DCrossAttn",
}

SDXL_UNET_JSON = {
    "block_out_channels": [320, 640, 1280],
    "down_block_types": [
        "DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
    ],
    "up_block_types": [
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D",
    ],
    "transformer_layers_per_block": [1, 2, 10],
    "num_attention_heads": [5, 10, 20],
    "cross_attention_dim": 2048,
    "addition_embed_type": "text_time",
    "addition_time_embed_dim": 256,
    "projection_class_embeddings_input_dim": 2816,
    "layers_per_block": 2,
    "mid_block_type": "UNetMidBlock2DCrossAttn",
}


def test_unet_config_parsing_sd15():
    cfg = loader.unet_config_from_json(SD15_UNET_JSON)
    assert cfg == configs.SD15_UNET
    assert loader.classify_arch(cfg.cross_attention_dim) == "sd15"


def test_unet_config_parsing_sdxl():
    cfg = loader.unet_config_from_json(SDXL_UNET_JSON)
    assert cfg.transformer_layers_per_block == (0, 2, 10)
    assert cfg.num_attention_heads == (5, 10, 20)
    assert cfg.mid_block_transformer_layers == 10
    assert loader.classify_arch(cfg.cross_attention_dim) == "sdxl"


def test_classify_arch_rejects_unknown():
    with pytest.raises(ValueError):
        loader.classify_arch(512)


# ---------------------------------------------------------------------------
# synthetic checkpoint directory
# ---------------------------------------------------------------------------


def make_tiny_checkpoint(root, arch="sd15"):
    """Write a complete tiny diffusers-layout checkpoint; returns its dir."""
    from safetensors.numpy import save_file

    root = str(root)
    unet_cfg = configs.TINY_UNET
    os.makedirs(os.path.join(root, "unet"))
    unet_json = {
        "block_out_channels": list(unet_cfg.block_out_channels),
        "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
        "attention_head_dim": 2,
        "cross_attention_dim": 768,  # keep detection in SD1.5 class
        "layers_per_block": 1,
        "norm_num_groups": 8,
        "time_cond_proj_dim": 8,
        "mid_block_type": "UNetMidBlock2DCrossAttn",
    }
    # actual tensors use ctx dim 32 (TINY); override config field for shape use
    unet_json["cross_attention_dim"] = 768
    with open(os.path.join(root, "unet", "config.json"), "w") as f:
        json.dump(unet_json, f)
    # build params with the parsed config so shapes line up
    parsed = loader.unet_config_from_json(unet_json)
    uparams = unet.init_params(parsed, np.random.RandomState(0))
    save_file(export_unet(uparams, parsed),
              os.path.join(root, "unet", "diffusion_pytorch_model.safetensors"))

    vae_cfg = configs.TINY_VAE
    os.makedirs(os.path.join(root, "vae"))
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump({
            "block_out_channels": list(vae_cfg.block_out_channels),
            "layers_per_block": 1, "norm_num_groups": 8,
            "latent_channels": 4, "scaling_factor": 0.18215,
        }, f)
    vparams = vae.init_decoder_params(vae_cfg, np.random.RandomState(1))
    veparams = vae.init_encoder_params(vae_cfg, np.random.RandomState(3))
    save_file({**export_vae_decoder(vparams, vae_cfg),
               **export_vae_encoder(veparams, vae_cfg)},
              os.path.join(root, "vae", "diffusion_pytorch_model.safetensors"))

    tok = make_test_tokenizer(["cat", "dog", "sunset"])
    vocab_size = len(tok.encoder)
    # hidden width must equal the UNet's cross_attention_dim (768 keeps the
    # checkpoint classified as SD1.5-class, as in real SD1.5)
    text_cfg = configs.CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=768, num_layers=2, num_heads=2,
        intermediate_size=64,
    )
    os.makedirs(os.path.join(root, "text_encoder"))
    with open(os.path.join(root, "text_encoder", "config.json"), "w") as f:
        json.dump({
            "vocab_size": vocab_size, "hidden_size": 768, "num_hidden_layers": 2,
            "num_attention_heads": 2, "intermediate_size": 64,
            "architectures": ["CLIPTextModel"], "hidden_act": "quick_gelu",
        }, f)
    tparams = clip_text.init_params(text_cfg, np.random.RandomState(2))
    save_file(export_clip(tparams, text_cfg),
              os.path.join(root, "text_encoder", "model.safetensors"))
    os.makedirs(os.path.join(root, "tokenizer"))
    with open(os.path.join(root, "tokenizer", "vocab.json"), "w") as f:
        json.dump(tok.encoder, f)
    with open(os.path.join(root, "tokenizer", "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(
            " ".join(p) for p in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
        ) + "\n")

    os.makedirs(os.path.join(root, "scheduler"))
    with open(os.path.join(root, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump({
            "num_train_timesteps": 1000, "beta_start": 0.00085,
            "beta_end": 0.012, "beta_schedule": "scaled_linear",
            "original_inference_steps": 50, "prediction_type": "epsilon",
            "timestep_scaling": 10.0,
        }, f)
    return root


def test_load_pipeline_end_to_end(tmp_path):
    d = make_tiny_checkpoint(tmp_path / "ckpt")
    bundle = loader.load_pipeline(d)
    assert bundle.arch == "sd15"
    assert bundle.unet_cfg.cross_attention_dim == 768
    assert bundle.scheduler_cfg.original_inference_steps == 50
    # loaded params drive a forward pass
    import jax.numpy as jnp
    rs = np.random.RandomState(0)
    ids = bundle.tokenizer("a cat at sunset")
    seq, _ = clip_text.encode_text(bundle.text_params, jnp.asarray(ids), bundle.text_cfg)
    assert seq.shape == (1, 77, 768)
    out = unet.forward(
        bundle.unet_params, bundle.unet_cfg,
        jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32),
        jnp.asarray([999], jnp.int32),
        jnp.asarray(rs.randn(1, 77, 768), jnp.float32),
        timestep_cond=jnp.asarray(rs.randn(1, 8), jnp.float32),
    )
    assert out.shape == (1, 4, 4, 4)
