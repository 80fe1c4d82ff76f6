"""SDXL single-file checkpoint loading (round-1 VERDICT #6).

String-level tests pin the OpenCLIP-bigG → transformers translation (packed
q/k/v split, ln renames, text_projection transpose); the functional test
writes a complete tiny SDXL-shaped LDM checkpoint with independent
exporters and loads it through the production load_single_file, then runs a
generation step.
"""

import json
import os
import re

import numpy as np
import pytest

import jax

from dreamlab_tpu import loader
from dreamlab_tpu.loader_single_file import (
    _derive_unet_cfg_sdxl,
    _translate_text_openclip,
    load_single_file,
)
from dreamlab_tpu.models import clip_text, configs, unet, vae
from dreamlab_tpu.utils.tokenizer import make_test_tokenizer
from tests.test_loader import (
    _put_conv,
    _put_linear,
    _put_norm,
    export_clip,
    export_vae_decoder,
)
from tests.test_single_file import export_unet_ldm

# ---------------------------------------------------------------------------
# tiny SDXL-shaped configs (dims chosen so the shape-driven derivation rules
# — 64-dim heads, 32-group norms — reproduce them exactly)
# ---------------------------------------------------------------------------

TINY_XL_UNET = configs.UNetConfig(
    block_out_channels=(64, 128),
    layers_per_block=1,
    transformer_layers_per_block=(0, 2),
    num_attention_heads=(1, 2),
    cross_attention_dim=1280,
    norm_groups=32,
    time_cond_proj_dim=None,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=640 + 6 * 8,
    mid_block_transformer_layers=2,
)

TINY_XL_TEXT_L = configs.CLIPTextConfig(
    hidden_size=640, num_layers=2, num_heads=10, intermediate_size=128,
    penultimate=True,
)
TINY_XL_TEXT_G = configs.CLIPTextConfig(
    hidden_size=640, num_layers=2, num_heads=10, intermediate_size=128,
    hidden_act="gelu", penultimate=True, projection_dim=640,
)

TINY_XL_VAE = configs.VAEConfig(
    block_out_channels=(32, 64), layers_per_block=1, norm_groups=32,
    scaling_factor=0.13025,
)


# ---------------------------------------------------------------------------
# independent exporters (write the published formats, not the inverse of the
# production mapper)
# ---------------------------------------------------------------------------


def export_openclip(params, prefix="conditioner.embedders.1.model."):
    """clip_text params → OpenCLIP naming with fused in_proj."""
    out = {}
    out[prefix + "token_embedding.weight"] = params["token_embedding"]["w"]
    out[prefix + "positional_embedding"] = params["position_embedding"]["w"]
    for i, lp in enumerate(params["layers"]):
        b = f"{prefix}transformer.resblocks.{i}."
        _put_norm(out, b + "ln_1", lp["ln1"])
        out[b + "attn.in_proj_weight"] = np.concatenate(
            [lp["attn"][k]["w"].T for k in ("q", "k", "v")], axis=0
        )
        out[b + "attn.in_proj_bias"] = np.concatenate(
            [lp["attn"][k]["b"] for k in ("q", "k", "v")], axis=0
        )
        _put_linear(out, b + "attn.out_proj", lp["attn"]["out"])
        _put_norm(out, b + "ln_2", lp["ln2"])
        _put_linear(out, b + "mlp.c_fc", lp["fc1"])
        _put_linear(out, b + "mlp.c_proj", lp["fc2"])
    _put_norm(out, prefix + "ln_final", params["final_ln"])
    # OpenCLIP applies pooled @ text_projection: [C, proj], our layout as-is
    out[prefix + "text_projection"] = params["text_projection"]["w"]
    out[prefix + "logit_scale"] = np.float32(4.6)
    return out


def diffusers_vae_to_ldm(diff, n_blocks):
    """decoder/encoder diffusers names → first_stage_model LDM names."""
    out = {}
    for k, t in diff.items():
        m = re.match(r"decoder\.up_blocks\.(\d+)\.(.*)", k)
        if m:
            k = f"decoder.up.{n_blocks - 1 - int(m.group(1))}.{m.group(2)}"
        k = re.sub(r"encoder\.down_blocks\.(\d+)\.", r"encoder.down.\1.", k)
        k = k.replace("upsamplers.0.conv", "upsample.conv")
        k = k.replace("downsamplers.0.conv", "downsample.conv")
        k = k.replace("resnets.", "block.")
        k = k.replace("conv_shortcut", "nin_shortcut")
        k = k.replace("mid_block.block.0", "mid.block_1")
        k = k.replace("mid_block.block.1", "mid.block_2")
        k = k.replace("mid_block.attentions.0", "mid.attn_1")
        k = k.replace("attn_1.group_norm", "attn_1.norm")
        k = k.replace("attn_1.to_out.0", "attn_1.proj_out")
        k = k.replace("attn_1.to_q", "attn_1.q")
        k = k.replace("attn_1.to_k", "attn_1.k")
        k = k.replace("attn_1.to_v", "attn_1.v")
        k = k.replace("conv_norm_out", "norm_out")
        out["first_stage_model." + k] = t
    return out


def make_tiny_sdxl_single_file(tmp_path):
    from safetensors.numpy import save_file

    rs = np.random.RandomState(0)
    tensors = {}

    uparams = unet.init_params(TINY_XL_UNET, rs)
    tensors.update(export_unet_ldm(uparams, TINY_XL_UNET))
    # export_unet_ldm predates SDXL: add the micro-conditioning MLP
    _put_linear(tensors, "model.diffusion_model.label_emb.0.0",
                uparams["add_embedding"]["linear_1"])
    _put_linear(tensors, "model.diffusion_model.label_emb.0.2",
                uparams["add_embedding"]["linear_2"])

    tok = make_test_tokenizer(["cat", "sunset"])
    t1 = clip_text.init_params(
        configs.CLIPTextConfig(
            **{**TINY_XL_TEXT_L.__dict__, "vocab_size": len(tok.encoder)}
        ), rs,
    )
    for k, t in export_clip(t1, TINY_XL_TEXT_L).items():
        tensors["conditioner.embedders.0.transformer." + k] = t
    t2 = clip_text.init_params(
        configs.CLIPTextConfig(
            **{**TINY_XL_TEXT_G.__dict__, "vocab_size": len(tok.encoder)}
        ), rs,
    )
    tensors.update(export_openclip(t2))

    vdec = vae.init_decoder_params(TINY_XL_VAE, rs)
    venc = vae.init_encoder_params(TINY_XL_VAE, rs)
    from tests.test_loader import export_vae_encoder

    diff_vae = {
        **export_vae_decoder(vdec, TINY_XL_VAE),
        **export_vae_encoder(venc, TINY_XL_VAE),
    }
    tensors.update(diffusers_vae_to_ldm(diff_vae, len(TINY_XL_VAE.block_out_channels)))

    path = str(tmp_path / "tiny_sdxl.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()}, path)

    tok_dir = tmp_path / "tokenizer"
    tok_dir.mkdir()
    (tok_dir / "vocab.json").write_text(json.dumps(tok.encoder))
    (tok_dir / "merges.txt").write_text("#version: 0.2\n" + "\n".join(
        " ".join(p) for p in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
    ) + "\n")
    return path, uparams, tok


# ---------------------------------------------------------------------------
# string-level translation
# ---------------------------------------------------------------------------


def test_openclip_inproj_splits():
    c = 8
    w = np.arange(3 * c * c, dtype=np.float32).reshape(3 * c, c)
    b = np.arange(3 * c, dtype=np.float32)
    out = _translate_text_openclip({
        "conditioner.embedders.1.model.transformer.resblocks.0.attn.in_proj_weight": w,
        "conditioner.embedders.1.model.transformer.resblocks.0.attn.in_proj_bias": b,
    })
    base = "text_model.encoder.layers.0.self_attn."
    np.testing.assert_array_equal(out[base + "q_proj.weight"], w[:c])
    np.testing.assert_array_equal(out[base + "k_proj.weight"], w[c:2 * c])
    np.testing.assert_array_equal(out[base + "v_proj.weight"], w[2 * c:])
    np.testing.assert_array_equal(out[base + "v_proj.bias"], b[2 * c:])


@pytest.mark.parametrize("opencl,hf", [
    ("transformer.resblocks.3.ln_1.weight",
     "text_model.encoder.layers.3.layer_norm1.weight"),
    ("transformer.resblocks.0.attn.out_proj.bias",
     "text_model.encoder.layers.0.self_attn.out_proj.bias"),
    ("transformer.resblocks.1.mlp.c_fc.weight",
     "text_model.encoder.layers.1.mlp.fc1.weight"),
    ("transformer.resblocks.1.mlp.c_proj.bias",
     "text_model.encoder.layers.1.mlp.fc2.bias"),
    ("token_embedding.weight", "text_model.embeddings.token_embedding.weight"),
    ("positional_embedding", "text_model.embeddings.position_embedding.weight"),
    ("ln_final.bias", "text_model.final_layer_norm.bias"),
])
def test_openclip_key_mapping(opencl, hf):
    out = _translate_text_openclip({
        "conditioner.embedders.1.model." + opencl: np.zeros((4, 4), np.float32)
    })
    assert list(out) == [hf]


def test_text_projection_transposed():
    t = np.arange(12, dtype=np.float32).reshape(3, 4)  # [C=3, proj=4]
    out = _translate_text_openclip(
        {"conditioner.embedders.1.model.text_projection": t}
    )
    np.testing.assert_array_equal(out["text_projection.weight"], t.T)


# ---------------------------------------------------------------------------
# functional
# ---------------------------------------------------------------------------


def test_sdxl_single_file_loads_and_generates(tmp_path):
    path, uparams, tok = make_tiny_sdxl_single_file(tmp_path)
    bundle = load_single_file(path)
    assert bundle.arch == "sdxl"
    assert bundle.unet_cfg == TINY_XL_UNET
    assert bundle.text_cfg_2.hidden_act == "gelu"
    assert bundle.text_cfg_2.projection_dim == 640
    assert bundle.tokenizer_2.pad_id == bundle.tokenizer_2.encoder["!"]
    assert bundle.vae_cfg.scaling_factor == 0.13025
    # ascending (encoder-order) widths — LDM up.{i} maps to the reversed
    # diffusers up_blocks, so reading up.{i} directly is already ascending
    assert bundle.vae_cfg.block_out_channels == TINY_XL_VAE.block_out_channels
    assert bundle.vae_encoder_params is not None

    # UNet params survive the LDM roundtrip bit-for-bit
    la = jax.tree_util.tree_leaves(uparams)
    lb = jax.tree_util.tree_leaves(bundle.unet_params)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    import jax.numpy as jnp

    from dreamlab_tpu.pipeline import LCMPipeline

    pipe = LCMPipeline(bundle, dtype=jnp.float32)
    res = pipe.generate(
        "a cat at sunset", height=16, width=16, num_inference_steps=1,
        seed=3, guidance_scale=1.0,
    )
    assert res.images.shape == (1, 16, 16, 3)


TINY_REF_UNET = configs.UNetConfig(
    block_out_channels=(64, 128),
    layers_per_block=1,
    transformer_layers_per_block=(0, 2),
    num_attention_heads=(1, 2),
    cross_attention_dim=1280,
    norm_groups=32,
    time_cond_proj_dim=None,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    # refiner: pooled (640) + 5 micro-conditioning ids, not 6
    projection_class_embeddings_input_dim=640 + 5 * 8,
    mid_block_transformer_layers=2,
)

# refiner: the single bigG tower's sequence IS the 1280-wide context
TINY_REF_TEXT_G = configs.CLIPTextConfig(
    hidden_size=1280, num_layers=2, num_heads=20, intermediate_size=128,
    hidden_act="gelu", penultimate=True, projection_dim=640,
)


def make_tiny_refiner_single_file(tmp_path):
    from safetensors.numpy import save_file

    rs = np.random.RandomState(4)
    tensors = {}

    uparams = unet.init_params(TINY_REF_UNET, rs)
    tensors.update(export_unet_ldm(uparams, TINY_REF_UNET))
    _put_linear(tensors, "model.diffusion_model.label_emb.0.0",
                uparams["add_embedding"]["linear_1"])
    _put_linear(tensors, "model.diffusion_model.label_emb.0.2",
                uparams["add_embedding"]["linear_2"])

    tok = make_test_tokenizer(["cat", "sunset"])
    tg = clip_text.init_params(
        configs.CLIPTextConfig(
            **{**TINY_REF_TEXT_G.__dict__, "vocab_size": len(tok.encoder)}
        ), rs,
    )
    tensors.update(export_openclip(tg, prefix="conditioner.embedders.0.model."))

    vdec = vae.init_decoder_params(TINY_XL_VAE, rs)
    diff_vae = export_vae_decoder(vdec, TINY_XL_VAE)
    tensors.update(
        diffusers_vae_to_ldm(diff_vae, len(TINY_XL_VAE.block_out_channels))
    )

    path = str(tmp_path / "tiny_refiner.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()}, path)

    tok_dir = tmp_path / "tokenizer"
    tok_dir.mkdir()
    (tok_dir / "vocab.json").write_text(json.dumps(tok.encoder))
    (tok_dir / "merges.txt").write_text("#version: 0.2\n" + "\n".join(
        " ".join(p) for p in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
    ) + "\n")
    return path, uparams


def test_sdxl_refiner_single_file_loads_and_generates(tmp_path):
    path, uparams = make_tiny_refiner_single_file(tmp_path)
    bundle = load_single_file(path)
    assert bundle.arch == "sdxl"
    assert bundle.unet_cfg == TINY_REF_UNET
    # single tower: no tower 2, bigG serves as THE text encoder
    assert bundle.text_params_2 is None and bundle.text_cfg_2 is None
    assert bundle.text_cfg.hidden_act == "gelu"
    assert bundle.text_cfg.projection_dim == 640
    assert bundle.tokenizer.pad_id == bundle.tokenizer.encoder["!"]

    la = jax.tree_util.tree_leaves(uparams)
    lb = jax.tree_util.tree_leaves(bundle.unet_params)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    import jax.numpy as jnp

    from dreamlab_tpu.pipeline import LCMPipeline

    pipe = LCMPipeline(bundle, dtype=jnp.float32)
    assert pipe._micro_cond_ids() == 5
    res = pipe.generate(
        "a cat at sunset", height=16, width=16, num_inference_steps=1,
        seed=3, guidance_scale=1.0, aesthetic_score=6.5,
    )
    assert res.images.shape == (1, 16, 16, 3)


def test_detect_sdxl_single_file(tmp_path):
    path, _, _ = make_tiny_sdxl_single_file(tmp_path)
    from dreamlab_tpu.utils.model_detector import detect_model

    info = detect_model(path)
    assert info.cross_attention_dim == 1280
    assert info.arch == "sdxl"


def test_derive_unet_cfg_requires_towers(tmp_path):
    """Refiner-style files (no embedders.0) fail with a clear message."""
    from safetensors.numpy import save_file

    rs = np.random.RandomState(1)
    uparams = unet.init_params(TINY_XL_UNET, rs)
    tensors = export_unet_ldm(uparams, TINY_XL_UNET)
    path = str(tmp_path / "refinerish.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()}, path)
    with pytest.raises(ValueError, match="embedders.0"):
        load_single_file(path)


def test_sd21_single_file_openclip_tower(tmp_path):
    """SD2.1-class single files store the text tower in OpenCLIP naming
    (cond_stage_model.model.*, fused in_proj) — the loader must translate it
    and condition on the penultimate hidden state."""
    from safetensors.numpy import save_file

    from dreamlab_tpu.loader_single_file import _translate_unet

    rs = np.random.RandomState(2)
    unet_cfg = configs.UNetConfig(
        **{**configs.TINY_UNET.__dict__,
           "cross_attention_dim": 1024, "time_cond_proj_dim": None}
    )
    uparams = unet.init_params(unet_cfg, rs)
    tensors = export_unet_ldm(uparams, unet_cfg)
    # the loader uses the full SD15 preset topology for real SD2.1 files;
    # for the tiny test we only check the text-tower translation, so give
    # the UNet a real-shaped attn2.to_k marker via the exported tensors

    tok = make_test_tokenizer(["cat"])
    tcfg = configs.CLIPTextConfig(
        vocab_size=len(tok.encoder), hidden_size=1024, num_layers=2,
        num_heads=16, intermediate_size=64, hidden_act="gelu",
        penultimate=True, projection_dim=1024,
    )
    tparams = clip_text.init_params(tcfg, rs)
    tensors.update(export_openclip(tparams, prefix="cond_stage_model.model."))

    vdec = vae.init_decoder_params(configs.TINY_VAE, rs)
    diff_vae = export_vae_decoder(vdec, configs.TINY_VAE)
    tensors.update(diffusers_vae_to_ldm(
        diff_vae, len(configs.TINY_VAE.block_out_channels)
    ))

    path = str(tmp_path / "sd21.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()}, path)
    tok_dir = tmp_path / "tokenizer"
    tok_dir.mkdir()
    (tok_dir / "vocab.json").write_text(json.dumps(tok.encoder))
    (tok_dir / "merges.txt").write_text("#version: 0.2\n" + "\n".join(
        " ".join(p) for p in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
    ) + "\n")

    from dreamlab_tpu.loader_single_file import _translate_text_openclip

    text_t = _translate_text_openclip(tensors, prefix="cond_stage_model.model.")
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in text_t
    assert text_t["text_model.embeddings.token_embedding.weight"].shape[1] == 1024

    # full load only works when the UNet matches the SD15 preset shapes
    # (real SD2.1 does); here assert the text config derivation directly
    from dreamlab_tpu.loader import convert_clip_text
    from dreamlab_tpu.loader_single_file import _derive_text_cfg

    cfg = _derive_text_cfg(text_t, act="gelu", penultimate=True)
    assert cfg.hidden_size == 1024 and cfg.num_heads == 16
    assert cfg.penultimate
    params = convert_clip_text(text_t, cfg)
    import jax.numpy as jnp

    ids = jnp.asarray(tok("a cat"))
    seq, pooled = clip_text.encode_text(params, ids, cfg)
    assert seq.shape == (1, 77, 1024)
    # penultimate output: differs from the final-layer output
    cfg_final = configs.CLIPTextConfig(**{**cfg.__dict__, "penultimate": False})
    seq_final, _ = clip_text.encode_text(params, ids, cfg_final)
    assert not np.allclose(np.asarray(seq), np.asarray(seq_final))


def test_penultimate_ln_equals_truncated_tower():
    """SD2.x conditioning = final-layer-normed penultimate state: on an
    L-layer tower, penultimate_ln=True must equal running an (L-1)-layer
    tower (same weights, last layer dropped) with its final LN — exactly
    diffusers' truncated 23-of-24-layer SD2.1 text encoder."""
    import jax.numpy as jnp

    rs = np.random.RandomState(4)
    tok = make_test_tokenizer(["cat"])
    full = configs.CLIPTextConfig(
        vocab_size=len(tok.encoder), hidden_size=64, num_layers=3,
        num_heads=1, intermediate_size=128, hidden_act="gelu",
        penultimate=True, penultimate_ln=True,
    )
    params = clip_text.init_params(full, rs)
    ids = jnp.asarray(tok("a cat"))
    got, _ = clip_text.encode_text(params, ids, full)

    truncated_cfg = configs.CLIPTextConfig(
        **{**full.__dict__, "num_layers": 2,
           "penultimate": False, "penultimate_ln": False}
    )
    truncated_params = {**params, "layers": params["layers"][:2]}
    want, _ = clip_text.encode_text(truncated_params, ids, truncated_cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_sd2_unet_heads_are_64_dim():
    """SD2.x-class single files must get 64-dim attention heads (5,10,20,20),
    not SD1.5's 8-per-block — wrong head partition silently produces noise."""
    from dreamlab_tpu.models.configs import SD15_UNET

    heads = tuple(max(1, c // 64) for c in SD15_UNET.block_out_channels)
    assert heads == (5, 10, 20, 20)
    # and the loader's SD2 branch applies exactly that rule (source-checked
    # here so a regression to the SD1.5 preset is caught)
    import inspect

    from dreamlab_tpu import loader_single_file as lsf

    src = inspect.getsource(lsf.load_single_file)
    assert "num_attention_heads" in src and "c // 64" in src
