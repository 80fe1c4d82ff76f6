"""Single-file (LDM layout) checkpoint loading: key translation against
known SD1.5 name pairs + a functional tiny round-trip through an
independently-written LDM exporter."""

import numpy as np
import pytest

from dreamlab_tpu import loader
from dreamlab_tpu.loader_single_file import (
    _map_unet_key,
    _translate_unet,
    _translate_vae,
    _translate_text,
)
from dreamlab_tpu.models import configs, unet
from dreamlab_tpu.models.configs import SD15_UNET


# ---------------------------------------------------------------------------
# string-level mapping against known SD1.5 pairs
# ---------------------------------------------------------------------------

SD15_PAIRS = [
    ("time_embed.0.weight", "time_embedding.linear_1.weight"),
    ("time_embed.2.bias", "time_embedding.linear_2.bias"),
    ("input_blocks.0.0.weight", "conv_in.weight"),
    ("input_blocks.1.0.in_layers.0.weight", "down_blocks.0.resnets.0.norm1.weight"),
    ("input_blocks.1.0.in_layers.2.weight", "down_blocks.0.resnets.0.conv1.weight"),
    ("input_blocks.1.0.emb_layers.1.weight",
     "down_blocks.0.resnets.0.time_emb_proj.weight"),
    ("input_blocks.1.0.out_layers.3.weight", "down_blocks.0.resnets.0.conv2.weight"),
    ("input_blocks.3.0.op.weight", "down_blocks.0.downsamplers.0.conv.weight"),
    ("input_blocks.4.1.transformer_blocks.0.attn2.to_k.weight",
     "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k.weight"),
    ("input_blocks.4.0.skip_connection.weight",
     "down_blocks.1.resnets.0.conv_shortcut.weight"),
    ("middle_block.0.in_layers.0.weight", "mid_block.resnets.0.norm1.weight"),
    ("middle_block.1.proj_in.weight", "mid_block.attentions.0.proj_in.weight"),
    ("middle_block.2.out_layers.3.bias", "mid_block.resnets.1.conv2.bias"),
    ("output_blocks.0.0.in_layers.2.weight", "up_blocks.0.resnets.0.conv1.weight"),
    ("output_blocks.2.1.conv.weight", "up_blocks.0.upsamplers.0.conv.weight"),
    ("output_blocks.3.1.norm.weight", "up_blocks.1.attentions.0.norm.weight"),
    ("output_blocks.5.2.conv.weight", "up_blocks.1.upsamplers.0.conv.weight"),
    ("output_blocks.11.1.proj_out.bias", "up_blocks.3.attentions.2.proj_out.bias"),
    ("out.0.weight", "conv_norm_out.weight"),
    ("out.2.weight", "conv_out.weight"),
]


@pytest.mark.parametrize("ldm,diff", SD15_PAIRS)
def test_unet_key_mapping_sd15(ldm, diff):
    assert _map_unet_key(ldm, SD15_UNET) == diff


VAE_PAIRS = [
    ("first_stage_model.decoder.conv_in.weight", "decoder.conv_in.weight"),
    ("first_stage_model.decoder.up.0.block.1.norm1.weight",
     "decoder.up_blocks.3.resnets.1.norm1.weight"),
    ("first_stage_model.decoder.up.3.block.0.nin_shortcut.weight",
     "decoder.up_blocks.0.resnets.0.conv_shortcut.weight"),
    ("first_stage_model.decoder.up.1.upsample.conv.weight",
     "decoder.up_blocks.2.upsamplers.0.conv.weight"),
    ("first_stage_model.decoder.mid.block_1.conv1.weight",
     "decoder.mid_block.resnets.0.conv1.weight"),
    ("first_stage_model.decoder.mid.attn_1.norm.weight",
     "decoder.mid_block.attentions.0.group_norm.weight"),
    ("first_stage_model.decoder.norm_out.weight", "decoder.conv_norm_out.weight"),
    ("first_stage_model.encoder.down.2.downsample.conv.bias",
     "encoder.down_blocks.2.downsamplers.0.conv.bias"),
    ("first_stage_model.post_quant_conv.weight", "post_quant_conv.weight"),
    ("first_stage_model.quant_conv.bias", "quant_conv.bias"),
]


@pytest.mark.parametrize("ldm,diff", VAE_PAIRS)
def test_vae_key_mapping(ldm, diff):
    out = _translate_vae({ldm: np.zeros((4, 4, 3, 3), np.float32)}, 4)
    assert list(out) == [diff]


def test_vae_attn_qkv_flattened():
    out = _translate_vae(
        {"first_stage_model.decoder.mid.attn_1.q.weight":
         np.zeros((8, 8, 1, 1), np.float32)}, 4,
    )
    (k, v), = out.items()
    assert k == "decoder.mid_block.attentions.0.to_q.weight"
    assert v.shape == (8, 8)


def test_text_prefix_stripped():
    out = _translate_text({
        "cond_stage_model.transformer.text_model.final_layer_norm.weight":
            np.zeros(4, np.float32),
        "unrelated.key": np.zeros(1, np.float32),
    })
    assert list(out) == ["text_model.final_layer_norm.weight"]


# ---------------------------------------------------------------------------
# functional tiny round-trip via an independent LDM exporter
# ---------------------------------------------------------------------------


def export_unet_ldm(params, cfg):
    """Write a tiny UNet param tree in the LDM namespace (written from the
    original SD layout spec, not by inverting the production mapper)."""
    from tests.test_loader import _put_conv, _put_linear, _put_norm

    out = {}
    pre = "model.diffusion_model."
    _put_linear(out, pre + "time_embed.0", params["time_embedding"]["linear_1"])
    _put_linear(out, pre + "time_embed.2", params["time_embedding"]["linear_2"])
    _put_conv(out, pre + "input_blocks.0.0", params["conv_in"])

    def put_res(key, p):
        _put_norm(out, key + ".in_layers.0", p["norm1"])
        _put_conv(out, key + ".in_layers.2", p["conv1"])
        _put_linear(out, key + ".emb_layers.1", p["time_emb_proj"])
        _put_norm(out, key + ".out_layers.0", p["norm2"])
        _put_conv(out, key + ".out_layers.3", p["conv2"])
        if "shortcut" in p:
            _put_conv(out, key + ".skip_connection", p["shortcut"])

    def put_tf(key, p):
        _put_norm(out, key + ".norm", p["norm"])
        _put_linear(out, key + ".proj_in", p["proj_in"])
        for k, blk in enumerate(p["blocks"]):
            b = f"{key}.transformer_blocks.{k}"
            _put_norm(out, b + ".norm1", blk["ln1"])
            for nm, ap in (("attn1", blk["attn1"]), ("attn2", blk["attn2"])):
                _put_linear(out, f"{b}.{nm}.to_q", ap["q"])
                _put_linear(out, f"{b}.{nm}.to_k", ap["k"])
                _put_linear(out, f"{b}.{nm}.to_v", ap["v"])
                _put_linear(out, f"{b}.{nm}.to_out.0", ap["out"])
            _put_norm(out, b + ".norm2", blk["ln2"])
            _put_norm(out, b + ".norm3", blk["ln3"])
            _put_linear(out, b + ".ff.net.0.proj", blk["ff_geglu"])
            _put_linear(out, b + ".ff.net.2", blk["ff_out"])
        _put_linear(out, key + ".proj_out", p["proj_out"])

    L = cfg.layers_per_block
    idx = 1
    for i, block in enumerate(params["down"]):
        for j, res in enumerate(block["resnets"]):
            put_res(f"{pre}input_blocks.{idx}.0", res)
            if block.get("attentions"):
                put_tf(f"{pre}input_blocks.{idx}.1", block["attentions"][j])
            idx += 1
        if "downsample" in block:
            _put_conv(out, f"{pre}input_blocks.{idx}.0.op", block["downsample"])
            idx += 1

    put_res(pre + "middle_block.0", params["mid"]["resnet1"])
    if "attention" in params["mid"]:
        put_tf(pre + "middle_block.1", params["mid"]["attention"])
    put_res(pre + "middle_block.2", params["mid"]["resnet2"])

    idx = 0
    for k, block in enumerate(params["up"]):
        for j, res in enumerate(block["resnets"]):
            put_res(f"{pre}output_blocks.{idx}.0", res)
            sub = 1
            if block.get("attentions"):
                put_tf(f"{pre}output_blocks.{idx}.{sub}", block["attentions"][j])
                sub += 1
            if "upsample" in block and j == L:  # last layer carries upsampler
                _put_conv(out, f"{pre}output_blocks.{idx}.{sub}.conv",
                          block["upsample"])
            idx += 1

    _put_norm(out, pre + "out.0", params["norm_out"])
    _put_conv(out, pre + "out.2", params["conv_out"])
    return out


def test_unet_ldm_roundtrip_tiny():
    # LDM single files predate LCM: no cond_proj tensor in the layout
    cfg = configs.UNetConfig(
        **{**configs.TINY_UNET.__dict__, "time_cond_proj_dim": None}
    )
    params = unet.init_params(cfg, np.random.RandomState(0))
    ldm = export_unet_ldm(params, cfg)
    translated = _translate_unet(ldm, cfg)
    back = loader.convert_unet(translated, cfg)
    import jax

    la = jax.tree_util.tree_leaves(params)
    lb = jax.tree_util.tree_leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_single_file_sidecar_scheduler(tmp_path):
    """<ckpt>.scheduler_config.json declares v-prediction (SD2.1-768 style);
    without it the default stays epsilon."""
    import json as _json

    from dreamlab_tpu.loader_single_file import _load_sidecar_scheduler

    ckpt = tmp_path / "v21.safetensors"
    ckpt.write_bytes(b"")
    assert _load_sidecar_scheduler(str(ckpt)).prediction_type == "epsilon"

    (tmp_path / "v21.scheduler_config.json").write_text(_json.dumps({
        "prediction_type": "v_prediction", "beta_schedule": "scaled_linear",
        "unknown_field": 1,
    }))
    cfg = _load_sidecar_scheduler(str(ckpt))
    assert cfg.prediction_type == "v_prediction"

    # sibling scheduler/ dir also works
    ckpt2 = tmp_path / "sub" / "m.safetensors"
    ckpt2.parent.mkdir()
    ckpt2.write_bytes(b"")
    sched = tmp_path / "sub" / "scheduler"
    sched.mkdir()
    (sched / "scheduler_config.json").write_text(_json.dumps({
        "prediction_type": "v_prediction",
    }))
    assert _load_sidecar_scheduler(str(ckpt2)).prediction_type == "v_prediction"
