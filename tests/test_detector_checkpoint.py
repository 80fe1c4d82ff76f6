"""Detector completeness: torch .ckpt detection + size-policy parity +
LoRA strength analyzer (round-1 VERDICT #6/#8).

.ckpt key names are read from the pickle stream via pickletools.genops —
never torch.load — so these tests also pin that no code execution happens
(the malicious-pickle test would run `os.system` under torch.load)."""

import io
import os
import pickle
import zipfile

import numpy as np
import pytest
import torch

from dreamlab_tpu.utils.model_detector import detect_model
from dreamlab_tpu.utils.custom_detector_examples import make_extended_detector


def _save_ckpt(path, state):
    torch.save(state, str(path))  # zip-format torch archive
    return str(path)


def test_ckpt_sd15_detected(tmp_path):
    sd = {
        "state_dict": {
            "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight": torch.zeros(4, 4),
            "first_stage_model.decoder.conv_in.weight": torch.zeros(1),
            "cond_stage_model.transformer.text_model.embeddings.token_embedding.weight": torch.zeros(1),
        }
    }
    info = detect_model(_save_ckpt(tmp_path / "model.ckpt", sd))
    assert info.format == "checkpoint"
    assert info.cross_attention_dim == 768
    assert info.variant == "SD15"
    assert info.arch == "sd15"
    assert info.extra["has_dual_text_encoders"] is False


def test_ckpt_sdxl_detected(tmp_path):
    sd = {
        "state_dict": {
            "conditioner.embedders.1.model.transformer.resblocks.0.attn.in_proj_weight": torch.zeros(1),
            "model.diffusion_model.middle_block.1.transformer_blocks.0.attn2.to_k.weight": torch.zeros(1),
        }
    }
    info = detect_model(_save_ckpt(tmp_path / "sdxl.ckpt", sd))
    assert info.cross_attention_dim == 2048
    assert info.variant == "SDXL"
    assert info.arch == "sdxl"
    assert info.native_size == 1024
    assert "1216x832" in info.recommended_sizes  # reference bucket table


def test_ckpt_lora_detected(tmp_path):
    sd = {"lora_unet_down_blocks_0_attn1_to_q.lora_down.weight": torch.zeros(2, 4)}
    info = detect_model(_save_ckpt(tmp_path / "style.ckpt", sd))
    assert info.is_lora
    assert info.format == "lora"
    assert info.extra["size_policy"]["source"] == "lora"


def test_ckpt_legacy_raw_pickle(tmp_path):
    """Pre-zip .ckpt files are a bare pickle stream."""
    p = tmp_path / "old.ckpt"
    keys = {"state_dict": {"cond_stage_model.x": 1, "model.diffusion_model.y": 2}}
    p.write_bytes(pickle.dumps(keys))
    info = detect_model(str(p))
    assert info.format == "checkpoint"
    assert info.cross_attention_dim == 768


def test_ckpt_detection_never_executes_pickle(tmp_path):
    """A malicious pickle must be inspected, not run."""

    class Evil:
        def __reduce__(self):
            marker = str(tmp_path / "pwned")
            return (os.system, (f"touch {marker}",))

    p = tmp_path / "evil.ckpt"
    buf = io.BytesIO()
    pickle.dump({"state_dict_key_with_text_encoder_2": Evil()}, buf)
    p.write_bytes(buf.getvalue())
    info = detect_model(str(p))
    assert not os.path.exists(tmp_path / "pwned"), "pickle was executed!"
    assert info.format == "checkpoint"
    assert info.cross_attention_dim == 2048  # te2 marker string seen


def test_size_policy_from_diffusers_sample_size(tmp_path):
    """unet.config sample_size drives native resolution when present."""
    import json

    d = tmp_path / "ckpt"
    (d / "unet").mkdir(parents=True)
    (d / "unet" / "config.json").write_text(json.dumps({
        "cross_attention_dim": 768, "sample_size": 96,
        "block_out_channels": [320, 640, 1280, 1280],
    }))
    info = detect_model(str(d))
    assert info.native_size == 768
    policy = info.extra["size_policy"]
    assert policy["source"] == "diffusers:unet.config"
    assert policy["latent_sample_size"] == 96


def test_lora_strength_analyzer(tmp_path):
    from safetensors.numpy import save_file

    rs = np.random.RandomState(0)
    base = "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k"
    save_file({
        f"{base}.lora_A.weight": (rs.randn(2, 768) * 0.003).astype(np.float32),
        f"{base}.lora_B.weight": (rs.randn(32, 2) * 0.003).astype(np.float32),
    }, str(tmp_path / "weak.safetensors"))
    info = make_extended_detector().detect(str(tmp_path / "weak.safetensors"))
    assert info.is_lora
    assert info.extra["lora_avg_magnitude"] < 0.01
    assert info.extra["suggested_strength_levels"] == [0.8, 1.0, 1.2, 1.5]
