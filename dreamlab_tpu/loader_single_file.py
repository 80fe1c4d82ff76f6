"""Single-file checkpoint loading (original "LDM" safetensors layout).

The reference serves single-file checkpoints via diffusers'
``from_single_file`` (/root/reference/backends/cuda_worker.py:79,380). This
module performs the same conversion offline: translate the LDM state-dict
namespace (``model.diffusion_model.*``, ``first_stage_model.*``,
``cond_stage_model.*`` / ``conditioner.*``) into the diffusers key namespace
this framework's converters consume, infer the architecture config from
tensor shapes, and build a ``PipelineBundle``.

Tokenizer files are not stored in single-file checkpoints (diffusers
downloads them; this framework is offline-first): they load from a sibling
``tokenizer/`` directory — ``<ckpt>.tokenizer/`` or ``tokenizer/`` next to
the file — with a clear error otherwise.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

from .loader import (
    PipelineBundle,
    classify_arch,
    convert_clip_text,
    convert_unet,
    convert_vae_decoder,
    convert_vae_encoder,
)
from .models.configs import (
    CLIPTextConfig,
    SD15_TEXT,
    SD15_UNET,
    SD15_VAE,
    SDXL_TEXT_BIGG,
    SDXL_TEXT_L,
    SDXL_UNET,
    SDXL_VAE,
    UNetConfig,
)
from .scheduler.lcm import LCMConfig
from .utils.tokenizer import CLIPTokenizer

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# LDM → diffusers UNet key translation
# ---------------------------------------------------------------------------

_RES_MAP = {
    "in_layers.0": "norm1",
    "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2",
    "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}


def _map_unet_key(key: str, cfg: UNetConfig) -> Optional[str]:
    """model.diffusion_model.* → diffusers UNet2DConditionModel name."""
    k = key
    n_blocks = cfg.num_blocks
    layers = cfg.layers_per_block

    def map_res(rest: str) -> Optional[str]:
        for ldm, diff in _RES_MAP.items():
            if rest.startswith(ldm):
                return diff + rest[len(ldm):]
        return None

    if k.startswith("time_embed.0."):
        return "time_embedding.linear_1." + k.split(".", 2)[2]
    if k.startswith("time_embed.2."):
        return "time_embedding.linear_2." + k.split(".", 2)[2]
    if k.startswith("label_emb.0.0."):
        return "add_embedding.linear_1." + k.split(".", 3)[3]
    if k.startswith("label_emb.0.2."):
        return "add_embedding.linear_2." + k.split(".", 3)[3]
    if k.startswith("input_blocks.0.0."):
        return "conv_in." + k.split(".", 3)[3]
    if k.startswith("out.0."):
        return "conv_norm_out." + k.split(".", 2)[2]
    if k.startswith("out.2."):
        return "conv_out." + k.split(".", 2)[2]

    m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.+)", k)
    if m:
        idx, sub, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        block = (idx - 1) // (layers + 1)
        layer = (idx - 1) % (layers + 1)
        if layer == layers:  # downsampler slot
            if rest.startswith("op."):
                return (
                    f"down_blocks.{block}.downsamplers.0.conv."
                    + rest[len("op."):]
                )
            return None
        if sub == 0:
            mapped = map_res(rest)
            return (
                f"down_blocks.{block}.resnets.{layer}.{mapped}"
                if mapped else None
            )
        return f"down_blocks.{block}.attentions.{layer}.{rest}"

    m = re.match(r"middle_block\.(\d+)\.(.+)", k)
    if m:
        sub, rest = int(m.group(1)), m.group(2)
        if sub == 0:
            mapped = map_res(rest)
            return f"mid_block.resnets.0.{mapped}" if mapped else None
        if sub == 1 and cfg.has_mid_attention:
            return f"mid_block.attentions.0.{rest}"
        mapped = map_res(rest)
        return f"mid_block.resnets.1.{mapped}" if mapped else None

    m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.+)", k)
    if m:
        idx, sub, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        block = idx // (layers + 1)
        layer = idx % (layers + 1)
        if sub == 0:
            mapped = map_res(rest)
            return (
                f"up_blocks.{block}.resnets.{layer}.{mapped}"
                if mapped else None
            )
        if rest.startswith("conv."):  # upsampler
            return f"up_blocks.{block}.upsamplers.0.{rest}"
        return f"up_blocks.{block}.attentions.{layer}.{rest}"
    return None


def _translate_unet(tensors: Dict[str, np.ndarray], cfg: UNetConfig) -> Dict[str, np.ndarray]:
    prefix = "model.diffusion_model."
    out: Dict[str, np.ndarray] = {}
    unmapped = 0
    for key, t in tensors.items():
        if not key.startswith(prefix):
            continue
        mapped = _map_unet_key(key[len(prefix):], cfg)
        if mapped is None:
            unmapped += 1
            continue
        out[mapped] = t
    if unmapped:
        logger.warning("single-file unet: %d unmapped tensors", unmapped)
    return out


# ---------------------------------------------------------------------------
# VAE + text translation
# ---------------------------------------------------------------------------

# order matters: attn_1 member renames run before the mid.attn_1 container
# rename so both fire on e.g. "mid.attn_1.q.weight"; the generic block→
# resnets rename is a regex anchored to up/down containers so it cannot
# touch the already-renamed "mid_block."
_VAE_SEGMENTS = (
    ("nin_shortcut", "conv_shortcut"),
    ("attn_1.norm", "attn_1.group_norm"),
    ("attn_1.proj_out", "attn_1.to_out.0"),
    ("attn_1.q", "attn_1.to_q"),
    ("attn_1.k", "attn_1.to_k"),
    ("attn_1.v", "attn_1.to_v"),
    ("mid.block_1", "mid_block.resnets.0"),
    ("mid.attn_1", "mid_block.attentions.0"),
    ("mid.block_2", "mid_block.resnets.1"),
    ("norm_out", "conv_norm_out"),
)


def _translate_vae(tensors: Dict[str, np.ndarray], n_blocks: int) -> Dict[str, np.ndarray]:
    """first_stage_model.* → diffusers AutoencoderKL names."""
    out: Dict[str, np.ndarray] = {}
    for key, t in tensors.items():
        if not key.startswith("first_stage_model."):
            continue
        k = key[len("first_stage_model."):]
        # up blocks are reversed between the layouts
        m = re.match(r"decoder\.up\.(\d+)\.(.*)", k)
        if m:
            i = int(m.group(1))
            k = f"decoder.up_blocks.{n_blocks - 1 - i}.{m.group(2)}"
        k = re.sub(r"encoder\.down\.(\d+)\.", r"encoder.down_blocks.\1.", k)
        k = k.replace("downsample.conv", "downsamplers.0.conv")
        k = k.replace("upsample.conv", "upsamplers.0.conv")
        for old, new in _VAE_SEGMENTS:
            k = k.replace(old, new)
        k = re.sub(
            r"(up_blocks|down_blocks)\.(\d+)\.block\.", r"\1.\2.resnets.", k
        )
        # attention q/k/v in old VAEs are 1x1 convs; flatten to linear
        if (
            re.search(r"attentions\.0\.to_(q|k|v|out\.0)\.weight$", k)
            and t.ndim == 4
        ):
            t = t[:, :, 0, 0]
        out[k] = t
    return out


def _translate_text(tensors: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """cond_stage_model.transformer.* (SD1.x) → transformers CLIPText names."""
    out = {}
    for key, t in tensors.items():
        for prefix in (
            "cond_stage_model.transformer.",
            "conditioner.embedders.0.transformer.",
        ):
            if key.startswith(prefix):
                out[key[len(prefix):]] = t
                break
    return out


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def _find_tokenizer_dir(ckpt_path: str) -> str:
    base = os.path.splitext(ckpt_path)[0]
    for cand in (
        base + ".tokenizer",
        os.path.join(os.path.dirname(ckpt_path), "tokenizer"),
    ):
        if os.path.isdir(cand):
            return cand
    raise FileNotFoundError(
        f"single-file checkpoints carry no tokenizer; place vocab.json/"
        f"merges.txt in {base}.tokenizer/ or a sibling tokenizer/ directory"
    )


def load_single_file(path: str) -> PipelineBundle:
    """Load an original-layout .safetensors checkpoint into a bundle.

    Supports SD1.5-class single files (incl. LCM-distilled ones with
    ``cond_proj`` tensors). SDXL single files additionally require the
    second text tower (``conditioner.embedders.1``, OpenCLIP naming) which
    uses a different attention packing — currently routed to diffusers-dir
    checkpoints instead.
    """
    from safetensors import numpy as st_numpy

    tensors = st_numpy.load_file(path)

    cad = None
    for key, t in tensors.items():
        if key.endswith("attn2.to_k.weight") and t.ndim == 2:
            cad = t.shape[1]
            break
    if cad is None:
        raise ValueError(f"not a diffusion checkpoint (no attn2.to_k): {path}")
    arch = classify_arch(cad)
    if arch == "sdxl":
        raise ValueError(
            "SDXL single-file checkpoints are not supported offline yet; "
            "convert to a diffusers directory"
        )

    has_cond_proj = any("time_embed.0.cond_proj" in k for k in tensors) or any(
        "time_embedding.cond_proj" in k for k in tensors
    )
    unet_cfg = SD15_UNET if has_cond_proj else UNetConfig(
        **{**SD15_UNET.__dict__, "time_cond_proj_dim": None}
    )
    if cad == 1024:  # SD2.1-class
        unet_cfg = UNetConfig(**{**unet_cfg.__dict__, "cross_attention_dim": 1024})

    unet_params = convert_unet(_translate_unet(tensors, unet_cfg), unet_cfg)
    vae_cfg = SD15_VAE
    vae_t = _translate_vae(tensors, len(vae_cfg.block_out_channels))
    vae_params = convert_vae_decoder(vae_t, vae_cfg)
    vae_encoder_params = (
        convert_vae_encoder(vae_t, vae_cfg)
        if any(k.startswith("encoder.") for k in vae_t)
        else None
    )

    text_t = _translate_text(tensors)
    hidden = text_t["text_model.embeddings.token_embedding.weight"].shape[1]
    layers = 1 + max(
        int(m.group(1))
        for k in text_t
        if (m := re.match(r"text_model\.encoder\.layers\.(\d+)\.", k))
    )
    text_cfg = CLIPTextConfig(
        **{**SD15_TEXT.__dict__, "hidden_size": hidden, "num_layers": layers,
           "num_heads": hidden // 64,
           "intermediate_size": text_t[
               "text_model.encoder.layers.0.mlp.fc1.weight"
           ].shape[0]}
    )
    text_params = convert_clip_text(text_t, text_cfg)

    tokenizer = CLIPTokenizer.from_pretrained(_find_tokenizer_dir(path))

    return PipelineBundle(
        arch=arch,
        model_dir=path,
        tokenizer=tokenizer,
        text_cfg=text_cfg,
        text_params=text_params,
        unet_cfg=unet_cfg,
        unet_params=unet_params,
        vae_cfg=vae_cfg,
        vae_params=vae_params,
        scheduler_cfg=LCMConfig(),
        vae_encoder_params=vae_encoder_params,
    )
