"""Checkpoint loading: diffusers-layout dirs → JAX param pytrees.

The reference consumes (a) ONNX/RKNN compiled graphs in a fixed dir layout
(/root/reference/backends/base.py:40-58) and (b) diffusers dirs / single-file
safetensors on CUDA (cuda_worker.py:66-85). Here checkpoints load straight
into pytrees — no graph-format intermediary; the "compiled graph" artifact of
this framework is the XLA executable produced by jit (plus its compile cache).

Weight-name translation (torch → NHWC functional):
- conv kernels  OIHW → HWIO
- linear        [out, in] → [in, out]
- norms         weight/bias → scale/bias
- 1×1 transformer proj convs (SD1.5 stores Conv2d) → channel linears

All tensors load via safetensors.numpy (zero-copy mmap, no torch).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .models.configs import (
    CLIPTextConfig,
    SuperResConfig,
    UNetConfig,
    VAEConfig,
)
from .scheduler.lcm import LCMConfig
from .utils.tokenizer import CLIPTokenizer

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# low-level helpers
# ---------------------------------------------------------------------------


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import numpy as st_numpy

    return st_numpy.load_file(path)


def find_weights_file(component_dir: str) -> Optional[str]:
    for name in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "diffusion_pytorch_model.fp16.safetensors",
        "model.fp16.safetensors",
    ):
        p = os.path.join(component_dir, name)
        if os.path.exists(p):
            return p
    return None


class _W:
    """Key-mapped view over a flat torch state dict with use tracking."""

    def __init__(self, tensors: Dict[str, np.ndarray], prefix: str = ""):
        self.t = tensors
        self.prefix = prefix
        self.used: set = set()

    def has(self, key: str) -> bool:
        return self.prefix + key in self.t

    def raw(self, key: str) -> np.ndarray:
        full = self.prefix + key
        self.used.add(full)
        return self.t[full]

    def conv(self, key: str) -> Dict[str, np.ndarray]:
        w = self.raw(key + ".weight")
        out = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}  # OIHW→HWIO
        if self.has(key + ".bias"):
            out["b"] = self.raw(key + ".bias")
        return out

    def linear(self, key: str) -> Dict[str, np.ndarray]:
        w = self.raw(key + ".weight")
        if w.ndim == 4:  # 1×1 conv stored where a linear is meant
            w = w[:, :, 0, 0]
        out = {"w": np.ascontiguousarray(w.T)}
        if self.has(key + ".bias"):
            out["b"] = self.raw(key + ".bias")
        return out

    def norm(self, key: str) -> Dict[str, np.ndarray]:
        return {"scale": self.raw(key + ".weight"), "bias": self.raw(key + ".bias")}

    def embedding(self, key: str) -> Dict[str, np.ndarray]:
        return {"w": self.raw(key + ".weight")}

    def warn_unused(self, what: str):
        unused = set(self.t) - self.used
        if unused:
            logger.warning(
                "%s: %d unconverted tensors (e.g. %s)",
                what, len(unused), sorted(unused)[:3],
            )


# ---------------------------------------------------------------------------
# configs from json
# ---------------------------------------------------------------------------


def _read_json(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def unet_config_from_json(raw: Dict[str, Any]) -> UNetConfig:
    chans = tuple(raw["block_out_channels"])
    n = len(chans)
    down_types = raw.get(
        "down_block_types", ["CrossAttnDownBlock2D"] * (n - 1) + ["DownBlock2D"]
    )
    tl_raw = raw.get("transformer_layers_per_block", 1)
    tl_list = [tl_raw] * n if isinstance(tl_raw, int) else list(tl_raw)
    tl = tuple(
        tl_list[i] if "CrossAttn" in down_types[i] else 0 for i in range(n)
    )
    heads_raw = raw.get("num_attention_heads") or raw.get("attention_head_dim", 8)
    # diffusers quirk: SD1.x stores the head *count* under attention_head_dim
    heads = tuple([heads_raw] * n if isinstance(heads_raw, int) else heads_raw)
    mid_type = raw.get("mid_block_type", "UNetMidBlock2DCrossAttn")
    mid_tl = (
        (tl_list[-1] if mid_type else 0)
        if "CrossAttn" in (mid_type or "")
        else 0
    )
    return UNetConfig(
        in_channels=raw.get("in_channels", 4),
        out_channels=raw.get("out_channels", 4),
        block_out_channels=chans,
        layers_per_block=raw.get("layers_per_block", 2),
        transformer_layers_per_block=tl,
        num_attention_heads=heads,
        cross_attention_dim=raw.get("cross_attention_dim", 768),
        norm_groups=raw.get("norm_num_groups", 32),
        time_cond_proj_dim=raw.get("time_cond_proj_dim"),
        addition_embed_type=raw.get("addition_embed_type"),
        addition_time_embed_dim=raw.get("addition_time_embed_dim"),
        projection_class_embeddings_input_dim=raw.get(
            "projection_class_embeddings_input_dim"
        ),
        mid_block_transformer_layers=mid_tl,
        flip_sin_to_cos=raw.get("flip_sin_to_cos", True),
        freq_shift=raw.get("freq_shift", 0),
    )


def vae_config_from_json(raw: Dict[str, Any]) -> VAEConfig:
    return VAEConfig(
        latent_channels=raw.get("latent_channels", 4),
        out_channels=raw.get("out_channels", 3),
        block_out_channels=tuple(raw.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=raw.get("layers_per_block", 2),
        norm_groups=raw.get("norm_num_groups", 32),
        scaling_factor=raw.get("scaling_factor", 0.18215),
        mid_attention=True,
    )


def text_config_from_json(raw: Dict[str, Any], *, penultimate: bool = False) -> CLIPTextConfig:
    arch = (raw.get("architectures") or [""])[0]
    return CLIPTextConfig(
        vocab_size=raw.get("vocab_size", 49408),
        hidden_size=raw.get("hidden_size", 768),
        num_layers=raw.get("num_hidden_layers", 12),
        num_heads=raw.get("num_attention_heads", 12),
        max_position_embeddings=raw.get("max_position_embeddings", 77),
        intermediate_size=raw.get("intermediate_size", 3072),
        hidden_act=raw.get("hidden_act", "quick_gelu"),
        layer_norm_eps=raw.get("layer_norm_eps", 1e-5),
        penultimate=penultimate,
        projection_dim=(
            raw.get("projection_dim")
            if ("WithProjection" in arch or arch == "CLIPModel")
            else None
        ),
    )


# ---------------------------------------------------------------------------
# component converters
# ---------------------------------------------------------------------------


def _unet_attn(w: "_W", key: str) -> Dict:
    return {
        "q": w.linear(key + ".to_q"),
        "k": w.linear(key + ".to_k"),
        "v": w.linear(key + ".to_v"),
        "out": w.linear(key + ".to_out.0"),
    }


def _unet_transformer(w: "_W", key: str, n_layers: int) -> Dict:
    blocks = []
    for k in range(n_layers):
        b = f"{key}.transformer_blocks.{k}"
        blocks.append(
            {
                "ln1": w.norm(b + ".norm1"),
                "attn1": _unet_attn(w, b + ".attn1"),
                "ln2": w.norm(b + ".norm2"),
                "attn2": _unet_attn(w, b + ".attn2"),
                "ln3": w.norm(b + ".norm3"),
                "ff_geglu": w.linear(b + ".ff.net.0.proj"),
                "ff_out": w.linear(b + ".ff.net.2"),
            }
        )
    return {
        "norm": w.norm(key + ".norm"),
        "proj_in": w.linear(key + ".proj_in"),
        "blocks": blocks,
        "proj_out": w.linear(key + ".proj_out"),
    }


def _unet_resnet(w: "_W", key: str) -> Dict:
    p = {
        "norm1": w.norm(key + ".norm1"),
        "conv1": w.conv(key + ".conv1"),
        "time_emb_proj": w.linear(key + ".time_emb_proj"),
        "norm2": w.norm(key + ".norm2"),
        "conv2": w.conv(key + ".conv2"),
    }
    if w.has(key + ".conv_shortcut.weight"):
        p["shortcut"] = w.conv(key + ".conv_shortcut")
    return p


def _convert_unet_trunk(w: "_W", cfg: UNetConfig) -> Dict:
    """conv_in + time/add embeddings + down + mid — the part a diffusers
    UNet2DConditionModel and a ControlNetModel share key-for-key."""
    transformer = partial(_unet_transformer, w)
    resnet = partial(_unet_resnet, w)

    params: Dict[str, Any] = {
        "conv_in": w.conv("conv_in"),
        "time_embedding": {
            "linear_1": w.linear("time_embedding.linear_1"),
            "linear_2": w.linear("time_embedding.linear_2"),
        },
    }
    if cfg.time_cond_proj_dim is not None and w.has("time_embedding.cond_proj.weight"):
        params["time_embedding"]["cond_proj"] = w.linear("time_embedding.cond_proj")
    if cfg.addition_embed_type == "text_time":
        params["add_embedding"] = {
            "linear_1": w.linear("add_embedding.linear_1"),
            "linear_2": w.linear("add_embedding.linear_2"),
        }

    down: List[Dict] = []
    for i in range(cfg.num_blocks):
        tl = cfg.transformer_layers_per_block[i]
        block: Dict[str, Any] = {"resnets": []}
        if tl > 0:
            block["attentions"] = []
        for j in range(cfg.layers_per_block):
            block["resnets"].append(resnet(f"down_blocks.{i}.resnets.{j}"))
            if tl > 0:
                block["attentions"].append(
                    transformer(f"down_blocks.{i}.attentions.{j}", tl)
                )
        if i < cfg.num_blocks - 1:
            block["downsample"] = w.conv(f"down_blocks.{i}.downsamplers.0.conv")
        down.append(block)
    params["down"] = down

    mid: Dict[str, Any] = {
        "resnet1": resnet("mid_block.resnets.0"),
        "resnet2": resnet("mid_block.resnets.1"),
    }
    if cfg.has_mid_attention:
        mid["attention"] = transformer(
            "mid_block.attentions.0", cfg.mid_block_transformer_layers
        )
    params["mid"] = mid
    return params


def convert_unet(tensors: Dict[str, np.ndarray], cfg: UNetConfig) -> Dict:
    w = _W(tensors)
    params = _convert_unet_trunk(w, cfg)
    transformer = partial(_unet_transformer, w)
    resnet = partial(_unet_resnet, w)

    up: List[Dict] = []
    for k in range(cfg.num_blocks):
        i = cfg.num_blocks - 1 - k
        tl = cfg.transformer_layers_per_block[i]
        block = {"resnets": []}
        if tl > 0:
            block["attentions"] = []
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(resnet(f"up_blocks.{k}.resnets.{j}"))
            if tl > 0:
                block["attentions"].append(
                    transformer(f"up_blocks.{k}.attentions.{j}", tl)
                )
        if k < cfg.num_blocks - 1:
            block["upsample"] = w.conv(f"up_blocks.{k}.upsamplers.0.conv")
        up.append(block)
    params["up"] = up

    params["norm_out"] = w.norm("conv_norm_out")
    params["conv_out"] = w.conv("conv_out")
    w.warn_unused("unet")
    return params


def convert_controlnet(tensors: Dict[str, np.ndarray], cfg: UNetConfig) -> Dict:
    """diffusers ControlNetModel safetensors → models.controlnet pytree.

    Layout = the UNet trunk plus the hint-embedding ladder
    (``controlnet_cond_embedding.*``) and the zero-conv taps
    (``controlnet_down_blocks.{i}`` / ``controlnet_mid_block``)."""
    w = _W(tensors)
    params = _convert_unet_trunk(w, cfg)

    blocks = []
    i = 0
    while w.has(f"controlnet_cond_embedding.blocks.{i}.weight"):
        blocks.append(w.conv(f"controlnet_cond_embedding.blocks.{i}"))
        i += 1
    params["cond_embedding"] = {
        "conv_in": w.conv("controlnet_cond_embedding.conv_in"),
        "blocks": blocks,
        "conv_out": w.conv("controlnet_cond_embedding.conv_out"),
    }

    taps = []
    i = 0
    while w.has(f"controlnet_down_blocks.{i}.weight"):
        taps.append(w.conv(f"controlnet_down_blocks.{i}"))
        i += 1
    params["zero_down"] = taps
    params["zero_mid"] = w.conv("controlnet_mid_block")
    w.warn_unused("controlnet")
    return params


def load_controlnet(model_dir: str) -> Tuple[Dict, UNetConfig]:
    """Load a diffusers-layout ControlNet directory (config.json +
    diffusion_pytorch_model.safetensors). Returns (params, cfg) ready for
    ``LCMPipeline.set_controlnet``."""
    cfg = unet_config_from_json(_read_json(os.path.join(model_dir, "config.json")))
    path = find_weights_file(model_dir)
    if path is None:
        raise FileNotFoundError(f"no safetensors weights in {model_dir}")
    params = convert_controlnet(_load_safetensors(path), cfg)
    n_skips = 1 + cfg.num_blocks * cfg.layers_per_block + (cfg.num_blocks - 1)
    if len(params["zero_down"]) != n_skips:
        raise ValueError(
            f"controlnet has {len(params['zero_down'])} down taps; the UNet "
            f"trunk produces {n_skips} skips — incompatible architecture"
        )
    return params, cfg


def _convert_vae_mid(w: _W, key: str) -> Dict:
    def resnet(k):
        p = {
            "norm1": w.norm(k + ".norm1"),
            "conv1": w.conv(k + ".conv1"),
            "norm2": w.norm(k + ".norm2"),
            "conv2": w.conv(k + ".conv2"),
        }
        if w.has(k + ".conv_shortcut.weight"):
            p["shortcut"] = w.conv(k + ".conv_shortcut")
        return p

    a = key + ".attentions.0"
    # new diffusers naming (to_q…) vs legacy (query…)
    qk = ".to_q" if w.has(a + ".to_q.weight") else ".query"
    names = (
        {"q": ".to_q", "k": ".to_k", "v": ".to_v", "out": ".to_out.0"}
        if qk == ".to_q"
        else {"q": ".query", "k": ".key", "v": ".value", "out": ".proj_attn"}
    )
    gn = ".group_norm" if w.has(a + ".group_norm.weight") else ".norm"
    return {
        "resnet1": resnet(key + ".resnets.0"),
        "resnet2": resnet(key + ".resnets.1"),
        "attention": {
            "norm": w.norm(a + gn),
            **{k: w.linear(a + v) for k, v in names.items()},
        },
    }


def convert_vae_decoder(tensors: Dict[str, np.ndarray], cfg: VAEConfig) -> Dict:
    w = _W(tensors)

    def resnet(k):
        p = {
            "norm1": w.norm(k + ".norm1"),
            "conv1": w.conv(k + ".conv1"),
            "norm2": w.norm(k + ".norm2"),
            "conv2": w.conv(k + ".conv2"),
        }
        if w.has(k + ".conv_shortcut.weight"):
            p["shortcut"] = w.conv(k + ".conv_shortcut")
        return p

    params: Dict[str, Any] = {
        "conv_in": w.conv("decoder.conv_in"),
        "mid": _convert_vae_mid(w, "decoder.mid_block"),
    }
    if w.has("post_quant_conv.weight"):
        params["post_quant_conv"] = w.conv("post_quant_conv")

    up = []
    n = len(cfg.block_out_channels)
    for k in range(n):
        block = {
            "resnets": [
                resnet(f"decoder.up_blocks.{k}.resnets.{j}")
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if k < n - 1:
            block["upsample"] = w.conv(f"decoder.up_blocks.{k}.upsamplers.0.conv")
        up.append(block)
    params["up"] = up
    params["norm_out"] = w.norm("decoder.conv_norm_out")
    params["conv_out"] = w.conv("decoder.conv_out")
    return params


def convert_vae_encoder(tensors: Dict[str, np.ndarray], cfg: VAEConfig) -> Dict:
    w = _W(tensors)

    def resnet(k):
        p = {
            "norm1": w.norm(k + ".norm1"),
            "conv1": w.conv(k + ".conv1"),
            "norm2": w.norm(k + ".norm2"),
            "conv2": w.conv(k + ".conv2"),
        }
        if w.has(k + ".conv_shortcut.weight"):
            p["shortcut"] = w.conv(k + ".conv_shortcut")
        return p

    params: Dict[str, Any] = {"conv_in": w.conv("encoder.conv_in")}
    down = []
    n = len(cfg.block_out_channels)
    for i in range(n):
        block = {
            "resnets": [
                resnet(f"encoder.down_blocks.{i}.resnets.{j}")
                for j in range(cfg.layers_per_block)
            ]
        }
        if i < n - 1:
            block["downsample"] = w.conv(f"encoder.down_blocks.{i}.downsamplers.0.conv")
        down.append(block)
    params["down"] = down
    params["mid"] = _convert_vae_mid(w, "encoder.mid_block")
    params["norm_out"] = w.norm("encoder.conv_norm_out")
    params["conv_out"] = w.conv("encoder.conv_out")
    if w.has("quant_conv.weight"):
        params["quant_conv"] = w.conv("quant_conv")
    return params


def convert_clip_text(tensors: Dict[str, np.ndarray], cfg: CLIPTextConfig) -> Dict:
    w = _W(tensors)
    pre = "text_model."
    layers = []
    for i in range(cfg.num_layers):
        b = f"{pre}encoder.layers.{i}"
        layers.append(
            {
                "ln1": w.norm(b + ".layer_norm1"),
                "attn": {
                    "q": w.linear(b + ".self_attn.q_proj"),
                    "k": w.linear(b + ".self_attn.k_proj"),
                    "v": w.linear(b + ".self_attn.v_proj"),
                    "out": w.linear(b + ".self_attn.out_proj"),
                },
                "ln2": w.norm(b + ".layer_norm2"),
                "fc1": w.linear(b + ".mlp.fc1"),
                "fc2": w.linear(b + ".mlp.fc2"),
            }
        )
    params = {
        "token_embedding": w.embedding(pre + "embeddings.token_embedding"),
        "position_embedding": w.embedding(pre + "embeddings.position_embedding"),
        "layers": layers,
        "final_ln": w.norm(pre + "final_layer_norm"),
    }
    if cfg.projection_dim is not None and w.has("text_projection.weight"):
        params["text_projection"] = w.linear("text_projection")
    return params


def convert_clip_vision(tensors: Dict[str, np.ndarray], cfg) -> Dict:
    """HF CLIPVisionModel state dict → clip_vision param tree.

    Accepts both ``pre_layrnorm`` (HF's historical misspelling) and
    ``pre_layernorm`` key variants.
    """
    w = _W(tensors)
    pre = "vision_model."
    layers = []
    for i in range(cfg.num_layers):
        b = f"{pre}encoder.layers.{i}"
        layers.append(
            {
                "ln1": w.norm(b + ".layer_norm1"),
                "attn": {
                    "q": w.linear(b + ".self_attn.q_proj"),
                    "k": w.linear(b + ".self_attn.k_proj"),
                    "v": w.linear(b + ".self_attn.v_proj"),
                    "out": w.linear(b + ".self_attn.out_proj"),
                },
                "ln2": w.norm(b + ".layer_norm2"),
                "fc1": w.linear(b + ".mlp.fc1"),
                "fc2": w.linear(b + ".mlp.fc2"),
            }
        )
    pre_ln_key = (
        pre + "pre_layrnorm"
        if w.has(pre + "pre_layrnorm.weight")
        else pre + "pre_layernorm"
    )
    return {
        "patch_embedding": {
            "w": np.ascontiguousarray(
                w.raw(pre + "embeddings.patch_embedding.weight").transpose(2, 3, 1, 0)
            )
        },
        "class_embedding": w.raw(pre + "embeddings.class_embedding"),
        "position_embedding": w.embedding(pre + "embeddings.position_embedding"),
        "pre_ln": w.norm(pre_ln_key),
        "layers": layers,
        "post_ln": w.norm(pre + "post_layernorm"),
        "visual_projection": w.linear("visual_projection"),
    }


def clip_vision_config_from_json(cfg_json: Dict):
    from .models.configs import CLIPVisionConfig

    return CLIPVisionConfig(
        image_size=cfg_json.get("image_size", 224),
        patch_size=cfg_json.get("patch_size", 32),
        hidden_size=cfg_json.get("hidden_size", 768),
        num_layers=cfg_json.get("num_hidden_layers", 12),
        num_heads=cfg_json.get("num_attention_heads", 12),
        intermediate_size=cfg_json.get("intermediate_size", 3072),
        hidden_act=cfg_json.get("hidden_act", "quick_gelu"),
        layer_norm_eps=cfg_json.get("layer_norm_eps", 1e-5),
        projection_dim=cfg_json.get("projection_dim", 512),
    )


def load_clip_model(model_dir: str):
    """Load an HF CLIPModel directory (config.json with text_config +
    vision_config, model.safetensors, tokenizer files) into a NativeCLIP —
    the torch-free scorer backend for Yume (yume/scoring.NativeCLIP)."""
    from .utils.tokenizer import CLIPTokenizer
    from .yume.scoring import NativeCLIP

    cfg_json = _read_json(os.path.join(model_dir, "config.json"))
    tjson, vjson = cfg_json["text_config"], cfg_json["vision_config"]
    proj = cfg_json.get("projection_dim", 512)
    text_cfg = CLIPTextConfig(
        vocab_size=tjson.get("vocab_size", 49408),
        hidden_size=tjson.get("hidden_size", 512),
        num_layers=tjson.get("num_hidden_layers", 12),
        num_heads=tjson.get("num_attention_heads", 8),
        max_position_embeddings=tjson.get("max_position_embeddings", 77),
        intermediate_size=tjson.get("intermediate_size", 2048),
        hidden_act=tjson.get("hidden_act", "quick_gelu"),
        layer_norm_eps=tjson.get("layer_norm_eps", 1e-5),
        projection_dim=proj,
    )
    vision_cfg = clip_vision_config_from_json({**vjson, "projection_dim": proj})
    weights = find_weights_file(model_dir)
    if weights is None:
        raise FileNotFoundError(f"no safetensors weights in {model_dir}")
    tensors = _load_safetensors(weights)
    tok_dir = model_dir
    if os.path.isdir(os.path.join(model_dir, "tokenizer")):
        tok_dir = os.path.join(model_dir, "tokenizer")
    return NativeCLIP(
        text_params=convert_clip_text(tensors, text_cfg),
        text_cfg=text_cfg,
        vision_params=convert_clip_vision(tensors, vision_cfg),
        vision_cfg=vision_cfg,
        tokenizer=CLIPTokenizer.from_pretrained(tok_dir),
    )


# ---------------------------------------------------------------------------
# pipeline bundle
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PipelineBundle:
    """Everything a worker needs to serve one checkpoint."""

    arch: str  # "sd15" | "sdxl"
    model_dir: str
    tokenizer: CLIPTokenizer
    text_cfg: CLIPTextConfig
    text_params: Dict
    unet_cfg: UNetConfig
    unet_params: Dict
    vae_cfg: VAEConfig
    vae_params: Dict
    scheduler_cfg: LCMConfig
    # SDXL second tower
    tokenizer_2: Optional[CLIPTokenizer] = None
    text_cfg_2: Optional[CLIPTextConfig] = None
    text_params_2: Optional[Dict] = None
    vae_encoder_params: Optional[Dict] = None


def classify_arch(cross_attention_dim: int) -> str:
    """The reference's detection rule (worker_factory.py:17-70):
    2048/1280 → SDXL-class, 768/1024 → SD1.5-class."""
    if cross_attention_dim in (2048, 1280):
        return "sdxl"
    if cross_attention_dim in (768, 1024):
        return "sd15"
    raise ValueError(f"unsupported cross_attention_dim: {cross_attention_dim}")


def load_pipeline(model_dir: str, *, load_vae_encoder: bool = False) -> PipelineBundle:
    """Load a checkpoint into a PipelineBundle.

    Accepts a diffusers-layout directory (reference contract, base.py:40-58):
      scheduler/scheduler_config.json, tokenizer/, text_encoder/,
      unet/, vae/ (or vae_decoder/), and for SDXL additionally
      tokenizer_2/, text_encoder_2/ —
    or a single-file LDM-layout .safetensors (the reference's
    from_single_file path; see loader_single_file).
    """
    if os.path.isfile(model_dir):
        from .loader_single_file import load_single_file

        return load_single_file(model_dir)
    def sub(name):
        return os.path.join(model_dir, name)

    unet_raw = _read_json(os.path.join(sub("unet"), "config.json"))
    unet_cfg = unet_config_from_json(unet_raw)
    arch = classify_arch(unet_cfg.cross_attention_dim)

    unet_params = convert_unet(
        _load_safetensors(find_weights_file(sub("unet"))), unet_cfg
    )

    vae_dir = sub("vae") if os.path.isdir(sub("vae")) else sub("vae_decoder")
    vae_cfg = vae_config_from_json(_read_json(os.path.join(vae_dir, "config.json")))
    vae_tensors = _load_safetensors(find_weights_file(vae_dir))
    vae_params = convert_vae_decoder(vae_tensors, vae_cfg)
    vae_encoder_params = (
        convert_vae_encoder(vae_tensors, vae_cfg)
        if load_vae_encoder and any(k.startswith("encoder.") for k in vae_tensors)
        else None
    )

    # SDXL-refiner checkpoints carry ONLY the second (OpenCLIP bigG) tower:
    # text_encoder_2/tokenizer_2 exist, text_encoder/tokenizer do not. The
    # single tower then serves as THE text tower (seq context = 1280 = cad,
    # projected pooled feeds the micro-conditioning).
    is_refiner = (
        arch == "sdxl"
        and not os.path.isdir(sub("text_encoder"))
        and os.path.isdir(sub("text_encoder_2"))
    )
    te_dir = sub("text_encoder_2") if is_refiner else sub("text_encoder")
    tok_dir = sub("tokenizer_2") if is_refiner else sub("tokenizer")
    text_cfg = text_config_from_json(
        _read_json(os.path.join(te_dir, "config.json")),
        penultimate=(arch == "sdxl"),
    )
    text_params = convert_clip_text(
        _load_safetensors(find_weights_file(te_dir)), text_cfg
    )
    tokenizer = CLIPTokenizer.from_pretrained(tok_dir)

    sched_path = os.path.join(sub("scheduler"), "scheduler_config.json")
    if os.path.exists(sched_path):
        from .scheduler.lcm import load_scheduler_config

        scheduler_cfg = load_scheduler_config(model_dir)
    else:
        scheduler_cfg = LCMConfig()

    bundle = PipelineBundle(
        arch=arch,
        model_dir=model_dir,
        tokenizer=tokenizer,
        text_cfg=text_cfg,
        text_params=text_params,
        unet_cfg=unet_cfg,
        unet_params=unet_params,
        vae_cfg=vae_cfg,
        vae_params=vae_params,
        scheduler_cfg=scheduler_cfg,
        vae_encoder_params=vae_encoder_params,
    )

    if arch == "sdxl" and not is_refiner and os.path.isdir(sub("text_encoder_2")):
        bundle.text_cfg_2 = text_config_from_json(
            _read_json(os.path.join(sub("text_encoder_2"), "config.json")),
            penultimate=True,
        )
        bundle.text_params_2 = convert_clip_text(
            _load_safetensors(find_weights_file(sub("text_encoder_2"))),
            bundle.text_cfg_2,
        )
        bundle.tokenizer_2 = CLIPTokenizer.from_pretrained(sub("tokenizer_2"))
    return bundle
