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


def _translate_text_openclip(
    tensors: Dict[str, np.ndarray],
    prefix: str = "conditioner.embedders.1.model.",
) -> Dict[str, np.ndarray]:
    """OpenCLIP bigG (SDXL text tower 2) → transformers CLIPText names.

    The two formats differ in attention packing: OpenCLIP stores one fused
    ``attn.in_proj_weight`` [3C, C] / ``in_proj_bias`` [3C] per block, which
    splits into the q/k/v projections transformers (and this framework)
    keep separate. ``text_projection`` is a raw [C, proj] matrix applied as
    ``pooled @ proj`` — transposed relative to a Linear weight.
    (The reference delegates this translation to diffusers' from_single_file,
    cuda_worker.py:380.)
    """
    out: Dict[str, np.ndarray] = {}
    for key, t in tensors.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        if k == "token_embedding.weight":
            out["text_model.embeddings.token_embedding.weight"] = t
        elif k == "positional_embedding":
            out["text_model.embeddings.position_embedding.weight"] = t
        elif k in ("ln_final.weight", "ln_final.bias"):
            out["text_model.final_layer_norm." + k.split(".")[1]] = t
        elif k == "text_projection":
            out["text_projection.weight"] = np.ascontiguousarray(t.T)
        elif k == "text_projection.weight":  # some exports keep Linear form
            out["text_projection.weight"] = t
        elif k == "logit_scale":
            continue
        else:
            m = re.match(r"transformer\.resblocks\.(\d+)\.(.+)", k)
            if not m:
                continue
            i, rest = m.group(1), m.group(2)
            base = f"text_model.encoder.layers.{i}."
            if rest in ("attn.in_proj_weight", "attn.in_proj_bias"):
                q, kk, v = np.split(t, 3, axis=0)
                leaf = "weight" if rest.endswith("weight") else "bias"
                out[base + f"self_attn.q_proj.{leaf}"] = q
                out[base + f"self_attn.k_proj.{leaf}"] = kk
                out[base + f"self_attn.v_proj.{leaf}"] = v
            else:
                ren = {
                    "ln_1": "layer_norm1",
                    "ln_2": "layer_norm2",
                    "attn.out_proj": "self_attn.out_proj",
                    "mlp.c_fc": "mlp.fc1",
                    "mlp.c_proj": "mlp.fc2",
                }
                stem, _, leaf = rest.rpartition(".")
                if stem in ren:
                    out[base + ren[stem] + "." + leaf] = t
    return out


# ---------------------------------------------------------------------------
# SDXL config derivation (shape-driven, like diffusers' config inference)
# ---------------------------------------------------------------------------


def _derive_unet_cfg_sdxl(
    t: Dict[str, np.ndarray], cad: int, pooled_dim: Optional[int]
) -> UNetConfig:
    """Infer the UNet topology from the LDM tensors themselves (block
    widths, resnet/transformer counts, micro-conditioning dims), mirroring
    diffusers from_single_file's config inference. Head counts are not
    stored in checkpoints; SDXL's 64-dim-head rule applies.

    pooled_dim: the pooled text-embedding width feeding label_emb. The
    micro-conditioning id count isn't stored either — base models use 6
    ids, refiners 5 (aesthetic score instead of target size); divisibility
    of (pcei - pooled_dim) disambiguates."""
    pre = "model.diffusion_model."
    chan0 = t[pre + "input_blocks.0.0.weight"].shape[0]
    temb = t[pre + "time_embed.0.weight"].shape[0]

    block_out, tls = [], []
    layers_per_block = 1
    stage_channels, stage_layers, stage_tl = chan0, 0, 0
    idx = 1
    while True:
        res_key = f"{pre}input_blocks.{idx}.0.in_layers.2.weight"
        down_key = f"{pre}input_blocks.{idx}.0.op.weight"
        if res_key in t:
            stage_channels = t[res_key].shape[0]
            stage_layers += 1
            n_tf = 0
            while (
                f"{pre}input_blocks.{idx}.1.transformer_blocks.{n_tf}"
                ".attn1.to_q.weight" in t
            ):
                n_tf += 1
            stage_tl = max(stage_tl, n_tf)
            idx += 1
        elif down_key in t:
            block_out.append(stage_channels)
            tls.append(stage_tl)
            layers_per_block = stage_layers
            stage_layers, stage_tl = 0, 0
            idx += 1
        else:
            break
    if stage_layers:
        block_out.append(stage_channels)
        tls.append(stage_tl)
        layers_per_block = stage_layers

    mid_tf = 0
    while f"{pre}middle_block.1.transformer_blocks.{mid_tf}.attn1.to_q.weight" in t:
        mid_tf += 1

    cond_key = pre + "time_embed.0.cond_proj.weight"
    time_cond = t[cond_key].shape[1] if cond_key in t else None

    label_key = pre + "label_emb.0.0.weight"
    pcei = add_dim = None
    addition = None
    if label_key in t:
        addition = "text_time"
        pcei = t[label_key].shape[1]
        if pooled_dim:
            for n_ids in (6, 5):
                if (pcei - pooled_dim) % n_ids == 0:
                    add_dim = (pcei - pooled_dim) // n_ids
                    break

    return UNetConfig(
        in_channels=t[pre + "input_blocks.0.0.weight"].shape[1],
        out_channels=t[pre + "out.2.weight"].shape[0],
        block_out_channels=tuple(block_out),
        layers_per_block=layers_per_block,
        transformer_layers_per_block=tuple(tls),
        num_attention_heads=tuple(max(1, c // 64) for c in block_out),
        cross_attention_dim=cad,
        norm_groups=32,
        time_embed_dim_mult=temb // chan0,
        time_cond_proj_dim=time_cond,
        addition_embed_type=addition,
        addition_time_embed_dim=add_dim,
        projection_class_embeddings_input_dim=pcei,
        mid_block_transformer_layers=mid_tf,
    )


def _derive_text_cfg(
    text_t: Dict[str, np.ndarray], *, act: str, penultimate: bool,
    head_dim: int = 64,
) -> CLIPTextConfig:
    hidden = text_t["text_model.embeddings.token_embedding.weight"].shape[1]
    layers = 1 + max(
        int(m.group(1))
        for k in text_t
        if (m := re.match(r"text_model\.encoder\.layers\.(\d+)\.", k))
    )
    proj = (
        text_t["text_projection.weight"].shape[0]
        if "text_projection.weight" in text_t
        else None
    )
    return CLIPTextConfig(
        vocab_size=text_t["text_model.embeddings.token_embedding.weight"].shape[0],
        hidden_size=hidden,
        num_layers=layers,
        num_heads=max(1, hidden // head_dim),
        intermediate_size=text_t["text_model.encoder.layers.0.mlp.fc1.weight"].shape[0],
        hidden_act=act,
        penultimate=penultimate,
        projection_dim=proj,
    )


def _derive_vae_sdxl(tensors):
    """VAE topology from tensor names; SDXL scaling factor."""
    n_up = 1 + max(
        int(m.group(1))
        for k in tensors
        if (m := re.match(r"first_stage_model\.decoder\.up\.(\d+)\.", k))
    )
    n_res = 1 + max(
        int(m.group(1))
        for k in tensors
        if (m := re.match(r"first_stage_model\.decoder\.up\.0\.block\.(\d+)\.", k))
    )
    # block_out_channels is ascending (encoder order): LDM decoder.up.{i}
    # maps to diffusers up_blocks.{n-1-i}, whose width is the reversed list —
    # so reading up.{i} directly yields the ascending encoder widths
    widths = tuple(
        tensors[f"first_stage_model.decoder.up.{i}.block.0.conv2.weight"].shape[0]
        for i in range(n_up)
    )
    from .models.configs import VAEConfig

    vae_cfg = VAEConfig(
        latent_channels=tensors["first_stage_model.decoder.conv_in.weight"].shape[1],
        block_out_channels=widths,
        layers_per_block=n_res - 1,
        norm_groups=32,
        scaling_factor=SDXL_VAE.scaling_factor,
    )
    vae_t = _translate_vae(tensors, n_up)
    vae_params = convert_vae_decoder(vae_t, vae_cfg)
    vae_encoder_params = (
        convert_vae_encoder(vae_t, vae_cfg)
        if any(k.startswith("encoder.") for k in vae_t)
        else None
    )
    return vae_cfg, vae_params, vae_encoder_params


def _load_single_file_sdxl_refiner(path: str, tensors, cad: int) -> PipelineBundle:
    """SDXL-refiner single file: ONE OpenCLIP bigG tower at
    ``conditioner.embedders.0.model`` (no ViT-L), 5 micro-conditioning ids
    (aesthetic score). Mirrors the diffusers-dir refiner layout this loader
    already serves (loader.py is_refiner path); the reference only ever
    *detects* refiners (model_detector.py) without serving them."""
    big_t = _translate_text_openclip(
        tensors, prefix="conditioner.embedders.0.model."
    )
    if not big_t:
        raise ValueError(
            f"{path}: no text tower (conditioner.embedders.0) found"
        )
    text_cfg = _derive_text_cfg(big_t, act="gelu", penultimate=True)
    pooled_dim = text_cfg.projection_dim or text_cfg.hidden_size
    unet_cfg = _derive_unet_cfg_sdxl(tensors, cad, pooled_dim)
    unet_params = convert_unet(_translate_unet(tensors, unet_cfg), unet_cfg)
    vae_cfg, vae_params, vae_encoder_params = _derive_vae_sdxl(tensors)

    # the bigG tower's tokenizer pads with "!" (id 0), not EOS
    tok_dir = _find_tokenizer_dir(path, "tokenizer_2")
    if tok_dir is None:
        tok_dir = _find_tokenizer_dir(path)
    tokenizer = CLIPTokenizer.from_pretrained(tok_dir, pad_token="!")

    return PipelineBundle(
        arch="sdxl",
        model_dir=path,
        tokenizer=tokenizer,
        text_cfg=text_cfg,
        text_params=convert_clip_text(big_t, text_cfg),
        unet_cfg=unet_cfg,
        unet_params=unet_params,
        vae_cfg=vae_cfg,
        vae_params=vae_params,
        scheduler_cfg=_load_sidecar_scheduler(path),
        vae_encoder_params=vae_encoder_params,
    )


def _load_single_file_sdxl(path: str, tensors, cad: int) -> PipelineBundle:
    """SDXL single file: dual text towers (ViT-L + OpenCLIP bigG with packed
    q/k/v), micro-conditioning UNet, 0.13025-scaled VAE.

    The reference delegates this to diffusers StableDiffusionXLPipeline
    .from_single_file (cuda_worker.py:332-459)."""
    text1_t = _translate_text(tensors)
    if not text1_t:
        # refiner checkpoints keep their single bigG tower at embedders.0
        return _load_single_file_sdxl_refiner(path, tensors, cad)
    text2_t = _translate_text_openclip(tensors)
    if not text2_t:
        raise ValueError(
            f"{path}: no second text tower (conditioner.embedders.1.model)"
        )
    text_cfg = _derive_text_cfg(text1_t, act="quick_gelu", penultimate=True)
    text_cfg_2 = _derive_text_cfg(text2_t, act="gelu", penultimate=True)
    text2_hidden = text_cfg_2.hidden_size

    unet_cfg = _derive_unet_cfg_sdxl(tensors, cad, text2_hidden)
    unet_params = convert_unet(_translate_unet(tensors, unet_cfg), unet_cfg)
    vae_cfg, vae_params, vae_encoder_params = _derive_vae_sdxl(tensors)

    tokenizer = CLIPTokenizer.from_pretrained(_find_tokenizer_dir(path))
    tok2_dir = _find_tokenizer_dir(path, "tokenizer_2")
    if tok2_dir is not None:
        tokenizer_2 = CLIPTokenizer.from_pretrained(tok2_dir)
    else:
        # same BPE vocab; OpenCLIP pads with "!" (id 0), not EOS
        tokenizer_2 = CLIPTokenizer.from_pretrained(
            _find_tokenizer_dir(path), pad_token="!"
        )

    return PipelineBundle(
        arch="sdxl",
        model_dir=path,
        tokenizer=tokenizer,
        text_cfg=text_cfg,
        text_params=convert_clip_text(text1_t, text_cfg),
        unet_cfg=unet_cfg,
        unet_params=unet_params,
        vae_cfg=vae_cfg,
        vae_params=vae_params,
        scheduler_cfg=_load_sidecar_scheduler(path),
        vae_encoder_params=vae_encoder_params,
        tokenizer_2=tokenizer_2,
        text_cfg_2=text_cfg_2,
        text_params_2=convert_clip_text(text2_t, text_cfg_2),
    )


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def _load_sidecar_scheduler(ckpt_path: str) -> LCMConfig:
    """Single files carry no scheduler config — diffusers guesses; here a
    sidecar wins: ``<ckpt>.scheduler_config.json`` or a sibling
    ``scheduler/scheduler_config.json``. This is how v-prediction SD2.1-768
    checkpoints declare themselves; default stays epsilon."""
    import dataclasses as _dc
    import json as _json

    from .scheduler.lcm import load_scheduler_config

    base = os.path.splitext(ckpt_path)[0]
    sidecar = base + ".scheduler_config.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            raw = _json.load(f)
        known = {f.name for f in _dc.fields(LCMConfig)}
        logger.info("single-file scheduler config from %s", sidecar)
        return LCMConfig(**{k: v for k, v in raw.items() if k in known})
    sibling = os.path.join(
        os.path.dirname(ckpt_path), "scheduler", "scheduler_config.json"
    )
    if os.path.exists(sibling):
        logger.info("single-file scheduler config from %s", sibling)
        return load_scheduler_config(os.path.dirname(ckpt_path))
    return LCMConfig()


def _find_tokenizer_dir(ckpt_path: str, which: str = "tokenizer") -> Optional[str]:
    base = os.path.splitext(ckpt_path)[0]
    for cand in (
        f"{base}.{which}",
        os.path.join(os.path.dirname(ckpt_path), which),
    ):
        if os.path.isdir(cand):
            return cand
    if which == "tokenizer":
        raise FileNotFoundError(
            f"single-file checkpoints carry no tokenizer; place vocab.json/"
            f"merges.txt in {base}.tokenizer/ or a sibling tokenizer/ directory"
        )
    return None


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
        return _load_single_file_sdxl(path, tensors, cad)

    has_cond_proj = any("time_embed.0.cond_proj" in k for k in tensors) or any(
        "time_embedding.cond_proj" in k for k in tensors
    )
    unet_cfg = SD15_UNET if has_cond_proj else UNetConfig(
        **{**SD15_UNET.__dict__, "time_cond_proj_dim": None}
    )
    if cad == 1024:  # SD2.x-class: 64-dim attention heads, not SD1.5's 8
        unet_cfg = UNetConfig(**{
            **unet_cfg.__dict__,
            "cross_attention_dim": 1024,
            "num_attention_heads": tuple(
                max(1, c // 64) for c in unet_cfg.block_out_channels
            ),
        })

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
    penultimate, penultimate_ln, act, is_sd2_text = False, False, "quick_gelu", False
    if not text_t and any(
        k.startswith("cond_stage_model.model.") for k in tensors
    ):
        # SD2.x: OpenCLIP ViT-H text tower (fused in_proj, gelu), conditioned
        # on the *final-layer-normed* penultimate hidden state (diffusers
        # serves a truncated 23-layer tower ending in final_layer_norm).
        # prediction_type: epsilon by default; v-prediction checkpoints
        # (768-v) declare it via the sidecar scheduler config
        # (_load_sidecar_scheduler).
        text_t = _translate_text_openclip(
            tensors, prefix="cond_stage_model.model."
        )
        penultimate, penultimate_ln, act = True, True, "gelu"
        is_sd2_text = True
    if not text_t:
        raise ValueError(f"{path}: no text tower (cond_stage_model) found")
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
           ].shape[0],
           "hidden_act": act, "penultimate": penultimate,
           "penultimate_ln": penultimate_ln}
    )
    text_params = convert_clip_text(text_t, text_cfg)

    tok_kwargs = {"pad_token": "!"} if is_sd2_text else {}
    tokenizer = CLIPTokenizer.from_pretrained(
        _find_tokenizer_dir(path), **tok_kwargs
    )

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
        scheduler_cfg=_load_sidecar_scheduler(path),
        vae_encoder_params=vae_encoder_params,
    )
