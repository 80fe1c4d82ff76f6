"""CLIP ViT image encoder as a pure functional JAX model.

Closes the round-1 gap where Yume's CLIP scoring only worked through a
torch/transformers adapter (reference yume/scoring.py:27-130 scores dream
candidates with a real CLIPModel): this tower runs the image side natively
as one jitted program, sharing the encoder-layer code with the text tower
(clip_text._encoder_layer — identical block, non-causal mask).

HF CLIPVisionTransformer semantics: patch conv (stride=patch, no bias) →
prepend class embedding → +position embeddings → pre-layernorm → encoder →
post-layernorm on the CLS token → visual projection (no bias).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .clip_text import _encoder_layer
from .configs import CLIPTextConfig, CLIPVisionConfig
from .layers import conv2d, init_conv, init_linear, init_norm, layer_norm, linear

# CLIPProcessor normalization constants (OpenAI CLIP)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _layer_cfg(cfg: CLIPVisionConfig) -> CLIPTextConfig:
    """Encoder-layer hyperparams repackaged for clip_text._encoder_layer."""
    return CLIPTextConfig(
        hidden_size=cfg.hidden_size,
        num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        hidden_act=cfg.hidden_act,
        layer_norm_eps=cfg.layer_norm_eps,
    )


def encode_image(
    params, pixel_values: jnp.ndarray, cfg: CLIPVisionConfig
) -> jnp.ndarray:
    """[B, H, W, 3] normalized pixels → [B, projection_dim] image features.

    pixel_values must already be CLIP-normalized ((x/255 - mean) / std);
    use ``preprocess_images`` for the host-side resize/crop/normalize.
    """
    b = pixel_values.shape[0]
    dtype = params["patch_embedding"]["w"].dtype
    x = conv2d(
        params["patch_embedding"], pixel_values.astype(dtype),
        stride=cfg.patch_size, padding="VALID",
    )  # [B, h', w', C]
    x = x.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(dtype), (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"]["w"][: x.shape[1]].astype(dtype)
    x = layer_norm(params["pre_ln"], x, eps=cfg.layer_norm_eps)

    lcfg = _layer_cfg(cfg)
    mask = jnp.zeros((1, 1, 1, 1), jnp.float32)  # non-causal
    for layer_p in params["layers"]:
        x = _encoder_layer(layer_p, x, mask, lcfg)

    pooled = layer_norm(params["post_ln"], x[:, 0], eps=cfg.layer_norm_eps)
    return linear(params["visual_projection"], pooled)


def preprocess_images(images, cfg: CLIPVisionConfig) -> np.ndarray:
    """HWC uint8 arrays → [N, S, S, 3] float32, CLIP-normalized.

    Mirrors CLIPProcessor: bicubic resize of the shortest edge to
    ``image_size``, center crop, scale 1/255, mean/std normalize.
    """
    from PIL import Image

    s = cfg.image_size
    out = np.empty((len(images), s, s, 3), np.float32)
    for i, arr in enumerate(images):
        img = Image.fromarray(np.asarray(arr)).convert("RGB")
        w, h = img.size
        scale = s / min(w, h)
        nw, nh = max(s, int(round(w * scale))), max(s, int(round(h * scale)))
        img = img.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - s) // 2, (nh - s) // 2
        img = img.crop((left, top, left + s, top + s))
        out[i] = np.asarray(img, np.float32) / 255.0
    return (out - IMAGE_MEAN) / IMAGE_STD


def init_params(
    cfg: CLIPVisionConfig,
    rng: Optional[np.random.RandomState] = None,
    dtype=np.float32,
):
    rng = rng or np.random.RandomState(0)
    c, ff = cfg.hidden_size, cfg.intermediate_size

    def layer():
        return {
            "ln1": init_norm(c, dtype=dtype),
            "attn": {
                "q": init_linear(rng, c, c, dtype=dtype),
                "k": init_linear(rng, c, c, dtype=dtype),
                "v": init_linear(rng, c, c, dtype=dtype),
                "out": init_linear(rng, c, c, dtype=dtype),
            },
            "ln2": init_norm(c, dtype=dtype),
            "fc1": init_linear(rng, c, ff, dtype=dtype),
            "fc2": init_linear(rng, ff, c, dtype=dtype),
        }

    return {
        "patch_embedding": {
            "w": (rng.randn(cfg.patch_size, cfg.patch_size, 3, c) * 0.02).astype(dtype)
        },
        "class_embedding": (rng.randn(c) * 0.02).astype(dtype),
        "position_embedding": {
            "w": (rng.randn(cfg.num_patches + 1, c) * 0.02).astype(dtype)
        },
        "pre_ln": init_norm(c, dtype=dtype),
        "layers": [layer() for _ in range(cfg.num_layers)],
        "post_ln": init_norm(c, dtype=dtype),
        "visual_projection": init_linear(
            rng, c, cfg.projection_dim, bias=False, dtype=dtype
        ),
    }
