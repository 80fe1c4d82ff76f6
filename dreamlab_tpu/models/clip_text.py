"""CLIP text encoder as a pure functional JAX model.

Covers both text towers the reference's checkpoints use: OpenAI CLIP ViT-L/14
(SD1.5, quick_gelu) and OpenCLIP ViT-bigG (SDXL encoder 2, gelu + text
projection). The reference runs this as a compiled ONNX/RKNN graph or inside
diffusers (/root/reference/backends/rknnlcm.py:296-367); here it is one more
jit-traceable function whose params ride in the same pytree as the UNet's.

Sequence length is fixed at 77 (tokenizer pad-to-max, reference
rknnlcm.py:305-311), so one compilation serves every prompt.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from .configs import CLIPTextConfig
from .layers import (
    gelu,
    init_embedding,
    init_linear,
    init_norm,
    layer_norm,
    linear,
    quick_gelu,
)

_ACTS = {"quick_gelu": quick_gelu, "gelu": gelu}


def _self_attention(p, x, mask, num_heads):
    b, n, c = x.shape
    d = c // num_heads
    q = linear(p["q"], x).reshape(b, n, num_heads, d)
    k = linear(p["k"], x).reshape(b, n, num_heads, d)
    v = linear(p["v"], x).reshape(b, n, num_heads, d)
    # 77-token causal attention: tiny — always the XLA path, fused by the
    # compiler; the flash kernel only pays off on the UNet's spatial axis.
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * (d**-0.5) + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(b, n, c)
    return linear(p["out"], out)


def _encoder_layer(p, x, mask, cfg: CLIPTextConfig):
    act = _ACTS[cfg.hidden_act]
    h = layer_norm(p["ln1"], x, eps=cfg.layer_norm_eps)
    x = x + _self_attention(p["attn"], h, mask, cfg.num_heads)
    h = layer_norm(p["ln2"], x, eps=cfg.layer_norm_eps)
    h = linear(p["fc1"], h)
    h = act(h)
    h = linear(p["fc2"], h)
    return x + h


def encode_text(
    params,
    input_ids: jnp.ndarray,
    cfg: CLIPTextConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the text tower.

    Args:
        params: parameter pytree (see ``init_params`` for the schema).
        input_ids: int32 [B, 77].

    Returns:
        (hidden_states [B, 77, C], pooled [B, C or projection_dim]) —
        ``hidden_states`` is the final layer's (or penultimate's, for SDXL)
        layer-normed-as-appropriate sequence output; ``pooled`` is the
        EOS-position embedding (argmax of ids = the EOS token under CLIP's
        vocabulary ordering), optionally text-projected.
    """
    b, n = input_ids.shape
    pos = jnp.arange(n)
    x = params["token_embedding"]["w"][input_ids] + params["position_embedding"]["w"][pos]
    x = x.astype(params["token_embedding"]["w"].dtype)

    # causal mask, [1, 1, N, N] fp32 additive
    causal = jnp.triu(jnp.full((n, n), -1e9, dtype=jnp.float32), k=1)[None, None]

    hidden_states = []
    for layer_p in params["layers"]:
        x = _encoder_layer(layer_p, x, causal, cfg)
        hidden_states.append(x)

    final = layer_norm(params["final_ln"], x, eps=cfg.layer_norm_eps)

    # pooled output: embedding at the EOS position of the *final* normed
    # state. EOS is found by equality with the vocabulary's last id (CLIP
    # convention: eos = vocab_size - 1), NOT by argmax — textual-inversion
    # ids sit beyond the base vocab and would win an argmax.
    eos_id = cfg.vocab_size - 1
    eos_idx = jnp.argmax((input_ids == eos_id).astype(jnp.int32), axis=-1)
    pooled = final[jnp.arange(b), eos_idx]
    if cfg.projection_dim is not None:
        pooled = linear(params["text_projection"], pooled)

    if cfg.penultimate:
        seq_out = hidden_states[-2]
        if cfg.penultimate_ln:
            # SD2.x convention: penultimate state IS final-layer-normed
            # (diffusers runs a truncated tower ending in final_layer_norm);
            # SDXL takes the raw penultimate state
            seq_out = layer_norm(params["final_ln"], seq_out,
                                 eps=cfg.layer_norm_eps)
    else:
        seq_out = final
    return seq_out, pooled


def init_params(cfg: CLIPTextConfig, rng: Optional[np.random.RandomState] = None, dtype=np.float32):
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

    params = {
        "token_embedding": init_embedding(rng, cfg.vocab_size, c, dtype=dtype),
        "position_embedding": init_embedding(rng, cfg.max_position_embeddings, c, dtype=dtype),
        "layers": [layer() for _ in range(cfg.num_layers)],
        "final_ln": init_norm(c, dtype=dtype),
    }
    if cfg.projection_dim is not None:
        params["text_projection"] = init_linear(
            rng, c, cfg.projection_dim, bias=False, dtype=dtype
        )
    return params
