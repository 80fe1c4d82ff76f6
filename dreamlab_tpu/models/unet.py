"""Conditional diffusion UNet (SD1.5 / SDXL topologies), NHWC, pure functional.

The execution core the TPU build replaces: the reference runs this as a
compiled RKNN graph (/root/reference/backends/rknnlcm.py:586-604) or a
diffusers CUDA module (/root/reference/backends/cuda_worker.py:221-229).
Here the whole UNet is one traced function — XLA fuses the elementwise
chains into the convs, and spatial attention dispatches to the Pallas flash
kernel (ops/attention.py).

Design notes (TPU-first):
- NHWC activations / HWIO kernels end-to-end: the layout the TPU conv units
  prefer, and the same boundary convention the reference's NPU used
  (rknnlcm.py:148-155) — but held *internally*, not transposed at an API edge.
- GroupNorm statistics in fp32; everything else follows the params dtype
  (bf16 in production) with fp32 MXU accumulation.
- No Python control flow on traced values; the architecture loop structure
  is static per config, so each (config, H, W) pair traces to a fixed graph.

Config semantics mirror diffusers' UNet2DConditionModel so detection by
``cross_attention_dim`` (engine/detect) and weight loading stay 1:1 with the
reference's checkpoint ecosystem.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from .configs import UNetConfig
from .layers import (
    conv2d,
    geglu,
    group_norm,
    group_norm_silu,
    init_conv,
    init_linear,
    init_norm,
    layer_norm,
    linear,
    nearest_upsample,
    silu,
    timestep_embedding,
)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _resnet(p, x, emb, *, groups):
    """ResnetBlock2D: GN→SiLU→conv, +time, GN→SiLU→conv, +skip."""
    h = conv2d(p["conv1"], group_norm_silu(p["norm1"], x, groups=groups))
    t = linear(p["time_emb_proj"], silu(emb))
    h = h + t[:, None, None, :].astype(h.dtype)
    h = conv2d(p["conv2"], group_norm_silu(p["norm2"], h, groups=groups))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x)
    return x + h


def _packed_proj(p, x):
    """One matmul for S stacked projections: w [Cin, S, Cout] → [B, N, S, Cout].

    XLA lowers the einsum to a single [B·N, Cin] @ [Cin, S·Cout] MXU matmul —
    the input activations stream from HBM once instead of S times, and the
    per-matmul launch/epilogue overhead is paid once (round-4 MFU lever,
    docs/PERFORMANCE.md)."""
    out = jnp.einsum(
        "bnc,cse->bnse", x, p["w"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def _attention(p, x, context, *, heads, impl="auto"):
    """Multi-head attention over token axis. x: [B, N, C]; context: [B, M, Cc]
    or None for self-attention.

    Accepts either the loader/init layout ({"q","k","v","out"}) or the packed
    layout pack_attention_params produces ({"qkv"} for self-attention,
    {"q","kv"} for cross) — the pipeline packs at weight-placement time so
    every attention site costs one projection matmul instead of three (self)
    or two (cross)."""
    b, n, c = x.shape
    d = c // heads
    ctx = x if context is None else context
    m = ctx.shape[1]
    if "qkv" in p:
        qkv = _packed_proj(p["qkv"], x)  # [B, N, 3, C]
        q = qkv[:, :, 0].reshape(b, n, heads, d)
        k = qkv[:, :, 1].reshape(b, m, heads, d)
        v = qkv[:, :, 2].reshape(b, m, heads, d)
    elif "kv" in p:
        q = linear(p["q"], x).reshape(b, n, heads, d)
        kv = _packed_proj(p["kv"], ctx)  # [B, M, 2, C]
        k = kv[:, :, 0].reshape(b, m, heads, d)
        v = kv[:, :, 1].reshape(b, m, heads, d)
    else:
        q = linear(p["q"], x).reshape(b, n, heads, d)
        k = linear(p["k"], ctx).reshape(b, m, heads, d)
        v = linear(p["v"], ctx).reshape(b, m, heads, d)
    out = dot_product_attention(q, k, v, impl=impl)
    return linear(p["out"], out.reshape(b, n, c))


def _transformer_block(p, x, context, *, heads, impl="auto"):
    """BasicTransformerBlock: self-attn, cross-attn, GEGLU FF (pre-LN)."""
    x = x + _attention(p["attn1"], layer_norm(p["ln1"], x), None, heads=heads, impl=impl)
    x = x + _attention(p["attn2"], layer_norm(p["ln2"], x), context, heads=heads, impl=impl)
    h = layer_norm(p["ln3"], x)
    h = linear(p["ff_out"], geglu(p["ff_geglu"], h))
    return x + h


def _spatial_transformer(p, x, context, *, heads, groups, impl="auto"):
    """Transformer2DModel: GN, project in, token-space blocks, project out,
    residual. Projections are channel-wise linear (≡ the 1×1 convs SD1.5
    checkpoints store; the loader flattens them)."""
    b, h_, w_, c = x.shape
    residual = x
    x = group_norm(p["norm"], x, groups=groups, eps=1e-6)
    x = linear(p["proj_in"], x.reshape(b, h_ * w_, c))
    for blk in p["blocks"]:
        x = _transformer_block(blk, x, context, heads=heads, impl=impl)
    x = linear(p["proj_out"], x)
    return x.reshape(b, h_, w_, c) + residual


# ---------------------------------------------------------------------------
# trunk pieces (shared with models.controlnet, which runs the same down/mid
# stack under zero-conv taps)
# ---------------------------------------------------------------------------


def time_embed(
    params,
    cfg: UNetConfig,
    timesteps: jnp.ndarray,
    timestep_cond: Optional[jnp.ndarray],
    added_text_embeds: Optional[jnp.ndarray],
    added_time_ids: Optional[jnp.ndarray],
    dtype,
) -> jnp.ndarray:
    """Combined time / LCM-w / SDXL-micro-conditioning embedding [B, temb]."""
    t_emb = timestep_embedding(
        timesteps, cfg.block_out_channels[0],
        flip_sin_to_cos=cfg.flip_sin_to_cos, downscale_freq_shift=cfg.freq_shift,
    ).astype(dtype)
    if cfg.time_cond_proj_dim is not None and timestep_cond is not None:
        t_emb = t_emb + linear(
            params["time_embedding"]["cond_proj"], timestep_cond.astype(dtype)
        )
    emb = linear(params["time_embedding"]["linear_1"], t_emb)
    emb = linear(params["time_embedding"]["linear_2"], silu(emb))

    if cfg.addition_embed_type == "text_time":
        time_ids_emb = timestep_embedding(
            added_time_ids.reshape(-1), cfg.addition_time_embed_dim,
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).reshape(added_time_ids.shape[0], -1)
        add = jnp.concatenate(
            [added_text_embeds.astype(jnp.float32), time_ids_emb], axis=-1
        ).astype(dtype)
        a = linear(params["add_embedding"]["linear_1"], add)
        emb = emb + linear(params["add_embedding"]["linear_2"], silu(a))
    return emb


def down_blocks(params, cfg: UNetConfig, x, emb, context):
    """Run the down stack on post-conv_in ``x``. Returns (x, skips) where
    ``skips`` includes the initial sample — one entry per skip connection
    the up stack (or a ControlNet zero-conv tap) consumes."""
    skips = [x]
    for i, block in enumerate(params["down"]):
        heads = cfg.num_attention_heads[i]
        for j, res in enumerate(block["resnets"]):
            x = _resnet(res, x, emb, groups=cfg.norm_groups)
            if block.get("attentions"):
                x = _spatial_transformer(
                    block["attentions"][j], x, context,
                    heads=heads, groups=cfg.norm_groups,
                    impl=cfg.attention_impl,
                )
            skips.append(x)
        if "downsample" in block:
            x = conv2d(block["downsample"], x, stride=2)
            skips.append(x)
    return x, skips


def mid_block(params, cfg: UNetConfig, x, emb, context):
    mid = params["mid"]
    x = _resnet(mid["resnet1"], x, emb, groups=cfg.norm_groups)
    if "attention" in mid:
        x = _spatial_transformer(
            mid["attention"], x, context,
            heads=cfg.num_attention_heads[-1], groups=cfg.norm_groups,
            impl=cfg.attention_impl,
        )
    return _resnet(mid["resnet2"], x, emb, groups=cfg.norm_groups)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def forward(
    params,
    cfg: UNetConfig,
    sample: jnp.ndarray,
    timesteps: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    timestep_cond: Optional[jnp.ndarray] = None,
    added_text_embeds: Optional[jnp.ndarray] = None,
    added_time_ids: Optional[jnp.ndarray] = None,
    down_residuals=None,
    mid_residual=None,
) -> jnp.ndarray:
    """Predict noise for ``sample`` [B, H, W, 4] at ``timesteps`` [B].

    encoder_hidden_states: [B, 77, cross_attention_dim] text conditioning.
    timestep_cond: [B, time_cond_proj_dim] LCM guidance embedding (w).
    added_text_embeds / added_time_ids: SDXL micro-conditioning
    ([B, pooled_dim], [B, 6]).
    down_residuals / mid_residual: ControlNet taps (models.controlnet) —
    one residual per skip connection plus one for the mid output, following
    the diffusers consumption contract (residuals modify the skips handed to
    the up stack and the mid output, not the sample flowing into mid).
    """
    dtype = params["conv_in"]["w"].dtype
    x = sample.astype(dtype)
    context = encoder_hidden_states.astype(dtype)

    emb = time_embed(
        params, cfg, timesteps, timestep_cond, added_text_embeds,
        added_time_ids, dtype,
    )

    # --- down ---
    x = conv2d(params["conv_in"], x)
    x, skips = down_blocks(params, cfg, x, emb, context)
    if down_residuals is not None:
        if len(down_residuals) != len(skips):
            raise ValueError(
                f"ControlNet provides {len(down_residuals)} down residuals "
                f"but this UNet has {len(skips)} skip connections — "
                "architecture mismatch"
            )
        skips = [s + r.astype(s.dtype) for s, r in zip(skips, down_residuals)]

    # --- mid ---
    x = mid_block(params, cfg, x, emb, context)
    if mid_residual is not None:
        x = x + mid_residual.astype(x.dtype)

    # --- up ---
    for k, block in enumerate(params["up"]):
        heads = cfg.num_attention_heads[cfg.num_blocks - 1 - k]
        for j, res in enumerate(block["resnets"]):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = _resnet(res, x, emb, groups=cfg.norm_groups)
            if block.get("attentions"):
                x = _spatial_transformer(
                    block["attentions"][j], x, context,
                    heads=heads, groups=cfg.norm_groups,
                    impl=cfg.attention_impl,
                )
        if "upsample" in block:
            x = conv2d(block["upsample"], nearest_upsample(x))

    x = group_norm_silu(params["norm_out"], x, groups=cfg.norm_groups)
    x = conv2d(params["conv_out"], x)
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# weight packing (applied once at weight-placement time)
# ---------------------------------------------------------------------------


def _stack_attn(p, names):
    """{"q","k","v"(subset)} linear dicts → one {"w":[Cin,S,Cout], "b"?} dict."""
    xp = jnp if any(isinstance(p[n]["w"], jnp.ndarray) for n in names) else np
    packed = {"w": xp.stack([p[n]["w"] for n in names], axis=1)}
    if all("b" in p[n] for n in names):
        packed["b"] = xp.stack([p[n]["b"] for n in names], axis=0)
    return packed


def pack_attention_params(params):
    """Return a tree with every transformer attention's projections packed:
    attn1 {"q","k","v"} → {"qkv": [C,3,C]}, attn2 {"k","v"} → {"kv": [Cc,2,C]}.

    Self-attention is identified by *key name* (attn1/attn2), not by shape —
    tiny test configs can have cross_attention_dim == C, which would make a
    shape heuristic mis-pack a cross site. Non-attention leaves are shared
    with the input tree (no copies); already-packed trees pass through.
    The packed projection is numerically the same contraction — each output
    column block reduces over the same axis in the same order.
    """

    def pack_attn(p, self_attn):
        if "qkv" in p or "kv" in p or "q" not in p:
            return p
        if self_attn:
            return {"qkv": _stack_attn(p, ("q", "k", "v")), "out": p["out"]}
        return {
            "q": p["q"],
            "kv": _stack_attn(p, ("k", "v")),
            "out": p["out"],
        }

    def walk(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k in ("attn1", "attn2") and isinstance(v, dict):
                    out[k] = pack_attn(v, self_attn=(k == "attn1"))
                else:
                    out[k] = walk(v)
            return out
        if isinstance(tree, list):
            return [walk(v) for v in tree]
        return tree

    return walk(params)


# ---------------------------------------------------------------------------
# init (tests / cold start)
# ---------------------------------------------------------------------------


def _init_resnet(rng, cin, cout, temb_dim, groups, dtype):
    p = {
        "norm1": init_norm(cin, dtype=dtype),
        "conv1": init_conv(rng, 3, 3, cin, cout, dtype=dtype),
        "time_emb_proj": init_linear(rng, temb_dim, cout, dtype=dtype),
        "norm2": init_norm(cout, dtype=dtype),
        "conv2": init_conv(rng, 3, 3, cout, cout, dtype=dtype),
    }
    if cin != cout:
        p["shortcut"] = init_conv(rng, 1, 1, cin, cout, dtype=dtype)
    return p


def _init_attn(rng, c, ctx_dim, dtype):
    return {
        "q": init_linear(rng, c, c, bias=False, dtype=dtype),
        "k": init_linear(rng, ctx_dim, c, bias=False, dtype=dtype),
        "v": init_linear(rng, ctx_dim, c, bias=False, dtype=dtype),
        "out": init_linear(rng, c, c, dtype=dtype),
    }


def _init_transformer(rng, c, ctx_dim, n_layers, dtype):
    def block():
        return {
            "ln1": init_norm(c, dtype=dtype),
            "attn1": _init_attn(rng, c, c, dtype),
            "ln2": init_norm(c, dtype=dtype),
            "attn2": _init_attn(rng, c, ctx_dim, dtype),
            "ln3": init_norm(c, dtype=dtype),
            "ff_geglu": init_linear(rng, c, 8 * c, dtype=dtype),
            "ff_out": init_linear(rng, 4 * c, c, dtype=dtype),
        }

    return {
        "norm": init_norm(c, dtype=dtype),
        "proj_in": init_linear(rng, c, c, dtype=dtype),
        "blocks": [block() for _ in range(n_layers)],
        "proj_out": init_linear(rng, c, c, dtype=dtype),
    }


def init_params(cfg: UNetConfig, rng: Optional[np.random.RandomState] = None, dtype=np.float32):
    rng = rng or np.random.RandomState(0)
    temb = cfg.time_embed_dim
    chans = cfg.block_out_channels
    ctx = cfg.cross_attention_dim

    params = {
        "conv_in": init_conv(rng, 3, 3, cfg.in_channels, chans[0], dtype=dtype),
        "time_embedding": {
            "linear_1": init_linear(rng, chans[0], temb, dtype=dtype),
            "linear_2": init_linear(rng, temb, temb, dtype=dtype),
        },
    }
    if cfg.time_cond_proj_dim is not None:
        params["time_embedding"]["cond_proj"] = init_linear(
            rng, cfg.time_cond_proj_dim, chans[0], bias=False, dtype=dtype
        )
    if cfg.addition_embed_type == "text_time":
        params["add_embedding"] = {
            "linear_1": init_linear(
                rng, cfg.projection_class_embeddings_input_dim, temb, dtype=dtype
            ),
            "linear_2": init_linear(rng, temb, temb, dtype=dtype),
        }

    # --- down; track skip channels exactly as forward consumes them ---
    down = []
    skip_chans = [chans[0]]
    cur = chans[0]
    for i, cout in enumerate(chans):
        tl = cfg.transformer_layers_per_block[i]
        block = {"resnets": []}
        if tl > 0:
            block["attentions"] = []
        for _ in range(cfg.layers_per_block):
            block["resnets"].append(_init_resnet(rng, cur, cout, temb, cfg.norm_groups, dtype))
            cur = cout
            if tl > 0:
                block["attentions"].append(_init_transformer(rng, cout, ctx, tl, dtype))
            skip_chans.append(cout)
        if i < cfg.num_blocks - 1:
            block["downsample"] = init_conv(rng, 3, 3, cout, cout, dtype=dtype)
            skip_chans.append(cout)
        down.append(block)
    params["down"] = down

    # --- mid ---
    mid_c = chans[-1]
    mid = {
        "resnet1": _init_resnet(rng, mid_c, mid_c, temb, cfg.norm_groups, dtype),
        "resnet2": _init_resnet(rng, mid_c, mid_c, temb, cfg.norm_groups, dtype),
    }
    if cfg.has_mid_attention:
        mid["attention"] = _init_transformer(
            rng, mid_c, ctx, cfg.mid_block_transformer_layers, dtype
        )
    params["mid"] = mid

    # --- up (reverse order) ---
    up = []
    cur = mid_c
    rev = list(reversed(chans))
    for k, cout in enumerate(rev):
        i = cfg.num_blocks - 1 - k  # matching down-block index
        tl = cfg.transformer_layers_per_block[i]
        block = {"resnets": []}
        if tl > 0:
            block["attentions"] = []
        for _ in range(cfg.layers_per_block + 1):
            skip = skip_chans.pop()
            block["resnets"].append(
                _init_resnet(rng, cur + skip, cout, temb, cfg.norm_groups, dtype)
            )
            cur = cout
            if tl > 0:
                block["attentions"].append(_init_transformer(rng, cout, ctx, tl, dtype))
        if k < cfg.num_blocks - 1:
            block["upsample"] = init_conv(rng, 3, 3, cout, cout, dtype=dtype)
        up.append(block)
    params["up"] = up

    params["norm_out"] = init_norm(chans[0], dtype=dtype)
    params["conv_out"] = init_conv(rng, 3, 3, chans[0], cfg.out_channels, dtype=dtype)
    return params
