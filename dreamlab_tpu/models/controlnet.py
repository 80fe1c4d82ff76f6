"""ControlNet spatial conditioning (NHWC, pure functional).

Completes the reference's unfinished roadmap item: its README lists
"ControlNet support (in progress)" (/root/reference/README.md:529) and the
pipeline ships only the hint-image preprocessing helper
``prepare_controlnet_cond`` (/root/reference/backends/rknnlcm.py:693-697)
with nothing consuming it. Here the feature is finished TPU-first:

- the ControlNet trunk *is* the UNet's down/mid stack (``unet.down_blocks``
  / ``unet.mid_block`` run on the ControlNet's own weights), so the two
  models stay numerically and structurally in lockstep;
- the hint-image embedding is latent-independent, so the pipeline computes
  it ONCE outside the denoise ``lax.scan`` and only the trunk + zero-conv
  taps run per step — XLA fuses them into the same program as the UNet;
- weights are jit *arguments* like every other model here: loading a
  different ControlNet (canny/depth/pose) never recompiles.

Checkpoint layout follows diffusers' ``ControlNetModel`` (config.json +
safetensors), the format the reference's ecosystem publishes ControlNets in.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .configs import UNetConfig
from .layers import conv2d, init_conv, silu
from . import unet


def embed_cond(params, hint: jnp.ndarray) -> jnp.ndarray:
    """Hint-image embedding: [B, H, W, 3] in [0, 1] → [B, H/8, W/8, C0].

    Conv ladder (diffusers ControlNetConditioningEmbedding): SiLU after every
    conv except the zero-initialized ``conv_out``; odd-indexed block convs
    stride 2, giving the 8× spatial reduction to latent resolution.

    Latent-independent — call once per request, outside the denoise scan.
    """
    dtype = params["conv_in"]["w"].dtype
    x = silu(conv2d(params["conv_in"], hint.astype(dtype)))
    for i, blk in enumerate(params["blocks"]):
        x = silu(conv2d(blk, x, stride=2 if i % 2 else 1))
    return conv2d(params["conv_out"], x)


def forward(
    params,
    cfg: UNetConfig,
    sample: jnp.ndarray,
    timesteps: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    cond_embedding: jnp.ndarray,
    *,
    conditioning_scale=1.0,
    timestep_cond: Optional[jnp.ndarray] = None,
    added_text_embeds: Optional[jnp.ndarray] = None,
    added_time_ids: Optional[jnp.ndarray] = None,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Run the control trunk; return (down_residuals, mid_residual).

    ``cond_embedding`` is the precomputed ``embed_cond`` output (already at
    latent resolution). Residual count equals the UNet's skip count; each is
    a zero-conv tap scaled by ``conditioning_scale``, ready for
    ``unet.forward(..., down_residuals=, mid_residual=)``.
    """
    dtype = params["conv_in"]["w"].dtype
    x = sample.astype(dtype)
    context = encoder_hidden_states.astype(dtype)

    emb = unet.time_embed(
        params, cfg, timesteps, timestep_cond, added_text_embeds,
        added_time_ids, dtype,
    )
    x = conv2d(params["conv_in"], x) + cond_embedding.astype(dtype)
    x, skips = unet.down_blocks(params, cfg, x, emb, context)
    x = unet.mid_block(params, cfg, x, emb, context)

    scale = jnp.asarray(conditioning_scale, dtype)
    down_res = tuple(
        conv2d(zc, s) * scale for zc, s in zip(params["zero_down"], skips)
    )
    mid_res = conv2d(params["zero_mid"], x) * scale
    return down_res, mid_res


# ---------------------------------------------------------------------------
# init (tests / cold start)
# ---------------------------------------------------------------------------


def init_params(
    cfg: UNetConfig,
    rng: Optional[np.random.RandomState] = None,
    dtype=np.float32,
    *,
    cond_channels: Tuple[int, ...] = (16, 32, 96, 256),
    zero_taps: bool = True,
):
    """Random ControlNet matching ``cfg``'s trunk.

    ``zero_taps=True`` zero-initializes the output convs — the ControlNet
    training-start invariant: the taps emit exactly zero, so a fresh
    ControlNet must not change the UNet's output at all (tested).
    """
    rng = rng or np.random.RandomState(0)
    params = unet.init_params(cfg, rng, dtype)
    del params["up"], params["norm_out"], params["conv_out"]

    c0 = cfg.block_out_channels[0]
    blocks = []
    for i in range(len(cond_channels) - 1):
        blocks.append(init_conv(rng, 3, 3, cond_channels[i], cond_channels[i], dtype=dtype))
        blocks.append(init_conv(rng, 3, 3, cond_channels[i], cond_channels[i + 1], dtype=dtype))
    cond_out = init_conv(rng, 3, 3, cond_channels[-1], c0, dtype=dtype)
    if zero_taps:
        cond_out = {k: np.zeros_like(v) for k, v in cond_out.items()}
    params["cond_embedding"] = {
        "conv_in": init_conv(rng, 3, 3, 3, cond_channels[0], dtype=dtype),
        "blocks": blocks,
        "conv_out": cond_out,
    }

    # skip-channel walk mirrors unet.init_params / unet.down_blocks
    skip_chans = [c0]
    for i, cout in enumerate(cfg.block_out_channels):
        skip_chans += [cout] * cfg.layers_per_block
        if i < cfg.num_blocks - 1:
            skip_chans.append(cout)

    def tap(c):
        p = init_conv(rng, 1, 1, c, c, dtype=dtype)
        return {k: np.zeros_like(v) for k, v in p.items()} if zero_taps else p

    params["zero_down"] = [tap(c) for c in skip_chans]
    params["zero_mid"] = tap(cfg.block_out_channels[-1])
    return params
