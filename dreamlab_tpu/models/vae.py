"""VAE decoder/encoder (AutoencoderKL), NHWC, pure functional.

The reference's VAE decode is its worst bottleneck on the NPU (11–14 s at
512², /root/reference/README.md:388-390) and runs per-image in a Python loop
(rknnlcm.py:614-618). Here decode is one fused XLA program over the whole
batch; at SDXL resolutions the pipeline can call ``decode`` over spatial
chunks (the XLA-friendly analogue of diffusers' VAE tiling,
cuda_worker.py:91,391).

The mid-block attention runs over H/8·W/8 tokens single-headed at full
channel width — it dispatches through the same attention op as the UNet.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from .configs import VAEConfig
from .layers import (
    conv2d,
    group_norm,
    group_norm_silu,
    init_conv,
    init_norm,
    linear,
    nearest_upsample,
    silu,
)


def _resnet(p, x, *, groups):
    h = conv2d(p["conv1"], group_norm_silu(p["norm1"], x, groups=groups))
    h = conv2d(p["conv2"], group_norm_silu(p["norm2"], h, groups=groups))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x)
    return x + h


def _mid_attention(p, x, *, groups, impl="auto"):
    b, h, w, c = x.shape
    res = x
    x = group_norm(p["norm"], x, groups=groups, eps=1e-6).reshape(b, h * w, c)
    q = linear(p["q"], x)[:, :, None, :]  # single head: [B, N, 1, C]
    k = linear(p["k"], x)[:, :, None, :]
    v = linear(p["v"], x)[:, :, None, :]
    # single-head d=512 exceeds the flash kernel's 128 lanes; only the
    # forced-xla debugging override is meaningful here
    out = dot_product_attention(q, k, v, impl="xla" if impl == "xla" else "auto")[:, :, 0, :]
    out = linear(p["out"], out).reshape(b, h, w, c)
    return out + res


def _mid_block(p, x, cfg: VAEConfig):
    x = _resnet(p["resnet1"], x, groups=cfg.norm_groups)
    if "attention" in p:
        x = _mid_attention(p["attention"], x, groups=cfg.norm_groups, impl=cfg.attention_impl)
    return _resnet(p["resnet2"], x, groups=cfg.norm_groups)


def decode(params, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """[B, h, w, 4] latents (already divided by scaling_factor) → [B, 8h, 8w, 3]
    images in [-1, 1]."""
    dtype = params["conv_in"]["w"].dtype
    x = latents.astype(dtype)
    if "post_quant_conv" in params:
        x = conv2d(params["post_quant_conv"], x)
    x = conv2d(params["conv_in"], x)
    x = _mid_block(params["mid"], x, cfg)
    for block in params["up"]:
        for res in block["resnets"]:
            x = _resnet(res, x, groups=cfg.norm_groups)
        if "upsample" in block:
            x = conv2d(block["upsample"], nearest_upsample(x))
    x = group_norm_silu(params["norm_out"], x, groups=cfg.norm_groups)
    x = conv2d(params["conv_out"], x)
    return x.astype(jnp.float32)


def _tile_starts(extent: int, tile: int, stride: int):
    """Static tile origins covering [0, extent): stride apart, last clamped
    so every tile has the SAME shape (XLA: one decode graph per tile)."""
    starts = list(range(0, max(extent - tile, 0) + 1, stride))
    if starts[-1] + tile < extent:
        starts.append(extent - tile)
    return starts


def _feather(n_px: int, ramp_px: int, lo_edge: bool, hi_edge: bool):
    """1-D blend weights: linear ramps over the overlap at interior edges,
    flat 1 at image borders. Computed at trace time (numpy)."""
    w = np.ones((n_px,), np.float32)
    if ramp_px > 0:
        ramp = (np.arange(1, ramp_px + 1, dtype=np.float32)) / (ramp_px + 1)
        if not lo_edge:
            w[:ramp_px] = ramp
        if not hi_edge:
            w[-ramp_px:] = ramp[::-1]
    return w


def decode_tiled(
    params, cfg: VAEConfig, latents: jnp.ndarray,
    *, tile: int = 64, overlap: int = 16,
) -> jnp.ndarray:
    """Spatially-chunked decode: the XLA-friendly analogue of diffusers'
    VAE tiling (/root/reference/backends/cuda_worker.py:91,391 enables
    vae.enable_tiling for exactly this HBM-bound case).

    Latents split into ``tile``×``tile`` chunks with ``overlap`` latent px
    of shared context; each chunk decodes through the full decoder and the
    outputs feather-blend (linear ramps over the overlap) into the final
    image. All tiles share one shape, so XLA compiles the decoder ONCE and
    peak activation memory scales with the tile, not the image — SDXL 1024²
    batch decode stops being the HBM high-water mark.

    Seam error is bounded by the decoder's receptive field vs ``overlap``
    (same approximation diffusers tiling makes); tests pin uint8 parity.

    The tile loop is a ``lax.scan`` over (position, blend-mask) pairs, so
    XLA compiles the decoder body ONCE regardless of tile count — a Python
    loop would inline T decoder copies and multiply compile time by T.
    """
    b, h, w, c_lat = latents.shape
    if h <= tile and w <= tile:
        return decode(params, cfg, latents)
    stride = tile - overlap
    assert stride > 0, (tile, overlap)
    s = cfg.scale_factor
    ys = _tile_starts(h, tile, stride)
    xs = _tile_starts(w, tile, stride)
    pos, masks = [], []
    for y0 in ys:
        wy = _feather(tile * s, overlap * s, y0 == 0, y0 + tile == h)
        for x0 in xs:
            wx = _feather(tile * s, overlap * s, x0 == 0, x0 + tile == w)
            pos.append((y0 * s, x0 * s, y0, x0))
            masks.append((wy[:, None] * wx[None, :])[:, :, None])
    pos = jnp.asarray(np.asarray(pos, np.int32))        # [T, 4]
    masks = jnp.asarray(np.stack(masks))                # [T, ts, ts, 1]

    def body(carry, inp):
        out, wsum = carry
        p, wmask = inp
        z = jax.lax.dynamic_slice(
            latents, (0, p[2], p[3], 0), (b, tile, tile, c_lat)
        )
        img = decode(params, cfg, z) * wmask
        cur = jax.lax.dynamic_slice(
            out, (0, p[0], p[1], 0), (b, tile * s, tile * s, 3)
        )
        out = jax.lax.dynamic_update_slice(out, cur + img, (0, p[0], p[1], 0))
        curw = jax.lax.dynamic_slice(
            wsum, (0, p[0], p[1], 0), (1, tile * s, tile * s, 1)
        )
        wsum = jax.lax.dynamic_update_slice(
            wsum, curw + wmask[None], (0, p[0], p[1], 0)
        )
        return (out, wsum), None

    out = jnp.zeros((b, h * s, w * s, 3), jnp.float32)
    wsum = jnp.zeros((1, h * s, w * s, 1), jnp.float32)
    (out, wsum), _ = jax.lax.scan(body, (out, wsum), (pos, masks))
    return out / wsum


def encode_moments(params, cfg: VAEConfig, images: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] in [-1, 1] → [B, H/8, W/8, 8] (mean ‖ logvar), *before*
    scaling_factor. Sample mean + exp(logvar/2)·noise and multiply by
    scaling_factor for img2img."""
    dtype = params["conv_in"]["w"].dtype
    x = images.astype(dtype)
    x = conv2d(params["conv_in"], x)
    for block in params["down"]:
        for res in block["resnets"]:
            x = _resnet(res, x, groups=cfg.norm_groups)
        if "downsample" in block:
            # diffusers pads (0,1,0,1) before the stride-2 VALID conv
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(block["downsample"], x, stride=2, padding="VALID")
    x = _mid_block(params["mid"], x, cfg)
    x = silu(group_norm(params["norm_out"], x, groups=cfg.norm_groups))
    x = conv2d(params["conv_out"], x)
    if "quant_conv" in params:
        x = conv2d(params["quant_conv"], x)
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_resnet(rng, cin, cout, groups, dtype):
    p = {
        "norm1": init_norm(cin, dtype=dtype),
        "conv1": init_conv(rng, 3, 3, cin, cout, dtype=dtype),
        "norm2": init_norm(cout, dtype=dtype),
        "conv2": init_conv(rng, 3, 3, cout, cout, dtype=dtype),
    }
    if cin != cout:
        p["shortcut"] = init_conv(rng, 1, 1, cin, cout, dtype=dtype)
    return p


def _init_mid(rng, c, cfg, dtype):
    from .layers import init_linear

    mid = {
        "resnet1": _init_resnet(rng, c, c, cfg.norm_groups, dtype),
        "resnet2": _init_resnet(rng, c, c, cfg.norm_groups, dtype),
    }
    if cfg.mid_attention:
        mid["attention"] = {
            "norm": init_norm(c, dtype=dtype),
            "q": init_linear(rng, c, c, dtype=dtype),
            "k": init_linear(rng, c, c, dtype=dtype),
            "v": init_linear(rng, c, c, dtype=dtype),
            "out": init_linear(rng, c, c, dtype=dtype),
        }
    return mid


def init_decoder_params(cfg: VAEConfig, rng: Optional[np.random.RandomState] = None, dtype=np.float32):
    rng = rng or np.random.RandomState(0)
    rev = list(reversed(cfg.block_out_channels))
    c0 = rev[0]
    params = {
        "post_quant_conv": init_conv(rng, 1, 1, cfg.latent_channels, cfg.latent_channels, dtype=dtype),
        "conv_in": init_conv(rng, 3, 3, cfg.latent_channels, c0, dtype=dtype),
        "mid": _init_mid(rng, c0, cfg, dtype),
    }
    up = []
    cur = c0
    for k, cout in enumerate(rev):
        block = {
            "resnets": [
                _init_resnet(rng, cur if j == 0 else cout, cout, cfg.norm_groups, dtype)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        cur = cout
        if k < len(rev) - 1:
            block["upsample"] = init_conv(rng, 3, 3, cout, cout, dtype=dtype)
        up.append(block)
    params["up"] = up
    params["norm_out"] = init_norm(rev[-1], dtype=dtype)
    params["conv_out"] = init_conv(rng, 3, 3, rev[-1], cfg.out_channels, dtype=dtype)
    return params


def init_encoder_params(cfg: VAEConfig, rng: Optional[np.random.RandomState] = None, dtype=np.float32):
    rng = rng or np.random.RandomState(0)
    chans = cfg.block_out_channels
    params = {
        "conv_in": init_conv(rng, 3, 3, cfg.out_channels, chans[0], dtype=dtype),
    }
    down = []
    cur = chans[0]
    for i, cout in enumerate(chans):
        block = {
            "resnets": [
                _init_resnet(rng, cur if j == 0 else cout, cout, cfg.norm_groups, dtype)
                for j in range(cfg.layers_per_block)
            ]
        }
        cur = cout
        if i < len(chans) - 1:
            block["downsample"] = init_conv(rng, 3, 3, cout, cout, dtype=dtype)
        down.append(block)
    params["down"] = down
    params["mid"] = _init_mid(rng, chans[-1], cfg, dtype)
    params["norm_out"] = init_norm(chans[-1], dtype=dtype)
    params["conv_out"] = init_conv(rng, 3, 3, chans[-1], 2 * cfg.latent_channels, dtype=dtype)
    params["quant_conv"] = init_conv(
        rng, 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels, dtype=dtype
    )
    return params
