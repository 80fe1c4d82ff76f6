"""Sub-pixel CNN super-resolution model (ESPCN), NHWC, pure functional.

TPU-native rebuild of the reference's second inference program: the
"super-resolution-10" ONNX-zoo model it compiles to RKNN and runs tile-wise
over the Y channel (224² tiles → 672², /root/reference/server/
lcm_sr_server.py:339-405). Here:

- the network itself is four convs + depth-to-space, jitted once per tile
  grid shape;
- the reference's sequential Python tile loop becomes a *batched* conv over
  all tiles at once (tiles stack on the batch axis — MXU-friendly);
- Cb/Cr bicubic upscale and YCbCr conversion stay on host (PIL), matching
  the reference's output contract.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .configs import SuperResConfig
from .layers import conv2d, depth_to_space, init_conv


def forward(params, cfg: SuperResConfig, y: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 1] luma in [0, 1] → [B, H·r, W·r, 1]."""
    x = y.astype(params["conv1"]["w"].dtype)
    x = jax.nn.relu(conv2d(params["conv1"], x))
    x = jax.nn.relu(conv2d(params["conv2"], x))
    x = jax.nn.relu(conv2d(params["conv3"], x))
    x = conv2d(params["conv4"], x)
    return depth_to_space(x, cfg.upscale).astype(jnp.float32)


def init_params(cfg: SuperResConfig, rng: Optional[np.random.RandomState] = None, dtype=np.float32):
    rng = rng or np.random.RandomState(0)
    c1, c2, c3 = cfg.channels
    k1, k2, k3, k4 = cfg.kernel_sizes
    return {
        "conv1": init_conv(rng, k1, k1, 1, c1, dtype=dtype),
        "conv2": init_conv(rng, k2, k2, c1, c2, dtype=dtype),
        "conv3": init_conv(rng, k3, k3, c2, c3, dtype=dtype),
        "conv4": init_conv(rng, k4, k4, c3, cfg.upscale**2, dtype=dtype),
    }


def tile_plan(h: int, w: int, tile: int) -> Tuple[int, int, int, int]:
    """Padded dims + tile counts for an H×W image cut into `tile`² tiles."""
    th = (h + tile - 1) // tile
    tw = (w + tile - 1) // tile
    return th * tile, tw * tile, th, tw


def upscale_luma(params, cfg: SuperResConfig, y: np.ndarray) -> np.ndarray:
    """Tile, batch, run, and reassemble a full-size [H, W] float luma plane.

    Replaces the reference's per-tile Python loop
    (lcm_sr_server.py:370-379) with one batched call over all tiles.
    """
    h, w = y.shape
    t = cfg.tile
    ph, pw, th, tw = tile_plan(h, w, t)
    ypad = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
    # [th, tw, t, t] -> [th*tw, t, t, 1]
    tiles = ypad.reshape(th, t, tw, t).transpose(0, 2, 1, 3).reshape(-1, t, t, 1)
    out = np.asarray(forward(params, cfg, jnp.asarray(tiles, jnp.float32)))
    r = cfg.upscale
    out = out.reshape(th, tw, t * r, t * r).transpose(0, 2, 1, 3).reshape(ph * r, pw * r)
    return np.clip(out[: h * r, : w * r], 0.0, 1.0)
