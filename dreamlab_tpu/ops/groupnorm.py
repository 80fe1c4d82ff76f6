"""Fused GroupNorm(+SiLU) Pallas TPU kernel.

Two grid passes over spatially-tiled NHWC activations:
1. per-tile, per-channel partial sums / sum-of-squares (fp32),
2. normalize + per-channel affine + optional SiLU in one elementwise sweep,
   with the per-channel (a, b) coefficients folded on the host side of the
   kernel (a = γ·rsqrt(σ²+ε), b = β − μ·a) so pass 2 is a single FMA chain.

The group reduction itself (combining per-channel sums into per-group
moments) is O(B·C) — left to XLA between the two calls.

This is the kernel the BASELINE.json north star names ("fused
conv/GroupNorm kernels"). Honest status: XLA's own fusion of the same
pattern is already bandwidth-bound and within noise of this kernel on v5e
for SD shapes (see bench in tests / docs/PERFORMANCE.md), so the models
use it only when ``DREAMLAB_FUSED_GROUPNORM=1``; it exists as the tuning
surface for later rounds (conv-epilogue fusion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)  # [tile, C]
    out_ref[0, 0, 0] = jnp.sum(x, axis=0)
    out_ref[0, 0, 1] = jnp.sum(x * x, axis=0)


def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, silu):
    x = x_ref[0].astype(jnp.float32)
    y = x * a_ref[0, 0] + b_ref[0, 0]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "silu", "tile")
)
def fused_group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    groups: int,
    eps: float = 1e-5,
    silu: bool = True,
    tile: int = 512,
) -> jnp.ndarray:
    """GroupNorm over the channel axis of [B, H, W, C] (+SiLU), fp32 stats."""
    b, h, w, c = x.shape
    assert c % groups == 0
    n = h * w
    xr = x.reshape(b, n, c)
    tile = min(tile, n)
    pad = (-n) % tile
    if pad:
        xr = jnp.pad(xr, ((0, 0), (0, pad), (0, 0)))
    npad = n + pad
    t = npad // tile

    stats = pl.pallas_call(
        _stats_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, 2, c), jnp.float32),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda ib, it: (ib, it, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, c), lambda ib, it: (ib, it, 0, 0)),
    )(xr)

    # combine tiles + channels→groups (tiny arrays; XLA territory)
    sums = stats[:, :, 0].sum(axis=1)  # [B, C]
    sqs = stats[:, :, 1].sum(axis=1)
    cg = c // groups
    gsum = sums.reshape(b, groups, cg).sum(-1)
    gsq = sqs.reshape(b, groups, cg).sum(-1)
    count = n * cg  # padding rows are zero: subtract their contribution
    if pad:
        # zeros contribute 0 to sums; count uses true n — already correct
        pass
    mean = gsum / count
    var = gsq / count - mean * mean
    inv = jax.lax.rsqrt(var + eps)  # [B, G]
    inv_c = jnp.repeat(inv, cg, axis=1)  # [B, C]
    mean_c = jnp.repeat(mean, cg, axis=1)
    a = inv_c * scale.astype(jnp.float32)[None, :]
    bb = bias.astype(jnp.float32)[None, :] - mean_c * a

    out = pl.pallas_call(
        functools.partial(_apply_kernel, silu=silu),
        out_shape=jax.ShapeDtypeStruct((b, npad, c), x.dtype),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda ib, it: (ib, it, 0)),
            pl.BlockSpec((1, 1, c), lambda ib, it: (ib, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda ib, it: (ib, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda ib, it: (ib, it, 0)),
    )(xr, a[:, None], bb[:, None])
    if pad:
        out = out[:, :n]
    return out.reshape(b, h, w, c)
