"""Shared functional building blocks (NHWC, params-as-inputs).

Models in this framework are *pure functions* of ``(params, inputs)`` where
``params`` is a nested dict pytree. This is the TPU-idiomatic shape: weights
are arguments to the jitted program, so hot-swapping a mode/LoRA swaps the
pytree without recompiling (north star in /root/repo/BASELINE.json), and
sharding annotations apply directly to the tree.

Layout conventions (TPU-native, mirroring the reference's NHWC boundary at
the NPU runtime — /root/reference/backends/rknnlcm.py:148-155):
- activations: NHWC
- conv kernels: HWIO
- linear kernels: [in, out]

Initializers exist for tests and cold-start; production weights come from
``dreamlab_tpu.loader``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(params, x, *, stride: int = 1, padding="SAME"):
    """NHWC conv. params: {'w': [kh,kw,in,out], 'b': [out] (optional)}.

    "SAME" is translated to torch-convention symmetric padding
    (kh//2, kw//2 each side): identical to XLA SAME at stride 1 for odd
    kernels, but at stride 2 XLA's SAME pads (0, 1) while torch/diffusers
    checkpoints were trained with (1, 1) — the asymmetry shifts every
    downsample output and breaks checkpoint fidelity.
    """
    w = params["w"]
    if padding == "SAME":
        kh, kw = w.shape[0], w.shape[1]
        padding = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out


def linear(params, x):
    """params: {'w': [in,out], 'b': [out] (optional)}."""
    out = jnp.dot(x, params["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out


def group_norm(params, x, *, groups: int = 32, eps: float = 1e-5):
    """GroupNorm over the channel axis of NHWC (or [..., C]) in fp32.

    Statistics in fp32 regardless of activation dtype — group variance in
    bf16 destroys the 1e-2 fidelity budget.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = xf.shape[-1]
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    shape = xf.shape[:-1] + (groups, c // groups)
    xg = xf.reshape(shape)
    # reduce over all spatial dims + the intra-group channel dim
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xf = xg.reshape(xf.shape)
    xf = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return xf.astype(orig_dtype)


def layer_norm(params, x, *, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return xf.astype(orig_dtype)


def silu(x):
    return jax.nn.silu(x)


def group_norm_silu(params, x, *, groups: int = 32, eps: float = 1e-5):
    """GroupNorm → SiLU, the UNet/VAE resnet prologue.

    With ``DREAMLAB_FUSED_GROUPNORM=1`` on TPU this dispatches to the Pallas
    fused kernel (ops/groupnorm.py); measured at parity with XLA's fusion on
    v5e, kept as the tuning surface for conv-epilogue fusion.
    """
    import os

    if (
        os.environ.get("DREAMLAB_FUSED_GROUPNORM") == "1"
        and x.ndim == 4
        and jax.default_backend() == "tpu"
    ):
        from ..ops.groupnorm import fused_group_norm_silu

        return fused_group_norm_silu(
            x, params["scale"], params["bias"], groups=groups, eps=eps
        )
    return silu(group_norm(params, x, groups=groups, eps=eps))


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def geglu(params, x):
    """Gated GELU used inside the UNet transformer FFN: proj to 2*d, gate."""
    h = linear(params, x)
    a, g = jnp.split(h, 2, axis=-1)
    return a * gelu(g)


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    *,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jnp.ndarray:
    """Sinusoidal diffusion timestep embedding, [B] -> [B, dim] (fp32).

    Convention matches the SD UNet time_proj (flip_sin_to_cos=True, shift=0).
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    angles = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(angles), jnp.cos(angles)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """Pixel shuffle on NHWC: [B,H,W,C·r²] -> [B,H·r,W·r,C] (CRD order,
    matching torch.nn.PixelShuffle semantics for channel grouping)."""
    b, h, w, c = x.shape
    r = block
    assert c % (r * r) == 0
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, co)


def nearest_upsample(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour upsample on NHWC via broadcast (no gather)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def avg_pool2d(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """Average pool on NHWC (VALID)."""
    out = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return (out / (window * window)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Initializers (tests / cold start)
# ---------------------------------------------------------------------------


def init_conv(rng: np.random.RandomState, kh, kw, cin, cout, *, bias=True, dtype=np.float32):
    fan_in = kh * kw * cin
    std = 1.0 / math.sqrt(fan_in)
    p = {"w": np.asarray(rng.uniform(-std, std, (kh, kw, cin, cout)), dtype)}
    if bias:
        p["b"] = np.asarray(rng.uniform(-std, std, (cout,)), dtype)
    return p


def init_linear(rng: np.random.RandomState, cin, cout, *, bias=True, dtype=np.float32):
    std = 1.0 / math.sqrt(cin)
    p = {"w": np.asarray(rng.uniform(-std, std, (cin, cout)), dtype)}
    if bias:
        p["b"] = np.asarray(rng.uniform(-std, std, (cout,)), dtype)
    return p


def init_norm(c, *, dtype=np.float32):
    return {"scale": np.ones((c,), dtype), "bias": np.zeros((c,), dtype)}


def init_embedding(rng: np.random.RandomState, n, d, *, dtype=np.float32):
    return {"w": np.asarray(rng.normal(0, 0.02, (n, d)), dtype)}


def cast_tree(tree, dtype):
    """Cast all floating leaves of a param tree to ``dtype`` (e.g. bf16)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def tree_bytes(tree) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "size")
    )
