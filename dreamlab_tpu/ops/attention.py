"""Attention dispatch: Pallas flash kernel on TPU, fused XLA fallback elsewhere.

The UNet's "long sequence" is *spatial*: self-attention over H/8·W/8 tokens
(4096 at 512², 16384 at SDXL 1024²) — this is where the reference needed
xformers / attention slicing (/root/reference/backends/cuda_worker.py:93-100).
On TPU a flash-style Pallas kernel gives O(N) memory and keeps the MXU fed;
the XLA fallback materialises the [N, M] score matrix, which is fine on CPU
tests and small shapes.

Interface: [B, N, H, D] tensors with separate head axis; softmax in fp32.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


# Trace-time counters: dispatch runs in Python while a program is being
# traced (even when the persistent compile cache skips XLA), so these count
# how many attention sites each path bound into compiled programs. bench.py
# asserts flash is live on TPU via FLASH_TRACE_COUNT.
FLASH_TRACE_COUNT = 0
XLA_TRACE_COUNT = 0


def _xla_attention(q, k, v, scale):
    # [B, N, H, D] → scores [B, H, N, M] in fp32 for the softmax
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _flash_supported(q, k) -> bool:
    if jax.default_backend() != "tpu":
        return False
    n, m, d = q.shape[1], k.shape[1], q.shape[3]
    # kernel tiles: sequence multiples of 128 (queries) / 128 (keys), head
    # dim padded to 128 inside the kernel — restrict to the profitable range
    return n >= 256 and n % 128 == 0 and m % 128 == 0 and d <= 128


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention, [B, N, H, D] x [B, M, H, D] -> [B, N, H, D].

    impl: "auto" (flash on TPU when shapes qualify), "flash", or "xla".
    """
    global FLASH_TRACE_COUNT, XLA_TRACE_COUNT
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl != "xla" and (
        impl == "flash" or (impl == "auto" and _flash_supported(q, k))
    ):
        from .flash_attention import flash_attention

        FLASH_TRACE_COUNT += 1
        return flash_attention(q, k, v, scale=scale)
    XLA_TRACE_COUNT += 1
    return _xla_attention(q, k, v, scale)
