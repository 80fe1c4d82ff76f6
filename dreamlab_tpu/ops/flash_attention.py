"""Flash attention Pallas TPU kernel (non-causal, online softmax).

Replaces the reference's xformers / attention-slicing memory strategies
(/root/reference/backends/cuda_worker.py:93-100) with an O(N)-memory kernel:
the [N, M] score matrix never leaves VMEM; running max/denominator/accumulator
are carried across key blocks in scratch.

Shape strategy: heads are folded into the grid's batch dimension, the head
dim is zero-padded to 128 lanes (zero key-channels add nothing to q·k;
padded value-channels are sliced off afterwards), and the key sequence is
padded to a 128 multiple with -1e30 logit masking. Padding the head dim is
free on the MXU — its contraction lane width is 128 regardless.

All softmax math is fp32; the two matmuls run on the MXU with fp32
accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # MXU/VPU lane width: head-dim pad target and key-block size
NEG_INF = -1e30  # finite mask value: keeps the running max finite on fully
                 # masked key blocks (true -inf would yield exp(nan))


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale, kv_len, num_k_blocks, block_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, 128]
    k = k_ref[0]  # [bk, 128]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]

    if kv_len is not None:
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    # running stats live broadcast across 128 lanes; against a wider
    # [bq, bk] score block they enter via their first lane ([:, :1]),
    # which the VPU broadcasts — bk is decoupled from the scratch width
    m_prev = m_scr[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)  # [bq, 128], equal lanes
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, :1])
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:] = m_new
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        # l's lanes are all equal; slice to the accumulator width so the
        # kernel also serves narrow-lane (unpadded head dim) variants
        o_ref[0] = (
            acc_scr[:] / l_scr[:, : acc_scr.shape[-1]]
        ).astype(o_ref.dtype)


def _pad_last(x, target):
    pad = target - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def _fit_block(block: int, n: int) -> int:
    """Largest LANES-multiple ≤ block that divides n (n is a LANES multiple)."""
    block = min(block, n)
    if n % block != 0:
        block = (block // LANES) * LANES
        while block > LANES and n % block != 0:
            block -= LANES
    return block


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(q, k, v, *, scale: float, block_q: int = 512,
                    block_k: int = 1024):
    # block_q=512/block_k=1024 measured fastest on v5e at SD shapes
    # (round-3 A/B, docs/PERFORMANCE.md): widening block_k from 128 cut the
    # grid's serial dimension 8x — per-grid-step overhead dominated at 4096
    # tokens (19.7 -> 5.9 ms at B8/N4096/d40, 3.3x) and the old kernel was
    # even slower than XLA's materialized softmax at batch 8.
    """[B, N, H, D] attention via the Pallas flash kernel.

    N must be a multiple of ``block_q``; D ≤ 128; M is padded+masked
    internally. Returns [B, N, H, D] in q's dtype.
    """
    b, n, h, d = q.shape
    m = k.shape[1]
    assert d <= LANES, f"head dim {d} > {LANES}"
    block_q = _fit_block(block_q, n)
    assert n % block_q == 0, f"query length {n} not a multiple of {LANES}"

    m_pad = ((m + LANES - 1) // LANES) * LANES
    kv_len = None if m_pad == m else m
    block_k = _fit_block(block_k, m_pad)

    # fold heads into batch: [B, N, H, D] -> [B*H, N, 128]
    def fold(x, length):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, length, d)
        return _pad_last(x, LANES)

    qt = fold(q, n)
    kt = _pad_last(
        jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))
        .reshape(b * h, m_pad, d),
        LANES,
    )
    vt = _pad_last(
        jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))
        .reshape(b * h, m_pad, d),
        LANES,
    )

    nq = n // block_q
    nk = m_pad // block_k

    kernel = functools.partial(
        _flash_kernel, scale=scale, kv_len=kv_len, num_k_blocks=nk,
        block_k=block_k,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, n, LANES), q.dtype),
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, LANES), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, LANES), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, LANES), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, LANES), lambda ib, iq, ik: (ib, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qt, kt, vt)

    out = out[:, :, :d].reshape(b, h, n, d).transpose(0, 2, 1, 3)
    return out
