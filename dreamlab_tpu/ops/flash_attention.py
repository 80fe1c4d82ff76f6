"""Flash attention Pallas TPU kernel (non-causal, online softmax, head-packed).

Replaces the reference's xformers / attention-slicing memory strategies
(/root/reference/backends/cuda_worker.py:93-100) with an O(N)-memory kernel:
the [N, M] score matrix never leaves VMEM; running max/denominator/accumulator
are carried across key blocks in scratch.

Shape strategy (round 5): PACK head-instances share each lane block,
PACK = the largest divisor of H within floor(128 / d) — e.g. two d=40
heads in lanes [0:40/40:80] (SD1.5 H=8), two d=64 heads in [0:64/64:128]
(SDXL). Heads are lane-adjacent in the projection output, so the pack
fold is the same single transpose the unpacked fold needed. This buys
three measured
wins over the round-4 kernel (scripts/ab_head_packing.py + on-chip
re-check, v5e, chained timing, fold included):

1. Kernel time: d=64 shapes get the full overlap win — the P heads in
   one grid step are INDEPENDENT problems, so head j+1's QK^T runs on
   the MXU while head j's softmax exp runs on the VPU (SDXL N=16384:
   27.0 -> 21.1 ms, N=4096/H20-class: 4.0 -> 2.56 ms). SD1.5's H=8/d=40
   gets pack=2 (largest divisor of 8) and measures kernel-parity
   (5.46 vs 5.26-5.48 ms) — pack=3 is 14% faster per slot but H=8
   forces a dead slot that cancels it (see _pack_geometry).
   (It is NOT an MXU-FLOP win: measured matmul time is identical at
   contraction/output widths 40 vs 128 — lane padding was already free,
   so the old "3.2x padding waste" was never reclaimable as FLOPs.)
2. The q/k/v HBM pads vanish: blocks carry lane width P*d (80 for
   SD1.5) instead of zero-padding every head to 128 — the round-5
   serving profile charged ~5 ms/round to exactly those pad ops.
3. The grid shrinks P-fold, amortizing per-step scratch init/finalize.

All softmax math is fp32; the matmuls run on the MXU with fp32
accumulation. K/V block fetches are double-buffered by the Pallas grid
pipeline automatically (block-specced inputs prefetch one grid step
ahead), so no manual DMA is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # MXU/VPU lane width
NEG_INF = -1e30  # finite mask value: keeps the running max finite on fully
                 # masked key blocks (true -inf would yield exp(nan))


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale, kv_len, num_k_blocks, block_k, d, pack):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, L] — pack heads in lane groups [j*d:(j+1)*d)
    k = k_ref[0]  # [bk, L]
    v = v_ref[0]  # [bk, L]

    col = None
    if kv_len is not None:
        col = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (q.shape[0], k.shape[0]), 1)

    # The pack loop is a static unroll of P INDEPENDENT attention problems:
    # Mosaic overlaps head j+1's QK^T (MXU) with head j's exp/stats (VPU) —
    # the measured ~14% win over one-head-per-block.
    for j in range(pack):
        lo = j * d
        s = jax.lax.dot_general(
            q[:, lo:lo + d], k[:, lo:lo + d],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale  # [bq, bk]
        if col is not None:
            s = jnp.where(col < kv_len, s, NEG_INF)
        # running stats live broadcast across the L lanes; against a wider
        # [bq, bk] score block they enter via their first lane ([:, :1]),
        # which the VPU broadcasts — bk is decoupled from the scratch width
        m_prev = m_scr[j]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)  # [bq, L], equal lanes
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :1])
        l_scr[j] = alpha * l_scr[j] + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[j] = m_new
        # PV against the FULL L-lane value block: the other heads' lane
        # groups accumulate garbage this head never reads (finalize slices
        # its own [lo:lo+d)); output lanes <= 128 cost one MXU tile anyway
        acc_scr[j] = acc_scr[j] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        if pack == 1:
            o_ref[0] = (acc_scr[0] / l_scr[0]).astype(o_ref.dtype)
        else:
            out = jnp.concatenate(
                [(acc_scr[j] / l_scr[j])[:, j * d:(j + 1) * d]
                 for j in range(pack)],
                axis=-1,
            )
            o_ref[0] = out.astype(o_ref.dtype)


def _fit_block(block: int, n: int) -> int:
    """Largest 128-multiple ≤ block that divides n (n is a 128 multiple)."""
    block = min(block, n)
    if n % block != 0:
        block = (block // LANES) * LANES
        while block > LANES and n % block != 0:
            block -= LANES
    return block


def _pack_geometry(h: int, d: int):
    """(pack, lane width L). pack always divides h — no dead head slots.

    Packing is per-batch over the head axis (heads are lane-adjacent in
    [B, N, H, D], so the pack fold costs the same single transpose as the
    unpacked fold; packing across the b*h boundary would need a second
    materialized transpose — measured a net loss). pack is the LARGEST
    divisor of h within the lane budget: dead head slots are never worth
    it — at SD1.5's H=8, pack=3 pads to 9 slots and the 12.5% extra
    kernel work cancels the ~14% overlap win (measured 6.07 ms vs the
    unpacked 5.4 at B8/N4096), while pack=2 keeps the overlap win at
    zero waste AND drops the lane width to 80 (no 40→128 pad traffic at
    all). Lane tiles are 8-wide, so d must be a multiple of 8 to
    lane-slice; otherwise fall back to one 128-padded head per block
    (the round-4 behavior). The unroll is capped at 8 to bound kernel
    code size for tiny test heads; scratch is 3·pack·bq·L·4 B of VMEM,
    which also argues for small pack."""
    if d % 8 == 0 and d <= LANES // 2 and h > 0:
        for cand in range(min(LANES // d, h, 8), 1, -1):
            if h % cand == 0:
                return cand, cand * d
    return 1, d if d % 8 == 0 else LANES


def _tuned_blocks(n: int, L: int, block_q: int, block_k: int):
    """Measured-best block sizes per shape class (r5 packed-kernel sweep
    on v5e, table in docs/PERFORMANCE.md): long-sequence
    narrow-lane shapes (SD1.5 N≥4096, L≤80) prefer bq=1024 (5.51 vs
    5.67 ms); full-lane d=64 shapes (SDXL) prefer bk=2048 (2.63 vs
    2.71 ms); everything else keeps bq=512/bk=1024 (bq1024+bk2048
    together exceeds scoped VMEM). Explicit caller values win."""
    if block_q and block_k:
        return block_q, block_k
    if n >= 4096 and L <= 80:
        return block_q or 1024, block_k or 1024
    if n >= 4096 and L >= 128:
        return block_q or 512, block_k or 2048
    return block_q or 512, block_k or 1024


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(q, k, v, *, scale: float, block_q: int = 0,
                    block_k: int = 0):
    """[B, N, H, D] attention via the packed Pallas flash kernel.

    N must be a multiple of 128; D ≤ 128; M is padded+masked internally.
    Returns [B, N, H, D] in q's dtype. block_q/block_k = 0 picks the
    r5-sweep-tuned defaults for the shape (see _tuned_blocks).
    """
    b, n, h, d = q.shape
    m = k.shape[1]
    assert d <= LANES, f"head dim {d} > {LANES}"

    pack, L = _pack_geometry(h, d)
    block_q, block_k = _tuned_blocks(n, L, block_q, block_k)
    block_q = _fit_block(block_q, n)
    assert n % block_q == 0, f"query length {n} not a multiple of {LANES}"
    d_lane = L // pack  # == d when packing; may be 128 on the fallback

    m_pad = ((m + LANES - 1) // LANES) * LANES
    kv_len = None if m_pad == m else m
    block_k = _fit_block(block_k, m_pad)

    def fold(x, length, pad_rows):
        # [B, len, H, D]: heads are lane-adjacent, so the pack fold is a
        # reshape + ONE transpose — the same layout cost as the unpacked
        # fold — plus a (pack*d → L) lane pad only on the d%8!=0 fallback
        if pad_rows:
            x = jnp.pad(x, ((0, 0), (0, pad_rows), (0, 0), (0, 0)))
        if d_lane != d:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_lane - d)))
        g = h // pack
        x = x.reshape(b, length + pad_rows, g, L)
        return x.transpose(0, 2, 1, 3).reshape(b * g, length + pad_rows, L)

    qt = fold(q, n, 0)
    kt = fold(k, m, m_pad - m)
    vt = fold(v, m, m_pad - m)

    nq = n // block_q
    nk = m_pad // block_k
    g = h // pack

    kernel = functools.partial(
        _flash_kernel, scale=scale, kv_len=kv_len, num_k_blocks=nk,
        block_k=block_k, d=d_lane, pack=pack,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * g, n, L), q.dtype),
        grid=(b * g, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, L), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, L), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, L), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, L), lambda ib, iq, ik: (ib, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((pack, block_q, L), jnp.float32),
            pltpu.VMEM((pack, block_q, L), jnp.float32),
            pltpu.VMEM((pack, block_q, L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qt, kt, vt)

    # unfold: [B*G, N, L] → [B, N, H, D] (one transpose, mirror of fold)
    out = out.reshape(b, g, n, pack, d_lane)
    out = out.transpose(0, 2, 1, 3, 4).reshape(b, n, h, d_lane)
    return out[:, :, :, :d]
