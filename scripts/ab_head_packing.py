"""A/B: can head-packing reclaim the d=40 lane-padding "waste"? (VERDICT r4 #1)

The round-4 profile charged the flash sites with "3.2x MXU padding waste"
(d=40 padded to 128 lanes). This probe tests, with measurements, whether
any packing scheme can reclaim it on a 128x128-systolic MXU:

1. MXU floor micros — time bf16 matmuls with contraction K in {40, 128}
   and output width N in {40, 128} at the attention's M. If t(K=40) ==
   t(K=128) and t(N=40) == t(N=128), the padded time IS the hardware
   floor: every packing rearrangement (block-diagonal K/V, lane-sliced
   dots) keeps M x ceil(K/128) x ceil(N/128) constant, so nothing is
   reclaimable and "68% of padded peak" is 68% of the real ceiling.
2. A real packed-3-heads kernel — 3 heads' (d=40) problems per grid step
   via lane-sliced dots (grid 3x smaller, 3x work per step). Measures
   whether grid-step overhead is worth anything.
3. Production-kernel block sweeps (bq, bk) — the remaining non-MXU
   overhead (softmax VPU work, per-step scratch traffic) is block-size
   sensitive; this is where real headroom would live.

Chained-iteration timing (scalar d2h sync — tunnel gotcha, CLAUDE.md).
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dreamlab_tpu.ops.flash_attention import flash_attention  # noqa: E402
from dreamlab_tpu.ops.attention import _xla_attention  # noqa: E402
from dreamlab_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

NEG_INF = -1e30


def chain(fn, args, iters=20):
    @jax.jit
    def loop(*xs):
        def body(i, x0):
            out = fn(x0, *xs[1:])
            return x0 + 1e-6 * out.astype(x0.dtype)

        return jnp.float32(jnp.sum(jax.lax.fori_loop(0, iters, body, xs[0])))

    float(loop(*args))
    t0 = time.time()
    float(loop(*args))
    return 1e3 * (time.time() - t0) / iters


# ---------------------------------------------------------------------------
# 1. MXU floor micros
# ---------------------------------------------------------------------------

def matmul_floors():
    rs = np.random.RandomState(0)
    M, N = 4096, 4096
    print("== MXU floor micros (bf16, chained, ms) ==")
    for K in (40, 64, 128):
        a = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
        b = jnp.asarray(rs.randn(K, N), jnp.bfloat16)
        ms = chain(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)[:, :a.shape[1]], (a, b))
        print(f"  QK^T-shape [{M},{K}]@[{K},{N}]: {ms:7.3f} ms")
    for Nout in (40, 128):
        a = jnp.asarray(rs.randn(M, 4096), jnp.bfloat16)
        b = jnp.asarray(rs.randn(4096, Nout), jnp.bfloat16)
        ms = chain(lambda a, b: jnp.pad(jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            ((0, 0), (0, 4096 - b.shape[1]))), (a, b))
        print(f"  PV-shape   [{M},4096]@[4096,{Nout}]: {ms:7.3f} ms")


# ---------------------------------------------------------------------------
# 2. packed-3-heads kernel (lane-sliced dots, grid 3x smaller)
# ---------------------------------------------------------------------------

def _packed3_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                    *, scale, num_k_blocks, d):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, 128] — 3 heads in lane groups [0:d), [d:2d), [2d:3d)
    k = k_ref[0]  # [bk, 128]
    v = v_ref[0]
    for j in range(3):
        lo = j * d
        qj = q[:, lo:lo + d]
        kj = k[:, lo:lo + d]
        s = jax.lax.dot_general(
            qj, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]
        m_prev = m_scr[j]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :1])
        l_scr[j] = alpha * l_scr[j] + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[j] = m_new
        # PV against the FULL 128-lane v block: lanes of the other heads
        # accumulate garbage we never read (finalize slices [lo:lo+d]);
        # the MXU cost is one output tile either way
        acc_scr[j] = acc_scr[j] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        parts = [
            (acc_scr[j] / l_scr[j])[:, j * d:(j + 1) * d] for j in range(3)
        ]
        parts.append(jnp.zeros((q.shape[0], 128 - 3 * d), jnp.float32))
        o_ref[0] = jnp.concatenate(parts, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention_packed3(q, k, v, *, scale, block_q=512, block_k=1024):
    """[B, N, H, D] with H % 3 == 0, 3*D <= 128: 3 heads per 128-lane block."""
    b, n, h, d = q.shape
    assert h % 3 == 0 and 3 * d <= 128
    g = b * h // 3

    def pack(x):
        # [B, N, H, D] -> [B, H/3, N, 3D] -> pad lanes to 128
        x = x.transpose(0, 2, 1, 3).reshape(b, h // 3, 3, n, d)
        x = x.transpose(0, 1, 3, 2, 4).reshape(g, n, 3 * d)
        return jnp.pad(x, ((0, 0), (0, 0), (0, 128 - 3 * d)))

    qt, kt, vt = pack(q), pack(k), pack(v)
    nq, nk = n // block_q, n // block_k
    kernel = functools.partial(_packed3_kernel, scale=scale,
                               num_k_blocks=nk, d=d)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, n, 128), q.dtype),
        grid=(g, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, 128), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, 128), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128),
                               lambda ib, iq, ik: (ib, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((3, block_q, 128), jnp.float32),
            pltpu.VMEM((3, block_q, 128), jnp.float32),
            pltpu.VMEM((3, block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qt, kt, vt)
    # unpack [G, N, 128] -> [B, N, H, D]
    out = out[:, :, :3 * d].reshape(b, h // 3, n, 3, d)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, h, n, d)
    return out.transpose(0, 2, 1, 3)


def main():
    enable_compile_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    rs = np.random.RandomState(0)
    # hot SD1.5 shape is B8/N4096/H8/d40; packed3 needs H % 3 == 0, so the
    # variant comparison runs both kernels at H=6 (apples-to-apples)
    b, n, d = 8, 4096, 40
    scale = 1.0 / np.sqrt(d)

    matmul_floors()

    # packed3 needs h % 3 == 0: run both variants at h=6 for apples-to-apples
    h3 = 6
    q = jnp.asarray(rs.randn(b, n, h3, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(b, n, h3, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(b, n, h3, d), jnp.bfloat16)

    # correctness of the packed kernel before timing it
    ref = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), scale=scale)
    got = flash_attention_packed3(q, k, v, scale=scale).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"packed3 max err vs XLA fp32 ref: {err:.4f} (bf16 inputs)")
    assert err < 0.15, "packed3 kernel wrong"

    print(f"== attention variants at B{b} N{n} H{h3} d{d} (ms, chained) ==")
    t = chain(lambda q, k, v: flash_attention(q, k, v, scale=scale), (q, k, v))
    print(f"  production flash (bq512 bk1024): {t:7.3f}")
    t = chain(lambda q, k, v: flash_attention_packed3(q, k, v, scale=scale),
              (q, k, v))
    print(f"  packed3 (3 heads/block, grid/3): {t:7.3f}")
    for bq, bk in ((512, 2048), (1024, 1024), (1024, 2048), (256, 4096)):
        t = chain(lambda q, k, v, bq=bq, bk=bk: flash_attention(
            q, k, v, scale=scale, block_q=bq, block_k=bk), (q, k, v))
        print(f"  flash bq{bq} bk{bk}:              {t:7.3f}")
    t = chain(lambda q, k, v: _xla_attention(q, k, v, scale=scale), (q, k, v))
    print(f"  XLA materialized softmax:        {t:7.3f}")

    # padding-free check: same kernel at d=128 "real" lanes, same folded shape
    q8 = jnp.asarray(rs.randn(b, n, h3, 128), jnp.bfloat16)
    k8 = jnp.asarray(rs.randn(b, n, h3, 128), jnp.bfloat16)
    v8 = jnp.asarray(rs.randn(b, n, h3, 128), jnp.bfloat16)
    t = chain(lambda q, k, v: flash_attention(q, k, v, scale=scale),
              (q8, k8, v8))
    print(f"  production flash at TRUE d=128:  {t:7.3f}  "
          "(== d40 time ⇒ lane padding is free ⇒ nothing to reclaim)")


if __name__ == "__main__":
    main()
