"""A/B the flash-attention data path at the serving hot shape.

hlo_stats (round 4) puts the 5 N=4096/d=40 self-attention sites at 22% of
the serving round and the fold/pad/copy layout ops around them at ~10%.
Variants measured here (chained in-program loops, scalar d2h sync):

  site    — production path: [B,N,H,D] in, fold+pad+kernel+unfold (baseline)
  folded  — kernel fed pre-folded [B*H,N,128] (isolates the fold/pad cost)
  nopad   — kernel variant reading lane dim D=40 directly (no 128 pad):
            3.2x less HBM traffic for q/k/v, Mosaic masked loads
  xla     — XLA materialized-softmax attention at the same shape
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dreamlab_tpu.ops.attention import _xla_attention
from dreamlab_tpu.ops.flash_attention import (
    LANES, _flash_kernel, flash_attention,
)
from dreamlab_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, H, N, D = 8, 8, 4096, 40
ITERS = 30
BQ, BK = 512, 1024
scale = D ** -0.5

rs = np.random.RandomState(0)
q4 = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
k4 = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
v4 = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
qf = jnp.asarray(
    np.pad(np.asarray(q4, np.float32).transpose(0, 2, 1, 3),
           ((0, 0), (0, 0), (0, 0), (0, LANES - D))).reshape(B * H, N, LANES),
    jnp.bfloat16)
kf = jnp.asarray(
    np.pad(np.asarray(k4, np.float32).transpose(0, 2, 1, 3),
           ((0, 0), (0, 0), (0, 0), (0, LANES - D))).reshape(B * H, N, LANES),
    jnp.bfloat16)
vf = jnp.asarray(
    np.pad(np.asarray(v4, np.float32).transpose(0, 2, 1, 3),
           ((0, 0), (0, 0), (0, 0), (0, LANES - D))).reshape(B * H, N, LANES),
    jnp.bfloat16)
qn = jnp.asarray(np.asarray(q4, np.float32).transpose(0, 2, 1, 3)
                 .reshape(B * H, N, D), jnp.bfloat16)
kn = jnp.asarray(np.asarray(k4, np.float32).transpose(0, 2, 1, 3)
                 .reshape(B * H, N, D), jnp.bfloat16)
vn = jnp.asarray(np.asarray(v4, np.float32).transpose(0, 2, 1, 3)
                 .reshape(B * H, N, D), jnp.bfloat16)


def kernel_call(q, k, v, lane):
    nq, nk = N // BQ, N // BK
    # round-5 kernel signature: unpacked (pack=1) at the probe lane width
    kern = functools.partial(
        _flash_kernel, scale=scale, kv_len=None, num_k_blocks=nk, block_k=BK,
        d=lane, pack=1,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B * H, N, lane), q.dtype),
        grid=(B * H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, BQ, lane), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, BK, lane), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, BK, lane), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, lane), lambda ib, iq, ik: (ib, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, BQ, lane), jnp.float32),
            pltpu.VMEM((1, BQ, lane), jnp.float32),
            pltpu.VMEM((1, BQ, lane), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)


def bench(name, fn, *args):
    @jax.jit
    def chained(*xs):
        def body(i, carry):
            out = fn(*([carry] + list(xs[1:])))
            return out.astype(xs[0].dtype)

        return jax.lax.fori_loop(0, ITERS, body, xs[0])

    t0 = time.time()
    out = chained(*args)
    float(jnp.sum(out[0, 0].astype(jnp.float32)))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = chained(*args)
        float(jnp.sum(out[0, 0].astype(jnp.float32)))
        times.append((time.time() - t0) / ITERS * 1e3)
    print(f"{name:8s} {min(times):7.2f} ms  (compile {compile_s:.0f}s, "
          f"reps {[round(t, 2) for t in times]})", flush=True)
    return min(times)


# correctness of the nopad variant first (vs padded kernel), tiny check
ref = np.asarray(kernel_call(qf, kf, vf, LANES)[:, :, :D], np.float32)
got = np.asarray(kernel_call(qn, kn, vn, D), np.float32)
err = np.abs(ref - got).max()
print(f"# nopad vs padded max err: {err}", flush=True)

site = bench("site", lambda q: flash_attention(q, k4, v4, scale=scale), q4)
folded = bench("folded", lambda q: kernel_call(q, kf, vf, LANES), qf)
nopad = bench("nopad", lambda q: kernel_call(q, kn, vn, D), qn)
xla = bench("xla", lambda q: _xla_attention(q, k4, v4, scale), q4)
print(f"# per-step serving impact x5 sites: site {5*site:.1f} ms, "
      f"best-kernel {5*min(folded, nopad):.1f} ms, xla {5*xla:.1f} ms")
