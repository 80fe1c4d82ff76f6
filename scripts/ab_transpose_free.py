"""A/B: transpose-free flash attention via 4D BlockSpec (round 5).

The serving profile charges ~2 ms/round to the fold/unfold transposes
around the flash sites (bf16[8,4096,8,40] layout copies). The packed
kernel's fold is a reshape + ONE transpose; this probe asks whether the
transpose can go entirely: keep q/k/v in their native [B, N, G, L] token-
major layout (a pure reshape of the projection output) and let the
BlockSpec index map decompose the grid's ib into (batch, group), fetching
[1, bq, 1, L] blocks whose rows are strided by G*L in memory.

Risk being measured: strided row DMA (240 B bursts at SD1.5's L=120)
vs the folded layout's contiguous [bq, L] tiles. The grid pipeline
prefetches blocks one step ahead either way; if the strided fetch stays
under the per-step compute time, it is free and the copies are pure win.

RESULT (round 5, v5e): **structurally impossible** — Mosaic requires a
block's last two dims to be (8-divisible, 128-divisible) or equal to the
array's; a (1, bq, 1, L) block over [B, N, G, L] puts G (=2..3) in the
sublane slot and fails lowering ("block shape (1, 512, 1, 120), array
(8, 4096, 2, 120)"). The [_, N, L] layout — and therefore the ONE fold
transpose — is forced by the hardware tiling. The ~2 ms/round of fold
copies in the serving profile are the floor for this op on this
toolchain; kept for the record.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from dreamlab_tpu.ops.flash_attention import (  # noqa: E402
    _flash_kernel, _pack_geometry, flash_attention,
)
from dreamlab_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention_4d(q, k, v, *, scale, block_q=512, block_k=1024):
    """[B, N, H, D] → packed [B, N, G, L] by pure reshape; no transpose."""
    b, n, h, d = q.shape
    m = k.shape[1]
    pack, L = _pack_geometry(h, d)
    assert m == n, "probe: no kv pad"
    g = h // pack

    def re(x):
        return x.reshape(b, n, g, L)

    qt, kt, vt = re(q), re(k), re(v)
    nq, nk = n // block_q, n // block_k
    kernel = functools.partial(
        _flash_kernel, scale=scale, kv_len=None, num_k_blocks=nk,
        block_k=block_k, d=d, pack=pack,
    )

    def kernel3(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        # adapt [1, bq, 1, L] refs to the production kernel's [1, bq, L]
        class View:
            def __init__(self, ref):
                self.ref = ref

            @property
            def dtype(self):
                return self.ref.dtype

            def __getitem__(self, idx):
                assert idx == 0
                return self.ref[0, :, 0, :]

            def __setitem__(self, idx, val):
                assert idx == 0
                self.ref[0, :, 0, :] = val

        kernel(View(q_ref), View(k_ref), View(v_ref), View(o_ref),
               m_scr, l_scr, acc_scr)

    out = pl.pallas_call(
        kernel3,
        out_shape=jax.ShapeDtypeStruct((b, n, g, L), q.dtype),
        grid=(b * g, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, 1, L),
                         lambda ib, iq, ik: (ib // g, iq, ib % g, 0)),
            pl.BlockSpec((1, block_k, 1, L),
                         lambda ib, iq, ik: (ib // g, ik, ib % g, 0)),
            pl.BlockSpec((1, block_k, 1, L),
                         lambda ib, iq, ik: (ib // g, ik, ib % g, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 1, L),
                               lambda ib, iq, ik: (ib // g, iq, ib % g, 0)),
        scratch_shapes=[
            pltpu.VMEM((pack, block_q, L), jnp.float32),
            pltpu.VMEM((pack, block_q, L), jnp.float32),
            pltpu.VMEM((pack, block_q, L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qt, kt, vt)
    return out.reshape(b, n, h, d)


def chain(fn, args, iters=20):
    @jax.jit
    def loop(*xs):
        def body(i, x0):
            return x0 + 1e-6 * fn(x0, *xs[1:]).astype(x0.dtype)

        return jnp.float32(jnp.sum(jax.lax.fori_loop(0, iters, body, xs[0])))

    float(loop(*args))
    t0 = time.time()
    float(loop(*args))
    return 1e3 * (time.time() - t0) / iters


def main():
    enable_compile_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    rs = np.random.RandomState(0)
    from dreamlab_tpu.ops.attention import _xla_attention

    for b, n, h, d, tag in [(8, 4096, 6, 40, "sd15ish-H6"),
                            (2, 4096, 10, 64, "sdxl-4k")]:
        q = jnp.asarray(rs.randn(b, n, h, d), jnp.bfloat16)
        k = jnp.asarray(rs.randn(b, n, h, d), jnp.bfloat16)
        v = jnp.asarray(rs.randn(b, n, h, d), jnp.bfloat16)
        s = d ** -0.5
        ref = np.asarray(_xla_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), s))
        got = np.asarray(flash_attention_4d(q, k, v, scale=s)).astype(
            np.float32)
        err = np.abs(got - ref).max()
        print(f"{tag}: 4d maxerr={err:.4f}")
        assert err < 0.2
        t4 = chain(lambda q, k, v: flash_attention_4d(q, k, v, scale=s),
                   (q, k, v))
        tp = chain(lambda q, k, v: flash_attention(q, k, v, scale=s),
                   (q, k, v))
        print(f"{tag}: production(fold+transpose) {tp:.3f} ms | "
              f"4d transpose-free {t4:.3f} ms")


if __name__ == "__main__":
    main()
