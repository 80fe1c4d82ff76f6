"""On-chip A/B of attention variants at the profile's hot shape.

The round-3 hlo_stats profile showed the 4096-token self-attention sites
consuming 41% of the whole serving program at ~9% effective MXU — this
script measures XLA vs the flash kernel across block sizes to pick the
production config. Chained-iteration methodology (output feeds the next
input) so one device sync amortizes over many invocations.
"""

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_timer(fn, args, iters=30):
    """Time fn by chaining: q <- q + eps*out, preventing DCE + overlap.

    Syncs via a SCALAR d2h (float(...)) — on the tunneled axon backend
    block_until_ready alone does not wait for remote completion."""

    @jax.jit
    def loop(q, k, v):
        def body(i, q):
            out = fn(q, k, v)
            return q + 1e-6 * out

        return jnp.float32(jnp.sum(jax.lax.fori_loop(0, iters, body, q)))

    q, k, v = args
    float(loop(q, k, v))  # compile + settle
    t0 = time.time()
    float(loop(q, k, v))
    return 1e3 * (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", default=None, help="substring filter on shapes")
    args = ap.parse_args()

    from dreamlab_tpu.ops.attention import _xla_attention
    from dreamlab_tpu.ops.flash_attention import flash_attention
    from dreamlab_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    shapes = [
        ("sd15-512px-site0 (B8,N4096,h8,d40)", (8, 4096, 8, 40)),
        ("sd15-512px-site1 (B8,N1024,h8,d80)", (8, 1024, 8, 80)),
        ("sdxl-1024px (B2,N16384,h10,d64)", (2, 16384, 10, 64)),
    ]
    if args.only:
        shapes = [s for s in shapes if args.only in s[0]]
    for name, (b, n, h, d) in shapes:
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(b, n, h, d), jnp.bfloat16)
        k = jnp.asarray(rs.randn(b, n, h, d), jnp.bfloat16)
        v = jnp.asarray(rs.randn(b, n, h, d), jnp.bfloat16)
        scale = d ** -0.5
        flops = 4.0 * b * h * n * n * d  # useful FLOPs (2 matmuls)

        def report(tag, ms):
            print(f"{name:38s} {tag:24s} {ms:8.3f} ms "
                  f"{flops / (ms * 1e-3) / 1e12:6.1f} TFLOP/s(useful)",
                  flush=True)

        try:
            report("xla", chain_timer(
                lambda q, k, v: _xla_attention(q, k, v, scale), (q, k, v),
                args.iters))
        except Exception as e:
            print(f"{name} xla: FAILED {str(e)[:120]}", flush=True)
        for bq, bk in ((512, 128), (512, 512), (512, 1024), (1024, 512),
                       (512, 2048)):
            try:
                ms = chain_timer(
                    lambda q, k, v, bq=bq, bk=bk: flash_attention(
                        q, k, v, scale=scale, block_q=bq, block_k=bk),
                    (q, k, v), args.iters)
                report(f"flash bq={bq} bk={bk}", ms)
            except Exception as e:
                print(f"{name} flash bq={bq} bk={bk}: FAILED {e}",
                      flush=True)


if __name__ == "__main__":
    main()
