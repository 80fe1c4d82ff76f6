"""A/B: packed vs unpacked attention projections, UNet step on the real TPU.

Amortized in-program timing: the step is chained (output feeds the next
sample input) inside lax.fori_loop so one dispatch covers ITERS steps; a
scalar d2h syncs (through the axon tunnel block_until_ready returns early).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from dreamlab_tpu.models import configs, unet
from dreamlab_tpu.models.layers import cast_tree
from dreamlab_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, H, W = 8, 64, 64
ITERS = 20
cfg = configs.SD15_UNET

rs = np.random.RandomState(0)
raw = unet.init_params(cfg, rs)

sample = jnp.asarray(rs.randn(B, H, W, 4), jnp.float32)
t = jnp.full((B,), 500, jnp.int32)
ctx = jnp.asarray(rs.randn(B, 77, cfg.cross_attention_dim), jnp.float32)
w_emb = jnp.asarray(rs.randn(B, cfg.time_cond_proj_dim), jnp.float32)


def bench(params, label):
    params = jax.device_put(cast_tree(params, jnp.bfloat16), jax.devices()[0])

    @jax.jit
    def chained(p, s):
        def body(_, carry):
            out = unet.forward(p, cfg, carry, t, ctx, timestep_cond=w_emb)
            return out.astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, s)

    t0 = time.time()
    out = chained(params, sample)
    float(jnp.sum(out[0, 0, 0]))
    print(f"{label}: compile+first {time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = chained(params, sample)
        float(jnp.sum(out[0, 0, 0]))
        times.append((time.time() - t0) / ITERS * 1e3)
    ms = min(times)
    print(f"{label}: {ms:.1f} ms/step (B={B})  reps={[round(x,1) for x in times]}",
          flush=True)
    return ms


a = bench(raw, "unpacked")
b = bench(unet.pack_attention_params(raw), "packed  ")
print(f"speedup: {a / b:.3f}x")
