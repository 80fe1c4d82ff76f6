"""Follow-up probes: (a) does copy_to_host_async at dispatch time cut the
image-fetch cost? (b) do grouped h2d transfers amortize the per-op round
trip? Usage: python scripts/latency_probe2.py"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle
    from dreamlab_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    pipe = LCMPipeline(random_bundle("sd15"))
    H = W = 512
    gen = lambda s, **kw: pipe.generate(
        "a photo of a cat, highly detailed", height=H, width=W,
        num_inference_steps=4, seed=s, **kw)
    gen(0)  # warm

    # (a) baseline sequential (blocking np.asarray inside generate)
    ts = []
    for i in range(10):
        t0 = time.time()
        gen(i)
        ts.append(time.time() - t0)
    print(f"generate (current fetch path):      p50 {1e3*med(ts):7.1f} ms")

    # (a') pipelined dispatch + immediate copy_to_host_async + wait
    ts = []
    for i in range(10):
        t0 = time.time()
        r = gen(i, pipelined=True)
        r.images.copy_to_host_async()
        r.wait()
        ts.append(time.time() - t0)
    print(f"dispatch + copy_to_host_async+wait: p50 {1e3*med(ts):7.1f} ms")

    # (b) grouped vs sequential h2d
    arrs = [np.zeros((64, 64, 4), np.float32) for _ in range(6)]
    ts = []
    for _ in range(10):
        t0 = time.time()
        xs = [jnp.asarray(a) for a in arrs]
        jax.block_until_ready(xs)
        float(xs[-1].ravel()[0])
        ts.append(time.time() - t0)
    print(f"h2d 6 sequential asarray:           p50 {1e3*med(ts):7.1f} ms")
    ts = []
    for _ in range(10):
        t0 = time.time()
        xs = jax.device_put(tuple(arrs))
        jax.block_until_ready(xs)
        float(xs[-1].ravel()[0])
        ts.append(time.time() - t0)
    print(f"h2d 1 grouped device_put(tuple):    p50 {1e3*med(ts):7.1f} ms")


if __name__ == "__main__":
    main()
