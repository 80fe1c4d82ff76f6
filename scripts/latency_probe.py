"""Dissect sequential B=1 request latency through the tunnel (VERDICT r2
item 3 — "latency mode"). Phases measured per request:

  prep     host tokenize + RandomState noise
  h2d      staging every program input on device (blocked)
  compute  program run, completion proven by a 3-byte scalar d2h
  fetch    uint8 image d2h (np.asarray)

plus A/Bs: host vs device RNG, full-image fetch vs scalar-only.

Usage: python scripts/latency_probe.py [--iters 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle
    from dreamlab_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    pipe = LCMPipeline(random_bundle("sd15"))
    H = W = args.size

    # ---- warmup / compile both rng buckets
    for rng in ("host", "device"):
        t0 = time.time()
        pipe.generate("warmup", height=H, width=W,
                      num_inference_steps=args.steps, seed=0, rng=rng)
        print(f"# compile rng={rng}: {time.time()-t0:.1f}s", file=sys.stderr)

    # ---- full-path p50 for both rng modes (what bench.py measures)
    for rng in ("host", "device"):
        ts = []
        for i in range(args.iters):
            t0 = time.time()
            pipe.generate("a photo of a cat, highly detailed", height=H,
                          width=W, num_inference_steps=args.steps, seed=i,
                          rng=rng)
            ts.append(time.time() - t0)
        print(f"full generate rng={rng}: p50 {1e3*med(ts):.1f} ms")

    # ---- phase dissection (host rng, the serving default)
    b = pipe.bundle
    sched = pipe._schedule(args.steps, None)
    h_lat, w_lat = H // pipe.vae_scale, W // pipe.vae_scale
    fn = pipe._get_compiled(1, h_lat, w_lat, args.steps, "wcond", "host",
                            task="txt2img", progress="none", ctrl=False)
    from dreamlab_tpu.scheduler.lcm import guidance_scale_embedding

    prep_t, h2d_t, comp_t, fetch_t, sync_t = [], [], [], [], []
    for i in range(args.iters):
        t0 = time.time()
        ids_np = b.tokenizer(["a photo of a cat, highly detailed"])
        lat0_np, noises_np = pipe._sample_noise(
            i, 1, h_lat, w_lat, args.steps, sched.init_noise_sigma)
        w_emb_np = guidance_scale_embedding(
            np.zeros((1,)), b.unet_cfg.time_cond_proj_dim)
        time_ids = pipe._time_ids(H, W, 1, 6.0, cfg_mode="wcond")
        t1 = time.time()
        ids = jnp.asarray(ids_np)
        lat0 = jnp.asarray(lat0_np)
        noises = jnp.asarray(noises_np)
        w_emb = jnp.asarray(w_emb_np)
        jax.block_until_ready((ids, lat0, noises, w_emb))
        # prove h2d completion with a scalar d2h round-trip
        float(noises.ravel()[0])
        t2 = time.time()
        out, den = fn(pipe.text_params, None, pipe.unet_params,
                      pipe.vae_params, ids, ids, ids, ids, lat0, noises,
                      sched, w_emb, jnp.float32(1.0), time_ids)
        int(out[0, 0, 0, 0])  # scalar sync: compute finished, image not fetched
        t3 = time.time()
        img = np.asarray(out)
        t4 = time.time()
        prep_t.append(t1 - t0)
        h2d_t.append(t2 - t1)
        comp_t.append(t3 - t2)
        fetch_t.append(t4 - t3)

    # bare sync cost: scalar d2h of an already-ready array
    for _ in range(args.iters):
        t0 = time.time()
        int(out[0, 0, 0, 0])
        sync_t.append(time.time() - t0)

    for name, ts in [("prep(host)", prep_t), ("h2d(staged+sync)", h2d_t),
                     ("compute(+scalar sync)", comp_t),
                     ("image fetch d2h", fetch_t),
                     ("bare scalar sync", sync_t)]:
        print(f"{name:24s} p50 {1e3*med(ts):7.1f} ms")

    # ---- h2d per-array cost (does each transfer pay a round trip?)
    one = np.zeros((4,), np.float32)
    big = np.zeros((args.steps, 1, h_lat, w_lat, 4), np.float32)
    for name, arr in [("tiny 16B", one), ("noise 256KB", big)]:
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            x = jnp.asarray(arr)
            jax.block_until_ready(x)
            float(x.ravel()[0])
            ts.append(time.time() - t0)
        print(f"h2d {name:12s} p50 {1e3*med(ts):7.1f} ms")


if __name__ == "__main__":
    main()
