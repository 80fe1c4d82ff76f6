"""Headline benchmark: SD1.5 512×512 4-step LCM images/sec on one TPU chip.

Runs the full serving path (tokenize → host noise → jitted encode/denoise/
decode → uint8 back to host) on the real architecture with random weights
(performance is weight-value independent; no checkpoints ship in this
environment).

Baseline: the reference's best published number for the same workload is
2–5 s/image on an RTX 3090 (CUDA backend, /root/reference/README.md:377);
midpoint 3.5 s → 0.286 images/sec. The RK3588 NPU backend's derived number
is ≈35 s/image (README.md:384-388).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

BASELINE_IMAGES_PER_SEC = 1.0 / 3.5  # reference CUDA midpoint


def main():
    import numpy as np

    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle
    from dreamlab_tpu.utils.compile_cache import enable_compile_cache

    # persistent XLA cache: repeat bench runs (and the driver) skip the
    # ~200 s of compiles the r2 run paid every time
    print(f"# compile cache: {enable_compile_cache()}", file=sys.stderr)

    t0 = time.time()
    bundle = random_bundle("sd15")
    pipe = LCMPipeline(bundle)  # bf16, flash attention auto
    print(f"# init+transfer {time.time() - t0:.1f}s", file=sys.stderr)

    prompt = "a photo of a cat, highly detailed"
    t0 = time.time()
    pipe.generate("warmup", height=512, width=512, num_inference_steps=4, seed=0)
    print(f"# compile b=1 {time.time() - t0:.1f}s", file=sys.stderr)

    # p50 latency: sequential single-image requests (the serving contract)
    n = 10
    t0 = time.time()
    for i in range(n):
        pipe.generate(prompt, height=512, width=512, num_inference_steps=4, seed=i)
    lat_ms = 1e3 * (time.time() - t0) / n
    print(f"# sequential latency: {lat_ms:.0f} ms/img "
          f"(target <500 ms)", file=sys.stderr)

    # throughput: batched serving with on-device RNG
    B = 8
    t0 = time.time()
    pipe.generate("warmup", height=512, width=512, num_inference_steps=4,
                  seed=0, batch=B, rng="device")
    print(f"# compile b={B} {time.time() - t0:.1f}s", file=sys.stderr)
    # pipelined: round i+1's dispatch/compute overlaps round i's image d2h
    # (GenerationResult.wait() materializes; latents stay on device unless
    # a caller reads them — the fingerprint path pays that cost, not txt2img)
    rounds = 8
    t0 = time.time()
    pending = None
    for i in range(rounds):
        res = pipe.generate(prompt, height=512, width=512,
                            num_inference_steps=4, seed=i, batch=B,
                            rng="device", pipelined=True)
        if pending is not None:
            pending.wait()
        pending = res
    pending.wait()
    ips = rounds * B / (time.time() - t0)
    print(f"# batched throughput (B={B}, pipelined): {ips:.2f} img/s",
          file=sys.stderr)

    print(json.dumps({
        "metric": "sd15_512x512_4step_lcm_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 2),
        "p50_latency_ms": round(lat_ms),
    }))


if __name__ == "__main__":
    main()
