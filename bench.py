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

    t0 = time.time()
    bundle = random_bundle("sd15")
    pipe = LCMPipeline(bundle)  # bf16, flash attention auto
    print(f"# init+transfer {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    pipe.generate("warmup", height=512, width=512, num_inference_steps=4, seed=0)
    print(f"# compile {time.time() - t0:.1f}s", file=sys.stderr)

    # measured: sequential single-image requests (the serving contract)
    n = 10
    t0 = time.time()
    for i in range(n):
        pipe.generate(
            "a photo of a cat, highly detailed", height=512, width=512,
            num_inference_steps=4, seed=i,
        )
    elapsed = time.time() - t0
    ips = n / elapsed
    print(
        f"# {n} images in {elapsed:.2f}s -> {ips:.2f} img/s "
        f"({1e3 * elapsed / n:.0f} ms/img p50-ish)",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "sd15_512x512_4step_lcm_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
