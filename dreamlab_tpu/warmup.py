"""Deploy-time compile warmer.

Pre-populates the persistent XLA compile cache for a checkpoint's serving
buckets so mode switches and restarts never compile on the request path
(SURVEY.md §7.3 recompilation management):

    python -m dreamlab_tpu.warmup -i /models/LCM-Dreamshaper-V7 \
        --sizes 512x512 768x768 --steps 4 --batches 1 4 8
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="pre-compile serving buckets")
    p.add_argument("-i", "--model-dir")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--sizes", nargs="+", default=["512x512"])
    p.add_argument("--steps", nargs="+", type=int, default=[4])
    p.add_argument("--batches", nargs="+", type=int, default=[1])
    p.add_argument("--rng", choices=["host", "device"], default="host")
    args = p.parse_args(argv)
    if not args.model_dir and not args.random_weights:
        p.error("either -i/--model-dir or --random-weights is required")

    from .utils.compile_cache import enable_compile_cache

    cache = enable_compile_cache()
    print(f"compile cache: {cache}")

    from .engine.base import parse_size
    from .pipeline import LCMPipeline

    if args.random_weights:
        from .testing import random_bundle

        bundle = random_bundle("sd15")
    else:
        from .loader import load_pipeline

        bundle = load_pipeline(args.model_dir)
    pipe = LCMPipeline(bundle)

    for size in args.sizes:
        w, h = parse_size(size)
        for steps in args.steps:
            for batch in args.batches:
                t0 = time.time()
                pipe.generate(
                    "warmup", height=h, width=w, num_inference_steps=steps,
                    seed=0, batch=batch, rng=args.rng,
                )
                print(f"  {size} steps={steps} batch={batch}: "
                      f"{time.time() - t0:.1f}s")
    print("done")


if __name__ == "__main__":
    main()
