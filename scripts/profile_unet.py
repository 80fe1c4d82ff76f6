"""On-chip per-op profile of the serving program (VERDICT r2 item 2).

Captures a jax.profiler trace of the B=8 512x512 4-step LCM program on the
real TPU and converts it to a per-HLO-op table via xprof's converter —
settling the "is 26% MFU the XLA ceiling?" question with measured data
instead of inference.

Usage: python scripts/profile_unet.py [--batch 8] [--tool hlo_stats]
Writes the JSON tool data to /tmp/xprof_out.json and prints a top-op table.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tool", default="hlo_stats")
    ap.add_argument("--logdir", default="/tmp/xprof_trace")
    args = ap.parse_args()

    import jax

    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle
    from dreamlab_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    t0 = time.time()
    pipe = LCMPipeline(random_bundle("sd15"))
    print(f"# init {time.time() - t0:.1f}s", file=sys.stderr)

    gen = lambda seed: pipe.generate(
        "a photo of a cat, highly detailed",
        height=args.size, width=args.size,
        num_inference_steps=args.steps, seed=seed,
        batch=args.batch, rng="device",
    )
    t0 = time.time()
    gen(0)
    print(f"# compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    gen(1)
    print(f"# steady-state round {time.time() - t0:.3f}s", file=sys.stderr)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for i in range(args.iters):
            gen(2 + i)

    planes = sorted(glob.glob(
        os.path.join(args.logdir, "**", "*.xplane.pb"), recursive=True
    ), key=os.path.getmtime)
    if not planes:
        print("no xplane.pb produced", file=sys.stderr)
        sys.exit(1)
    xplane = planes[-1]
    print(f"# xplane: {xplane}", file=sys.stderr)

    from xprof.convert import raw_to_tool_data

    data, ctype = raw_to_tool_data.xspace_to_tool_data([xplane], args.tool, {})
    if isinstance(data, bytes):
        data = data.decode()
    with open("/tmp/xprof_out.json", "w") as f:
        f.write(data)
    print(f"# tool data ({ctype}) -> /tmp/xprof_out.json", file=sys.stderr)

    try:
        parsed = json.loads(data)
    except Exception:
        print(data[:2000])
        return
    print(json.dumps(parsed, indent=1)[:3000])


if __name__ == "__main__":
    main()
