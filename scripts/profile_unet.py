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
    ap.add_argument("--arch", default="sd15", choices=["sd15", "sdxl"])
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 8 for sd15, 1 for sdxl")
    ap.add_argument("--steps", type=int, default=None,
                    help="default: 4 for sd15, 30 for sdxl")
    ap.add_argument("--size", type=int, default=None,
                    help="default: 512 for sd15, 1024 for sdxl")
    ap.add_argument("--guidance", type=float, default=None,
                    help="default: 1.0 for sd15, 7.5 for sdxl (CFG)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tool", default="hlo_stats")
    ap.add_argument("--logdir", default="/tmp/xprof_trace")
    args = ap.parse_args()
    is_xl = args.arch == "sdxl"
    batch = args.batch if args.batch is not None else (1 if is_xl else 8)
    steps = args.steps if args.steps is not None else (30 if is_xl else 4)
    size = args.size if args.size is not None else (1024 if is_xl else 512)
    guidance = args.guidance if args.guidance is not None else (
        7.5 if is_xl else 1.0)

    import jax

    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle
    from dreamlab_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    print(f"# config: {args.arch} B={batch} {size}x{size} {steps}-step "
          f"guidance={guidance}", file=sys.stderr)

    t0 = time.time()
    pipe = LCMPipeline(random_bundle(args.arch))
    print(f"# init {time.time() - t0:.1f}s", file=sys.stderr)

    gen = lambda seed: pipe.generate(
        "a photo of a cat, highly detailed",
        height=size, width=size,
        num_inference_steps=steps, seed=seed,
        guidance_scale=guidance,
        batch=batch, rng="device",
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
    summarize(parsed, iters=args.iters)


def summarize(parsed, iters=1):
    """Aggregate an hlo_stats gviz table: self-time share by category and
    the top ops — the table docs/PERFORMANCE.md's profile sections print."""
    table = parsed.get("1") if isinstance(parsed, dict) and "1" in parsed else parsed
    if not (isinstance(table, dict) and "rows" in table and "cols" in table):
        print(json.dumps(parsed, indent=1)[:3000])
        return
    labels = [c.get("label", "") for c in table["cols"]]

    def col(*cands):
        for cand in cands:
            for i, lab in enumerate(labels):
                if cand.lower() in lab.lower():
                    return i
        return None

    i_cat = col("category")
    i_name = col("HLO op name", "op name", "name")
    i_self = col("total self time (us)", "self time (us)", "self time")
    i_occ = col("occurrences", "#occurrences")
    if i_cat is None or i_self is None:
        print("unrecognized hlo_stats schema; labels:", labels)
        print(json.dumps(parsed, indent=1)[:3000])
        return
    rows = []
    for r in table["rows"]:
        c = r["c"]
        val = lambda i: (c[i] or {}).get("v") if i is not None and i < len(c) else None
        rows.append({
            "category": val(i_cat) or "?",
            "name": str(val(i_name) or "?"),
            "self_us": float(val(i_self) or 0.0),
            "occ": int(val(i_occ) or 0),
        })
    total = sum(r["self_us"] for r in rows) or 1.0
    by_cat = {}
    for r in rows:
        by_cat[r["category"]] = by_cat.get(r["category"], 0.0) + r["self_us"]
    print(f"\n== self time by category (total {total/1e3/iters:.1f} ms/round"
          f" over {iters} rounds) ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<28} {us/1e3/iters:8.1f} ms  {100*us/total:5.1f}%")
    print("\n== top 25 ops by self time ==")
    for r in sorted(rows, key=lambda r: -r["self_us"])[:25]:
        print(f"  {r['self_us']/1e3/iters:8.2f} ms  {100*r['self_us']/total:5.1f}%"
              f"  x{r['occ']:<5} {r['category']:<22} {r['name'][:90]}")


if __name__ == "__main__":
    main()
