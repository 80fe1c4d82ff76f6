"""Headline benchmark: SD1.5 512×512 4-step LCM images/sec on one TPU chip,
plus an SDXL 1024² section (time-budget gated).

Runs the full serving path (tokenize → host staging → jitted encode/denoise/
decode → uint8 back to host) on the real architecture with random weights
(performance is weight-value independent; no checkpoints ship in this
environment).

Variance controls (round 4 — the r3 driver number regressed 14.2 → 10.95
while builder-side runs measured 18.2, and nothing in the old single-pass
bench could say why):

- every throughput/latency figure is the MEDIAN of ≥3 repetitions, with the
  per-rep values in the JSON;
- a COMPUTE-ONLY throughput (all rounds queued, one sync, no per-round image
  d2h) is reported next to end-to-end — when the tunnel's d2h bandwidth
  degrades, e2e falls but compute-only holds, which localises the gap;
- tunnel weather is measured directly (h2d/d2h MB/s on a fixed 6 MB buffer,
  sync round-trip ms) and recorded;
- the flash kernel is asserted live (trace-time counter in ops/attention.py)
  and every compile logs its wall time + how many new persistent-cache
  entries it wrote (0 new entries == cache hit).

Baselines (/root/reference/README.md:377-388): SD1.5 on RTX 3090 CUDA is
2–5 s/image (midpoint 3.5 s → 0.286 img/s); SDXL on the 3090 is 8–15 s/image
(midpoint 11.5 s). The RK3588 NPU backend is ≈35 s/image.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import statistics
import sys
import time

BASELINE_IMAGES_PER_SEC = 1.0 / 3.5  # reference CUDA midpoint, SD1.5
SDXL_BASELINE_S_PER_IMG = 11.5       # reference CUDA midpoint, SDXL


def _log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _sync(x) -> None:
    """Force remote completion: through the axon tunnel block_until_ready
    returns before the remote program retires — only a d2h read truly
    synchronises (CLAUDE.md gotcha)."""
    import numpy as np

    np.asarray(x).reshape(-1)[:1]


class CacheWatch:
    """Detects persistent-compile-cache hits: a compile that writes no new
    cache entries loaded its executable from disk."""

    def __init__(self, cache_dir):
        self.dir = cache_dir
        self.compiles = []

    def _entries(self) -> int:
        try:
            return len(os.listdir(self.dir))
        except (OSError, TypeError):
            return -1

    def timed(self, name, fn):
        before = self._entries()
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        wrote = self._entries() - before if before >= 0 else -1
        rec = {"name": name, "seconds": round(dt, 1),
               "new_cache_entries": wrote,
               "cache_hit": bool(wrote == 0)}
        self.compiles.append(rec)
        _log(f"compile {name}: {dt:.1f}s "
             f"({'cache HIT' if wrote == 0 else f'{wrote} new cache entries'})")
        return out


def _tunnel_weather(timeout_s: float = 120.0):
    """Measure the tunnel directly: sync round-trip and h2d/d2h bandwidth on
    a 6 MB buffer (the size of one batch-8 uint8 image fetch).

    Runs in a worker thread with a deadline: a wedged tunnel session must
    degrade this to a diagnostic, not hang the whole bench before any
    number is produced. The probe is the process's FIRST backend touch, so
    it records which PHASE it reached — 'init' means backend/tunnel init
    ate the timebox (not necessarily a stall; a recorded phase of 'h2d' or
    later means the link itself was slow)."""
    import threading

    out = {}

    def probe():
        try:
            import numpy as np

            import jax
            import jax.numpy as jnp

            out["phase"] = "init"
            dev = jax.devices()[0]
            buf = np.zeros((8, 512, 512, 3), np.uint8)
            out["phase"] = "h2d"
            t0 = time.time()
            dbuf = jax.device_put(buf, dev)
            _sync(dbuf[:1, :1, :1, :1])
            h2d_s = time.time() - t0
            out["phase"] = "d2h"
            t0 = time.time()
            np.asarray(dbuf)
            d2h_s = time.time() - t0
            out["phase"] = "sync"
            one = jax.device_put(jnp.zeros((), jnp.float32), dev)
            t0 = time.time()
            for _ in range(5):
                np.asarray(one)
            rt_ms = (time.time() - t0) / 5 * 1e3
            mb = buf.nbytes / 1e6
            out.update({
                "phase": "done",
                "h2d_mb_s": round(mb / max(h2d_s, 1e-9), 1),
                "d2h_mb_s": round(mb / max(d2h_s, 1e-9), 1),
                "sync_roundtrip_ms": round(rt_ms, 1),
            })
        except Exception as e:  # a dead tunnel is a diagnostic, not a crash
            out["error"] = f"probe failed during {out.get('phase')}: {e!r}"

    _log("tunnel weather probe...")
    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        phase = out.get("phase", "startup")
        _log(f"tunnel weather probe still in phase {phase!r} after "
             f"{timeout_s:.0f}s")
        return {"error": f"probe exceeded {timeout_s:.0f}s during {phase!r}",
                "phase": phase}
    if "error" in out or "h2d_mb_s" not in out:
        _log(f"tunnel weather probe failed: {out}")
        return out or {"error": "probe produced nothing"}
    _log(f"tunnel: h2d {out['h2d_mb_s']} MB/s, "
         f"d2h {out['d2h_mb_s']} MB/s, sync {out['sync_roundtrip_ms']} ms")
    return out


def _median(xs):
    return statistics.median(xs)


TINY = os.environ.get("DREAMLAB_BENCH_TINY") == "1"  # CPU smoke test only


def bench_sd15(watch, budget):
    from dreamlab_tpu.ops import attention
    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle

    t0 = time.time()
    pipe = LCMPipeline(random_bundle("sd15", tiny=TINY))  # bf16, flash auto
    _log(f"sd15 init+transfer {time.time() - t0:.1f}s")

    prompt = "a photo of a cat, highly detailed"
    size = 64 if TINY else 512

    def gen(seed, batch=None, rng=None, pipelined=False, prefetch=True):
        return pipe.generate(
            prompt, height=size, width=size, num_inference_steps=4,
            seed=seed, batch=batch, rng=rng, pipelined=pipelined,
            prefetch=prefetch,
        )

    watch.timed("sd15_b1", lambda: gen(0))
    import jax

    flash = attention.FLASH_TRACE_COUNT
    if jax.default_backend() == "tpu":
        assert flash > 0, (
            "flash attention kernel not traced on TPU — the headline would "
            "silently measure the XLA fallback"
        )
    _log(f"flash attention sites traced: {flash}")

    # p50 latency: sequential single-image requests (the serving contract),
    # 3 reps × 10 images, per-image times pooled. Budget-guarded after the
    # first rep: a wedged tunnel (the r4 run lost 28 min INSIDE one call,
    # on a compile-cache hit) must degrade rep counts, not kill the JSON.
    lat_reps = []
    for rep in range(3):
        times = []
        for i in range(10):
            t0 = time.time()
            gen(seed=rep * 100 + i)
            times.append(1e3 * (time.time() - t0))
        lat_reps.append(round(_median(times)))
        _log(f"sequential latency rep {rep}: p50 {lat_reps[-1]} ms")
        if not budget():
            _log("budget exhausted mid-latency-reps")
            break
    p50 = _median(lat_reps)

    B, rounds = 8, 8
    watch.timed(
        "sd15_b8_devrng",
        lambda: gen(0, batch=B, rng="device"),
    )

    def run_e2e():
        """Pipelined serving: round i+1's dispatch/compute overlaps round
        i's image d2h — the production worker-pool pattern."""
        t0 = time.time()
        pending = None
        for i in range(rounds):
            res = gen(seed=i, batch=B, rng="device", pipelined=True)
            if pending is not None:
                pending.wait()
            pending = res
        pending.wait()
        return rounds * B / (time.time() - t0)

    def run_compute_only():
        """All rounds queued back-to-back, ONE sync at the end, no per-round
        image d2h (prefetch=False — otherwise the eager async image copies
        throttle the queue to tunnel bandwidth): measures what the chip
        does. This is the figure a direct-attached deployment sees."""
        t0 = time.time()
        last = None
        for i in range(rounds):
            last = gen(seed=i, batch=B, rng="device", pipelined=True,
                       prefetch=False)
        _sync(last.images[:1, :1, :1, :1])
        return rounds * B / (time.time() - t0)

    e2e, compute = [], []
    for rep in range(3):
        e2e.append(round(run_e2e(), 2))
        compute.append(round(run_compute_only(), 2))
        _log(f"throughput rep {rep}: e2e {e2e[-1]} img/s, "
             f"compute-only {compute[-1]} img/s")
        if not budget():
            _log("budget exhausted mid-throughput-reps")
            break

    out = {
        "img_per_s": _median(e2e),
        "e2e_reps": e2e,
        "compute_only_img_per_s": _median(compute),
        "compute_only_reps": compute,
        "p50_latency_ms": p50,
        "p50_latency_reps": lat_reps,
        "flash_sites_traced": flash,
    }
    if budget():
        out["lora_swap"] = _bench_lora_swap(pipe, gen, watch)
    del pipe
    return out


def _bench_lora_swap(pipe, gen, watch):
    """LoRA hot-swap (BASELINE config 'multi-LoRA composition mode'):
    merge an adapter into the UNet on-device and serve with it. Weights
    are jit ARGUMENTS, so the swap must not recompile — the reference
    reloads the whole pipeline to change adapters (modes.yaml switch,
    README.md:394-397)."""
    import tempfile

    from dreamlab_tpu import lora as lora_mod
    from dreamlab_tpu.testing import tiny_lora_state_dict

    attn = pipe.unet_params["down"][0]["attentions"][0]["blocks"][0]["attn1"]
    wq = attn["qkv"]["w"] if "qkv" in attn else attn["q"]["w"]
    c = int(wq.shape[0])
    sd = tiny_lora_state_dict(c, rank=8)
    tensors = lora_mod.parse_lora_state_dict(sd)
    base = pipe.unet_params
    entries_before = watch._entries()
    t0 = time.time()
    merged = lora_mod.merge_lora_into_tree(base, tensors.unet, 1.0)
    _sync((merged["down"][0]["attentions"][0]["blocks"][0]["attn1"]
           ["qkv" if "qkv" in attn else "q"]["w"])[:1, :1])
    merge_ms = round(1e3 * (time.time() - t0), 1)
    pipe.unet_params = merged
    t0 = time.time()
    gen(seed=12345)
    styled_ms = round(1e3 * (time.time() - t0))
    pipe.unet_params = base
    recompiled = (watch._entries() - entries_before) != 0 \
        if entries_before >= 0 else None

    # style FLIP cost through the serving worker (round 5): the first
    # application merges + caches; later flips to the same (style, level)
    # must be pointer swaps (<50 ms), not ~1.1 s re-merges — the traffic
    # pattern of the reference's per-request exclusive-style contract.
    from safetensors.numpy import save_file

    from dreamlab_tpu.engine.tpu_worker import TPUPipelineWorker
    from dreamlab_tpu.lora import StyleDef

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bench_style.safetensors")
        save_file(sd, path)
        worker = TPUPipelineWorker(
            pipe, 0, styles={"bench": StyleDef(name="bench", path=path)}
        )
        t0 = time.time()
        worker._apply_style("bench", 3)
        # the merge is async-dispatched: sync a leaf or this reads ~5 ms
        _sync((pipe.unet_params["down"][0]["attentions"][0]["blocks"][0]
               ["attn1"]["qkv" if "qkv" in attn else "q"]["w"])[:1, :1])
        first_apply_ms = round(1e3 * (time.time() - t0), 1)
        worker._apply_style(None, 0)
        # the 0-ms flip claim is only honest if the entry actually cached —
        # a merge-and-drop path would re-dispatch the full merge async and
        # time.time() would read only dispatch (the tunnel sync gotcha)
        cached = len(worker._merged_cache) == 1
        flips = []
        for _ in range(3):
            t0 = time.time()
            worker._apply_style("bench", 3)
            flips.append(round(1e3 * (time.time() - t0), 2))
            worker._apply_style(None, 0)
        worker._merged_clear()
        pipe.unet_params = base
    cached_flip_ms = _median(flips)
    _log(f"lora swap: merge {merge_ms} ms, styled gen {styled_ms} ms, "
         f"first apply {first_apply_ms} ms, cached flip {cached_flip_ms} ms "
         f"(entry_cached={cached}), recompiled={recompiled}")
    return {"merge_ms": merge_ms, "styled_gen_ms": styled_ms,
            "first_apply_ms": first_apply_ms,
            "cached_flip_ms": cached_flip_ms, "cached_flip_reps": flips,
            "entry_cached": cached, "recompiled": recompiled}


def bench_superres(watch, budget):
    """SR post-processing (BASELINE config 'LCM + super-resolution'):
    one 224→672 luma pass of the sub-pixel CNN as its own XLA program
    (the reference's super-resolution-10.rknn does the same tile-wise on
    NPU, lcm_sr_server.py:408-499)."""
    import numpy as np

    from dreamlab_tpu.models import superres
    from dreamlab_tpu.models.configs import SuperResConfig

    cfg = SuperResConfig()
    params = superres.init_params(cfg, np.random.RandomState(0))
    y = np.random.RandomState(1).rand(224, 224).astype(np.float32)
    watch.timed("sr_224_to_672",
                lambda: superres.upscale_luma(params, cfg, y))
    reps = []
    for rep in range(3):
        t0 = time.time()
        superres.upscale_luma(params, cfg, y)
        reps.append(round(1e3 * (time.time() - t0), 1))
        if not budget():
            break
    _log(f"superres 224→672: {reps} ms")
    return {"sr_224_to_672_ms": _median(reps), "reps": reps,
            "upscale_per_pass": cfg.upscale}


def bench_sdxl(watch, budget):
    """SDXL 1024²: 4-step LCM-style and 30-step CFG 7.5 (batch-doubled) —
    the BASELINE.json config the driver could never verify before r4."""
    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle

    t0 = time.time()
    pipe = LCMPipeline(random_bundle("sdxl", tiny=TINY))
    _log(f"sdxl init+transfer {time.time() - t0:.1f}s")
    size = 64 if TINY else 1024

    def gen(steps, gs, seed, **kw):
        return pipe.generate(
            "a photo of a cat", height=size, width=size,
            num_inference_steps=steps, guidance_scale=gs, seed=seed, **kw,
        )

    def compute_only(steps, gs, n, reps=3):
        """n gens queued back-to-back, one sync — the chip's rate without
        the tunnel's per-call dispatch/h2d/d2h (same split as SD1.5).
        Median of reps: a tunnel stall inside the single sync once
        reported 3.6 s/img for a 350 ms program (r5) — one wedged
        measurement must not become the recorded number."""
        out = []
        for r in range(reps):
            t0 = time.time()
            last = None
            for i in range(n):
                last = gen(steps, gs, 1000 + r * 10 + i, pipelined=True,
                           prefetch=False)
            _sync(last.images[:1, :1, :1, :1])
            out.append((time.time() - t0) / n)
            if not budget():
                break
        return _median(out)

    out = {}
    watch.timed("sdxl_1024_4step", lambda: gen(4, 1.0, 0))
    reps = []
    for rep in range(3):
        t0 = time.time()
        for i in range(3):
            gen(4, 1.0, rep * 10 + i)
        reps.append(round(1e3 * (time.time() - t0) / 3))
        _log(f"sdxl 4-step rep {rep}: {reps[-1]} ms/img")
        if not budget():
            break
    out["lcm4_ms_per_img"] = _median(reps)
    out["lcm4_reps"] = reps
    if budget():
        out["lcm4_compute_only_ms"] = round(1e3 * compute_only(4, 1.0, 3))
        _log(f"sdxl 4-step compute-only: {out['lcm4_compute_only_ms']} ms/img")

    if budget():
        watch.timed("sdxl_1024_30step_cfg", lambda: gen(30, 7.5, 0))
        reps = []
        for rep in range(3):
            t0 = time.time()
            gen(30, 7.5, rep + 1)
            reps.append(round(time.time() - t0, 2))
            _log(f"sdxl 30-step CFG rep {rep}: {reps[-1]} s/img")
            if not budget():
                break
        out["cfg30_s_per_img"] = _median(reps)
        out["cfg30_reps"] = reps
        if budget():
            out["cfg30_compute_only_s"] = round(compute_only(30, 7.5, 2), 2)
            _log(
                f"sdxl 30-step compute-only: {out['cfg30_compute_only_s']} s/img"
            )
        out["cfg30_vs_baseline"] = round(
            SDXL_BASELINE_S_PER_IMG / out["cfg30_s_per_img"], 2
        )
        if out.get("cfg30_compute_only_s"):
            # same split as the headline: the reference number is local-GPU
            # e2e; this rig's e2e rides the tunnel
            out["cfg30_vs_baseline_compute"] = round(
                SDXL_BASELINE_S_PER_IMG / out["cfg30_compute_only_s"], 2
            )
    else:
        _log("budget exhausted before sdxl 30-step CFG — skipped")
        out["cfg30_s_per_img"] = None
    del pipe
    return out


def main():
    t_start = time.time()
    budget_s = float(os.environ.get("DREAMLAB_BENCH_BUDGET_S", "2400"))

    def budget() -> bool:
        return time.time() - t_start < budget_s

    from dreamlab_tpu.utils.compile_cache import enable_compile_cache

    cache_dir = enable_compile_cache()
    _log(f"compile cache: {cache_dir}")
    watch = CacheWatch(cache_dir)

    weather = _tunnel_weather()
    sd15 = bench_sd15(watch, budget)

    sr = None
    if budget():
        sr = bench_superres(watch, budget)
    else:
        _log("budget exhausted before superres section — skipped")

    sdxl = None
    if os.environ.get("DREAMLAB_BENCH_SDXL", "1") not in ("0", "false"):
        if budget():
            sdxl = bench_sdxl(watch, budget)
        else:
            _log("budget exhausted before sdxl section — skipped")

    # Headline = compute-only (what the CHIP serves; comparable to the
    # reference's local-GPU numbers, whose PCIe d2h is negligible). The
    # dev-rig tunnel moves image bytes at single-digit MB/s on bad days —
    # r3's 14.2→10.95 "regression" was tunnel weather, which the e2e and
    # weather fields now expose instead of hiding in the headline.
    print(json.dumps({
        "metric": "sd15_512x512_4step_lcm_images_per_sec_per_chip",
        "value": sd15["compute_only_img_per_s"],
        "unit": "images/sec",
        "vs_baseline": round(
            sd15["compute_only_img_per_s"] / BASELINE_IMAGES_PER_SEC, 2
        ),
        "vs_baseline_compute": round(
            sd15["compute_only_img_per_s"] / BASELINE_IMAGES_PER_SEC, 2
        ),
        "vs_baseline_e2e": round(
            sd15["img_per_s"] / BASELINE_IMAGES_PER_SEC, 2
        ),
        "p50_latency_ms": sd15["p50_latency_ms"],
        "e2e_tunnel_img_per_s": sd15["img_per_s"],
        "note": (
            "value = median compute-only throughput (all rounds queued, one "
            "sync, no per-round image d2h); e2e_tunnel includes image d2h "
            "through the remote-TPU tunnel at detail.tunnel.d2h_mb_s. "
            "vs_baseline_compute divides compute-only by the reference's "
            "e2e CUDA midpoint (0.286 img/s, local PCIe d2h ~free); "
            "vs_baseline_e2e is the strict e2e-vs-e2e comparison THROUGH "
            "this rig's tunnel"
        ),
        "value_series_note": (
            "rounds 1-3 reported e2e-through-tunnel as 'value' "
            "(7.63 / 14.19 / 10.95); from round 4 'value' is compute-only "
            "— compare e2e_tunnel_img_per_s against the r1-r3 series"
        ),
        "detail": {
            "sd15": sd15,
            "superres": sr,
            "sdxl": sdxl,
            "tunnel": weather,
            "compiles": watch.compiles,
            "total_bench_s": round(time.time() - t_start, 1),
        },
    }))


if __name__ == "__main__":
    main()
