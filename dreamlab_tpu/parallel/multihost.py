"""Multi-host (DCN) serving dryrun — the last parallelism axis.

The reference is strictly single-node (SURVEY.md §2.5: no NCCL/MPI/Gloo
anywhere); single-host multi-chip serving ships here via ``DREAMLAB_MESH``.
This module proves the SAME mesh/sharding code runs across *processes*
(JAX multi-controller over DCN): ``jax.distributed`` wires N processes into
one global device set, the ("data", "model") mesh spans all of them, and
the generation program executes with batch rows sharded across hosts.

``dryrun_multihost(n_proc)`` is the driver-style entry: it spawns
``n_proc`` CPU-backend processes on this machine (each with its own
virtual devices), runs one sharded generation step, and checks every
process agrees — no TPU pod needed to validate the code path.

Deployment sketch (ROADMAP.md): one process per TPU host, coordinator =
host 0, the serving layer runs only on process 0 and broadcasts request
payloads via ``multihost_utils.broadcast_one_to_all`` before each batched
step; every process executes the same jitted call (multi-controller SPMD).
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np


def init_process(
    coordinator: str,
    num_processes: int,
    process_id: int,
    *,
    local_devices: int = 2,
    platform: str = "cpu",
) -> None:
    """Initialize this process as one controller of a multi-host run.

    Must run before any JAX backend touch. For the CPU dryrun each process
    gets ``local_devices`` virtual devices; on a real pod this is one
    process per host and the TPU plugin provides the local devices.
    """
    if platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={local_devices}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def _child_main(argv) -> int:
    """One controller process of the dryrun: build the global mesh, run a
    sharded generation step, verify agreement across hosts."""
    coordinator, n_proc, pid, local = (
        argv[0], int(argv[1]), int(argv[2]), int(argv[3])
    )
    init_process(coordinator, n_proc, pid, local_devices=local)

    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from .sharding import make_mesh
    from ..pipeline import LCMPipeline
    from ..testing import random_bundle

    n_global = len(jax.devices())
    assert n_global == n_proc * local, (n_global, n_proc, local)
    assert jax.process_count() == n_proc

    # every process builds identical weights from the same seed — the
    # deployment analogue of each host loading the same checkpoint
    mesh = make_mesh(n_global, model=1)
    bundle = random_bundle("sd15", tiny=True, seed=0)
    pipe = LCMPipeline(bundle, dtype=jnp.float32, mesh=mesh)

    batch = n_global  # one row per global device over the data axis
    shape = {}

    def run():
        # pipelined=True keeps images as the GLOBAL device array — a
        # multi-controller process can only read its own shards, so the
        # usual host materialization is done per-shard below
        res = pipe.generate(
            "multihost dryrun", height=32, width=32, num_inference_steps=2,
            seed=0, batch=batch, pipelined=True,
        )
        img = jax.block_until_ready(res.images)
        assert tuple(img.shape) == (batch, 32, 32, 3), img.shape
        shape["images"] = tuple(img.shape)
        shards = img.addressable_shards
        assert len(shards) == local, (len(shards), local)
        return np.float64(sum(
            np.asarray(jax.device_get(s.data)).astype(np.float64).sum()
            for s in shards
        ))

    local_sum = run()
    # all-gather the per-process checksums over DCN — the collective itself
    # exercises the cross-process runtime
    sums = multihost_utils.process_allgather(np.asarray([local_sum]))
    assert sums.shape[0] == n_proc
    # per-request determinism must hold across the DCN boundary: repeated
    # runs from the same seed produce identical shards on every process
    assert run() == local_sum, "multihost run not deterministic"

    if pid == 0:
        print(
            f"dryrun_multihost ok: processes={n_proc} "
            f"global_devices={n_global} mesh=({n_global}x1) "
            f"images={shape['images']}",
            flush=True,
        )
    return 0


def _router_child_main(argv) -> int:
    """One controller of the ROUTER dryrun: process 0 runs the REAL aiohttp
    serving stack over a RouterPipeline and drives it with real HTTP
    requests; followers replay broadcast requests in SPMD lockstep
    (parallel/multihost_router.py). Beyond plain txt2img, this exercises
    every router-supported feature: img2img, ControlNet hints, ensemble
    segments (carry stays per-controller), progress callbacks
    (callback_latents=False), and LoRA style merges replayed on every
    controller."""
    coordinator, n_proc, pid, local = (
        argv[0], int(argv[1]), int(argv[2]), int(argv[3])
    )
    init_process(coordinator, n_proc, pid, local_devices=local)

    import jax
    import jax.numpy as jnp

    from .sharding import make_mesh
    from .multihost_router import MultihostRouter, RouterPipeline
    from ..pipeline import LCMPipeline
    from ..testing import random_bundle, random_controlnet

    n_global = len(jax.devices())
    mesh = make_mesh(n_global, model=1)
    bundle = random_bundle("sd15", tiny=True, seed=0)
    pipe = LCMPipeline(bundle, dtype=jnp.float32, mesh=mesh)
    # every controller attaches the SAME ControlNet (same seed), mirroring
    # a deployment where each host loads the same mode config
    pipe.set_controlnet(
        random_controlnet(bundle.unet_cfg, vae_scale=pipe.vae_scale),
        bundle.unet_cfg,
    )
    router = MultihostRouter()
    rp = RouterPipeline(pipe, router)

    if pid != 0:
        served = rp.serve_follower()
        assert served >= 17, f"follower replayed only {served} messages"
        return 0

    # ---- process 0: the full serving stack, HTTP and all ----
    import asyncio
    import tempfile
    import threading
    import urllib.request

    import yaml
    from aiohttp import web

    from ..engine.mode_config import ModeConfigManager
    from ..engine.model_registry import ModelRegistry
    from ..engine.tpu_worker import TPUPipelineWorker
    from ..engine.worker_pool import WorkerPool
    from ..serving.app import ServerConfig, create_app

    with tempfile.NamedTemporaryFile(
        "w", suffix=".yaml", delete=False
    ) as f:
        yaml.safe_dump({
            "model_root": "/tmp", "default_mode": "router",
            "modes": {"router": {"model": "a"}},
        }, f)
        modes_path = f.name
    pool = WorkerPool(
        queue_max=8,
        worker_factory=lambda i, p: TPUPipelineWorker(rp, i),
        mode_config=ModeConfigManager(modes_path),
        registry=ModelRegistry(total_hbm_bytes=16 << 30),
    )
    app = create_app(
        ServerConfig(default_size="32x32", default_steps=2),
        pool=pool, skip_startup=True,
    )

    loop = asyncio.new_event_loop()
    started = threading.Event()
    port_box = {}

    async def _serve():
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port_box["port"] = site._server.sockets[0].getsockname()[1]
        started.set()

    def _loop_main():
        asyncio.set_event_loop(loop)
        loop.create_task(_serve())
        loop.run_forever()

    t = threading.Thread(target=_loop_main, daemon=True)
    t.start()
    assert started.wait(30), "HTTP server failed to start"
    port = port_box["port"]

    def post(body: bytes):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:  # surface the server's reason
            raise AssertionError(
                f"HTTP {e.code}: {e.read(2000)!r}"
            ) from e

    body = (b'{"prompt": "router dryrun", "size": "32x32", '
            b'"num_inference_steps": 2, "seed": 5}')
    st1, hdr1, png1 = post(body)
    assert st1 == 200 and png1[:8] == b"\x89PNG\r\n\x1a\n", (st1, png1[:8])
    assert hdr1.get("X-Seed") == "5", hdr1
    st2, _, png2 = post(body)
    # determinism THROUGH the router: same seed, same bytes, every process
    # having executed the same SPMD program
    assert st2 == 200 and png2 == png1, "router serving not deterministic"
    st3, _, png3 = post(
        b'{"prompt": "router dryrun", "size": "32x32", '
        b'"num_inference_steps": 2, "seed": 6}'
    )
    assert st3 == 200 and png3 != png1

    # fingerprint path rides the router too (latents gathered cross-host)
    from ..engine.base import GenSpec

    w = TPUPipelineWorker(rp, 9)
    png_fp, seed_fp, fp = w.run_job_with_latents(GenSpec(
        prompt="router dryrun", size="32x32", num_inference_steps=2, seed=5,
    ))
    assert seed_fp == 5 and len(fp) == 512, (seed_fp, len(fp))

    # ---- coalesced batches ride the router: the worker's batched call
    # carries explicit per-row latents + step noises (each row from its own
    # seed), so batching must not change any request's bytes ----
    solo = [w.run_job(GenSpec(
        prompt="router dryrun", size="32x32", num_inference_steps=2, seed=s,
    )) for s in (41, 42)]
    batched = w.run_jobs([GenSpec(
        prompt="router dryrun", size="32x32", num_inference_steps=2, seed=s,
    ) for s in (41, 42)])
    assert [b[0] for b in batched] == [s[0] for s in solo], \
        "batched rows != solo runs through the router"

    # ---- SSE streaming through the FULL stack (pool → worker → router):
    # the worker registers a callback_latents=False hook, followers replay
    # with a no-op, step events reach the HTTP client from process 0 ----
    sse_req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate/stream",
        data=(b'{"prompt": "router dryrun", "size": "32x32", '
              b'"num_inference_steps": 2, "seed": 5}'),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(sse_req, timeout=120) as resp:
        sse_body = resp.read().decode()
    assert sse_body.count("event: progress") == 2, sse_body[:400]
    assert "event: result" in sse_body and "image_b64" in sse_body

    # ---- progress callbacks (the /generate/stream form) across hosts ----
    fired = []
    pk = dict(height=32, width=32, num_inference_steps=2, seed=5)
    rp1 = rp.generate("router dryrun", callback=lambda i, t, lat: fired.append((i, t)),
                      callback_steps=1, callback_latents=False, **pk)
    assert sorted(i for i, _ in fired) == [0, 1], fired
    rp2 = rp.generate("router dryrun", callback=lambda i, t, lat: None,
                      callback_steps=1, callback_latents=False, **pk)
    assert np.array_equal(rp1.images, rp2.images), "progress run not deterministic"
    try:
        rp.generate("x", callback=lambda i, t, lat: None, **pk)
        raise AssertionError("callback_latents=True must be rejected multi-host")
    except ValueError:
        pass

    # ---- img2img across hosts (init image rides the broadcast) ----
    init = (np.random.RandomState(3).rand(32, 32, 3) * 255).astype(np.uint8)
    i1 = rp.img2img("router dryrun", init, strength=0.6, seed=21,
                    num_inference_steps=2)
    i2 = rp.img2img("router dryrun", init, strength=0.6, seed=21,
                    num_inference_steps=2)
    assert i1.images.shape == (1, 32, 32, 3)
    assert np.array_equal(i1.images, i2.images), "img2img not deterministic"

    # ---- ControlNet hints across hosts ----
    hint = (np.random.RandomState(4).rand(32, 32, 3) * 255).astype(np.uint8)
    g_plain = rp.generate("router dryrun", height=32, width=32,
                          num_inference_steps=2, seed=9)
    g_hint = rp.generate("router dryrun", height=32, width=32,
                         num_inference_steps=2, seed=9, control_image=hint,
                         controlnet_scale=1.0)
    g_hint2 = rp.generate("router dryrun", height=32, width=32,
                          num_inference_steps=2, seed=9, control_image=hint,
                          controlnet_scale=1.0)
    assert not np.array_equal(g_plain.images, g_hint.images), \
        "hint had no effect through the router"
    assert np.array_equal(g_hint.images, g_hint2.images)

    # ---- ensemble segments: carry stays on each controller ----
    sk = dict(height=32, width=32, num_inference_steps=2, seed=11)
    full = rp.generate("router dryrun", **sk)
    s1 = rp.generate("router dryrun", segment=(0, 1), **sk)
    assert s1.images is None and s1.state_device is not None
    s2 = rp.generate("router dryrun", segment=(1, 2),
                     latents_state=s1.state_device, **sk)
    assert np.array_equal(s2.images, full.images), \
        "segmented run != single full run through the router"
    try:
        rp.generate("x", segment=(1, 2),
                    latents_state=np.zeros((1, 16, 16, 4), np.float32), **sk)
        raise AssertionError("foreign carry must be rejected multi-host")
    except ValueError:
        pass

    # ---- LoRA styles: the merge replays on every controller ----
    import tempfile as _tf

    from safetensors.numpy import save_file as _st_save

    from ..testing import tiny_lora_state_dict

    lora_path = os.path.join(
        _tf.gettempdir(),
        f"router_lora_{coordinator.split(':')[1]}.safetensors",
    )
    _st_save(
        tiny_lora_state_dict(bundle.unet_cfg.cross_attention_dim), lora_path
    )
    lk = dict(height=32, width=32, num_inference_steps=2, seed=13)
    base_img = rp.generate("router dryrun", **lk)
    rp.apply_lora(lora_path, 1.0)
    styled = rp.generate("router dryrun", **lk)
    assert not np.array_equal(base_img.images, styled.images), \
        "LoRA merge had no effect through the router"
    rp.apply_lora(None)
    restored = rp.generate("router dryrun", **lk)
    assert np.array_equal(base_img.images, restored.images), \
        "LoRA restore did not recover base weights"

    # a merge that fails votes across controllers, restores base weights
    # fleet-wide, and surfaces loudly — weights never diverge silently
    try:
        rp.apply_lora("/nonexistent/adapter.safetensors", 1.0)
        raise AssertionError("missing adapter must fail the request")
    except RuntimeError:
        pass
    after_fail = rp.generate("router dryrun", **lk)
    assert np.array_equal(after_fail.images, base_img.images), \
        "failed merge left non-base weights behind"

    # raw weight swaps still refuse loudly: they'd apply on process 0 only
    try:
        rp.unet_params = None
        raise AssertionError("raw weight swap must be rejected multi-host")
    except ValueError:
        pass

    # post-broadcast validation errors (both controllers raise the SAME
    # error before any collective) must not kill the follower loop
    try:
        rp.img2img("x", init, strength=0.0, seed=1, num_inference_steps=2)
        raise AssertionError("strength=0 must raise")
    except ValueError:
        pass
    again = rp.generate("router dryrun", **lk)
    assert np.array_equal(again.images, base_img.images), \
        "router desynced after a rejected request"

    rp.shutdown()
    loop.call_soon_threadsafe(loop.stop)
    print(
        f"dryrun_router ok: processes={n_proc} global_devices={n_global} "
        f"served=27 fingerprint=512B features=batch,sse,progress,img2img,"
        f"controlnet,segments,lora,lora-vote,reject-resilience "
        f"deterministic=True",
        flush=True,
    )
    return 0


def _spawn_controllers(mode: str, n_proc: int, local_devices: int,
                       timeout: float, ok_marker: str) -> None:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    procs = []
    for pid in range(n_proc):
        env = dict(os.environ)
        # each child must initialize its OWN backend; scrub inherited state
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "dreamlab_tpu.parallel.multihost",
             coordinator, str(n_proc), str(pid), str(local_devices), mode],
            env=env,
            stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if pid == 0 else subprocess.DEVNULL,
        ))
    out0, _ = procs[0].communicate(timeout=timeout)
    codes = [procs[0].returncode] + [
        p.wait(timeout=timeout) for p in procs[1:]
    ]
    text = out0.decode(errors="replace")
    if any(codes) or ok_marker not in text:
        raise RuntimeError(
            f"multihost {mode} dryrun failed: exit codes {codes}\n{text[-4000:]}"
        )
    print(text.strip().splitlines()[-1])


def dryrun_router(
    n_proc: int = 2, *, local_devices: int = 2, timeout: float = 600.0
) -> None:
    """Spawn ``n_proc`` controllers and serve real /generate requests
    through the global mesh (HTTP on process 0, SPMD everywhere)."""
    _spawn_controllers("router", n_proc, local_devices, timeout,
                       "dryrun_router ok")


def dryrun_multihost(
    n_proc: int = 2, *, local_devices: int = 2, timeout: float = 600.0
) -> None:
    """Spawn ``n_proc`` controller processes on this machine and run one
    DCN-spanning generation step (CPU backend; no pod required)."""
    _spawn_controllers("checksum", n_proc, local_devices, timeout,
                       "dryrun_multihost ok")


if __name__ == "__main__":  # child-process entry
    _mode = sys.argv[5] if len(sys.argv) > 5 else "checksum"
    if _mode == "router":
        sys.exit(_router_child_main(sys.argv[1:5]))
    sys.exit(_child_main(sys.argv[1:5]))
