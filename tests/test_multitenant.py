"""Multi-tenant mode serving: with DREAMLAB_MODE_CACHE > 1 a request that
names a non-active mode runs on that mode's warm resident worker — no
global switch, no effect on other clients' traffic. The reference serves
exactly one mode at a time and pays a full unload/reload on every switch
(/root/reference/backends/worker_pool.py:236-284, README.md:394-397);
multi-tenancy is the warm-cache design (round 3) promoted to a routing
policy.
"""

import os
import threading
import time

import numpy as np
import pytest
import yaml

from dreamlab_tpu.engine.base import GenSpec
from dreamlab_tpu.engine.mode_config import ModeConfigManager
from dreamlab_tpu.engine.model_registry import ModelRegistry
from dreamlab_tpu.engine.worker_pool import GenerationJob, WorkerPool

from tests.test_engine import FakeWorker, write_modes_yaml


def make_pool(tmp_path, cache_size, modes=("alpha", "beta", "gamma"),
              max_batch=1):
    cfg = ModeConfigManager(write_modes_yaml(tmp_path / "modes.yaml", modes))
    registry = ModelRegistry(total_hbm_bytes=16 << 30)
    created = []

    def factory(worker_id, model_path):
        w = FakeWorker(worker_id, model_path)
        created.append(w)
        return w

    pool = WorkerPool(queue_max=16, worker_factory=factory, mode_config=cfg,
                      registry=registry, max_batch=max_batch)
    pool.mode_cache_size = cache_size
    pool._created = created
    return pool


def test_tenant_request_serves_without_switch(tmp_path):
    pool = make_pool(tmp_path, cache_size=3)
    try:
        assert pool.current_mode == "alpha"
        fut = pool.submit_job(GenerationJob(GenSpec(prompt="x", mode="beta")))
        fut.result(timeout=10)
        # active mode untouched; beta is resident as a warm tenant
        assert pool.current_mode == "alpha"
        assert "beta" in pool.get_status()["warm_modes"]
        # the job ran on beta's worker, not alpha's
        beta = next(w for w in pool._created if "beta" in w.model_path)
        assert len(beta.jobs) == 1 and beta.jobs[0].mode == "beta"
        alpha = next(w for w in pool._created if "alpha" in w.model_path)
        assert alpha.jobs == []
    finally:
        pool.shutdown()


def test_tenant_worker_reused_across_requests(tmp_path):
    pool = make_pool(tmp_path, cache_size=3)
    try:
        for seed in range(3):
            pool.submit_job(GenerationJob(
                GenSpec(prompt="x", seed=seed, mode="beta")
            )).result(timeout=10)
        builds = [w for w in pool._created if "beta" in w.model_path]
        assert len(builds) == 1, "tenant rebuilt instead of reused"
        assert len(builds[0].jobs) == 3
    finally:
        pool.shutdown()


def test_tenant_requires_cache_headroom(tmp_path):
    pool = make_pool(tmp_path, cache_size=1)
    try:
        fut = pool.submit_job(GenerationJob(GenSpec(prompt="x", mode="beta")))
        with pytest.raises(ValueError, match="DREAMLAB_MODE_CACHE"):
            fut.result(timeout=10)
        assert pool.current_mode == "alpha"  # still serving
    finally:
        pool.shutdown()


def test_unknown_tenant_mode_fails_only_that_job(tmp_path):
    pool = make_pool(tmp_path, cache_size=3)
    try:
        bad = pool.submit_job(GenerationJob(GenSpec(prompt="x", mode="nope")))
        with pytest.raises(Exception):
            bad.result(timeout=10)
        ok = pool.submit_job(GenerationJob(GenSpec(prompt="x")))
        ok.result(timeout=10)  # pool thread survived
    finally:
        pool.shutdown()


def test_tenant_lru_eviction_bounded(tmp_path):
    # cache_size=2 → active + 1 warm slot; beta then gamma traffic must
    # evict beta (LRU), never the active worker
    pool = make_pool(tmp_path, cache_size=2)
    try:
        pool.submit_job(GenerationJob(GenSpec(prompt="x", mode="beta"))
                        ).result(timeout=10)
        pool.submit_job(GenerationJob(GenSpec(prompt="x", mode="gamma"))
                        ).result(timeout=10)
        warm = pool.get_status()["warm_modes"]
        assert warm == ["gamma"], warm
        beta = next(w for w in pool._created if "beta" in w.model_path)
        assert beta.closed, "evicted tenant not disposed"
        alpha = next(w for w in pool._created if "alpha" in w.model_path)
        assert not alpha.closed and pool.current_mode == "alpha"
    finally:
        pool.shutdown()


def test_switch_to_tenant_promotes_cached_worker(tmp_path):
    pool = make_pool(tmp_path, cache_size=3)
    try:
        pool.submit_job(GenerationJob(GenSpec(prompt="x", mode="beta"))
                        ).result(timeout=10)
        beta = next(w for w in pool._created if "beta" in w.model_path)
        pool.switch_mode("beta").result(timeout=10)
        assert pool.current_mode == "beta"
        # the warm tenant was promoted, not rebuilt
        assert pool.worker is beta
        assert len([w for w in pool._created if "beta" in w.model_path]) == 1
    finally:
        pool.shutdown()


def test_pinned_mode_survives_queued_switch(tmp_path):
    """A request that pins the CURRENTLY-active mode must still serve from
    that mode when a queued switch lands ahead of it in the FIFO (the
    serving layer pins req.mode unconditionally in multi-tenant setups)."""
    from dreamlab_tpu.engine.worker_pool import CustomJob

    pool = make_pool(tmp_path, cache_size=2)
    try:
        gate = threading.Event()
        pool.submit_job(CustomJob(lambda w: gate.wait(5)))
        sw = pool.switch_mode("beta")
        fut = pool.submit_job(GenerationJob(
            GenSpec(prompt="x", mode="alpha")
        ))
        gate.set()
        sw.result(timeout=10)
        fut.result(timeout=10)
        assert pool.current_mode == "beta"
        # the job ran on alpha's (now warm) worker, not the new active
        alpha = next(w for w in pool._created if "alpha" in w.model_path)
        beta = next(w for w in pool._created if "beta" in w.model_path)
        assert [s.mode for s in alpha.jobs] == ["alpha"]
        assert beta.jobs == []
    finally:
        pool.shutdown()


def test_tenant_switch_interleaving(tmp_path):
    """Tenant jobs interleaved with a switch TO that tenant: the first job
    builds the tenant, the switch promotes the SAME worker to active, and
    a later pinned job resolves to it — exactly one build ever happens."""
    from dreamlab_tpu.engine.worker_pool import CustomJob

    pool = make_pool(tmp_path, cache_size=3)
    try:
        gate = threading.Event()
        pool.submit_job(CustomJob(lambda w: gate.wait(5)))
        f1 = pool.submit_job(GenerationJob(GenSpec(prompt="x", mode="beta")))
        sw = pool.switch_mode("beta")
        f2 = pool.submit_job(GenerationJob(GenSpec(prompt="y", mode="beta")))
        gate.set()
        f1.result(timeout=10)
        sw.result(timeout=10)
        f2.result(timeout=10)
        betas = [w for w in pool._created if "beta" in w.model_path]
        assert len(betas) == 1, "tenant rebuilt across promotion"
        assert len(betas[0].jobs) == 2
        assert pool.current_mode == "beta"
        # the now-active mode cannot be evicted out from under traffic
        with pytest.raises(ValueError, match="active"):
            pool.evict_mode("beta")
    finally:
        pool.shutdown()


def test_mixed_mode_jobs_do_not_share_batches(tmp_path):
    from tests.test_engine import BatchingFakeWorker

    class RecordingWorker(BatchingFakeWorker):
        def __init__(self, *a):
            super().__init__(*a)
            self.batches = []

        def run_jobs(self, specs):
            self.batches.append(list(specs))
            return [self.run_job(s) for s in specs]

    created = []

    def factory(i, path):
        w = RecordingWorker(i, path)
        created.append(w)
        return w

    cfg = ModeConfigManager(write_modes_yaml(
        tmp_path / "modes.yaml", ("alpha", "beta")
    ))
    pool = WorkerPool(queue_max=32, worker_factory=factory, mode_config=cfg,
                      registry=ModelRegistry(total_hbm_bytes=16 << 30),
                      max_batch=8)
    pool.mode_cache_size = 2
    try:
        # warm the tenant first so batching isn't broken up by its load
        pool.submit_job(GenerationJob(GenSpec(prompt="w", mode="beta"))
                        ).result(timeout=10)
        # stall the pool thread so all jobs queue up and COULD coalesce
        gate = threading.Event()
        from dreamlab_tpu.engine.worker_pool import CustomJob

        pool.submit_job(CustomJob(lambda w: gate.wait(5)))
        futs = []
        for i, mode in enumerate([None, None, "beta", "beta", None]):
            futs.append(pool.submit_job(GenerationJob(
                GenSpec(prompt="x", seed=i, mode=mode)
            )))
        gate.set()
        for f in futs:
            f.result(timeout=10)
        alpha = created[0]
        beta = next(w for w in created if "beta" in w.model_path)
        # batches never mixed modes: alpha saw {None}-batches, beta saw
        # {"beta"}-batches
        for batch in getattr(alpha, "batches", []):
            assert {getattr(s, "mode", None) for s in batch} == {None}
        for batch in getattr(beta, "batches", []):
            assert {getattr(s, "mode", None) for s in batch} == {"beta"}
        n_alpha = sum(len(b) for b in getattr(alpha, "batches", [])) + len(
            [s for s in alpha.jobs if getattr(s, "mode", None) is None]
        )
        assert n_alpha >= 3
    finally:
        pool.shutdown()


def test_mode_warmup_buckets(tmp_path):
    """defaults.warmup_buckets pre-compiles extra shape buckets in the
    background at mode load, so a deployment's non-default sizes never
    compile on the request path."""
    import jax.numpy as jnp

    from dreamlab_tpu.engine.tpu_worker import TPUPipelineWorker
    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle

    pipe = LCMPipeline(random_bundle("sd15", tiny=True), dtype=jnp.float32)
    cfg_yaml = {
        "model_root": "/tmp", "default_mode": "tiny",
        "modes": {"tiny": {
            "model": "a",
            "defaults": {"warmup_buckets": ["32x32:2", "64x64:3"]},
        }},
    }
    path = tmp_path / "modes.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg_yaml, f)
    pool = WorkerPool(
        queue_max=4,
        worker_factory=lambda i, p: TPUPipelineWorker(pipe, i),
        mode_config=ModeConfigManager(str(path)),
        registry=ModelRegistry(total_hbm_bytes=16 << 30),
    )
    try:
        # tiny VAE scale is 2: 32x32 → 16x16 latents, 64x64 → 32x32
        want = {(1, 16, 16, 2), (1, 32, 32, 3)}
        deadline = time.time() + 60
        while time.time() < deadline:
            have = {k[:4] for k in pipe._compiled}
            if want <= have:
                break
            time.sleep(0.2)
        assert want <= {k[:4] for k in pipe._compiled}, (
            want, set(pipe._compiled))
    finally:
        pool.shutdown()


def test_rest_tenant_generate(tmp_path):
    """End-to-end: /generate with {"mode": "tiny2"} serves from a warm
    tenant (X-Mode: tiny2) while the active mode stays tiny — and the
    single-tenant default (cache=1) still performs the sticky switch."""
    import asyncio

    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestClient, TestServer

    from dreamlab_tpu.engine.tpu_worker import TPUPipelineWorker
    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.serving.app import ServerConfig, create_app
    from dreamlab_tpu.testing import random_bundle

    pipe = LCMPipeline(random_bundle("sd15", tiny=True), dtype=jnp.float32)
    cfg = ModeConfigManager(write_modes_yaml(
        tmp_path / "modes.yaml", ("tiny", "tiny2")
    ))
    pool = WorkerPool(
        queue_max=8,
        worker_factory=lambda i, p: TPUPipelineWorker(pipe, i),
        mode_config=cfg, registry=ModelRegistry(total_hbm_bytes=16 << 30),
    )
    pool.mode_cache_size = 2
    app = create_app(ServerConfig(default_size="32x32", default_steps=2),
                     pool=pool, mode_config=cfg, skip_startup=True)

    async def drive():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/generate", json={
                "prompt": "cat", "size": "32x32",
                "num_inference_steps": 2, "seed": 5, "mode": "tiny2",
            })
            assert r.status == 200, await r.text()
            assert r.headers["X-Mode"] == "tiny2"
            assert pool.current_mode == "tiny"
            assert "tiny2" in pool.get_status()["warm_modes"]
            r2 = await client.post("/generate", json={
                "prompt": "cat", "size": "32x32",
                "num_inference_steps": 2, "seed": 5,
            })
            assert r2.status == 200
            assert r2.headers["X-Mode"] == "tiny"
            # same seed through either path must be the same image: both
            # tenants wrap the same pipeline here, so the bytes agree
            assert await r.read() == await r2.read()
        finally:
            await client.close()

    asyncio.new_event_loop().run_until_complete(drive())
    pool.shutdown()
