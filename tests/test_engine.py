"""Engine layer: worker pool FIFO + mode switching with injected fakes,
HBM registry accounting, factory detection, mode config parsing, file
watcher — mirroring the reference's unit-test strategy (fake worker + DI,
reference tests/test_worker_pool.py, test_model_registry.py,
test_worker_factory.py)."""

import json
import os
import threading
import time

import numpy as np
import pytest
import yaml

from dreamlab_tpu.engine.base import GenSpec, ModelPaths, parse_size
from dreamlab_tpu.engine.mode_config import (
    ModeConfigError,
    ModeConfigManager,
)
from dreamlab_tpu.engine.model_registry import ModelRegistry
from dreamlab_tpu.engine.worker_pool import (
    CustomJob,
    GenerationJob,
    QueueFullError,
    WorkerPool,
)
from dreamlab_tpu.engine.file_watcher import ConfigFileWatcher


# ---------------------------------------------------------------------------
# fakes (the reference's deterministic fake-worker pattern, conftest.py:124-160)
# ---------------------------------------------------------------------------


class FakeWorker:
    def __init__(self, worker_id, model_path):
        self.worker_id = worker_id
        self.model_path = model_path
        self.closed = False
        self.jobs = []

    def run_job(self, spec):
        self.jobs.append(spec)
        rs = np.random.RandomState(spec.seed or 0)
        return rs.bytes(64), spec.seed or 0

    def run_job_with_latents(self, spec):
        png, seed = self.run_job(spec)
        return png, seed, b"\x00" * 512

    def close(self):
        self.closed = True


def write_modes_yaml(path, modes=("alpha", "beta"), default=None):
    cfg = {
        "model_root": "/nonexistent",
        "default_mode": default or modes[0],
        "modes": {
            name: {"model": f"{name}.safetensors", "defaults": {"steps": 4}}
            for name in modes
        },
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.fixture
def pool(tmp_path):
    cfg = ModeConfigManager(write_modes_yaml(tmp_path / "modes.yaml"))
    registry = ModelRegistry(total_hbm_bytes=16 << 30)
    created = []

    def factory(worker_id, model_path):
        w = FakeWorker(worker_id, model_path)
        created.append(w)
        return w

    p = WorkerPool(
        queue_max=4, worker_factory=factory, mode_config=cfg, registry=registry
    )
    p._created = created
    yield p
    p.shutdown(drain=False, timeout=1.0)


# ---------------------------------------------------------------------------
# worker pool
# ---------------------------------------------------------------------------


def test_default_mode_loaded(pool):
    assert pool.current_mode == "alpha"
    assert pool.worker is not None
    assert pool.registry.get_model("alpha") is not None


def test_generation_job_roundtrip(pool):
    fut = pool.submit_job(GenerationJob(GenSpec(prompt="hi", seed=3)))
    png, seed = fut.result(timeout=5)
    assert seed == 3 and isinstance(png, bytes)


def test_fifo_ordering(pool):
    order = []

    def slow(worker, tag):
        time.sleep(0.05)
        order.append(tag)
        return tag

    futs = [pool.submit_job(CustomJob(slow, t)) for t in ("a", "b", "c")]
    for f in futs:
        f.result(timeout=5)
    assert order == ["a", "b", "c"]


def test_mode_switch_recreates_worker(pool):
    first = pool.worker
    fut = pool.switch_mode("beta")
    fut.result(timeout=5)
    # worker loop processes the load; give it a beat
    deadline = time.time() + 2
    while pool.current_mode != "beta" and time.time() < deadline:
        time.sleep(0.01)
    assert pool.current_mode == "beta"
    assert pool.worker is not first
    assert first.closed
    assert pool.registry.get_model("alpha") is None
    assert pool.registry.get_model("beta") is not None


def test_same_mode_switch_noop(pool):
    first = pool.worker
    pool.switch_mode("alpha").result(timeout=5)
    assert pool.worker is first


def test_switch_waits_for_inflight_jobs(pool):
    seen = []

    def slow(worker, tag):
        time.sleep(0.1)
        seen.append((tag, worker.model_path))
        return tag

    pool.submit_job(CustomJob(slow, "before"))
    pool.switch_mode("beta")
    fut = pool.submit_job(CustomJob(slow, "after"))
    fut.result(timeout=5)
    assert seen[0][0] == "before" and seen[0][1].endswith("alpha.safetensors")
    assert seen[1][0] == "after" and seen[1][1].endswith("beta.safetensors")


def test_unknown_mode_rejected(pool):
    with pytest.raises(KeyError):
        pool.switch_mode("nope")


def test_queue_full_backpressure(pool):
    block = threading.Event()
    started = threading.Event()

    def waiter(worker):
        started.set()
        block.wait(5)
        return True

    pool.submit_job(CustomJob(waiter))  # occupies the worker
    assert started.wait(5)  # ensure it left the queue
    for _ in range(4):
        pool.submit_job(CustomJob(lambda w: None))
    with pytest.raises(QueueFullError):
        pool.submit_job(CustomJob(lambda w: None))
    block.set()


def test_job_failure_only_fails_that_future(pool):
    def boom(worker):
        raise RuntimeError("kaboom")

    bad = pool.submit_job(CustomJob(boom))
    good = pool.submit_job(CustomJob(lambda w: "ok"))
    with pytest.raises(RuntimeError):
        bad.result(timeout=5)
    assert good.result(timeout=5) == "ok"


def test_shutdown_drains(pool):
    results = []
    pool.submit_job(CustomJob(lambda w: results.append(1)))
    pool.shutdown(drain=True, timeout=5)
    assert results == [1]
    with pytest.raises(RuntimeError):
        pool.submit_job(CustomJob(lambda w: None))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def test_registry_accounting():
    reg = ModelRegistry(total_hbm_bytes=10_000)
    reg.register_model("m1", "/p1", 0, 4_000)
    assert reg.get_used_hbm() >= 0  # real stats may shadow registered sum
    assert reg.get_model("m1").hbm_bytes == 4_000
    reg.register_model("m1", "/p1b", 0, 5_000)  # overwrite warns, keeps latest
    assert reg.get_model("m1").model_path == "/p1b"
    assert reg.unregister_model("m1")
    assert not reg.unregister_model("m1")


def test_registry_can_fit_headroom():
    reg = ModelRegistry(total_hbm_bytes=10_000, headroom=0.9)
    # without live device stats the used sum comes from entries
    if reg.get_used_hbm() == 0:
        reg.register_model("a", "/a", 0, 5_000)
        assert reg.can_fit(3_000)
        assert not reg.can_fit(5_000)


def test_registry_estimate_from_files(tmp_path):
    p = tmp_path / "model"
    (p / "unet").mkdir(parents=True)
    (p / "unet" / "w.safetensors").write_bytes(b"x" * 1000)
    est = ModelRegistry.estimate_model_hbm(str(p))
    assert est == int(1000 * 1.2 * 0.5)


def test_registry_stats_schema():
    reg = ModelRegistry(total_hbm_bytes=16 << 30)
    reg.register_model("m", "/m", 0, 2 << 30, loras=["detail"])
    s = reg.get_hbm_stats()
    for key in ("device", "total_gb", "used_gb", "available_gb",
                "used_percent", "models"):
        assert key in s
    assert s["models"][0]["loras"] == ["detail"]


# ---------------------------------------------------------------------------
# mode config
# ---------------------------------------------------------------------------


def test_mode_config_parsing(tmp_path):
    path = tmp_path / "modes.yaml"
    with open(path, "w") as f:
        yaml.safe_dump({
            "model_root": "/mr",
            "lora_root": "/lr",
            "default_mode": "x",
            "modes": {
                "x": {
                    "model": "ckpt",
                    "description": "d",
                    "loras": [{"file": "l.safetensors", "strength": 0.7}],
                    "defaults": {"size": "512x512", "steps": 4, "guidance": 1.0},
                },
                "y": {"model": "/abs/path"},
            },
        }, f)
    m = ModeConfigManager(str(path))
    assert m.default_mode == "x"
    x = m.get_mode("x")
    assert x.model == "/mr/ckpt"
    assert x.loras[0].file == "/lr/l.safetensors"
    assert x.loras[0].strength == 0.7
    assert x.default_steps() == 4
    assert m.get_mode("y").model == "/abs/path"
    assert set(m.mode_names()) == {"x", "y"}
    d = m.to_dict()
    assert d["modes"]["x"]["loras"][0]["name"] == "l"


def test_mode_config_errors(tmp_path):
    with pytest.raises(ModeConfigError):
        ModeConfigManager(str(tmp_path / "missing.yaml"))
    bad = tmp_path / "bad.yaml"
    bad.write_text("modes: {}\n")
    with pytest.raises(ModeConfigError):
        ModeConfigManager(str(bad))
    nodefault = tmp_path / "nd.yaml"
    nodefault.write_text("default_mode: zz\nmodes:\n  a:\n    model: m\n")
    with pytest.raises(ModeConfigError):
        ModeConfigManager(str(nodefault))


def test_mode_config_reload(tmp_path):
    path = write_modes_yaml(tmp_path / "modes.yaml", modes=("a",))
    m = ModeConfigManager(str(path))
    write_modes_yaml(tmp_path / "modes.yaml", modes=("a", "b"))
    m.reload()
    assert m.has_mode("b")


# ---------------------------------------------------------------------------
# misc engine pieces
# ---------------------------------------------------------------------------


def test_parse_size():
    assert parse_size("512x512") == (512, 512)
    assert parse_size("384X768") == (384, 768)
    with pytest.raises(ValueError):
        parse_size("512by512")


def test_model_paths_contract(tmp_path):
    for d in ("scheduler", "tokenizer", "text_encoder", "unet", "vae_decoder"):
        (tmp_path / d).mkdir()
    mp = ModelPaths(str(tmp_path))
    assert mp.validate()
    assert mp.vae_dir.endswith("vae_decoder")
    (tmp_path / "vae").mkdir()
    assert mp.vae_dir.endswith("vae")


def test_file_watcher_detects_change(tmp_path):
    path = tmp_path / "modes.yaml"
    path.write_text("a: 1\n")
    fired = threading.Event()
    w = ConfigFileWatcher(str(path), fired.set, poll_interval=0.05, debounce=0.0)
    w.start()
    try:
        time.sleep(0.1)
        os.utime(path, (time.time() + 5, time.time() + 5))
        assert fired.wait(2.0)
    finally:
        w.stop()


class BatchingFakeWorker(FakeWorker):
    def __init__(self, *a):
        super().__init__(*a)
        self.batch_calls = []

    @staticmethod
    def batchable(a, b):
        return a.size == b.size and a.num_inference_steps == b.num_inference_steps

    def run_jobs(self, specs):
        self.batch_calls.append(len(specs))
        return [self.run_job(s) for s in specs]


def test_pool_coalesces_compatible_jobs(tmp_path):
    cfg = ModeConfigManager(write_modes_yaml(tmp_path / "m.yaml", modes=("a",)))
    reg = ModelRegistry(total_hbm_bytes=1 << 30)
    workers = []

    def factory(i, path):
        w = BatchingFakeWorker(i, path)
        workers.append(w)
        return w

    pool = WorkerPool(queue_max=16, worker_factory=factory, mode_config=cfg,
                      registry=reg, max_batch=4)
    try:
        # stall the worker so jobs pile up
        gate = threading.Event()
        pool.submit_job(CustomJob(lambda w: gate.wait(5)))
        time.sleep(0.1)
        futs = [
            pool.submit_job(GenerationJob(GenSpec(prompt=f"p{i}", size="32x32",
                                                  num_inference_steps=2, seed=i)))
            for i in range(3)
        ]
        # incompatible job right after: must NOT join the batch
        odd = pool.submit_job(GenerationJob(GenSpec(prompt="odd", size="64x64",
                                                    num_inference_steps=2, seed=9)))
        gate.set()
        for f in futs:
            f.result(timeout=5)
        odd.result(timeout=5)
        w = workers[0]
        assert 3 in w.batch_calls  # the three compatible jobs coalesced
        # the odd job ran solo, after the batch
        assert w.jobs[-1].prompt == "odd"
    finally:
        pool.shutdown(drain=False, timeout=1)


def test_pool_batching_disabled_for_plain_worker(pool):
    """FakeWorker has no run_jobs: the pool must fall back to solo path."""
    futs = [
        pool.submit_job(GenerationJob(GenSpec(prompt=f"p{i}", size="32x32",
                                              num_inference_steps=2, seed=i)))
        for i in range(3)
    ]
    for f in futs:
        f.result(timeout=5)


def test_style_registry_yaml(tmp_path):
    from dreamlab_tpu.engine.styles import load_style_registry

    path = tmp_path / "styles.yaml"
    path.write_text("""
lora_root: /loras
styles:
  anime:
    file: anime-v2.safetensors
    strengths: [0.5, 1.0]
    required_cross_attention_dim: 768
  crisp: detail.safetensors
""")
    reg = load_style_registry(str(path))
    assert reg["anime"].path == "/loras/anime-v2.safetensors"
    assert reg["anime"].strengths == (0.5, 1.0)
    assert reg["anime"].required_cross_attention_dim == 768
    assert reg["crisp"].path == "/loras/detail.safetensors"
    assert load_style_registry(str(tmp_path / "missing.yaml")) == {}


def test_shutdown_fails_leftover_futures(tmp_path):
    cfg = ModeConfigManager(write_modes_yaml(tmp_path / "m.yaml", modes=("a",)))
    reg = ModelRegistry(total_hbm_bytes=1 << 30)
    pool = WorkerPool(queue_max=8, worker_factory=lambda i, p: FakeWorker(i, p),
                      mode_config=cfg, registry=reg)
    gate = threading.Event()
    pool.submit_job(CustomJob(lambda w: gate.wait(5)))
    time.sleep(0.05)
    stuck = [pool.submit_job(CustomJob(lambda w: "never")) for _ in range(3)]
    gate.set()
    pool.shutdown(drain=False, timeout=0.2)
    for f in stuck:
        assert f.done()
        # either completed before shutdown won the race, or failed cleanly
        if f.exception() is not None:
            assert "shut down" in str(f.exception())


def test_pool_pipelined_batches_overlap_and_stay_fifo(tmp_path):
    """A run_jobs_pipelined worker gets dispatch-then-settle treatment: the
    previous batch's futures resolve right after the next batch dispatches,
    results stay correct per request, and non-batch jobs (incl. shutdown)
    settle the in-flight batch first — nothing strands."""
    cfg = ModeConfigManager(write_modes_yaml(tmp_path / "m.yaml", modes=("a",)))
    reg = ModelRegistry(total_hbm_bytes=1 << 30)
    events = []

    class PipelinedFakeWorker:
        def __init__(self, worker_id, path):
            self.worker_id = worker_id

        @staticmethod
        def batchable(a, b):
            return a.size == b.size

        def run_jobs(self, specs):
            return self.run_jobs_pipelined(specs)()

        def run_jobs_pipelined(self, specs):
            events.append(("dispatch", [s.prompt for s in specs]))

            def finalize():
                events.append(("finalize", [s.prompt for s in specs]))
                return [(f"png:{s.prompt}".encode(), s.seed) for s in specs]

            return finalize

        def run_job(self, spec):
            events.append(("solo", spec.prompt))
            return f"png:{spec.prompt}".encode(), spec.seed

        def close(self):
            pass

    pool = WorkerPool(queue_max=32, worker_factory=PipelinedFakeWorker,
                      mode_config=cfg, registry=reg, max_batch=2)
    try:
        gate = threading.Event()
        pool.submit_job(CustomJob(lambda w: gate.wait(5)))
        time.sleep(0.1)
        futs = [
            pool.submit_job(GenerationJob(GenSpec(prompt=f"p{i}", size="32x32",
                                                  num_inference_steps=2, seed=i)))
            for i in range(4)  # two batches of 2
        ]
        solo = pool.submit_job(GenerationJob(GenSpec(prompt="solo", size="64x64",
                                                     num_inference_steps=2, seed=9)))
        gate.set()
        results = [f.result(timeout=5) for f in futs]
        solo.result(timeout=5)
        assert [r[0] for r in results] == [b"png:p0", b"png:p1", b"png:p2", b"png:p3"]

        # overlap shape: batch 2 dispatches BEFORE batch 1 finalizes; the
        # solo job settles batch 2 before running
        assert events == [
            ("dispatch", ["p0", "p1"]),
            ("dispatch", ["p2", "p3"]),
            ("finalize", ["p0", "p1"]),
            ("finalize", ["p2", "p3"]),
            ("solo", "solo"),
        ]
    finally:
        pool.shutdown(drain=False, timeout=1)


def test_pool_inflight_settles_on_shutdown(tmp_path):
    """An in-flight pipelined batch finalizes (not strands) at shutdown."""
    cfg = ModeConfigManager(write_modes_yaml(tmp_path / "m.yaml", modes=("a",)))
    reg = ModelRegistry(total_hbm_bytes=1 << 30)

    class W:
        def __init__(self, i, p):
            pass

        @staticmethod
        def batchable(a, b):
            return True

        def run_jobs(self, specs):
            return self.run_jobs_pipelined(specs)()

        def run_jobs_pipelined(self, specs):
            return lambda: [(b"ok", s.seed) for s in specs]

        def run_job(self, spec):  # solo path if the batch window misses
            return (b"ok", spec.seed)

        def close(self):
            pass

    pool = WorkerPool(queue_max=8, worker_factory=W, mode_config=cfg,
                      registry=reg, max_batch=2)
    futs = [
        pool.submit_job(GenerationJob(GenSpec(prompt=f"x{i}", size="32x32",
                                              num_inference_steps=2, seed=i)))
        for i in range(2)
    ]
    pool.shutdown(timeout=5)
    for f in futs:
        assert f.result(timeout=1) == (b"ok", f.result(timeout=1)[1])


def test_mode_cache_keeps_warm_workers(tmp_path, monkeypatch):
    """DREAMLAB_MODE_CACHE=2: switching back to a warm mode reuses the
    cached worker (no factory call) — the reference reloads every switch."""
    monkeypatch.setenv("DREAMLAB_MODE_CACHE", "2")
    cfg = ModeConfigManager(write_modes_yaml(tmp_path / "m.yaml", modes=("a", "b")))
    reg = ModelRegistry(total_hbm_bytes=1 << 30)
    created = []

    class W:
        def __init__(self, mode):
            self.mode = mode

        def close(self):
            pass

    def factory(i, path):
        created.append(path)
        return W(path)

    pool = WorkerPool(queue_max=8, worker_factory=factory, mode_config=cfg,
                      registry=reg)
    try:
        assert pool.mode_cache_size == 2
        first_worker = pool.worker
        pool.switch_mode("b").result(timeout=5)
        assert pool.worker is not first_worker
        pool.switch_mode("a").result(timeout=5)
        # warm reactivation: same object, no new factory call
        assert pool.worker is first_worker
        assert len(created) == 2
        # registry still tracks both resident modes
        names = {m["name"] for m in reg.get_hbm_stats()["models"]}
        assert names == {"a", "b"}
    finally:
        pool.shutdown(drain=False, timeout=1)
    # shutdown disposed everything
    assert reg.get_hbm_stats()["models"] == []


def test_mode_cache_size_one_matches_reference_behavior(tmp_path, monkeypatch):
    monkeypatch.delenv("DREAMLAB_MODE_CACHE", raising=False)
    cfg = ModeConfigManager(write_modes_yaml(tmp_path / "m.yaml", modes=("a", "b")))
    reg = ModelRegistry(total_hbm_bytes=1 << 30)
    created = []

    def factory(i, path):
        created.append(path)

        class W:
            def close(self):
                pass

        return W()

    pool = WorkerPool(queue_max=8, worker_factory=factory, mode_config=cfg,
                      registry=reg)
    try:
        pool.switch_mode("b").result(timeout=5)
        pool.switch_mode("a").result(timeout=5)
        assert len(created) == 3  # every switch reloads (reference parity)
        names = {m["name"] for m in reg.get_hbm_stats()["models"]}
        assert names == {"a"}
    finally:
        pool.shutdown(drain=False, timeout=1)


def test_mode_cache_evicts_before_load_when_hbm_tight(tmp_path, monkeypatch):
    """Warm workers evict LRU-first BEFORE a new load allocates, driven by
    the registry's can_fit estimate — not after the allocation."""
    import yaml as _yaml

    monkeypatch.setenv("DREAMLAB_MODE_CACHE", "3")
    # two real model files whose size estimates each exceed half the capacity
    for name in ("a", "b"):
        (tmp_path / f"{name}.safetensors").write_bytes(b"x" * 200)  # est ≈ 120 B
    (tmp_path / "m.yaml").write_text(_yaml.safe_dump({
        "model_root": str(tmp_path),
        "default_mode": "a",
        "modes": {n: {"model": f"{n}.safetensors"} for n in ("a", "b")},
    }))
    cfg = ModeConfigManager(str(tmp_path / "m.yaml"))
    reg = ModelRegistry(total_hbm_bytes=150)  # fits one, not two

    order = []

    class W:
        def __init__(self, mode):
            self.mode = mode

        def close(self):
            order.append(("closed", self.mode))

    pool = WorkerPool(queue_max=8, worker_factory=lambda i, p: W(p),
                      mode_config=cfg, registry=reg)
    try:
        active_a = pool.worker
        pool.switch_mode("b").result(timeout=5)
        names = {m["name"] for m in reg.get_hbm_stats()["models"]}
        assert names == {"b"}, names
        # 'a' was closed BEFORE 'b' was constructed
        assert ("closed", active_a.mode) in order
        assert pool.get_status()["warm_modes"] == []
    finally:
        pool.shutdown(drain=False, timeout=1)


def test_mode_cache_invalidated_by_config_change(tmp_path, monkeypatch):
    """A modes.yaml hot-reload that repoints a mode discards its warm
    worker instead of serving stale weights."""
    import yaml as _yaml

    monkeypatch.setenv("DREAMLAB_MODE_CACHE", "4")
    cfg_path = tmp_path / "m.yaml"

    def write(model_a):
        cfg_path.write_text(_yaml.safe_dump({
            "model_root": str(tmp_path),
            "default_mode": "a",
            "modes": {"a": {"model": model_a}, "b": {"model": "mb"}},
        }))

    write("ma")
    cfg = ModeConfigManager(str(cfg_path))
    reg = ModelRegistry(total_hbm_bytes=1 << 30)
    created = []

    class W:
        def __init__(self, path):
            self.path = path

        def close(self):
            pass

    pool = WorkerPool(queue_max=8, worker_factory=lambda i, p: W(p),
                      mode_config=cfg, registry=reg)
    try:
        first = pool.worker
        pool.switch_mode("b").result(timeout=5)
        # repoint mode 'a' and hot-reload the config
        write("ma-v2")
        cfg.reload()
        pool.switch_mode("a").result(timeout=5)
        assert pool.worker is not first, "stale cached worker served"
        assert pool.worker.path.endswith("ma-v2")
    finally:
        pool.shutdown(drain=False, timeout=1)


def test_preload_modes_warms_cache_without_activating(tmp_path, monkeypatch):
    monkeypatch.setenv("DREAMLAB_MODE_CACHE", "3")
    cfg = ModeConfigManager(
        write_modes_yaml(tmp_path / "m.yaml", modes=("a", "b", "c"))
    )
    reg = ModelRegistry(total_hbm_bytes=1 << 30)
    created = []

    class W:
        def __init__(self, path):
            self.path = path

        def close(self):
            pass

    pool = WorkerPool(queue_max=8, worker_factory=lambda i, p: W(p),
                      mode_config=cfg, registry=reg)
    try:
        loaded = pool.preload_modes(["b", "c", "a", "nope"])
        assert loaded == ["b", "c"]  # 'a' active, 'nope' unknown
        assert pool.current_mode == "a"  # active mode untouched
        assert set(pool.get_status()["warm_modes"]) == {"b", "c"}
        # warm switch reuses the preloaded worker instantly
        warm_b = dict(pool._mode_cache)["b"][1]
        pool.switch_mode("b").result(timeout=5)
        assert pool.worker is warm_b
    finally:
        pool.shutdown(drain=False, timeout=1)


def test_preload_respects_cache_capacity(tmp_path, monkeypatch):
    monkeypatch.setenv("DREAMLAB_MODE_CACHE", "2")  # active + 1 warm slot
    cfg = ModeConfigManager(
        write_modes_yaml(tmp_path / "m.yaml", modes=("a", "b", "c"))
    )
    reg = ModelRegistry(total_hbm_bytes=1 << 30)

    class W:
        def close(self):
            pass

    pool = WorkerPool(queue_max=8, worker_factory=lambda i, p: W(),
                      mode_config=cfg, registry=reg)
    try:
        loaded = pool.preload_modes(["b", "c"])
        assert loaded == ["b"]  # second preload refused: cache full
    finally:
        pool.shutdown(drain=False, timeout=1)


def test_cancelled_jobs_are_skipped(pool):
    """A future cancelled while queued (client disconnect) never executes."""
    gate = threading.Event()
    pool.submit_job(CustomJob(lambda w: gate.wait(5)))
    time.sleep(0.1)
    doomed = pool.submit_job(GenerationJob(GenSpec(
        prompt="doomed", size="32x32", num_inference_steps=2, seed=1,
    )))
    alive = pool.submit_job(GenerationJob(GenSpec(
        prompt="alive", size="32x32", num_inference_steps=2, seed=2,
    )))
    assert doomed.cancel()
    gate.set()
    png, seed = alive.result(timeout=10)
    assert seed == 2
    assert doomed.cancelled()
    # the worker never saw the doomed spec
    assert all(j.prompt != "doomed" for j in pool.worker.jobs)


def test_batch_window_fills_while_inflight(tmp_path, monkeypatch):
    """While a batch computes on device, staggered arrivals coalesce for
    free: the collect window is open only when work is in flight."""
    monkeypatch.setenv("DREAMLAB_BATCH_WINDOW_MS", "400")
    cfg = ModeConfigManager(write_modes_yaml(tmp_path / "m.yaml", modes=("a",)))
    reg = ModelRegistry(total_hbm_bytes=1 << 30)
    dispatches = []
    release_first = threading.Event()

    class W:
        def __init__(self, i, p):
            pass

        @staticmethod
        def batchable(a, b):
            return a.size == b.size

        def run_jobs(self, specs):
            return self.run_jobs_pipelined(specs)()

        def run_jobs_pipelined(self, specs):
            prompts = [s.prompt for s in specs]
            dispatches.append(prompts)
            first = len(dispatches) == 1

            def finalize():
                if first:
                    release_first.wait(5)  # keep batch 1 "computing"
                return [(b"ok", s.seed) for s in specs]

            return finalize

        def run_job(self, spec):
            dispatches.append([spec.prompt])
            return (b"ok", spec.seed)

        def close(self):
            pass

    pool = WorkerPool(queue_max=32, worker_factory=W, mode_config=cfg,
                      registry=reg, max_batch=4)
    try:
        gate = threading.Event()
        pool.submit_job(CustomJob(lambda w: gate.wait(5)))
        time.sleep(0.1)
        # wave 1: two jobs -> batch 1 dispatches and stays "in flight"
        f1 = [pool.submit_job(GenerationJob(GenSpec(
            prompt=f"a{i}", size="32x32", num_inference_steps=2, seed=i,
        ))) for i in range(2)]
        gate.set()
        time.sleep(0.15)  # batch 1 dispatched; loop now idles with inflight
        # wave 2: staggered arrivals within the 400 ms window
        f2a = pool.submit_job(GenerationJob(GenSpec(
            prompt="b0", size="32x32", num_inference_steps=2, seed=10)))
        time.sleep(0.1)
        f2b = pool.submit_job(GenerationJob(GenSpec(
            prompt="b1", size="32x32", num_inference_steps=2, seed=11)))
        release_first.set()
        for f in f1 + [f2a, f2b]:
            f.result(timeout=10)
        assert ["a0", "a1"] in dispatches
        assert ["b0", "b1"] in dispatches, (
            f"staggered jobs should coalesce while batch 1 is in flight: "
            f"{dispatches}"
        )
    finally:
        pool.shutdown(drain=False, timeout=1)
