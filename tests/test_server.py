"""REST API contract tests against the real serving stack (tiny pipeline on
CPU): /generate headers + bytes, backpressure, mode routes, compat
endpoints, storage, superres, health — the contracts in SURVEY.md Appendix A."""

import asyncio
import base64
import io
import json

import numpy as np
import pytest
import jax.numpy as jnp
from aiohttp.test_utils import TestClient, TestServer

from dreamlab_tpu.engine.model_registry import ModelRegistry
from dreamlab_tpu.engine.worker_pool import WorkerPool
from dreamlab_tpu.models.configs import SuperResConfig
from dreamlab_tpu.persistence import InMemoryStorageProvider
from dreamlab_tpu.pipeline import LCMPipeline
from dreamlab_tpu.serving.app import ServerConfig, create_app
from dreamlab_tpu.serving.superres_service import SuperResService
from dreamlab_tpu.testing import random_bundle
from tests.test_engine import write_modes_yaml
from dreamlab_tpu.engine.mode_config import ModeConfigManager
from dreamlab_tpu.engine.tpu_worker import TPUPipelineWorker


@pytest.fixture(scope="module")
def shared_pipe():
    return LCMPipeline(random_bundle("sd15", tiny=True), dtype=jnp.float32)


@pytest.fixture()
def client(tmp_path, shared_pipe):
    """App with a real (tiny) worker behind the mode system."""
    cfgfile = write_modes_yaml(tmp_path / "modes.yaml", modes=("alpha", "beta"))
    mode_config = ModeConfigManager(str(cfgfile))
    registry = ModelRegistry(total_hbm_bytes=16 << 30)

    def factory(worker_id, model_path):
        return TPUPipelineWorker(shared_pipe, worker_id)

    pool = WorkerPool(
        queue_max=8, worker_factory=factory, mode_config=mode_config,
        registry=registry,
    )
    sr = SuperResService(cfg=SuperResConfig(tile=16), num_workers=1)
    storage = InMemoryStorageProvider()
    cfg = ServerConfig(default_size="32x32", default_steps=2, request_timeout=60)
    app = create_app(
        cfg, pool=pool, sr=sr, storage=storage,
        mode_config=mode_config, registry=registry, skip_startup=True,
    )

    loop = asyncio.new_event_loop()
    cl = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(cl.start_server())

    def call(method, path, **kw):
        async def go():
            resp = await cl.request(method, path, **kw)
            body = await resp.read()
            return resp, body
        return loop.run_until_complete(go())

    yield call
    loop.run_until_complete(cl.close())
    pool.shutdown(drain=False, timeout=1)
    sr.shutdown()
    loop.close()


GEN = {"prompt": "a cat", "size": "32x32", "num_inference_steps": 2, "seed": 7}


def test_health(client):
    resp, body = client("GET", "/health")
    assert resp.status == 200
    data = json.loads(body)
    assert data["status"] == "ok" and data["backend"] == "mode"


def test_generate_returns_png_with_headers(client):
    resp, body = client("POST", "/generate", json=GEN)
    assert resp.status == 200, body
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    assert resp.headers["X-Seed"] == "7"
    assert resp.headers["X-Mode"] == "alpha"
    assert resp.headers["X-SuperRes"] == "0"
    assert resp.headers["X-LCM-Image-Key"].startswith("lcm:")
    assert resp.headers["Access-Control-Allow-Origin"] == "*"


def test_generate_then_fetch_from_storage(client):
    resp, body = client("POST", "/generate", json=GEN)
    key = resp.headers["X-LCM-Image-Key"]
    resp2, body2 = client("GET", f"/storage/{key}")
    assert resp2.status == 200
    assert body2 == body
    assert resp2.headers["X-Meta-seed"] == "7"


def test_generate_validation_error(client):
    resp, body = client("POST", "/generate", json={"prompt": "x", "size": "bogus"})
    assert resp.status == 422
    resp, body = client("POST", "/generate",
                        json={"prompt": "x", "num_inference_steps": 99})
    assert resp.status == 422


def _parse_sse(body: bytes):
    events = []
    for block in body.decode().strip().split("\n\n"):
        event = data = None
        for line in block.splitlines():
            if line.startswith("event: "):
                event = line[7:]
            elif line.startswith("data: "):
                data = json.loads(line[6:])
        events.append((event, data))
    return events


def test_generate_stream_sse(client):
    # the SSE route produces per-step progress then the same image bytes
    # /generate returns for the identical request
    resp, ref_png = client("POST", "/generate", json=GEN)
    assert resp.status == 200
    resp, body = client("POST", "/generate/stream", json=GEN)
    assert resp.status == 200
    assert resp.headers["Content-Type"].startswith("text/event-stream")
    events = _parse_sse(body)
    progress = [d for e, d in events if e == "progress"]
    assert [p["step"] for p in progress] == [0, 1]
    assert all(p["total_steps"] == 2 for p in progress)
    assert all(isinstance(p["timestep"], int) for p in progress)
    results = [d for e, d in events if e == "result"]
    assert len(results) == 1
    r = results[0]
    assert r["seed"] == 7 and r["mode"] == "alpha"
    assert base64.b64decode(r["image_b64"]) == ref_png
    assert r["image_key"].startswith("lcm:")


def test_generate_stream_error_in_stream(client):
    resp, body = client("POST", "/generate/stream", json={**GEN, "mode": "nope"})
    # status line is already committed when validation-after-prepare fails;
    # the error arrives as an SSE event
    events = _parse_sse(body)
    errs = [d for e, d in events if e == "error"]
    assert len(errs) == 1 and errs[0]["status"] == 404


def test_generate_unknown_mode_404(client):
    resp, body = client("POST", "/generate", json={**GEN, "mode": "nope"})
    assert resp.status == 404


def test_generate_mode_switch(client):
    resp, _ = client("POST", "/generate", json={**GEN, "mode": "beta"})
    assert resp.status == 200
    assert resp.headers["X-Mode"] == "beta"


def test_generate_with_superres(client):
    resp, body = client("POST", "/generate", json={
        **GEN, "superres": True, "superres_magnitude": 1,
    })
    assert resp.status == 200
    assert resp.headers["X-SuperRes"] == "1"
    assert resp.headers["X-SR-Passes"] == "1"
    from PIL import Image

    img = Image.open(io.BytesIO(body))
    assert img.size == (96, 96)  # 32 × 3


def test_superres_upload(client):
    import aiohttp
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (20, 24), (128, 40, 200)).save(buf, format="PNG")
    form = aiohttp.FormData()
    form.add_field("file", buf.getvalue(), filename="in.png",
                   content_type="image/png")
    form.add_field("magnitude", "1")
    form.add_field("out_format", "jpeg")
    resp, body = client("POST", "/superres", data=form)
    assert resp.status == 200
    out = Image.open(io.BytesIO(body))
    assert out.size == (60, 72)
    assert out.format == "JPEG"


def test_superres_bad_magnitude(client):
    import aiohttp

    form = aiohttp.FormData()
    form.add_field("file", b"xx", filename="in.png", content_type="image/png")
    form.add_field("magnitude", "9")
    resp, _ = client("POST", "/superres", data=form)
    assert resp.status == 400


def test_storage_health_and_put(client):
    resp, body = client("GET", "/storage/health")
    assert json.loads(body)["ok"]
    resp, body = client("PUT", "/storage/custom:key", data=b"blob")
    assert resp.status == 200
    resp, body = client("GET", "/storage/custom:key")
    assert body == b"blob"


def test_storage_missing_404(client):
    resp, _ = client("GET", "/storage/nope")
    assert resp.status == 404


def test_api_models_status(client):
    resp, body = client("GET", "/api/models/status")
    data = json.loads(body)
    assert data["backend"] == "mode"
    assert data["current_mode"] in ("alpha", "beta")
    assert "memory" in data


def test_api_modes_and_switch(client):
    resp, body = client("GET", "/api/modes")
    data = json.loads(body)
    assert set(data["modes"]) == {"alpha", "beta"}
    resp, body = client("POST", "/api/modes/switch",
                        json={"mode": "alpha", "wait_seconds": 10})
    assert resp.status == 200
    assert json.loads(body)["status"] == "switched"
    resp, _ = client("POST", "/api/modes/switch", json={"mode": "zz"})
    assert resp.status == 404
    resp, _ = client("POST", "/api/modes/switch", json={})
    assert resp.status == 400


def test_api_vram_schema(client):
    resp, body = client("GET", "/api/vram")
    data = json.loads(body)
    for k in ("total_gb", "used_gb", "available_gb", "models"):
        assert k in data


def test_api_reserved_501(client):
    for path in ("/api/models/load", "/api/models/unload"):
        resp, _ = client("POST", path, json={})
        assert resp.status == 501


def test_sdapi_models_options_samplers(client):
    resp, body = client("GET", "/sdapi/v1/sd-models")
    names = {m["model_name"] for m in json.loads(body)}
    assert names == {"alpha", "beta"}
    resp, body = client("GET", "/sdapi/v1/options")
    assert "sd_model_checkpoint" in json.loads(body)
    resp, body = client("GET", "/sdapi/v1/samplers")
    assert json.loads(body)[0]["name"] == "LCM"


def test_sdapi_txt2img(client):
    resp, body = client("POST", "/sdapi/v1/txt2img", json={
        "prompt": "a cat", "width": 32, "height": 32, "steps": 2, "seed": 3,
    })
    assert resp.status == 200, body
    data = json.loads(body)
    img = base64.b64decode(data["images"][0])
    assert img[:8] == b"\x89PNG\r\n\x1a\n"
    assert json.loads(data["info"])["seed"] == 3


def test_sdapi_txt2img_random_seed(client):
    resp, body = client("POST", "/sdapi/v1/txt2img", json={
        "prompt": "a cat", "width": 32, "height": 32, "steps": 1, "seed": -1,
    })
    assert json.loads(body)["info"]


def test_openai_images(client):
    resp, body = client("POST", "/v1/images/generations", json={
        "prompt": "a cat", "size": "32x32", "n": 1,
    })
    assert resp.status == 200, body
    data = json.loads(body)
    assert len(data["data"]) == 1
    img = base64.b64decode(data["data"][0]["b64_json"])
    assert img[:8] == b"\x89PNG\r\n\x1a\n"


def test_mode_defaults_applied(client):
    # modes.yaml from write_modes_yaml sets defaults: steps 4 — but tiny
    # pipeline accepts that; verify the request carries defaults when unset.
    resp, _ = client("POST", "/generate", json={"prompt": "x", "size": "32x32",
                                                "seed": 1})
    assert resp.status == 200


def test_mode_defaults_never_override_user_values():
    """Unit contract of _apply_mode_defaults (VERDICT r4 weak-6): fields
    the CLIENT set survive; only schema-defaulted fields take the mode's
    defaults — asserted in both directions so a set/unset inversion bug
    (the exact hazard the old `unset` naming invited) cannot land."""
    from dreamlab_tpu.serving.app import _apply_mode_defaults
    from dreamlab_tpu.serving.schemas import GenerateRequest

    class FakeMode:
        def default_size(self):
            return "256x256"

        def default_steps(self):
            return 8

        def default_guidance(self):
            return 2.5

    # user set everything: nothing may change
    req = GenerateRequest(prompt="x", size="32x32", num_inference_steps=2,
                          guidance_scale=1.5)
    _apply_mode_defaults(req, FakeMode())
    assert (req.size, req.num_inference_steps, req.guidance_scale) == \
        ("32x32", 2, 1.5)

    # user set nothing: every mode default lands
    req = GenerateRequest(prompt="x")
    _apply_mode_defaults(req, FakeMode())
    assert (req.size, req.num_inference_steps, req.guidance_scale) == \
        ("256x256", 8, 2.5)

    # mixed: only the unset field moves
    req = GenerateRequest(prompt="x", size="64x64")
    _apply_mode_defaults(req, FakeMode())
    assert req.size == "64x64"
    assert (req.num_inference_steps, req.guidance_scale) == (8, 2.5)


def test_server_config_from_env(monkeypatch, tmp_path):
    from dreamlab_tpu.serving.app import ServerConfig

    monkeypatch.setenv("MODEL_ROOT", "/models")
    monkeypatch.setenv("MODEL", "ckpt")
    monkeypatch.setenv("NUM_WORKERS", "3")
    monkeypatch.setenv("QUEUE_MAX", "7")
    monkeypatch.setenv("DEFAULT_SIZE", "384x384")
    monkeypatch.setenv("DEFAULT_TIMEOUT", "60")
    monkeypatch.setenv("SR_NUM_WORKERS", "2")
    monkeypatch.setenv("YUME_ENABLED", "1")
    monkeypatch.delenv("MODES_CONFIG", raising=False)
    cfg = ServerConfig.from_env()
    assert cfg.model_path == "/models/ckpt"
    assert cfg.num_workers == 3
    assert cfg.queue_max == 7
    assert cfg.default_size == "384x384"
    assert cfg.request_timeout == 60.0
    assert cfg.sr_num_workers == 2
    assert cfg.yume_enabled


def test_legacy_service_multi_worker(shared_pipe):
    from dreamlab_tpu.engine.base import GenSpec
    from dreamlab_tpu.engine.tpu_worker import TPUPipelineWorker
    from dreamlab_tpu.serving.legacy_service import PipelineService

    made = []

    def factory(i):
        w = TPUPipelineWorker(shared_pipe, i)
        made.append(w)
        return w

    svc = PipelineService(factory, num_workers=2, queue_max=8)
    try:
        assert len(made) == 2
        futs = [
            svc.submit(GenSpec(prompt=f"p{i}", size="32x32",
                               num_inference_steps=2, seed=i))
            for i in range(4)
        ]
        results = [f.result(timeout=60) for f in futs]
        assert all(png[:8] == b"\x89PNG\r\n\x1a\n" for png, _ in results)
        png_l, seed_l, lat = svc.submit(
            GenSpec(prompt="z", size="32x32", num_inference_steps=2, seed=5),
            with_latents=True,
        ).result(timeout=60)
        assert len(lat) == 512
    finally:
        svc.shutdown()
    with pytest.raises(RuntimeError):
        svc.submit(GenSpec(prompt="late", size="32x32"))


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_img2img_endpoint(client):
    import aiohttp

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (32, 32, 3), np.uint8)
    form = aiohttp.FormData()
    form.add_field("file", _png_bytes(img), filename="in.png",
                   content_type="image/png")
    form.add_field("prompt", "repaint as a cat")
    form.add_field("strength", "0.6")
    form.add_field("steps", "2")
    form.add_field("seed", "11")
    resp, body = client("POST", "/v1/img2img", data=form)
    assert resp.status == 200, body
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    assert resp.headers["X-Seed"] == "11"
    assert resp.headers["X-Strength"] == "0.6"


def test_inpaint_endpoint_with_mask(client):
    import aiohttp

    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (32, 32, 3), np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    mask[8:16, 8:16] = 255
    form = aiohttp.FormData()
    form.add_field("file", _png_bytes(img), filename="in.png",
                   content_type="image/png")
    form.add_field("mask", _png_bytes(mask), filename="mask.png",
                   content_type="image/png")
    form.add_field("prompt", "fill with flowers")
    form.add_field("steps", "2")
    resp, body = client("POST", "/v1/inpaint", data=form)
    assert resp.status == 200, body
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_img2img_missing_fields(client):
    import aiohttp

    form = aiohttp.FormData()
    form.add_field("prompt", "no image")
    resp, _ = client("POST", "/v1/img2img", data=form)
    assert resp.status == 400
    form = aiohttp.FormData()
    form.add_field("file", b"123", filename="x.png", content_type="image/png")
    resp, _ = client("POST", "/v1/img2img", data=form)
    assert resp.status == 400  # missing prompt


def test_dreams_routes_via_app(shared_pipe, tmp_path):
    """Dream session lifecycle through the HTTP surface."""
    from dreamlab_tpu.engine.tpu_worker import TPUPipelineWorker
    from dreamlab_tpu.yume.dream_worker import DreamWorker, set_dream_worker
    from dreamlab_tpu.yume.scoring import AestheticScorer

    worker = TPUPipelineWorker(shared_pipe, 0)
    dream = DreamWorker(
        worker, scorer=AestheticScorer(), redis=None,
        candidate_size="32x32", candidate_steps=1,
        render_size="32x32", render_steps=1,
        render_interval=2, score_threshold=0.0, candidate_batch=2,
    )
    # pre-compile the candidate + render buckets: first-use compiles on the
    # single-core CPU would otherwise eat the whole timed session
    dream._generate_candidates([1, 2], "warm")
    from dreamlab_tpu.engine.base import GenSpec as _GS
    worker.run_job(_GS(prompt="warm", size="32x32", num_inference_steps=1, seed=0))
    set_dream_worker(dream)
    try:
        app = create_app(ServerConfig(yume_enabled=True), skip_startup=True)
        loop = asyncio.new_event_loop()
        cl = TestClient(TestServer(app, loop=loop), loop=loop)
        loop.run_until_complete(cl.start_server())

        async def drive():
            r = await cl.post("/dreams/start",
                              json={"prompt": "tiny", "duration_s": 2.0,
                                    "strategy": "random"})
            assert r.status == 200
            assert (await cl.post("/dreams/start", json={"prompt": "x"})).status == 409
            assert (await cl.get("/dreams/status")).status == 200
            await asyncio.sleep(2.3)
            r = await cl.post("/dreams/stop")
            st = await r.json()
            assert not st["running"]
            top = await (await cl.get("/dreams/top?n=5")).json()
            assert top["top"]
            stats = await (await cl.get("/dreams/stats")).json()
            assert stats["generated"] > 0
            assert (await cl.get("/dreams/recent")).status == 200
            return True

        assert loop.run_until_complete(drive())
        loop.run_until_complete(cl.close())
        loop.close()
    finally:
        set_dream_worker(None)


def test_dreams_unavailable_503():
    from dreamlab_tpu.yume.dream_worker import set_dream_worker

    set_dream_worker(None)
    app = create_app(ServerConfig(yume_enabled=True), skip_startup=True)
    loop = asyncio.new_event_loop()
    cl = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(cl.start_server())

    async def go():
        return (await cl.get("/dreams/status")).status

    assert loop.run_until_complete(go()) == 503
    loop.run_until_complete(cl.close())
    loop.close()


def test_request_logger_config(monkeypatch):
    from dreamlab_tpu.serving.request_logger import (
        RequestLoggerConfig,
        _body_summary,
        _headers_summary,
    )

    monkeypatch.setenv("LOG_REQUESTS", "1")
    monkeypatch.setenv("LOG_PATH_DENYLIST", "/health,/metrics")
    monkeypatch.setenv("LOG_PATH_PREFIXES", "")
    cfg = RequestLoggerConfig()
    assert cfg.should_log("/generate")
    assert not cfg.should_log("/health")
    assert not cfg.should_log("/metrics/x")

    monkeypatch.setenv("LOG_PATH_PREFIXES", "/api")
    cfg = RequestLoggerConfig()
    assert cfg.should_log("/api/modes")
    assert not cfg.should_log("/generate")

    monkeypatch.setenv("LOG_REQUESTS", "0")
    assert not RequestLoggerConfig().should_log("/api/modes")

    # redaction + allowlist
    hdrs = {"Authorization": "secret", "Content-Type": "application/json",
            "X-Custom": "hidden"}
    out = _headers_summary(hdrs)
    assert "secret" not in out and "<redacted>" in out
    assert "application/json" in out
    assert "X-Custom" not in out

    # body summaries
    assert _body_summary(b'{"a": 1}', "application/json", 100) == '{"a":1}'
    long = json.dumps({"k": "v" * 100}).encode()
    assert _body_summary(long, "application/json", 20).endswith("…")
    assert "multipart" in _body_summary(b"xx", "multipart/form-data", 100)
    assert _body_summary(b"\x00\x01", "application/octet-stream", 100) == "<2 bytes>"


def test_profiler_endpoints(client):
    """POST /api/profiler/start + /stop capture a real XLA trace."""
    import json as _json
    import os
    import shutil

    resp, body = client("POST", "/api/profiler/start", json={})
    assert resp.status == 200
    trace_dir = _json.loads(body)["dir"]
    # run something on device while tracing
    resp, _ = client("POST", "/generate", json={
        "prompt": "trace me", "size": "32x32",
        "num_inference_steps": 1, "seed": 0,
    })
    assert resp.status == 200
    # double-start refused
    resp, _ = client("POST", "/api/profiler/start", json={})
    assert resp.status == 409
    resp, body = client("POST", "/api/profiler/stop")
    assert resp.status == 200
    assert os.path.isdir(trace_dir)
    assert any(os.scandir(trace_dir)), "trace produced no files"
    shutil.rmtree(trace_dir, ignore_errors=True)
    resp, _ = client("POST", "/api/profiler/stop")
    assert resp.status == 409


def test_styles_endpoint(client):
    import json as _json

    resp, body = client("GET", "/api/styles")
    assert resp.status == 200
    data = _json.loads(body)
    assert "styles" in data and isinstance(data["styles"], list)


def test_generate_sdxl_over_rest(tmp_path):
    """SDXL (dual towers, CFG batch-doubling) through the full REST path."""
    import jax.numpy as jnp

    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle

    cfgfile = write_modes_yaml(tmp_path / "modes.yaml", modes=("xl",))
    mode_config = ModeConfigManager(str(cfgfile))
    registry = ModelRegistry(total_hbm_bytes=16 << 30)
    pipe = LCMPipeline(random_bundle("sdxl", tiny=True), dtype=jnp.float32)
    pool = WorkerPool(
        queue_max=8, worker_factory=lambda i, p: TPUPipelineWorker(pipe, i),
        mode_config=mode_config, registry=registry,
    )
    app = create_app(
        ServerConfig(default_size="32x32", default_steps=2),
        pool=pool, storage=InMemoryStorageProvider(),
        mode_config=mode_config, registry=registry, skip_startup=True,
    )
    loop = asyncio.new_event_loop()
    cl = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(cl.start_server())
    try:
        async def gen(body):
            resp = await cl.post("/generate", json=body)
            return resp, await resp.read()

        # CFG path (guidance > 1 on a non-LCM SDXL) + negative prompt
        resp, png = loop.run_until_complete(gen({
            "prompt": "a castle", "negative_prompt": "blurry",
            "size": "32x32", "num_inference_steps": 2,
            "guidance_scale": 4.0, "seed": 11,
        }))
        assert resp.status == 200, png
        assert png.startswith(b"\x89PNG")
        assert resp.headers["X-Seed"] == "11"
        # determinism through REST on the CFG path
        resp2, png2 = loop.run_until_complete(gen({
            "prompt": "a castle", "negative_prompt": "blurry",
            "size": "32x32", "num_inference_steps": 2,
            "guidance_scale": 4.0, "seed": 11,
        }))
        assert png == png2
    finally:
        loop.run_until_complete(cl.close())
        pool.shutdown(drain=False, timeout=1)
        loop.close()


def test_legacy_pipelined_matches_direct(shared_pipe):
    """The legacy loop's dispatch-then-settle path returns byte-identical
    results to a direct (blocking) run_job."""
    from dreamlab_tpu.engine.base import GenSpec
    from dreamlab_tpu.engine.tpu_worker import TPUPipelineWorker
    from dreamlab_tpu.serving.legacy_service import PipelineService

    spec = GenSpec(prompt="pipeline me", size="32x32",
                   num_inference_steps=2, seed=21)
    want = TPUPipelineWorker(shared_pipe, 0).run_job(spec)

    svc = PipelineService(lambda i: TPUPipelineWorker(shared_pipe, i),
                          num_workers=1, queue_max=8)
    try:
        futs = [svc.submit(GenSpec(prompt="pipeline me", size="32x32",
                                   num_inference_steps=2, seed=21))
                for _ in range(3)]
        for f in futs:
            assert f.result(timeout=60) == want
    finally:
        svc.shutdown()


def test_models_load_unload_with_cache(tmp_path, shared_pipe, monkeypatch):
    """With DREAMLAB_MODE_CACHE>1 the reserved /api/models/load|unload
    endpoints become real (warm a mode / evict a warm mode); with the
    default cache size they stay 501 like the reference."""
    import json as _json

    monkeypatch.setenv("DREAMLAB_MODE_CACHE", "2")
    cfgfile = write_modes_yaml(tmp_path / "modes.yaml", modes=("alpha", "beta"))
    mode_config = ModeConfigManager(str(cfgfile))
    registry = ModelRegistry(total_hbm_bytes=16 << 30)
    pool = WorkerPool(
        queue_max=8,
        worker_factory=lambda i, p: TPUPipelineWorker(shared_pipe, i),
        mode_config=mode_config, registry=registry,
    )
    app = create_app(
        ServerConfig(default_size="32x32", default_steps=2),
        pool=pool, storage=InMemoryStorageProvider(),
        mode_config=mode_config, registry=registry, skip_startup=True,
    )
    loop = asyncio.new_event_loop()
    cl = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(cl.start_server())

    def call(method, path, **kw):
        async def go():
            resp = await cl.request(method, path, **kw)
            return resp.status, _json.loads(await resp.read())
        return loop.run_until_complete(go())

    try:
        status, body = call("POST", "/api/models/load", json={"mode": "beta"})
        assert status == 200 and body["status"] == "loaded"
        assert pool.get_status()["warm_modes"] == ["beta"]
        # idempotent-ish: already resident
        status, body = call("POST", "/api/models/load", json={"mode": "beta"})
        assert status == 200 and body["status"] == "already_resident"
        # cannot unload the active mode
        status, _ = call("POST", "/api/models/unload", json={"mode": "alpha"})
        assert status == 409
        status, body = call("POST", "/api/models/unload", json={"mode": "beta"})
        assert status == 200 and body["status"] == "unloaded"
        assert pool.get_status()["warm_modes"] == []
        status, _ = call("POST", "/api/models/unload", json={"mode": "beta"})
        assert status == 404
        status, _ = call("POST", "/api/models/load", json={"mode": "nope"})
        assert status == 404
    finally:
        loop.run_until_complete(cl.close())
        pool.shutdown(drain=False, timeout=1)
        loop.close()


def test_models_load_unload_501_without_cache(client):
    """Default cache size keeps the reference's reserved-501 contract."""
    resp, _ = client("POST", "/api/models/load", json={"mode": "alpha"})
    assert resp.status == 501
    resp, _ = client("POST", "/api/models/unload", json={"mode": "alpha"})
    assert resp.status == 501
