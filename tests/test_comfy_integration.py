"""ComfyUI delegation against an in-process fake ComfyUI server (HTTP only —
the client's WS failure path falls back to history polling, which this
exercises), plus the /v1/comfy/jobs route end-to-end."""

import asyncio
import json
import threading
import time

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from dreamlab_tpu.invokers.comfy_client import ComfyUIInvoker


class FakeComfy:
    """Minimal ComfyUI API: upload, prompt, history."""

    def __init__(self):
        self.uploads = {}
        self.prompts = {}
        self.app = web.Application()
        self.app.router.add_post("/upload/image", self.upload)
        self.app.router.add_post("/prompt", self.prompt)
        self.app.router.add_get("/history/{pid}", self.history)
        self.app.router.add_get("/view", self.view)

    async def upload(self, request):
        post = await request.post()
        f = post["image"]
        self.uploads[f.filename] = f.file.read()
        return web.json_response({"name": f.filename})

    async def prompt(self, request):
        body = await request.json()
        pid = f"pid-{len(self.prompts)}"
        self.prompts[pid] = body["prompt"]
        return web.json_response({"prompt_id": pid})

    async def history(self, request):
        pid = request.match_info["pid"]
        if pid not in self.prompts:
            return web.json_response({})
        return web.json_response({
            pid: {
                "outputs": {
                    "9": {"images": [{"filename": "out.png",
                                      "subfolder": "", "type": "output"}]}
                }
            }
        })

    async def view(self, request):
        return web.Response(body=b"\x89PNG fake", content_type="image/png")


@pytest.fixture()
def fake_comfy_url():
    srv = FakeComfy()
    loop = asyncio.new_event_loop()
    runner = web.AppRunner(srv.app)
    loop.run_until_complete(runner.setup())
    site = web.TCPSite(runner, "127.0.0.1", 0)
    loop.run_until_complete(site.start())
    port = site._server.sockets[0].getsockname()[1]

    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", srv
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=2)


def test_invoker_end_to_end(fake_comfy_url):
    url, srv = fake_comfy_url
    inv = ComfyUIInvoker(url, timeout=5)
    name = inv.upload_image(b"\x89PNGdata", "test.png")
    assert name == "test.png"
    assert srv.uploads["test.png"] == b"\x89PNGdata"

    graph = {"1": {"class_type": "KSampler", "inputs": {"steps": 4}}}
    result = inv.run(graph, timeout=10)
    assert result.prompt_id in srv.prompts
    assert srv.prompts[result.prompt_id] == graph
    assert len(result.outputs) == 1
    assert result.outputs[0].filename == "out.png"
    assert inv.fetch_image(result.outputs[0]).startswith(b"\x89PNG")


def test_comfy_routes_end_to_end(fake_comfy_url, tmp_path, monkeypatch):
    url, srv = fake_comfy_url
    monkeypatch.setenv("COMFYUI_URL", url)
    monkeypatch.setenv("COMFY_WORKFLOWS_DIR", str(tmp_path))
    (tmp_path / "basic.json").write_text(json.dumps({
        "1": {"class_type": "LoadImage", "inputs": {"image": "x.png"}},
        "2": {"class_type": "KSampler",
              "inputs": {"steps": 20, "cfg": 7.0, "seed": 1, "denoise": 1.0}},
    }))

    from dreamlab_tpu.invokers.jobs import jobs_clear
    from dreamlab_tpu.serving.app import ServerConfig, create_app

    jobs_clear()
    app = create_app(
        ServerConfig(comfy_enabled=True), skip_startup=True
    )
    loop = asyncio.new_event_loop()
    cl = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(cl.start_server())
    try:
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("workflowId", "basic")
        form.add_field("params", json.dumps({"steps": 2, "seed": 9}))
        form.add_field("profile", "subtle-refine")
        form.add_field("image", b"\x89imgdata", filename="up.png",
                       content_type="image/png")

        async def submit():
            resp = await cl.post("/v1/comfy/jobs", data=form)
            return resp.status, await resp.json()

        status, data = loop.run_until_complete(submit())
        assert status == 200
        job_id = data["jobId"]

        # poll until the background thread finishes against the fake server
        deadline = time.time() + 10
        final = None
        while time.time() < deadline:
            async def poll():
                resp = await cl.get(f"/v1/comfy/jobs/{job_id}")
                return await resp.json()

            final = loop.run_until_complete(poll())
            if final["status"] in ("done", "error"):
                break
            time.sleep(0.1)
        assert final["status"] == "done", final
        assert final["outputs"][0]["filename"] == "out.png"
        assert final["progress"]["fraction"] == 1.0
        # profile defaults merged under explicit params
        sent = list(srv.prompts.values())[-1]
        assert sent["2"]["inputs"]["steps"] == 2  # explicit wins
        assert sent["2"]["inputs"]["denoise"] == 0.35  # from profile
        assert sent["1"]["inputs"]["image"] == f"{job_id}.png"

        async def missing():
            resp = await cl.get("/v1/comfy/jobs/nope")
            return resp.status

        assert loop.run_until_complete(missing()) == 404
    finally:
        loop.run_until_complete(cl.close())
        loop.close()


# ---------------------------------------------------------------------------
# WS node-progress tier (round-1 VERDICT #9): fake ComfyUI emits 'executing'
# events; assert per-node progress, the 0.95 cap, heartbeat refreshes, and
# the reaper's stale/hard transitions.
# ---------------------------------------------------------------------------


class FakeComfyWS(FakeComfy):
    """FakeComfy + a /ws endpoint that streams node events for the last
    submitted prompt: noise events first (wrong type / wrong prompt), then
    one 'executing' per node, then the terminal node=None."""

    def __init__(self):
        super().__init__()
        self.app.router.add_get("/ws", self.ws)

    async def ws(self, request):
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        for _ in range(50):  # wait for the prompt submission
            if self.prompts:
                break
            await asyncio.sleep(0.05)
        pid = sorted(self.prompts)[-1]
        graph = self.prompts[pid]
        await ws.send_str(json.dumps({"type": "status", "data": {}}))
        await ws.send_str(json.dumps({
            "type": "executing", "data": {"prompt_id": "other", "node": "99"},
        }))
        for node in graph:
            await ws.send_str(json.dumps({
                "type": "executing", "data": {"prompt_id": pid, "node": node},
            }))
        await ws.send_str(json.dumps({
            "type": "executing", "data": {"prompt_id": pid, "node": None},
        }))
        await ws.close()
        return ws


@pytest.fixture()
def fake_comfy_ws_url():
    srv = FakeComfyWS()
    loop = asyncio.new_event_loop()
    runner = web.AppRunner(srv.app)
    loop.run_until_complete(runner.setup())
    site = web.TCPSite(runner, "127.0.0.1", 0)
    loop.run_until_complete(site.start())
    port = site._server.sockets[0].getsockname()[1]
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", srv
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=2)


def test_invoker_ws_node_progress(fake_comfy_ws_url):
    url, srv = fake_comfy_ws_url
    inv = ComfyUIInvoker(url, timeout=5)
    graph = {
        "1": {"class_type": "LoadImage", "inputs": {}},
        "2": {"class_type": "KSampler", "inputs": {}},
        "3": {"class_type": "SaveImage", "inputs": {}},
    }
    events = []
    result = inv.run(graph, on_node=events.append, timeout=10)
    # wrong-prompt and non-executing events filtered; ours in order + terminal
    assert events == ["1", "2", "3", None]
    assert result.outputs[0].filename == "out.png"


def test_route_progress_cap_and_heartbeat(monkeypatch, tmp_path):
    """Drive comfy_routes._run_job with a scripted invoker: fractions climb
    per node, cap at 0.95 on the terminal event, reach 1.0 only at done;
    every node event refreshes the heartbeat (reaper contract)."""
    import dreamlab_tpu.serving.comfy_routes as cr
    from dreamlab_tpu.invokers.comfy_client import ComfyFileRef, ComfyInvokeResult
    from dreamlab_tpu.invokers.jobs import jobs_clear, jobs_get, jobs_put, _JOBS

    monkeypatch.setenv("COMFY_WORKFLOWS_DIR", str(tmp_path))
    (tmp_path / "one.json").write_text(json.dumps({
        "1": {"class_type": "KSampler", "inputs": {"steps": 4}},
    }))
    jobs_clear()
    job_id = "jid1"
    jobs_put(job_id, {"status": "pending", "progress": {"fraction": 0.0}})

    observed = {"fractions": [], "heartbeats": []}

    class ScriptedInvoker:
        def run(self, graph, on_node=None, timeout=900.0):
            # age the heartbeat, then prove each node event refreshes it
            _JOBS[job_id]["heartbeat_at"] = 0.0
            on_node("1")  # 1/1 nodes → capped to 0.95
            observed["fractions"].append(jobs_get(job_id)["progress"]["fraction"])
            observed["heartbeats"].append(jobs_get(job_id)["heartbeat_at"])
            on_node(None)  # terminal event: still capped until done
            observed["fractions"].append(jobs_get(job_id)["progress"]["fraction"])
            return ComfyInvokeResult("pid-x", [ComfyFileRef("out.png")])

    monkeypatch.setattr(cr, "_invoker", lambda: ScriptedInvoker())
    cr._run_job(job_id, "one", {}, None)

    assert observed["fractions"] == [0.95, 0.95]
    assert observed["heartbeats"][0] > 0.0, "node event must refresh heartbeat"
    final = jobs_get(job_id)
    assert final["status"] == "done"
    assert final["progress"]["fraction"] == 1.0


def test_reaper_stale_and_hard_transitions():
    """Running job with a stalled heartbeat → stale error at 60 s; ancient
    created_at → hard timeout at 15 min; fresh jobs untouched
    (reference startup_hooks.py:9-25 + comfy_routes.py:212-214)."""
    import time as _time

    from dreamlab_tpu.invokers import jobs as J

    J.jobs_clear()
    now = _time.time()
    J.jobs_put("fresh", {"status": "running"})
    J.jobs_put("stalled", {"status": "running"})
    J._JOBS["stalled"]["heartbeat_at"] = now - J.STALE_AFTER_S - 1
    J.jobs_put("ancient", {"status": "pending"})
    J._JOBS["ancient"]["created_at"] = now - J.HARD_TIMEOUT_S - 1
    J.jobs_put("finished", {"status": "done"})
    J._JOBS["finished"]["heartbeat_at"] = 0.0

    assert J.reap_stale_jobs() == 2
    assert J.jobs_get("fresh")["status"] == "running"
    assert J.jobs_get("stalled")["status"] == "error"
    assert "stale" in J.jobs_get("stalled")["error"]
    assert J.jobs_get("ancient")["status"] == "error"
    assert "hard timeout" in J.jobs_get("ancient")["error"]
    assert J.jobs_get("finished")["status"] == "done"

    # heartbeat refresh rescues a previously-stalled job
    J.jobs_put("rescued", {"status": "running"})
    J._JOBS["rescued"]["heartbeat_at"] = now - J.STALE_AFTER_S - 1
    J.jobs_update_path("rescued", "progress.node", "5")  # WS event analogue
    assert J.reap_stale_jobs() == 0
    assert J.jobs_get("rescued")["status"] == "running"


def test_comfy_view_proxy(fake_comfy_url, monkeypatch):
    """/v1/comfy/view proxies output images from ComfyUI (the browser never
    needs direct reach to the ComfyUI instance)."""
    url, srv = fake_comfy_url
    monkeypatch.setenv("COMFYUI_URL", url)
    from dreamlab_tpu.serving.app import ServerConfig, create_app

    app = create_app(ServerConfig(comfy_enabled=True), skip_startup=True)
    loop = asyncio.new_event_loop()
    cl = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(cl.start_server())
    try:
        async def fetch(path):
            resp = await cl.get(path)
            return resp.status, await resp.read()

        status, body = loop.run_until_complete(
            fetch("/v1/comfy/view?filename=out.png&type=output")
        )
        assert status == 200
        assert body.startswith(b"\x89PNG")
        status, _ = loop.run_until_complete(fetch("/v1/comfy/view"))
        assert status == 400
    finally:
        loop.run_until_complete(cl.close())
        loop.close()
