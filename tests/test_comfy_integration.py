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
