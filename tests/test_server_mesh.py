"""Multi-chip serving: DREAMLAB_MESH drives the full REST path over a
(data, model) mesh — on the 8-virtual-CPU-device test backend, exactly the
layout the driver's dryrun validates.

Covers: mesh-spec parsing, the app wiring (ServerConfig.mesh_spec →
mesh-aware worker factory), batch-1 requests on a data>1 mesh (inputs
replicate when the batch doesn't divide), and determinism vs a meshless
pipeline.
"""

import asyncio
import json

import numpy as np
import pytest
import yaml
from aiohttp.test_utils import TestClient, TestServer

from dreamlab_tpu.parallel.sharding import parse_mesh_spec
from tests.test_loader import make_tiny_checkpoint


def test_parse_mesh_spec():
    assert parse_mesh_spec("data=8") == {"data": 8, "model": 1}
    assert parse_mesh_spec("data=4,model=2") == {"data": 4, "model": 2}
    assert parse_mesh_spec("model=2") == {"data": 1, "model": 2}
    with pytest.raises(ValueError):
        parse_mesh_spec("rows=4")
    with pytest.raises(ValueError):
        parse_mesh_spec("data=0")


def test_server_generates_over_mesh(tmp_path, monkeypatch):
    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    cfg_path = tmp_path / "modes.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "model_root": str(tmp_path),
        "default_mode": "tiny",
        "modes": {"tiny": {"model": "ckpt"}},
    }))
    monkeypatch.setenv("WARMUP", "0")

    from dreamlab_tpu.serving.app import ServerConfig, create_app

    app = create_app(
        ServerConfig(
            modes_config=str(cfg_path), mesh_spec="data=4",
            default_size="32x32", default_steps=2,
        ),
    )
    loop = asyncio.new_event_loop()
    cl = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(cl.start_server())
    try:
        async def gen(seed):
            resp = await cl.post("/generate", json={
                "prompt": "a cat", "size": "32x32",
                "num_inference_steps": 2, "seed": seed,
            })
            assert resp.status == 200, await resp.text()
            return await resp.read(), resp.headers["X-Seed"]

        png, seed_hdr = loop.run_until_complete(gen(7))
        assert png.startswith(b"\x89PNG")
        assert seed_hdr == "7"
        # deterministic across repeats on the mesh
        png2, _ = loop.run_until_complete(gen(7))
        assert png == png2
    finally:
        loop.run_until_complete(cl.close())
        loop.close()


def test_mesh_output_matches_meshless(tmp_path):
    """The mesh is an annotation, not a semantic change: same checkpoint,
    same seed → same latents with and without a (data=4) mesh, even at
    batch 1 (replicated fallback) and batch 4 (sharded path)."""
    import jax.numpy as jnp

    from dreamlab_tpu.loader import load_pipeline
    from dreamlab_tpu.parallel.sharding import make_mesh
    from dreamlab_tpu.pipeline import LCMPipeline

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    bundle = load_pipeline(ckpt)
    solo = LCMPipeline(bundle, dtype=jnp.float32)
    meshed = LCMPipeline(load_pipeline(ckpt), dtype=jnp.float32,
                         mesh=make_mesh(4))

    for batch in (1, 4):
        kw = dict(height=32, width=32, num_inference_steps=2, seed=3,
                  batch=batch)
        a = solo.generate("t", **kw)
        b = meshed.generate("t", **kw)
        np.testing.assert_allclose(a.latents, b.latents, rtol=1e-4, atol=1e-4)


def test_app_preloads_modes_in_background(tmp_path, monkeypatch):
    """DREAMLAB_PRELOAD_MODES wiring: the second mode lands in the warm
    cache shortly after startup without blocking the server."""
    import time

    monkeypatch.setenv("WARMUP", "0")
    monkeypatch.setenv("DREAMLAB_MODE_CACHE", "2")
    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    cfg_path = tmp_path / "modes.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "model_root": str(tmp_path),
        "default_mode": "tiny",
        "modes": {"tiny": {"model": "ckpt"}, "tiny2": {"model": "ckpt"}},
    }))

    from dreamlab_tpu.serving.app import STATE_KEY, ServerConfig, create_app

    app = create_app(ServerConfig(
        modes_config=str(cfg_path), preload_modes="tiny2",
        default_size="32x32", default_steps=2,
    ))
    loop = asyncio.new_event_loop()
    cl = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(cl.start_server())  # startup hooks build the pool
    try:
        state = app[STATE_KEY]
        deadline = time.time() + 60
        while time.time() < deadline:
            if state.pool.get_status()["warm_modes"] == ["tiny2"]:
                break
            time.sleep(0.2)
        assert state.pool.get_status()["warm_modes"] == ["tiny2"]
        assert state.pool.current_mode == "tiny"
    finally:
        loop.run_until_complete(cl.close())
        loop.close()
