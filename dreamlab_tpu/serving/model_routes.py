"""Model management API: /api/* routes.

Contract port of /root/reference/server/model_routes.py:40-228:
``/api/models/status``, ``/api/modes``, ``/api/modes/switch`` (queued),
``/api/modes/reload``, ``/api/vram`` (HBM here, same schema), and the
reserved 501 stubs ``/api/models/load`` / ``/api/models/unload``.
"""

from __future__ import annotations

import asyncio
import json
import logging

from aiohttp import web

logger = logging.getLogger(__name__)


def _state(request: web.Request):
    from .app import STATE_KEY

    return request.app[STATE_KEY]


def _require_mode_system(state):
    if state.pool is None or state.mode_config is None:
        raise web.HTTPServiceUnavailable(
            text=json.dumps({"detail": "mode system not enabled"}),
            content_type="application/json",
        )


async def models_status(request: web.Request) -> web.Response:
    state = _state(request)
    registry = state.registry
    if registry is None:
        from ..engine.model_registry import get_model_registry

        registry = get_model_registry()
    payload = {
        "backend": state.backend,
        "current_mode": state.pool.current_mode if state.pool else None,
        "queue": state.pool.get_status() if state.pool else None,
        "memory": registry.get_hbm_stats(),
    }
    return web.json_response(payload)


async def list_modes(request: web.Request) -> web.Response:
    state = _state(request)
    _require_mode_system(state)
    d = state.mode_config.to_dict()
    d["current_mode"] = state.pool.current_mode
    d["warm_modes"] = state.pool.get_status().get("warm_modes", [])
    return web.json_response(d)


async def switch_mode(request: web.Request) -> web.Response:
    state = _state(request)
    _require_mode_system(state)
    body = await request.json()
    mode = body.get("mode")
    if not mode:
        raise web.HTTPBadRequest(
            text=json.dumps({"detail": "field 'mode' required"}),
            content_type="application/json",
        )
    if not state.mode_config.has_mode(mode):
        raise web.HTTPNotFound(
            text=json.dumps({"detail": f"unknown mode {mode!r}"}),
            content_type="application/json",
        )
    fut = state.pool.switch_mode(mode)
    wait = float(body.get("wait_seconds", 0) or 0)
    if wait > 0:
        # shield: a wait timeout / client disconnect must NOT cancel the
        # queued switch — it still applies, exactly like wait_seconds=0
        await asyncio.wait_for(
            asyncio.shield(asyncio.wrap_future(fut)), timeout=wait
        )
        return web.json_response({"status": "switched", "mode": mode})
    return web.json_response({"status": "queued", "mode": mode})


async def reload_modes(request: web.Request) -> web.Response:
    state = _state(request)
    _require_mode_system(state)
    state.mode_config.reload()
    return web.json_response({
        "status": "reloaded",
        "modes": state.mode_config.mode_names(),
    })


async def hbm_stats(request: web.Request) -> web.Response:
    state = _state(request)
    registry = state.registry
    if registry is None:
        from ..engine.model_registry import get_model_registry

        registry = get_model_registry()
    return web.json_response(registry.get_hbm_stats())


async def list_styles(request: web.Request) -> web.Response:
    """Style LoRA registry for UI population (registry itself is
    server-side — engine/styles.py over styles.yaml)."""
    from ..engine.styles import get_style_registry

    return web.json_response({
        "styles": [
            {
                "name": s.name,
                "levels": len(s.strengths),
                "required_cross_attention_dim": s.required_cross_attention_dim,
            }
            for s in get_style_registry().values()
        ]
    })


async def load_model(request: web.Request) -> web.Response:
    """POST /api/models/load {mode}: warm a mode into the HBM cache.

    The reference reserves this endpoint as 501 (model_routes.py:209-228);
    here it becomes real exactly when the capability exists
    (DREAMLAB_MODE_CACHE > 1) and stays 501-compatible otherwise."""
    state = _state(request)
    if (
        state.pool is None
        or state.mode_config is None
        or state.pool.mode_cache_size <= 1
    ):
        # reference contract: reserved endpoints stay 501 (also for the
        # legacy backend, where the reference returned 501, not 503)
        return await not_implemented(request)
    body = await request.json()
    mode = body.get("mode")
    if not mode:
        raise web.HTTPBadRequest(
            text=json.dumps({"detail": "field 'mode' required"}),
            content_type="application/json",
        )
    if not state.mode_config.has_mode(mode):
        raise web.HTTPNotFound(
            text=json.dumps({"detail": f"unknown mode {mode!r}"}),
            content_type="application/json",
        )
    loaded = await asyncio.get_running_loop().run_in_executor(
        None, state.pool.preload_modes, [mode]
    )
    already = (
        mode == state.pool.current_mode
        or mode in state.pool.get_status()["warm_modes"]
    )
    if not loaded and not already:
        return web.json_response(
            {"detail": f"could not load {mode!r} (cache full or HBM tight)"},
            status=409,
        )
    return web.json_response({
        "status": "loaded" if loaded else "already_resident", "mode": mode,
    })


async def unload_model(request: web.Request) -> web.Response:
    """POST /api/models/unload {mode}: evict a warm (non-active) mode."""
    state = _state(request)
    if (
        state.pool is None
        or state.mode_config is None
        or state.pool.mode_cache_size <= 1
    ):
        return await not_implemented(request)
    body = await request.json()
    mode = body.get("mode")
    if not mode:
        raise web.HTTPBadRequest(
            text=json.dumps({"detail": "field 'mode' required"}),
            content_type="application/json",
        )
    if mode == state.pool.current_mode:
        return web.json_response(
            {"detail": f"mode {mode!r} is active; switch away first"},
            status=409,
        )
    try:
        evicted = await asyncio.get_running_loop().run_in_executor(
            None, state.pool.evict_mode, mode
        )
    except ValueError as e:
        return web.json_response({"detail": str(e)}, status=409)
    if not evicted:
        raise web.HTTPNotFound(
            text=json.dumps({"detail": f"mode {mode!r} is not resident"}),
            content_type="application/json",
        )
    return web.json_response({"status": "unloaded", "mode": mode})


async def not_implemented(request: web.Request) -> web.Response:
    # reserved endpoints (reference model_routes.py:183-228)
    return web.json_response(
        {"detail": "not implemented; use /api/modes/switch"}, status=501
    )


# ---------------------------------------------------------------------------
# on-device profiling (TPU-native observability — the reference's per-stage
# wall-clock prints, SURVEY §5.1, plus a real XLA trace for tensorboard)
# ---------------------------------------------------------------------------

_PROFILE = {"dir": None}


async def profiler_start(request: web.Request) -> web.Response:
    import os
    import tempfile
    import time as _time

    import jax

    # parse the body BEFORE the running-check: no await between check and
    # set, so two concurrent starts cannot both pass the guard
    try:
        body = await request.json()
    except Exception:
        body = {}
    if _PROFILE["dir"] is not None:
        return web.json_response(
            {"detail": f"trace already running: {_PROFILE['dir']}"}, status=409
        )
    trace_dir = body.get("dir") or os.path.join(
        tempfile.gettempdir(), f"dreamlab-trace-{int(_time.time())}"
    )
    try:
        jax.profiler.start_trace(trace_dir)
    except Exception as e:
        return web.json_response(
            {"detail": f"start_trace failed: {e}"}, status=500
        )
    _PROFILE["dir"] = trace_dir
    return web.json_response({"status": "tracing", "dir": trace_dir})


async def profiler_stop(request: web.Request) -> web.Response:
    import jax

    if _PROFILE["dir"] is None:
        return web.json_response({"detail": "no trace running"}, status=409)
    try:
        jax.profiler.stop_trace()
    except Exception as e:
        # keep the running marker: the JAX trace may still be active and a
        # retry (or a fixed trace dir) must remain possible
        return web.json_response(
            {"detail": f"stop_trace failed: {e}"}, status=500
        )
    trace_dir, _PROFILE["dir"] = _PROFILE["dir"], None
    return web.json_response({"status": "stopped", "dir": trace_dir})


def register_model_routes(app: web.Application):
    app.router.add_get("/api/models/status", models_status)
    app.router.add_get("/api/modes", list_modes)
    app.router.add_post("/api/modes/switch", switch_mode)
    app.router.add_post("/api/modes/reload", reload_modes)
    app.router.add_get("/api/vram", hbm_stats)  # name kept for compat
    app.router.add_get("/api/hbm", hbm_stats)
    app.router.add_post("/api/models/load", load_model)
    app.router.add_post("/api/models/unload", unload_model)
    app.router.add_get("/api/styles", list_styles)
    app.router.add_post("/api/profiler/start", profiler_start)
    app.router.add_post("/api/profiler/stop", profiler_stop)
