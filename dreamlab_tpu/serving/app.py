"""REST server (aiohttp): the reference's public API surface, TPU execution.

Route-for-route port of /root/reference/server/lcm_sr_server.py's contracts
(SURVEY.md Appendix A): ``/generate``, ``/superres``, ``/v1/superres``,
``/health``, ``/storage/*``, plus ``/api/*`` (model_routes), ``/sdapi/v1/*``
and ``/v1/images/generations`` (compat_endpoints), ``/v1/comfy/jobs``
(comfy_routes) and ``/dreams/*`` (yume). Responses carry the same
``X-Seed`` / ``X-Mode`` / ``X-SuperRes`` / ``X-SR-*`` / ``X-LCM-Image-Key``
metadata headers (lcm_sr_server.py:838-865).

Two serving paths coexist, as in the reference (lcm_sr_server.py:541-595):
the **mode system** (WorkerPool + modes.yaml + registry + file watcher +
SIGHUP) and the **legacy** env-configured ``PipelineService``.

Built on aiohttp (FastAPI/uvicorn are not in this image); handlers stay
contract-identical.
"""

from __future__ import annotations

import asyncio
import base64
import json
import logging
import os
import signal
import uuid
from dataclasses import dataclass, field
from typing import Optional

from aiohttp import web

from pydantic import ValidationError

from ..engine.base import GenSpec
from ..engine.worker_pool import GenerationJob, QueueFullError
from .request_logger import make_request_logger_middleware
from .schemas import GenerateRequest

logger = logging.getLogger(__name__)

STATE_KEY = web.AppKey("dreamlab_state", object)


@dataclass
class ServerConfig:
    """Env-derived settings (names from reference lcm_sr_server.py:505-520)."""

    modes_config: Optional[str] = None
    model_path: Optional[str] = None
    num_workers: int = 1
    queue_max: int = 64
    port: int = 8000
    default_size: str = "512x512"
    default_steps: int = 4
    default_guidance: float = 1.0
    request_timeout: float = 120.0
    sr_model_path: Optional[str] = None
    sr_num_workers: int = 1
    sr_queue_max: int = 32
    sr_timeout: float = 120.0
    sr_max_pixels: Optional[int] = None
    ui_dist: Optional[str] = None
    yume_enabled: bool = False
    comfy_enabled: bool = False
    warmup: bool = True
    # multi-chip layout, e.g. "data=8" or "data=4,model=2" (DREAMLAB_MESH):
    # batch DP over the data axis, Megatron-style TP over the model axis
    mesh_spec: Optional[str] = None
    # modes to pre-warm into the cache at startup (DREAMLAB_PRELOAD_MODES:
    # comma list or "all"); needs DREAMLAB_MODE_CACHE > 1
    preload_modes: Optional[str] = None

    @classmethod
    def from_env(cls) -> "ServerConfig":
        env = os.environ

        def get(name, default, cast=str):
            v = env.get(name)
            return cast(v) if v not in (None, "") else default

        model_root = env.get("MODEL_ROOT", "")
        model = env.get("MODEL", "")
        model_path = os.path.join(model_root, model) if model else (model_root or None)
        modes = env.get("MODES_CONFIG") or (
            "modes.yaml" if os.path.exists("modes.yaml") else None
        )
        ui_dist = env.get("UI_DIST")
        if not ui_dist:
            candidate = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), "ui", "dist",
            )
            ui_dist = candidate if os.path.isdir(candidate) else None
        return cls(
            modes_config=modes,
            model_path=model_path,
            num_workers=get("NUM_WORKERS", 1, int),
            queue_max=get("QUEUE_MAX", 64, int),
            port=get("PORT", 8000, int),
            default_size=get("DEFAULT_SIZE", "512x512"),
            default_steps=get("DEFAULT_STEPS", 4, int),
            default_guidance=get("DEFAULT_GUIDANCE", 1.0, float),
            request_timeout=get("DEFAULT_TIMEOUT", 120.0, float),
            sr_model_path=env.get("SR_MODEL_PATH"),
            sr_num_workers=get("SR_NUM_WORKERS", 1, int),
            sr_queue_max=get("SR_QUEUE_MAX", 32, int),
            sr_timeout=get("SR_TIMEOUT", 120.0, float),
            sr_max_pixels=get("SR_MAX_PIXELS", None, int),
            ui_dist=ui_dist,
            yume_enabled=env.get("YUME_ENABLED", "0") in ("1", "true", "True"),
            comfy_enabled=env.get("COMFYUI_ENABLED", "0") in ("1", "true", "True"),
            warmup=env.get("WARMUP", "1") not in ("0", "false", "False"),
            mesh_spec=env.get("DREAMLAB_MESH") or None,
            preload_modes=env.get("DREAMLAB_PRELOAD_MODES") or None,
        )


@dataclass
class ServerState:
    config: ServerConfig
    pool: Optional[object] = None  # WorkerPool (mode system)
    legacy: Optional[object] = None  # PipelineService
    sr: Optional[object] = None  # SuperResService
    storage: Optional[object] = None
    mode_config: Optional[object] = None
    registry: Optional[object] = None
    watcher: Optional[object] = None
    dream_worker: Optional[object] = None
    extra: dict = field(default_factory=dict)

    @property
    def backend(self) -> str:
        return "mode" if self.pool is not None else "legacy"


# ---------------------------------------------------------------------------
# middlewares
# ---------------------------------------------------------------------------


@web.middleware
async def cors_middleware(request: web.Request, handler):
    if request.method == "OPTIONS":
        resp = web.Response(status=204)
    else:
        resp = await handler(request)
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Methods"] = "GET, POST, PUT, DELETE, OPTIONS"
    resp.headers["Access-Control-Allow-Headers"] = "Content-Type, Authorization"
    resp.headers["Access-Control-Expose-Headers"] = "*"
    return resp


@web.middleware
async def error_middleware(request: web.Request, handler):
    try:
        return await handler(request)
    except web.HTTPException:
        raise
    except asyncio.TimeoutError:
        return web.json_response({"detail": "request timed out"}, status=504)
    except QueueFullError as e:
        return web.json_response({"detail": str(e)}, status=429)
    except ValidationError as e:
        return web.json_response({"detail": json.loads(e.json())}, status=422)
    except ValueError as e:
        return web.json_response({"detail": str(e)}, status=400)
    except Exception:
        logger.exception("unhandled error on %s %s", request.method, request.path)
        return web.json_response({"detail": "internal server error"}, status=500)


# ---------------------------------------------------------------------------
# core handlers
# ---------------------------------------------------------------------------


async def _await_future(fut, timeout: float):
    """Await a concurrent Future; a client disconnect cancels it so a
    still-queued job is skipped instead of burning device time (the pool
    checks set_running_or_notify_cancel before executing)."""
    try:
        return await asyncio.wait_for(asyncio.wrap_future(fut), timeout=timeout)
    except (asyncio.CancelledError, asyncio.TimeoutError):
        fut.cancel()  # no-op once running; drops jobs still in the queue
        raise


def _decode_hint_image(data: bytes, size: str):
    """Hint bytes → RGB uint8 array resized to the output size (the
    reference's prepare_controlnet_cond contract expects the hint at output
    resolution, rknnlcm.py:693-697 — the server is the 'upstream' that
    resizes)."""
    import io

    import numpy as np
    from PIL import Image as PILImage

    from ..engine.base import parse_size

    width, height = parse_size(size)
    img = PILImage.open(io.BytesIO(data)).convert("RGB")
    if img.size != (width, height):
        img = img.resize((width, height), PILImage.LANCZOS)
    return np.asarray(img)


def _spec_from_request(req: GenerateRequest, state: ServerState) -> GenSpec:
    control = None
    if req.control_image:
        b64 = req.control_image
        if b64.startswith("data:"):  # data URL → strip the header
            b64 = b64.split(",", 1)[-1]
        try:
            raw = base64.b64decode(b64, validate=True)
        except Exception as e:
            raise ValueError(f"control_image is not valid base64: {e}") from e
        control = _decode_hint_image(raw, req.size)
    return GenSpec(
        prompt=req.prompt,
        size=req.size,
        num_inference_steps=req.num_inference_steps,
        guidance_scale=req.guidance_scale,
        seed=req.seed,
        negative_prompt=req.negative_prompt,
        style=req.style_lora.style if req.style_lora else None,
        style_level=req.style_lora.level if req.style_lora else 0,
        aesthetic_score=(
            req.aesthetic_score if req.aesthetic_score is not None else 6.0
        ),
        control_image=control,
        controlnet_scale=req.controlnet_scale,
    )


def _apply_mode_defaults(req: GenerateRequest, mode) -> None:
    """Fill unset fields from the mode's defaults (lcm_sr_server.py:754-765).

    ``set_fields`` holds the names the CLIENT provided — a field absent from
    it fell back to the schema default and may be overridden by the mode."""
    set_fields = req.model_fields_set
    if "size" not in set_fields and mode.default_size():
        req.size = mode.default_size()
    if "num_inference_steps" not in set_fields and mode.default_steps():
        req.num_inference_steps = int(mode.default_steps())
    if "guidance_scale" not in set_fields and mode.default_guidance() is not None:
        req.guidance_scale = float(mode.default_guidance())


async def run_generate(state: ServerState, req: GenerateRequest,
                       progress_cb=None):
    """Shared generation flow → (image_bytes, headers dict)."""
    cfg = state.config

    tenant_mode = None
    if req.mode is not None:
        if state.pool is None:
            raise web.HTTPBadRequest(
                text=json.dumps({"detail": "mode system not enabled"}),
                content_type="application/json",
            )
        if not state.mode_config.has_mode(req.mode):
            raise web.HTTPNotFound(
                text=json.dumps({"detail": f"unknown mode {req.mode!r}"}),
                content_type="application/json",
            )
        if getattr(state.pool, "multi_tenant", False):
            # DREAMLAB_MODE_CACHE > 1: serve from the mode's warm resident
            # worker — the active mode (and every other client's traffic)
            # is untouched. Pin the mode even when it equals the active one
            # RIGHT NOW: a queued switch ahead of this job would otherwise
            # silently re-route it to the new active model.
            tenant_mode = req.mode
        elif state.pool.current_mode != req.mode:
            fut = state.pool.switch_mode(req.mode)
            await _await_future(fut, timeout=30.0)

    if state.pool is not None and state.mode_config is not None:
        served = tenant_mode or state.pool.current_mode
        if served and state.mode_config.has_mode(served):
            _apply_mode_defaults(req, state.mode_config.get_mode(served))

    spec = _spec_from_request(req, state)
    spec.mode = tenant_mode
    if progress_cb is not None:
        spec.progress_cb = progress_cb

    if state.pool is not None:
        fut = state.pool.submit_job(GenerationJob(spec))
    elif state.legacy is not None:
        try:
            fut = state.legacy.submit(spec)
        except Exception as e:
            if "Full" in type(e).__name__ or "full" in str(e):
                raise QueueFullError("queue full") from e
            raise
    else:
        raise web.HTTPServiceUnavailable(
            text=json.dumps({"detail": "no generation backend loaded"}),
            content_type="application/json",
        )
    png, seed = await _await_future(fut, timeout=cfg.request_timeout)

    headers = {
        "X-Seed": str(seed),
        "X-Mode": (
            (tenant_mode or state.pool.current_mode)
            if state.pool else "legacy"
        ),
        "X-SuperRes": "0",
    }
    if spec.control_image is not None:
        headers["X-ControlNet"] = "1"
        if spec.controlnet_scale is not None:
            applied_scale = spec.controlnet_scale
        elif tenant_mode is not None:
            # the tenant worker's default is its mode's controlnet.scale —
            # the active worker's default may differ. A modes.yaml hot-reload
            # can remove the mode between validation and response
            # construction; the completed generation must not 500 over a
            # response header (ADVICE r4).
            try:
                cn = getattr(state.mode_config.get_mode(tenant_mode),
                             "controlnet", None)
            except KeyError:
                cn = None
            applied_scale = cn.scale if cn else 1.0
        else:
            applied_scale = getattr(
                state.pool.worker if state.pool else None,
                "controlnet_scale", 1.0,
            )
        headers["X-ControlNet-Scale"] = str(applied_scale)
    media_type = "image/png"
    data = png

    if req.superres and state.sr is not None:
        sr_fut = state.sr.submit(
            png, magnitude=req.superres_magnitude,
            out_format=req.superres_format, quality=req.superres_quality,
        )
        data, passes = await _await_future(sr_fut, timeout=cfg.sr_timeout)
        headers.update({
            "X-SuperRes": "1",
            "X-SR-Passes": str(passes),
            "X-SR-Scale-Per-Pass": str(state.sr.cfg.upscale),
            "X-SR-Model": state.sr.model_desc,
        })
        if req.superres_format in ("jpeg", "jpg"):
            media_type = "image/jpeg"

    if state.storage is not None:
        key = state.storage.new_key()
        state.storage.put(
            key, data,
            metadata={
                "prompt": req.prompt[:256], "seed": str(seed),
                "size": req.size, "steps": str(req.num_inference_steps),
            },
            content_type=media_type,
        )
        headers["X-LCM-Image-Key"] = key

    return data, media_type, headers


async def generate_handler(request: web.Request) -> web.Response:
    state: ServerState = request.app[STATE_KEY]
    req = GenerateRequest.model_validate(await request.json())
    data, media_type, headers = await run_generate(state, req)
    return web.Response(body=data, content_type=media_type, headers=headers)


def _sse(event: str, payload: dict) -> bytes:
    return f"event: {event}\ndata: {json.dumps(payload)}\n\n".encode()


async def generate_stream_handler(request: web.Request) -> web.StreamResponse:
    """Server-sent-events generation: per-step ``progress`` events from
    inside the denoise scan (the cheap no-latents hook — no extra d2h),
    then one ``result`` event with the base64 image + the same metadata
    /generate returns in headers. Same request schema as /generate."""
    state: ServerState = request.app[STATE_KEY]
    req = GenerateRequest.model_validate(await request.json())
    total = req.num_inference_steps

    resp = web.StreamResponse(headers={
        "Content-Type": "text/event-stream",
        "Cache-Control": "no-cache",
        "Access-Control-Allow-Origin": "*",
    })
    await resp.prepare(request)

    loop = asyncio.get_running_loop()
    q: asyncio.Queue = asyncio.Queue()

    def on_step(step: int, timestep: int) -> None:
        # fires on the device-callback thread; marshal into the event loop
        loop.call_soon_threadsafe(
            q.put_nowait, ("progress", {
                "step": step, "timestep": timestep, "total_steps": total,
            })
        )

    gen = asyncio.ensure_future(run_generate(state, req, progress_cb=on_step))
    try:
        while True:
            get = asyncio.ensure_future(q.get())
            done, _ = await asyncio.wait(
                {gen, get}, return_when=asyncio.FIRST_COMPLETED
            )
            if get in done:
                event, payload = get.result()
                await resp.write(_sse(event, payload))
                continue
            get.cancel()
            break
        # flush any progress events that raced with completion
        while not q.empty():
            event, payload = q.get_nowait()
            await resp.write(_sse(event, payload))
        data, media_type, headers = await gen
        await resp.write(_sse("result", {
            "image_b64": base64.b64encode(data).decode(),
            "media_type": media_type,
            "seed": int(headers["X-Seed"]),
            "mode": headers.get("X-Mode"),
            "image_key": headers.get("X-LCM-Image-Key"),
        }))
    except (asyncio.CancelledError, ConnectionResetError):
        gen.cancel()
        raise
    except web.HTTPException as e:
        await resp.write(_sse("error", {
            "status": e.status, "detail": e.text or e.reason,
        }))
    except Exception as e:  # surface in-stream; status line already sent
        await resp.write(_sse("error", {"status": 500, "detail": str(e)}))
    await resp.write_eof()
    return resp


async def superres_handler(request: web.Request) -> web.Response:
    state: ServerState = request.app[STATE_KEY]
    if state.sr is None:
        raise web.HTTPServiceUnavailable(
            text=json.dumps({"detail": "superres not enabled"}),
            content_type="application/json",
        )
    post = await request.post()
    upload = post.get("file")
    if upload is None or not hasattr(upload, "file"):
        raise web.HTTPBadRequest(
            text=json.dumps({"detail": "multipart field 'file' required"}),
            content_type="application/json",
        )
    data = upload.file.read()
    magnitude = int(post.get("magnitude", 1))
    out_format = str(post.get("out_format", "png")).lower()
    quality = int(post.get("quality", 90))
    if not 1 <= magnitude <= 3:
        raise web.HTTPBadRequest(
            text=json.dumps({"detail": "magnitude must be 1-3"}),
            content_type="application/json",
        )
    try:
        fut = state.sr.submit(data, magnitude=magnitude, out_format=out_format,
                              quality=quality)
    except Exception as e:
        raise QueueFullError("SR queue full") from e
    out, passes = await _await_future(fut, timeout=state.config.sr_timeout)
    return web.Response(
        body=out,
        content_type="image/jpeg" if out_format in ("jpeg", "jpg") else "image/png",
        headers={
            "X-SR-Passes": str(passes),
            "X-SR-Scale-Per-Pass": str(state.sr.cfg.upscale),
            "X-SR-Model": state.sr.model_desc,
        },
    )


async def img2img_handler(request: web.Request) -> web.Response:
    """POST /v1/img2img (multipart): file, prompt, strength, steps, guidance,
    seed, negative_prompt, optional mask → image bytes + X-Seed.

    Extends the reference surface with the img2img/inpaint pipeline types
    its model ecosystem ships (LCM-Dreamshaper model card lists TextToImage/
    ImageToImage/ImageInpaintLegacy). Mode-system backend only.
    """
    import numpy as np
    from PIL import Image as PILImage

    state: ServerState = request.app[STATE_KEY]
    if state.pool is None:
        raise web.HTTPServiceUnavailable(
            text=json.dumps({"detail": "img2img requires the mode system"}),
            content_type="application/json",
        )
    post = await request.post()
    upload = post.get("file")
    if upload is None or not hasattr(upload, "file"):
        raise web.HTTPBadRequest(
            text=json.dumps({"detail": "multipart field 'file' required"}),
            content_type="application/json",
        )
    prompt = str(post.get("prompt", "") or "")
    if not prompt:
        raise web.HTTPBadRequest(
            text=json.dumps({"detail": "field 'prompt' required"}),
            content_type="application/json",
        )
    import io as _io

    image = np.asarray(
        PILImage.open(_io.BytesIO(upload.file.read())).convert("RGB")
    )
    mask = None
    mask_upload = post.get("mask")
    if mask_upload is not None and hasattr(mask_upload, "file"):
        mask = np.asarray(
            PILImage.open(_io.BytesIO(mask_upload.file.read())).convert("L")
        )
    strength = float(post.get("strength", 0.5))
    aesthetic = float(post.get("aesthetic_score", 6.0))
    seed_raw = post.get("seed")
    spec = GenSpec(
        prompt=prompt,
        num_inference_steps=int(post.get("steps", 4)),
        guidance_scale=float(post.get("guidance", 1.0)),
        seed=int(seed_raw) if seed_raw not in (None, "") else None,
        negative_prompt=str(post.get("negative_prompt") or "") or None,
        aesthetic_score=aesthetic,
    )

    from ..engine.worker_pool import CustomJob

    fut = state.pool.submit_job(CustomJob(
        lambda worker: worker.run_img2img(
            spec, image, strength=strength, mask=mask,
        )
    ))
    png, seed = await _await_future(fut, timeout=state.config.request_timeout)
    return web.Response(
        body=png, content_type="image/png",
        headers={"X-Seed": str(seed),
                 "X-Mode": state.pool.current_mode or "",
                 "X-Strength": str(strength)},
    )


async def controlnet_handler(request: web.Request) -> web.Response:
    """POST /v1/controlnet (multipart): file (hint image), prompt, size,
    steps, guidance, seed, negative_prompt, scale → image bytes + X-Seed /
    X-ControlNet headers.

    The multipart twin of /generate's base64 ``control_image`` field —
    completes the reference's unfinished ControlNet roadmap item
    (README.md:529 "in progress"; hint contract rknnlcm.py:693-697).
    Requires the active mode to declare a ``controlnet:``.
    """
    state: ServerState = request.app[STATE_KEY]
    if state.pool is None:
        raise web.HTTPServiceUnavailable(
            text=json.dumps({"detail": "controlnet requires the mode system"}),
            content_type="application/json",
        )
    post = await request.post()
    upload = post.get("file")
    if upload is None or not hasattr(upload, "file"):
        raise web.HTTPBadRequest(
            text=json.dumps({"detail": "multipart field 'file' required"}),
            content_type="application/json",
        )
    prompt = str(post.get("prompt", "") or "")
    if not prompt:
        raise web.HTTPBadRequest(
            text=json.dumps({"detail": "field 'prompt' required"}),
            content_type="application/json",
        )
    size = str(post.get("size", state.config.default_size))
    hint = _decode_hint_image(upload.file.read(), size)
    seed_raw = post.get("seed")
    scale_raw = post.get("scale")
    spec = GenSpec(
        prompt=prompt,
        size=size,
        num_inference_steps=int(post.get("steps", state.config.default_steps)),
        guidance_scale=float(post.get("guidance", state.config.default_guidance)),
        seed=int(seed_raw) if seed_raw not in (None, "") else None,
        negative_prompt=str(post.get("negative_prompt") or "") or None,
        control_image=hint,
        controlnet_scale=(
            float(scale_raw) if scale_raw not in (None, "") else None
        ),
    )
    fut = state.pool.submit_job(GenerationJob(spec))
    png, seed = await _await_future(fut, timeout=state.config.request_timeout)
    return web.Response(
        body=png, content_type="image/png",
        headers={
            "X-Seed": str(seed),
            "X-Mode": state.pool.current_mode or "",
            "X-ControlNet": "1",
            "X-ControlNet-Scale": str(
                spec.controlnet_scale if spec.controlnet_scale is not None
                else getattr(state.pool.worker, "controlnet_scale", 1.0)
            ),
        },
    )


async def health_handler(request: web.Request) -> web.Response:
    state: ServerState = request.app[STATE_KEY]
    return web.json_response({"status": "ok", "backend": state.backend})


async def storage_get_handler(request: web.Request) -> web.Response:
    state: ServerState = request.app[STATE_KEY]
    if state.storage is None:
        raise web.HTTPServiceUnavailable(
            text=json.dumps({"detail": "storage disabled"}),
            content_type="application/json",
        )
    item = state.storage.get(request.match_info["key"])
    if item is None:
        raise web.HTTPNotFound(
            text=json.dumps({"detail": "not found"}),
            content_type="application/json",
        )
    return web.Response(
        body=item.data, content_type=item.content_type,
        headers={f"X-Meta-{k}": v for k, v in item.metadata.items()},
    )


async def storage_put_handler(request: web.Request) -> web.Response:
    state: ServerState = request.app[STATE_KEY]
    if state.storage is None:
        raise web.HTTPServiceUnavailable(
            text=json.dumps({"detail": "storage disabled"}),
            content_type="application/json",
        )
    data = await request.read()
    key = request.match_info["key"]
    state.storage.put(
        key, data, content_type=request.content_type or "application/octet-stream"
    )
    return web.json_response({"key": key, "bytes": len(data)})


async def storage_health_handler(request: web.Request) -> web.Response:
    state: ServerState = request.app[STATE_KEY]
    if state.storage is None:
        return web.json_response({"provider": "disabled", "ok": False})
    return web.json_response(state.storage.health())


# ---------------------------------------------------------------------------
# lifespan
# ---------------------------------------------------------------------------


async def _startup(app: web.Application):
    state: ServerState = app[STATE_KEY]
    cfg = state.config
    loop = asyncio.get_running_loop()

    def build():
        from .superres_service import SuperResService
        from ..persistence import make_storage_provider_from_env
        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()

        if state.storage is None:
            state.storage = make_storage_provider_from_env()

        if state.sr is None:
            state.sr = SuperResService(
                model_path=cfg.sr_model_path,
                num_workers=cfg.sr_num_workers,
                queue_max=cfg.sr_queue_max,
                max_pixels=cfg.sr_max_pixels,
            )

        if state.pool is None and state.legacy is None:
            if cfg.modes_config and os.path.exists(cfg.modes_config):
                from ..engine.mode_config import ModeConfigManager
                from ..engine.worker_pool import WorkerPool

                state.mode_config = ModeConfigManager(cfg.modes_config)
                factory = None
                if cfg.mesh_spec:
                    from ..engine.worker_factory import create_tpu_worker
                    from ..parallel.sharding import make_mesh, parse_mesh_spec

                    axes = parse_mesh_spec(cfg.mesh_spec)
                    mesh = make_mesh(
                        axes["data"] * axes["model"], model=axes["model"]
                    )
                    logger.info(
                        "serving over a %dx%d (data, model) mesh",
                        axes["data"], axes["model"],
                    )

                    def factory(worker_id, model_path, *, loras=None):
                        return create_tpu_worker(
                            worker_id, model_path, loras=loras, mesh=mesh,
                            tensor_parallel=axes["model"] > 1,
                        )

                state.pool = WorkerPool(
                    queue_max=cfg.queue_max, mode_config=state.mode_config,
                    worker_factory=factory,
                )
                if cfg.preload_modes:
                    names = (
                        state.mode_config.mode_names()
                        if cfg.preload_modes.strip() == "all"
                        else [n.strip() for n in cfg.preload_modes.split(",") if n.strip()]
                    )
                    # queue behind the default load; don't block server bind
                    import threading as _threading

                    _threading.Thread(
                        target=lambda: state.pool.preload_modes(names),
                        name="mode-preloader", daemon=True,
                    ).start()
            elif cfg.model_path:
                from .legacy_service import PipelineService
                from ..engine.worker_factory import create_tpu_worker
                import jax

                devices = jax.devices()

                def factory(i):
                    return create_tpu_worker(
                        i, cfg.model_path,
                        warmup_size=(
                            tuple(map(int, cfg.default_size.split("x")))
                            if cfg.warmup else None
                        ),
                    )

                state.legacy = PipelineService(
                    factory, num_workers=min(cfg.num_workers, len(devices)),
                    queue_max=cfg.queue_max,
                )
            else:
                logger.warning(
                    "no modes.yaml and no MODEL env — serving without a "
                    "generation backend (health/storage/SR only)"
                )

    await loop.run_in_executor(None, build)

    # config hot-reload: file watcher + SIGHUP (lcm_sr_server.py:569-585)
    if state.pool is not None and cfg.modes_config:
        from ..engine.file_watcher import start_config_watcher

        def reload_config():
            state.mode_config.reload()

        state.watcher = start_config_watcher(cfg.modes_config, reload_config)
        try:
            loop.add_signal_handler(signal.SIGHUP, reload_config)
        except (NotImplementedError, RuntimeError):
            pass

    if cfg.yume_enabled:
        from ..yume.dream_init import initialize_dream_system

        worker = None
        if state.pool is not None:
            worker = state.pool.worker
        elif state.legacy is not None and state.legacy.workers:
            worker = state.legacy.workers[0]
        if worker is not None:
            state.dream_worker = await initialize_dream_system(worker)

    if cfg.comfy_enabled:
        from .startup_hooks import start_jobs_reaper

        start_jobs_reaper()


async def _cleanup(app: web.Application):
    state: ServerState = app[STATE_KEY]
    if state.watcher is not None:
        state.watcher.stop()
    if state.dream_worker is not None:
        await state.dream_worker.stop_dreaming()
    for svc in (state.pool, state.legacy, state.sr):
        if svc is not None:
            try:
                svc.shutdown()
            except Exception:
                logger.exception("shutdown error")
    if state.storage is not None:
        state.storage.close()


# ---------------------------------------------------------------------------
# app factory
# ---------------------------------------------------------------------------


def create_app(
    config: Optional[ServerConfig] = None,
    *,
    pool=None,
    legacy=None,
    sr=None,
    storage=None,
    mode_config=None,
    registry=None,
    skip_startup: bool = False,
) -> web.Application:
    """Build the server. Components are injectable for tests (the DI seam
    the reference builds into WorkerPool, worker_pool.py:165-168)."""
    cfg = config or ServerConfig.from_env()
    state = ServerState(
        config=cfg, pool=pool, legacy=legacy, sr=sr, storage=storage,
        mode_config=mode_config, registry=registry,
    )

    app = web.Application(
        middlewares=[
            make_request_logger_middleware(),
            cors_middleware,
            error_middleware,
        ],
        client_max_size=64 << 20,
    )
    app[STATE_KEY] = state

    app.router.add_post("/generate", generate_handler)
    app.router.add_post("/generate/stream", generate_stream_handler)
    app.router.add_post("/superres", superres_handler)
    app.router.add_post("/v1/superres", superres_handler)
    app.router.add_post("/v1/img2img", img2img_handler)
    app.router.add_post("/v1/inpaint", img2img_handler)
    app.router.add_post("/v1/controlnet", controlnet_handler)
    app.router.add_get("/health", health_handler)
    app.router.add_get("/storage/health", storage_health_handler)
    app.router.add_get("/storage/{key:.+}", storage_get_handler)
    app.router.add_put("/storage/{key:.+}", storage_put_handler)

    from .model_routes import register_model_routes
    from .compat_endpoints import register_compat_routes

    register_model_routes(app)
    register_compat_routes(app)

    if cfg.comfy_enabled:
        from .comfy_routes import register_comfy_routes

        register_comfy_routes(app)
    if cfg.yume_enabled:
        from ..yume.dream_endpoints import register_dream_routes

        register_dream_routes(app)

    if cfg.ui_dist and os.path.isdir(cfg.ui_dist):
        index_path = os.path.join(cfg.ui_dist, "index.html")

        async def index(request: web.Request) -> web.FileResponse:
            return web.FileResponse(index_path)

        if os.path.exists(index_path):
            app.router.add_get("/", index)
        app.router.add_static("/", cfg.ui_dist)

    if not skip_startup:
        app.on_startup.append(_startup)
        app.on_cleanup.append(_cleanup)
    return app


def main():  # pragma: no cover - process entrypoint
    from .logging_config import configure_logging

    configure_logging()
    cfg = ServerConfig.from_env()
    app = create_app(cfg)
    web.run_app(app, port=cfg.port)


if __name__ == "__main__":  # pragma: no cover
    main()
