"""Multi-host serving router: HTTP on process 0, SPMD execution everywhere.

Turns the proven DCN dryrun (parallel/multihost.py) into the serving
topology ROADMAP.md sketched: one JAX controller process per TPU host,
the REST server runs ONLY on process 0, and every accepted pipeline call
is broadcast to all controllers (``multihost_utils.broadcast_one_to_all``)
so each executes the SAME jitted call over the global ("data", "model")
mesh — multi-controller SPMD. Image shards gather back with
``process_allgather`` and process 0 answers the HTTP request.

The reference is strictly single-node (SURVEY.md §2.5); this is the
deployment mode the reference never had.

Wire protocol (all collectives, no sockets of our own):

1. ``[length]`` int64 broadcast — 0 length is the shutdown sentinel;
2. ``[length]``-byte uint8 broadcast carrying a typed JSON message
   (numpy arrays — explicit latents, step noises, ControlNet hints,
   img2img inputs — ride base64-encoded, recursively):
   - ``{"op": "call", "pipe": id, "method": m, "kw": {...}}`` —
     generate / img2img / inpaint on the pipe registered under ``id``;
   - ``{"op": "lora", "pipe": id, "path": p, "scale": s}`` — every
     controller merges the SAME LoRA file into its own base weights
     (``path=None`` restores them), keeping weight state in lockstep;
3. the pipeline program itself (SPMD over the mesh);
4. ``process_allgather`` of the uint8 image batch + final latents.

Determinism across hosts needs no weight sync: every process loads the
same checkpoint, host-RNG noise is drawn from the request seed
(np.random.RandomState, process-independent), and LoRA merges replay the
identical (file, scale) device computation on every controller.

Feature coverage beyond plain txt2img:

- **ControlNet hints** (``control_image``/``controlnet_scale``) broadcast
  like any other array argument; every controller holds the same attached
  ControlNet params (same mode config), so the cfg-keyed ctrl bucket
  compiles identically.
- **Ensemble segments** (SDXL base → refiner): the scan-carry latent
  ``state_device`` never crosses DCN — each controller KEEPS its own
  shard from the base segment (``router.last_carry``) and splices it into
  the refiner segment when the broadcast message says ``carry=True``.
  Process 0 checks by identity that the caller handed back the carry the
  router just produced (the worker's handoff does), because a foreign
  device array would desynchronize the followers' shards.
- **Progress callbacks** with ``callback_latents=False`` (the serving
  /generate/stream form): the callback itself cannot be broadcast, so
  followers register a no-op with the same ``callback_steps`` — the
  traced program (its progress bucket, its debug_callback custom-calls)
  is identical on every controller and only process 0's trampoline does
  visible work. ``callback_latents=True`` is rejected: per-step latent
  fetches of a cross-process global array would need a collective per
  step, which the streaming contract doesn't ask for.
- **img2img / inpaint**: broadcast like generate; the init image / mask
  arrays ride the base64 channel.

Styles through the serving stack hot-swap ``pipeline.unet_params``
(engine/tpu_worker.py:_apply_style); a raw weight assignment on process 0
only would silently corrupt every shard the followers own, so
``RouterPipeline`` refuses the attribute write and instead offers
``apply_lora(path, scale)`` — the worker prefers it when present.
"""

from __future__ import annotations

import base64
import json
import logging
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _encode_value(v):
    if isinstance(v, np.ndarray):
        return {
            "__nd__": True,
            "dtype": str(v.dtype),
            "shape": list(v.shape),
            "b64": base64.b64encode(np.ascontiguousarray(v).tobytes()).decode(),
        }
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, dict):
        return {k: _encode_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_encode_value(x) for x in v]
    return v


def _decode_value(v):
    if isinstance(v, dict) and v.get("__nd__"):
        return np.frombuffer(
            base64.b64decode(v["b64"]), dtype=np.dtype(v["dtype"])
        ).reshape(v["shape"]).copy()
    if isinstance(v, dict):
        return {k: _decode_value(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_decode_value(x) for x in v]
    return v


class MultihostRouter:
    """Length-prefixed JSON broadcast between JAX controller processes."""

    def __init__(self):
        import jax
        from jax.experimental import multihost_utils

        self._mh = multihost_utils
        self.process_index = jax.process_index()
        self.is_primary = self.process_index == 0
        # pipe_id -> RouterPipeline (every controller constructs the same
        # set, in any order — lookup is by id, not position)
        self.pipes: Dict[str, "RouterPipeline"] = {}
        # this controller's scan-carry shard from the last partial segment
        # (ensemble base → refiner handoff); never crosses DCN
        self.last_carry: Any = None

    # -- byte channel ------------------------------------------------------
    def _bcast_bytes(self, data: Optional[bytes]) -> bytes:
        n = np.zeros((1,), np.int64)
        if self.is_primary and data is not None:
            n[0] = len(data)
        n = self._mh.broadcast_one_to_all(n)
        length = int(n[0])
        if length == 0:
            return b""
        buf = np.zeros((length,), np.uint8)
        if self.is_primary:
            buf[:] = np.frombuffer(data, np.uint8)
        buf = self._mh.broadcast_one_to_all(buf)
        return buf.tobytes()

    # -- message channel ---------------------------------------------------
    def broadcast_message(self, msg: Optional[Dict[str, Any]]) -> None:
        """Process 0: publish a typed message (None = shutdown sentinel)."""
        assert self.is_primary
        data = None
        if msg is not None:
            data = json.dumps(_encode_value(msg)).encode()
        self._bcast_bytes(data)

    def recv_message(self) -> Optional[Dict[str, Any]]:
        """Followers: block until the next message; None on shutdown."""
        assert not self.is_primary
        data = self._bcast_bytes(None)
        if not data:
            return None
        return _decode_value(json.loads(data))

    # -- result channel ----------------------------------------------------
    def gather_images(self, global_images) -> np.ndarray:
        """All-gather a batch-sharded global uint8 array to host-local np.

        tiled=True: shards concatenate along their sharded axis (the batch),
        reproducing the global [B, H, W, 3] value on every process."""
        return np.asarray(self._mh.process_allgather(global_images, tiled=True))


class RouterPipeline:
    """LCMPipeline facade for multi-controller serving.

    Process 0 wraps each real pipeline in one of these and hands it to the
    ordinary serving stack (TPUPipelineWorker / WorkerPool / create_app —
    none of them change). ``generate()``/``img2img()``/``inpaint()``
    broadcast the call before executing it, so followers running
    :meth:`serve_follower` stay in lockstep; the returned result carries
    the GATHERED image batch, making the sharded execution invisible to
    the worker. An ensemble deployment constructs one facade per model
    (``pipe_id="base"`` / ``"refiner"``) over the same router.
    """

    def __init__(self, pipe, router: MultihostRouter, pipe_id: str = "base"):
        self._pipe = pipe
        self._router = router
        self._pipe_id = pipe_id
        self._base_unet_params = pipe.unet_params
        self._lora_cache: Dict[str, Any] = {}
        self._active_lora = None
        if pipe_id in router.pipes:
            raise ValueError(f"duplicate router pipe id {pipe_id!r}")
        router.pipes[pipe_id] = self

    def __getattr__(self, name):
        return getattr(self._pipe, name)

    # the serving worker swaps unet_params to apply LoRA styles. On a
    # multi-controller deployment that merge would happen on process 0
    # ONLY — the followers would execute the same program with different
    # weights, silently corrupting every shard they own. Refuse the raw
    # write; apply_lora() below replays the merge on every controller.
    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        elif name == "unet_params":
            raise ValueError(
                "multi-host serving cannot hot-swap raw weights: the write "
                "would apply on process 0 only and diverge from the other "
                "controllers — use apply_lora(path, scale) instead"
            )
        else:
            setattr(self._pipe, name, value)

    # -- LoRA styles -------------------------------------------------------
    def apply_lora(self, path: Optional[str], scale: float = 1.0) -> None:
        """Merge LoRA ``path`` at ``scale`` into the base UNet weights on
        EVERY controller (None restores the base). The merge is a
        deterministic device computation from identical inputs, so no
        weight bytes cross DCN — each host recomputes the same result."""
        if self._router.is_primary:
            self._router.broadcast_message({
                "op": "lora", "pipe": self._pipe_id,
                "path": path, "scale": float(scale),
            })
        self._apply_lora_sync(path, float(scale))

    def _apply_lora_sync(self, path: Optional[str], scale: float) -> None:
        """Apply locally, then VOTE: a merge that fails on any controller
        (file missing on one host's disk, corrupt download) must not leave
        the fleet with divergent weights — every controller all-gathers a
        success flag, and on any failure ALL of them restore base weights
        before the error surfaces. Serving stays bit-consistent; the
        client's request fails loudly."""
        ok = 1
        try:
            self._apply_lora_local(path, scale)
        except Exception:
            logger.exception("LoRA merge of %r failed on this controller",
                             path)
            ok = 0
        oks = np.asarray(self._router._mh.process_allgather(
            np.asarray([ok], np.int32)
        )).reshape(-1)
        if int(oks.min()) == 0:
            self._apply_lora_local(None, 0.0)  # fleet-wide restore
            raise RuntimeError(
                f"LoRA merge of {path!r} failed on "
                f"{int((oks == 0).sum())}/{oks.size} controller(s); base "
                "weights restored fleet-wide"
            )

    def _apply_lora_local(self, path: Optional[str], scale: float) -> None:
        if path is None:
            self._pipe.unet_params = self._base_unet_params
            self._active_lora = None
            return
        if self._active_lora == (path, scale):
            return
        from ..lora import load_lora, merge_lora_into_tree

        tensors = self._lora_cache.get(path)
        if tensors is None:
            tensors = load_lora(path)
            self._lora_cache[path] = tensors
        self._pipe.unet_params = merge_lora_into_tree(
            self._base_unet_params, tensors.unet, scale
        )
        self._active_lora = (path, scale)

    # -- pipeline calls ----------------------------------------------------
    def generate(self, prompt, **kw):
        callback = kw.pop("callback", None)
        progress = None
        if callback is not None:
            if kw.pop("callback_latents", True):
                raise ValueError(
                    "multi-host serving supports progress callbacks only "
                    "with callback_latents=False (per-step latents of a "
                    "cross-process array would need a collective per step)"
                )
            progress = [int(kw.pop("callback_steps", 1))]
        state = kw.pop("latents_state", None)
        return self._dispatch("generate", {"prompt": prompt, **kw},
                              callback=callback, progress=progress,
                              carry=state is not None, carry_obj=state)

    def img2img(self, prompt, init_image, **kw):
        if kw.get("mask") is not None:
            return self._dispatch("inpaint", {
                "prompt": prompt, "init_image": np.asarray(init_image),
                "mask": np.asarray(kw.pop("mask")), **kw,
            })
        return self._dispatch("img2img", {
            "prompt": prompt, "init_image": np.asarray(init_image), **kw,
        })

    def inpaint(self, prompt, init_image, mask, **kw):
        return self._dispatch("inpaint", {
            "prompt": prompt, "init_image": np.asarray(init_image),
            "mask": np.asarray(mask), **kw,
        })

    def _dispatch(self, method, kw, *, callback=None, progress=None,
                  carry=False, carry_obj=None):
        kw = dict(kw)
        kw.pop("pipelined", None)
        kw.pop("prefetch", None)
        if carry:
            if carry_obj is None or carry_obj is not self._router.last_carry:
                raise ValueError(
                    "multi-host segments must hand back the latents_state "
                    "returned by the immediately preceding segment call "
                    "through this router (each controller holds its own "
                    "shard of the carry; a foreign array would diverge)"
                )
        self._router.broadcast_message({
            "op": "call", "pipe": self._pipe_id, "method": method,
            "kw": kw, "progress": progress, "carry": carry,
        })
        return self._execute(method, kw, callback=callback,
                             progress=progress, carry=carry)

    def _execute(self, method, kw, *, callback=None, progress=None,
                 carry=False):
        """Run the call locally (every controller) and gather the results.

        The collective sequence here must be IDENTICAL on all processes:
        unconditional latents gather, image gather iff the call produces
        images (a property of the arguments, not of the process)."""
        kw = dict(kw)
        if isinstance(kw.get("segment"), list):
            kw["segment"] = tuple(kw["segment"])
        if carry:
            if self._router.last_carry is None:
                raise RuntimeError(
                    "segment handoff arrived with no carry on this "
                    "controller (calls replayed out of order?)"
                )
            kw["latents_state"] = self._router.last_carry
            self._router.last_carry = None  # donated to the program
        if progress is not None:
            kw.update(
                callback=callback or (lambda step, t, lat: None),
                callback_steps=progress[0],
                callback_latents=False,
            )
        if method == "generate":
            res = self._pipe.generate(**kw, pipelined=True, prefetch=False)
        elif method in ("img2img", "inpaint"):
            res = getattr(self._pipe, method)(**kw)
        else:
            raise ValueError(f"unknown router method {method!r}")

        from ..pipeline import GenerationResult

        images = None
        if res.images is not None:
            images = self._router.gather_images(res.images)
        # final latents gather keeps the fingerprint path
        # (run_job_with_latents) working across hosts; it's [B, h/8, w/8, 4]
        # fp32 — tiny next to the images. Both sides must join the
        # collective, so this is unconditional.
        latents = np.asarray(
            self._router._mh.process_allgather(res.latents_device, tiled=True)
        )
        if res.state_device is not None:
            self._router.last_carry = res.state_device
        out = GenerationResult(
            images=images, seed=res.seed, timings=res.timings,
            state_device=res.state_device,
        )
        out._latents_np = latents
        return out

    # -- follower loop -----------------------------------------------------
    def serve_follower(self) -> int:
        """Controller loop for processes 1..N-1: replay broadcast messages
        until the shutdown sentinel. Dispatches across ALL RouterPipelines
        registered on this router (base + refiner in an ensemble). Returns
        the number of messages served.

        Error policy, per op:

        - ``call``: caught and logged — a request that fails ARGUMENT
          VALIDATION (bad strength, missing ControlNet, …) raises the same
          exception on every controller BEFORE any collective; process 0
          answers 4xx and keeps serving, so followers keep serving too.
          (A failure INSIDE a collective is not survivable either way —
          that is a runtime fault, not a request fault.)
        - ``lora``: the merge VOTES across controllers; a partial failure
          restores base weights fleet-wide (weights stay bit-consistent)
          and the resulting error is caught here like a call error.
        - unknown ops are FATAL: process 0 executed something this
          controller doesn't understand (version skew between hosts), so
          continuing would silently desynchronize state."""
        served = 0
        router = self._router
        while True:
            msg = router.recv_message()
            if msg is None:
                return served
            op = msg.get("op")
            if op not in ("call", "lora"):
                raise ValueError(
                    f"unknown router op {op!r} — controller version skew?"
                )
            try:
                pipe = router.pipes[msg.get("pipe", "base")]
                if op == "call":
                    pipe._execute(
                        msg["method"], msg["kw"],
                        progress=msg.get("progress"),
                        carry=bool(msg.get("carry")),
                    )
                else:
                    pipe._apply_lora_sync(msg["path"], msg["scale"])
            except Exception:
                logger.exception(
                    "follower: message %s failed (process 0 fails the same "
                    "request; weights remain fleet-consistent; continuing)",
                    op,
                )
            served += 1

    def shutdown(self) -> None:
        """Process 0: release the followers."""
        if self._router.is_primary:
            self._router.broadcast_message(None)
