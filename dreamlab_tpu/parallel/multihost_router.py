"""Multi-host serving router: HTTP on process 0, SPMD execution everywhere.

Turns the proven DCN dryrun (parallel/multihost.py) into the serving
topology ROADMAP.md sketched: one JAX controller process per TPU host,
the REST server runs ONLY on process 0, and every accepted generation
request is broadcast to all controllers (``multihost_utils.
broadcast_one_to_all``) so each executes the SAME jitted call over the
global ("data", "model") mesh — multi-controller SPMD. Image shards gather
back with ``process_allgather`` and process 0 answers the HTTP request.

The reference is strictly single-node (SURVEY.md §2.5); this is the
deployment mode the reference never had.

Wire protocol (all collectives, no sockets of our own):

1. ``[length]`` int64 broadcast — 0 length is the shutdown sentinel;
2. ``[length]``-byte uint8 broadcast carrying a JSON request (numpy arrays
   — explicit latents / per-row step noises — ride base64-encoded);
3. the generation program itself (SPMD over the mesh);
4. ``process_allgather`` of the uint8 image batch.

Determinism across hosts needs no weight sync: every process loads the
same checkpoint, and host-RNG noise is drawn from the request seed
(np.random.RandomState), which is process-independent.

Scope: txt2img serving (the /generate + pool-coalescing path, including
explicit latents/step_noises). Per-step progress callbacks, ControlNet
hints, ensemble segments and the latent-fingerprint d2h are single-host
features for now — RouterPipeline rejects them loudly rather than
diverging silently.
"""

from __future__ import annotations

import base64
import json
import logging
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

_UNSUPPORTED = ("callback", "control_image", "latents_state", "segment")


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
    return v


def _decode_value(v):
    if isinstance(v, dict) and v.get("__nd__"):
        return np.frombuffer(
            base64.b64decode(v["b64"]), dtype=np.dtype(v["dtype"])
        ).reshape(v["shape"]).copy()
    return v


class MultihostRouter:
    """Length-prefixed JSON broadcast between JAX controller processes."""

    def __init__(self):
        import jax
        from jax.experimental import multihost_utils

        self._mh = multihost_utils
        self.process_index = jax.process_index()
        self.is_primary = self.process_index == 0

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

    # -- request channel ---------------------------------------------------
    def broadcast_request(self, req: Optional[Dict[str, Any]]) -> None:
        """Process 0: publish a request dict (None = shutdown sentinel)."""
        assert self.is_primary
        data = None
        if req is not None:
            data = json.dumps(
                {k: _encode_value(v) for k, v in req.items()}
            ).encode()
        self._bcast_bytes(data)

    def recv_request(self) -> Optional[Dict[str, Any]]:
        """Followers: block until the next request; None on shutdown."""
        assert not self.is_primary
        data = self._bcast_bytes(None)
        if not data:
            return None
        return {k: _decode_value(v) for k, v in json.loads(data).items()}

    # -- result channel ----------------------------------------------------
    def gather_images(self, global_images) -> np.ndarray:
        """All-gather a batch-sharded global uint8 array to host-local np.

        tiled=True: shards concatenate along their sharded axis (the batch),
        reproducing the global [B, H, W, 3] value on every process."""
        return np.asarray(self._mh.process_allgather(global_images, tiled=True))


class RouterPipeline:
    """LCMPipeline facade for multi-controller serving.

    Process 0 wraps the real pipeline in one of these and hands it to the
    ordinary serving stack (TPUPipelineWorker / WorkerPool / create_app —
    none of them change). ``generate()`` broadcasts the request before
    executing it, so followers running :meth:`serve_follower` stay in
    lockstep; the returned result carries the GATHERED image batch, making
    the sharded execution invisible to the worker.
    """

    def __init__(self, pipe, router: MultihostRouter):
        self._pipe = pipe
        self._router = router

    def __getattr__(self, name):
        return getattr(self._pipe, name)

    # the serving worker swaps unet_params to apply LoRA styles. On a
    # multi-controller deployment that merge would happen on process 0
    # ONLY — the followers would execute the same program with different
    # weights, silently corrupting every shard they own. Refuse loudly;
    # the no-op restore path (_apply_style(None) with no style active)
    # never writes, so plain traffic is unaffected.
    def __setattr__(self, name, value):
        if name in ("_pipe", "_router"):
            object.__setattr__(self, name, value)
        elif name == "unet_params":
            raise ValueError(
                "multi-host serving does not support LoRA styles yet: the "
                "merge would apply on process 0 only and diverge from the "
                "other controllers"
            )
        else:
            setattr(self._pipe, name, value)

    def generate(self, prompt, **kw):
        for bad in _UNSUPPORTED:
            if kw.get(bad) is not None:
                raise ValueError(
                    f"multi-host serving does not support {bad!r} yet "
                    "(single-host feature)"
                )
        req = {"prompt": prompt, **kw}
        req.pop("pipelined", None)
        wire = {k: v for k, v in req.items()}
        self._router.broadcast_request(wire)
        return self._run(req)

    def _run(self, req):
        from ..pipeline import GenerationResult

        res = self._pipe.generate(**req, pipelined=True)
        images = self._router.gather_images(res.images)
        # final latents gather keeps the fingerprint path
        # (run_job_with_latents) working across hosts; it's [B, h/8, w/8, 4]
        # fp32 — tiny next to the images. Both sides must join the
        # collective, so this is unconditional.
        latents = np.asarray(
            self._router._mh.process_allgather(res.latents_device, tiled=True)
        )
        out = GenerationResult(
            images=images, seed=res.seed, timings=res.timings,
        )
        out._latents_np = latents
        return out

    def serve_follower(self) -> int:
        """Controller loop for processes 1..N-1: replay broadcast requests
        until the shutdown sentinel. Returns the number of requests served."""
        served = 0
        while True:
            req = self._router.recv_request()
            if req is None:
                return served
            self._run(req)
            served += 1

    def shutdown(self) -> None:
        """Process 0: release the followers."""
        if self._router.is_primary:
            self._router.broadcast_request(None)
