"""Super-resolution service: second XLA program in its own worker pool.

Behavioral port of the reference's SR subsystem
(/root/reference/server/lcm_sr_server.py:302-499): a separate bounded queue
+ worker threads run a sub-pixel CNN over the Y channel in 224² tiles
(3× per pass, ``magnitude`` passes), Cb/Cr upscaled bicubically, output
re-encoded as PNG/JPEG. Differences by design:

- the per-tile Python loop is a *batched* jitted conv over all tiles
  (models/superres.upscale_luma);
- weights load from the reference's ``super-resolution-10.onnx`` directly
  (utils/onnx_weights — no onnx runtime dependency) or from safetensors;
- with no weights the service degrades to *bicubic* upscaling (never random
  convs: a warning-then-noise path is a correctness trap — VERDICT r1).
"""

from __future__ import annotations

import dataclasses
import io
import logging
import os
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Tuple

import numpy as np

from ..models import superres
from ..models.configs import SuperResConfig

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SRJob:
    data: bytes
    magnitude: int = 1
    out_format: str = "png"  # png | jpeg
    quality: int = 90
    future: Future = dataclasses.field(default_factory=Future)


def load_sr_params(cfg: SuperResConfig, path: Optional[str] = None):
    """Load ESPCN weights: ``.onnx`` (reference artifact) or ``.safetensors``
    (torch OIHW conv1..conv4). Returns None when no weights are available —
    the worker then degrades to bicubic instead of serving random-conv noise.
    """
    if path and os.path.exists(path):
        if path.endswith(".onnx"):
            from ..utils.onnx_weights import load_espcn_from_onnx

            return load_espcn_from_onnx(path)
        if path.endswith(".safetensors"):
            from safetensors import numpy as st_numpy

            raw = st_numpy.load_file(path)
            params = {}
            for i in (1, 2, 3, 4):
                w = raw[f"conv{i}.weight"]  # torch OIHW → HWIO
                params[f"conv{i}"] = {
                    "w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                    "b": raw[f"conv{i}.bias"],
                }
            return params
    if path:
        logger.warning(
            "SR model %s not loadable; degrading to bicubic upscaling", path
        )
    return None


class SuperResWorker:
    """One SR model instance; stateless between jobs.

    params None = bicubic degradation mode (weights unavailable)."""

    def __init__(self, params, cfg: SuperResConfig, worker_id: int = 0):
        self.params = params
        self.cfg = cfg
        self.worker_id = worker_id

    def upscale_once(self, img) -> "object":
        from PIL import Image

        r = self.cfg.upscale
        new_size = (img.width * r, img.height * r)
        if self.params is None:
            return img.resize(new_size, Image.BICUBIC)
        ycbcr = img.convert("YCbCr")
        y, cb, cr = ycbcr.split()
        y_arr = np.asarray(y, np.float32) / 255.0
        out_y = superres.upscale_luma(self.params, self.cfg, y_arr)
        y_img = Image.fromarray((out_y * 255.0).round().astype(np.uint8), "L")
        cb_up = cb.resize(new_size, Image.BICUBIC)
        cr_up = cr.resize(new_size, Image.BICUBIC)
        return Image.merge("YCbCr", (y_img, cb_up, cr_up)).convert("RGB")

    def upscale_bytes(self, data: bytes, magnitude: int, out_format: str,
                      quality: int, max_pixels: Optional[int] = None) -> Tuple[bytes, int]:
        from PIL import Image

        img = Image.open(io.BytesIO(data)).convert("RGB")
        passes = max(1, min(int(magnitude), 3))
        for p in range(passes):
            if max_pixels and img.width * img.height * self.cfg.upscale**2 > max_pixels:
                logger.warning("SR: stopping at pass %d (max_pixels)", p)
                passes = p
                break
            img = self.upscale_once(img)
        buf = io.BytesIO()
        if out_format.lower() in ("jpeg", "jpg"):
            img.save(buf, format="JPEG", quality=int(quality))
        else:
            img.save(buf, format="PNG")
        return buf.getvalue(), passes


class SuperResService:
    """Bounded queue + N worker threads (reference lcm_sr_server.py:408-499)."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        num_workers: int = 1,
        queue_max: int = 32,
        cfg: Optional[SuperResConfig] = None,
        max_pixels: Optional[int] = None,
        params=None,
    ):
        self.cfg = cfg or SuperResConfig()
        self.params = params if params is not None else load_sr_params(self.cfg, model_path)
        if self.params is not None:
            # derive the upscale factor from the loaded weights (conv4 emits
            # r² channels for depth-to-space) so any ESPCN export just works
            r2 = self.params["conv4"]["w"].shape[3]
            r = int(round(r2 ** 0.5))
            if r * r == r2 and r != self.cfg.upscale:
                self.cfg = dataclasses.replace(self.cfg, upscale=r)
        self.model_desc = (
            os.path.basename(model_path)
            if self.params is not None and model_path
            else ("espcn-injected" if self.params is not None else "bicubic")
        )
        self.max_pixels = max_pixels
        self.queue: "queue.Queue[Optional[SRJob]]" = queue.Queue(maxsize=queue_max)
        self._shutdown = threading.Event()
        self._threads = []
        for i in range(max(1, num_workers)):
            t = threading.Thread(
                target=self._loop, args=(SuperResWorker(self.params, self.cfg, i),),
                name=f"sr-worker-{i}", daemon=True,
            )
            t.start()
            self._threads.append(t)

    def _loop(self, worker: SuperResWorker):
        while not self._shutdown.is_set():
            try:
                job = self.queue.get(timeout=0.25)
            except queue.Empty:
                continue
            if job is None:
                self.queue.task_done()
                break
            if not job.future.set_running_or_notify_cancel():
                self.queue.task_done()  # client gone: skip
                continue
            try:
                t0 = time.time()
                out, passes = worker.upscale_bytes(
                    job.data, job.magnitude, job.out_format, job.quality,
                    self.max_pixels,
                )
                logger.info(
                    "SR job: %d passes in %.0f ms", passes, 1e3 * (time.time() - t0)
                )
                job.future.set_result((out, passes))
            except Exception as e:
                logger.exception("SR job failed")
                job.future.set_exception(e)
            finally:
                self.queue.task_done()

    def submit(self, data: bytes, magnitude: int = 1, out_format: str = "png",
               quality: int = 90) -> Future:
        job = SRJob(data=data, magnitude=magnitude, out_format=out_format,
                    quality=quality)
        self.queue.put_nowait(job)  # queue.Full propagates → HTTP 429
        return job.future

    def shutdown(self):
        self._shutdown.set()
        for _ in self._threads:
            try:
                self.queue.put_nowait(None)
            except queue.Full:
                break
        for t in self._threads:
            t.join(timeout=2.0)
