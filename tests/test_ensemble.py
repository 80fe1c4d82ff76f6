"""SDXL base→refiner ensemble (diffusers denoising_end/denoising_start):
segment scheduling, on-device latent handoff, worker flow, modes.yaml key,
and the REST path. Ref: the reference only *detects* refiners
(/root/reference/utils/custom_detector_example.py:91) — ensemble serving is
the completion of that capability.
"""

import asyncio
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dreamlab_tpu.engine.base import GenSpec
from dreamlab_tpu.engine.mode_config import ModeConfigManager
from dreamlab_tpu.engine.model_registry import ModelRegistry
from dreamlab_tpu.engine.tpu_worker import TPUPipelineWorker
from dreamlab_tpu.engine.worker_pool import GenerationJob, WorkerPool
from dreamlab_tpu.pipeline import LCMPipeline
from dreamlab_tpu.testing import random_bundle
from tests.test_refiner import _tiny_refiner_bundle


@pytest.fixture(scope="module")
def sd15_pipe():
    return LCMPipeline(random_bundle("sd15", tiny=True), dtype=jnp.float32)


# ---------------------------------------------------------------------------
# segment semantics (single pipeline)
# ---------------------------------------------------------------------------


def test_segments_bitmatch_full_run(sd15_pipe):
    """(0,k) + (k,S) on the same model must reproduce the S-step run
    EXACTLY — the schedule slice + seed-stream noise slice are the whole
    contract."""
    pipe = sd15_pipe
    full = pipe.generate("cat", height=32, width=32, num_inference_steps=4,
                         seed=11)
    base = pipe.generate("cat", height=32, width=32, num_inference_steps=4,
                         seed=11, segment=(0, 3))
    assert base.images is None
    assert base.state_device is not None
    rest = pipe.generate("cat", height=32, width=32, num_inference_steps=4,
                         seed=11, segment=(3, 4),
                         latents_state=base.state_device)
    np.testing.assert_array_equal(full.images, rest.images)
    np.testing.assert_array_equal(full.latents, rest.latents)


def test_segment_handoff_stays_on_device(sd15_pipe):
    """The carry is a device array, not host memory."""
    base = sd15_pipe.generate("cat", height=32, width=32,
                              num_inference_steps=2, seed=3, segment=(0, 1))
    assert isinstance(base.state_device, jax.Array)


def test_segment_validation(sd15_pipe):
    pipe = sd15_pipe
    kw = dict(height=32, width=32, num_inference_steps=4, seed=1)
    with pytest.raises(ValueError, match="out of range"):
        pipe.generate("cat", segment=(0, 5), **kw)
    with pytest.raises(ValueError, match="out of range"):
        pipe.generate("cat", segment=(2, 2), **kw)
    with pytest.raises(ValueError, match="latents_state"):
        pipe.generate("cat", segment=(1, 4), **kw)
    with pytest.raises(ValueError, match="latents_state"):
        pipe.generate("cat", segment=(0, 2),
                      latents_state=jnp.zeros((1, 16, 16, 4)), **kw)
    base = pipe.generate("cat", segment=(0, 2), **kw)
    with pytest.raises(ValueError, match="incompatible"):
        pipe.generate("cat", segment=(2, 4),
                      latents_state=base.state_device,
                      latents=np.zeros((1, 16, 16, 4), np.float32), **kw)


# ---------------------------------------------------------------------------
# worker ensemble flow (base + refiner are DIFFERENT models)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ensemble_parts():
    base = LCMPipeline(random_bundle("sdxl", tiny=True), dtype=jnp.float32)
    refiner = LCMPipeline(_tiny_refiner_bundle(), dtype=jnp.float32)
    return base, refiner


def test_worker_ensemble_handoff(ensemble_parts):
    base_pipe, refiner_pipe = ensemble_parts
    solo = TPUPipelineWorker(base_pipe, 0)
    ens = TPUPipelineWorker(base_pipe, 0, refiner=refiner_pipe,
                            refiner_switch_at=0.5)
    assert solo.supports_batching and not ens.supports_batching

    spec = GenSpec(prompt="a castle", size="32x32", num_inference_steps=4,
                   guidance_scale=1.0, seed=9)
    png_solo, seed_s = solo.run_job(spec)
    png_ens, seed_e = ens.run_job(spec)
    assert seed_s == seed_e == 9
    assert png_ens[:8] == b"\x89PNG\r\n\x1a\n"
    # the refiner's weights differ from the base's — the ensemble image must
    # diverge from the base-only image
    assert png_ens != png_solo
    # deterministic: same seed → same ensemble bytes
    png_ens2, _ = ens.run_job(spec)
    assert png_ens2 == png_ens


def test_worker_ensemble_with_latents(ensemble_parts):
    base_pipe, refiner_pipe = ensemble_parts
    ens = TPUPipelineWorker(base_pipe, 0, refiner=refiner_pipe,
                            refiner_switch_at=0.5)
    spec = GenSpec(prompt="a castle", size="32x32", num_inference_steps=2,
                   seed=4)
    png, seed, fp = ens.run_job_with_latents(spec)
    assert len(fp) == 512  # [1, 4, 8, 8] f16 fingerprint contract


def test_worker_single_step_skips_refiner(ensemble_parts):
    """steps=1 can't split; the base serves alone."""
    base_pipe, refiner_pipe = ensemble_parts
    solo = TPUPipelineWorker(base_pipe, 0)
    ens = TPUPipelineWorker(base_pipe, 0, refiner=refiner_pipe)
    spec = GenSpec(prompt="a castle", size="32x32", num_inference_steps=1,
                   seed=2)
    assert ens.run_job(spec) == solo.run_job(spec)


# ---------------------------------------------------------------------------
# modes.yaml + pool wiring
# ---------------------------------------------------------------------------


def test_mode_config_refiner_key(tmp_path):
    p = tmp_path / "m.yaml"
    p.write_text("""
model_root: /models
default_mode: xl
modes:
  xl:
    model: base
    refiner:
      model: refiner-1.0
      switch_at: 0.7
  xl2:
    model: base
    refiner: refiner-1.0
  plain:
    model: base
""")
    cfg = ModeConfigManager(str(p))
    assert cfg.get_mode("xl").refiner.file == "/models/refiner-1.0"
    assert cfg.get_mode("xl").refiner.switch_at == 0.7
    assert cfg.get_mode("xl2").refiner.switch_at == 0.8
    assert cfg.get_mode("plain").refiner is None
    d = cfg.to_dict()["modes"]["xl"]["refiner"]
    assert d == {"model": "/models/refiner-1.0", "switch_at": 0.7}
    s1 = WorkerPool._mode_signature(cfg.get_mode("xl"))
    s2 = WorkerPool._mode_signature(cfg.get_mode("xl2"))
    assert s1 != s2


def test_mode_config_refiner_validation(tmp_path):
    from dreamlab_tpu.engine.mode_config import ModeConfigError

    p = tmp_path / "m.yaml"
    p.write_text("""
default_mode: a
modes:
  a:
    model: base
    refiner: { switch_at: 1.5, model: r }
""")
    with pytest.raises(ModeConfigError, match="switch_at"):
        ModeConfigManager(str(p))


# ---------------------------------------------------------------------------
# REST: an ensemble mode serves /generate
# ---------------------------------------------------------------------------


def test_rest_ensemble_mode(tmp_path, ensemble_parts):
    from aiohttp.test_utils import TestClient, TestServer

    from dreamlab_tpu.serving.app import ServerConfig, create_app

    base_pipe, refiner_pipe = ensemble_parts
    (tmp_path / "modes.yaml").write_text("""
model_root: /tmp
default_mode: xl
modes:
  xl:
    model: base
    refiner: { model: refiner, switch_at: 0.5 }
""")
    mode_config = ModeConfigManager(str(tmp_path / "modes.yaml"))
    registry = ModelRegistry(total_hbm_bytes=16 << 30)
    seen = {}

    def factory(worker_id, model_path, *, refiner=None):
        seen["refiner_cfg"] = refiner
        return TPUPipelineWorker(
            base_pipe, worker_id, refiner=refiner_pipe,
            refiner_switch_at=refiner.switch_at if refiner else 0.8,
        )

    pool = WorkerPool(queue_max=8, worker_factory=factory,
                      mode_config=mode_config, registry=registry)
    app = create_app(
        ServerConfig(default_size="32x32", default_steps=4,
                     request_timeout=60),
        pool=pool, mode_config=mode_config, registry=registry,
        skip_startup=True,
    )
    loop = asyncio.new_event_loop()
    cl = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(cl.start_server())
    try:
        # the pool handed the mode's refiner config to the factory
        assert seen["refiner_cfg"].file == "/tmp/refiner"
        assert seen["refiner_cfg"].switch_at == 0.5

        async def go():
            resp = await cl.post("/generate", json={
                "prompt": "a castle", "size": "32x32",
                "num_inference_steps": 4, "seed": 9,
            })
            return resp, await resp.read()

        resp, body = loop.run_until_complete(go())
        assert resp.status == 200
        assert body[:8] == b"\x89PNG\r\n\x1a\n"
        assert resp.headers["X-Seed"] == "9"
        # the image is the ensemble output, not base-only
        solo_png, _ = TPUPipelineWorker(base_pipe, 0).run_job(
            GenSpec(prompt="a castle", size="32x32", num_inference_steps=4,
                    seed=9)
        )
        assert body != solo_png
    finally:
        loop.run_until_complete(cl.close())
        pool.shutdown(drain=False, timeout=1)
        loop.close()
