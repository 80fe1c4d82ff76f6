"""Worker factory through the REAL loader (no injected pipeline_factory).

Round-1 advisor finding (high): create_tpu_worker called load_pipeline
without load_vae_encoder=True, so production workers had no VAE encoder and
every /v1/img2img and /v1/inpaint request failed — server tests passed only
because they injected testing.random_bundle. This suite builds a worker from
an on-disk tiny checkpoint exactly as WorkerPool._load_mode does.
"""

import numpy as np

from tests.test_loader import make_tiny_checkpoint


def test_create_tpu_worker_loads_vae_encoder(tmp_path):
    from dreamlab_tpu.engine.worker_factory import create_tpu_worker

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    worker = create_tpu_worker(0, ckpt)
    assert worker.pipeline.vae_encoder_params is not None, (
        "production workers must load VAE encoder weights for img2img/inpaint"
    )


def test_img2img_through_factory_built_worker(tmp_path):
    """The actual img2img program runs with a factory-built worker."""
    from dreamlab_tpu.engine.worker_factory import create_tpu_worker

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    worker = create_tpu_worker(0, ckpt)
    rs = np.random.RandomState(0)
    init = rs.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    res = worker.pipeline.img2img(
        "a cat", init, strength=0.6, num_inference_steps=2, seed=7,
    )
    assert res.images.shape == (1, 32, 32, 3)


def _write_mode_lora(path, seed=0, rank=2, c=32, ctx=32):
    """Synthetic diffusers-format LoRA hitting the tiny UNet's first
    self-attention q projection."""
    from safetensors.numpy import save_file

    rs = np.random.RandomState(seed)
    base = "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    save_file({
        f"{base}.lora_A.weight": rs.randn(rank, c).astype(np.float32),
        f"{base}.lora_B.weight": rs.randn(c, rank).astype(np.float32),
    }, str(path))
    return str(path)


def test_mode_loras_apply_with_strength(tmp_path):
    """VERDICT r1 #5: per-mode LoRAs must actually merge at mode load, and
    strength must scale the effect monotonically (the reference parsed them
    but never applied per-mode strengths — SURVEY §7.2(8))."""
    import dataclasses

    from dreamlab_tpu.engine.worker_factory import create_tpu_worker

    @dataclasses.dataclass
    class L:
        file: str
        strength: float = 1.0

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    lora = _write_mode_lora(tmp_path / "style.safetensors")

    def gen(worker):
        from dreamlab_tpu.engine.base import GenSpec

        png, seed, lat = worker.run_job_with_latents(GenSpec(
            prompt="a cat", size="32x32", num_inference_steps=2, seed=5,
        ))
        return np.frombuffer(lat, dtype=np.float16)

    base = gen(create_tpu_worker(0, ckpt))
    half = gen(create_tpu_worker(0, ckpt, loras=[L(lora, 0.5)]))
    full = gen(create_tpu_worker(0, ckpt, loras=[L(lora, 1.0)]))

    d_half = float(np.abs(half.astype(np.float32) - base.astype(np.float32)).sum())
    d_full = float(np.abs(full.astype(np.float32) - base.astype(np.float32)).sum())
    assert d_half > 0, "mode LoRA had no effect"
    assert d_full > d_half, (d_full, d_half)


def test_pool_threads_mode_loras_to_factory(tmp_path):
    """WorkerPool passes mode.loras to loras-aware factories and keeps the
    plain (worker_id, model_path) signature working for injected fakes."""
    import yaml

    from dreamlab_tpu.engine.mode_config import ModeConfigManager
    from dreamlab_tpu.engine.model_registry import ModelRegistry
    from dreamlab_tpu.engine.worker_pool import WorkerPool

    lora = _write_mode_lora(tmp_path / "style.safetensors")
    cfg_path = tmp_path / "modes.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "model_root": str(tmp_path),
        "default_mode": "with_lora",
        "modes": {
            "with_lora": {"model": "m", "loras": [
                {"file": lora, "strength": 0.7},
            ]},
            "plain": {"model": "m"},
        },
    }))
    mc = ModeConfigManager(str(cfg_path))

    seen = {}

    class FakeWorker:
        def close(self):
            pass

    def factory(worker_id, model_path, *, loras=None):
        seen["loras"] = loras
        return FakeWorker()

    pool = WorkerPool(
        queue_max=4, worker_factory=factory, mode_config=mc,
        registry=ModelRegistry(total_hbm_bytes=1 << 30),
    )
    try:
        assert seen["loras"] is not None
        assert seen["loras"][0].strength == 0.7
        pool.switch_mode("plain").result(timeout=10)
        assert seen["loras"] is None or seen["loras"] == []
    finally:
        pool.shutdown()

    # plain signature still works
    def plain_factory(worker_id, model_path):
        return FakeWorker()

    pool2 = WorkerPool(
        queue_max=4, worker_factory=plain_factory, mode_config=mc,
        registry=ModelRegistry(total_hbm_bytes=1 << 30),
    )
    pool2.shutdown()
