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
