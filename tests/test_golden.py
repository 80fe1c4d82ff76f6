"""Golden regression net: a fixed tiny checkpoint + seed must keep producing
the same image across refactors.

The tiny checkpoint is generated from fixed numpy RandomState seeds
(tests/test_loader.make_tiny_checkpoint), so this pins the whole chain —
tokenizer → CLIP → LCM schedule → UNet → VAE → uint8 — against committed
reference outputs. Latents compare with a small tolerance (XLA version
bumps may move the last ulp); pixels allow a ±1 uint8 rounding band.
"""

import os

import numpy as np

import jax.numpy as jnp

from dreamlab_tpu.loader import load_pipeline
from dreamlab_tpu.pipeline import LCMPipeline
from tests.test_loader import make_tiny_checkpoint

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_golden_tiny_sd15_seed7(tmp_path):
    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    pipe = LCMPipeline(load_pipeline(ckpt), dtype=jnp.float32)
    res = pipe.generate("a cat at sunset", height=32, width=32,
                        num_inference_steps=2, seed=7)

    want_lat = np.load(os.path.join(GOLDEN, "tiny_sd15_seed7_latents.npy"))
    np.testing.assert_allclose(res.latents, want_lat, rtol=1e-4, atol=1e-3)

    want_px = np.load(os.path.join(GOLDEN, "tiny_sd15_seed7_pixels.npy"))
    diff = np.abs(res.images.astype(np.int16) - want_px.astype(np.int16))
    assert diff.max() <= 1, f"pixel drift: max delta {diff.max()}"
    assert (diff > 0).mean() < 0.01, "more than 1% of pixels moved"
