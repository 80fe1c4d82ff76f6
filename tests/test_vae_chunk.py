"""Spatially-chunked VAE decode (round 4 — the 'chunk if HBM-bound' prose
in docs/PERFORMANCE.md made real).

vae.decode_tiled splits latents into fixed-shape tiles with overlap and
feather-blends the decoded chunks — the XLA analogue of diffusers'
vae.enable_tiling (/root/reference/backends/cuda_worker.py:91,391). The
approximation is bounded by the decoder's receptive field vs the overlap;
these tests pin (a) near-parity with full-frame decode, (b) the pipeline's
env gating, (c) determinism through the chunked path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dreamlab_tpu.models import configs, vae


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = configs.TINY_VAE
    params = vae.init_decoder_params(cfg, np.random.RandomState(0))
    return cfg, params


def test_tiled_matches_full_decode(tiny_vae):
    """Tiling error comes from per-tile GroupNorm statistics (same
    approximation diffusers tiling makes); it shrinks ~1/sqrt(tile area).
    The tiny 16-latent tiles here are the WORST case — production tiles are
    64 latent px (16× the samples per GN group) — so the bound is loose in
    absolute terms but pins that the path blends/covers correctly."""
    cfg, params = tiny_vae
    rs = np.random.RandomState(1)
    lat = jnp.asarray(rs.randn(2, 24, 24, cfg.latent_channels), jnp.float32)
    full = np.asarray(vae.decode(params, cfg, lat))
    tiled = np.asarray(vae.decode_tiled(params, cfg, lat, tile=16, overlap=8))
    assert tiled.shape == full.shape
    err = np.abs(tiled - full)
    assert err.mean() < 0.05, err.mean()   # [-1, 1] scale
    assert err.max() < 0.5, err.max()
    # a tile covering the whole frame is EXACT (no stats change, no seams)
    whole = np.asarray(vae.decode_tiled(params, cfg, lat, tile=24, overlap=8))
    np.testing.assert_array_equal(whole, full)


def test_tiled_small_input_passthrough(tiny_vae):
    cfg, params = tiny_vae
    rs = np.random.RandomState(2)
    lat = jnp.asarray(rs.randn(1, 8, 8, cfg.latent_channels), jnp.float32)
    full = np.asarray(vae.decode(params, cfg, lat))
    tiled = np.asarray(vae.decode_tiled(params, cfg, lat, tile=16, overlap=4))
    np.testing.assert_array_equal(tiled, full)  # no chunking, no change


def test_tile_starts_cover_and_clamp():
    assert vae._tile_starts(24, 16, 8) == [0, 8]
    assert vae._tile_starts(25, 16, 8) == [0, 8, 9]  # clamped final tile
    assert vae._tile_starts(16, 16, 8) == [0]


def test_pipeline_env_gated_chunk(monkeypatch):
    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle

    bundle = random_bundle("sd15", tiny=True)
    kw = dict(height=64, width=64, num_inference_steps=2, seed=9)

    ref_pipe = LCMPipeline(bundle, dtype=jnp.float32)
    assert ref_pipe._vae_chunk == 160  # auto default
    full = ref_pipe.generate("a cat", **kw).images

    # tiny bundle: 64px → latent 16; threshold 8 forces the tiled path
    monkeypatch.setenv("DREAMLAB_VAE_CHUNK", "8")
    monkeypatch.setenv("DREAMLAB_VAE_TILE", "8")
    pipe = LCMPipeline(bundle, dtype=jnp.float32)
    assert pipe._vae_chunk == 8
    chunked = pipe.generate("a cat", **kw).images
    assert chunked.shape == full.shape
    # worst-case tiny tiles (see test_tiled_matches_full_decode): bound the
    # drift, don't expect pixel equality
    err = np.abs(chunked.astype(int) - full.astype(int))
    assert np.mean(err) < 16, np.mean(err)
    # per-request determinism holds through the chunked program
    again = pipe.generate("a cat", **kw).images
    np.testing.assert_array_equal(chunked, again)

    monkeypatch.setenv("DREAMLAB_VAE_CHUNK", "off")
    off = LCMPipeline(bundle, dtype=jnp.float32)
    assert off._vae_chunk is None
    np.testing.assert_array_equal(off.generate("a cat", **kw).images, full)
