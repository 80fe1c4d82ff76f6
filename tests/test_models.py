"""Model forward passes at tiny widths: shapes, dtypes, jit-compatibility,
and structural invariants (skip bookkeeping, SDXL micro-conditioning, VAE
round-trip dims, SR pixel-shuffle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dreamlab_tpu.models import clip_text, configs, superres, unet, vae
from dreamlab_tpu.models.layers import cast_tree, depth_to_space, tree_bytes


def test_clip_text_shapes():
    cfg = configs.TINY_TEXT
    params = clip_text.init_params(cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 100, (2, 77)), jnp.int32)
    seq, pooled = jax.jit(lambda p, i: clip_text.encode_text(p, i, cfg))(params, ids)
    assert seq.shape == (2, 77, cfg.hidden_size)
    assert pooled.shape == (2, cfg.hidden_size)


def test_clip_penultimate_and_projection_differ():
    rs = np.random.RandomState(1)
    base = configs.TINY_TEXT
    pen = configs.CLIPTextConfig(**{**base.__dict__, "penultimate": True})
    proj = configs.CLIPTextConfig(**{**base.__dict__, "projection_dim": 16})
    params = clip_text.init_params(proj, np.random.RandomState(0))
    ids = jnp.asarray(rs.randint(1, 100, (1, 77)), jnp.int32)
    seq_f, _ = clip_text.encode_text(params, ids, base)
    seq_p, pooled = clip_text.encode_text(params, ids, pen)
    assert not np.allclose(np.asarray(seq_f), np.asarray(seq_p))
    _, pooled_proj = clip_text.encode_text(params, ids, proj)
    assert pooled_proj.shape == (1, 16)


@pytest.mark.parametrize("h,w", [(32, 32), (32, 48)])
def test_unet_sd15_topology(h, w):
    cfg = configs.TINY_UNET
    params = unet.init_params(cfg)
    rs = np.random.RandomState(0)
    sample = jnp.asarray(rs.randn(2, h // 8, w // 8, 4), jnp.float32)
    ts = jnp.asarray([999, 999], jnp.int32)
    ctx = jnp.asarray(rs.randn(2, 77, cfg.cross_attention_dim), jnp.float32)
    w_emb = jnp.asarray(rs.randn(2, cfg.time_cond_proj_dim), jnp.float32)

    out = jax.jit(
        lambda p, s, t, c, wc: unet.forward(p, cfg, s, t, c, timestep_cond=wc)
    )(params, sample, ts, ctx, w_emb)
    assert out.shape == sample.shape
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_unet_sdxl_topology():
    cfg = configs.TINY_UNET_XL
    params = unet.init_params(cfg)
    rs = np.random.RandomState(0)
    sample = jnp.asarray(rs.randn(1, 8, 8, 4), jnp.float32)
    ts = jnp.asarray([500], jnp.int32)
    ctx = jnp.asarray(rs.randn(1, 77, cfg.cross_attention_dim), jnp.float32)
    pooled = jnp.asarray(rs.randn(1, 32), jnp.float32)
    time_ids = jnp.asarray([[64, 64, 0, 0, 64, 64]], jnp.float32)
    out = unet.forward(
        params, cfg, sample, ts, ctx,
        added_text_embeds=pooled, added_time_ids=time_ids,
    )
    assert out.shape == sample.shape
    assert np.isfinite(np.asarray(out)).all()


def test_unet_bf16_params_fp32_output():
    cfg = configs.TINY_UNET
    params = cast_tree(unet.init_params(cfg), jnp.bfloat16)
    rs = np.random.RandomState(0)
    sample = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    out = unet.forward(
        params, cfg, sample, jnp.asarray([1], jnp.int32),
        jnp.asarray(rs.randn(1, 77, cfg.cross_attention_dim), jnp.float32),
        timestep_cond=jnp.asarray(rs.randn(1, cfg.time_cond_proj_dim), jnp.float32),
    )
    assert out.dtype == jnp.float32


def test_unet_guidance_cond_changes_output():
    cfg = configs.TINY_UNET
    params = unet.init_params(cfg)
    rs = np.random.RandomState(0)
    sample = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    ctx = jnp.asarray(rs.randn(1, 77, cfg.cross_attention_dim), jnp.float32)
    ts = jnp.asarray([100], jnp.int32)
    w1 = jnp.zeros((1, cfg.time_cond_proj_dim), jnp.float32)
    w2 = jnp.ones((1, cfg.time_cond_proj_dim), jnp.float32)
    o1 = unet.forward(params, cfg, sample, ts, ctx, timestep_cond=w1)
    o2 = unet.forward(params, cfg, sample, ts, ctx, timestep_cond=w2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_vae_decode_shapes():
    cfg = configs.TINY_VAE
    params = vae.init_decoder_params(cfg)
    rs = np.random.RandomState(0)
    lat = jnp.asarray(rs.randn(2, 8, 8, 4), jnp.float32)
    img = jax.jit(lambda p, z: vae.decode(p, cfg, z))(params, lat)
    # 2 blocks → one upsample → 2× spatial
    assert img.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_vae_encode_decode_roundtrip_shapes():
    cfg = configs.TINY_VAE
    enc = vae.init_encoder_params(cfg)
    dec = vae.init_decoder_params(cfg)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, 16, 16, 3) * 2 - 1, jnp.float32)
    moments = vae.encode_moments(enc, cfg, img)
    assert moments.shape == (1, 8, 8, 8)
    mean = moments[..., :4]
    out = vae.decode(dec, cfg, mean)
    assert out.shape == img.shape


def test_superres_forward_and_tiling():
    cfg = configs.SuperResConfig(tile=16)
    params = superres.init_params(cfg)
    rs = np.random.RandomState(0)
    y = rs.rand(20, 28).astype(np.float32)  # non-multiple of tile
    out = superres.upscale_luma(params, cfg, y)
    assert out.shape == (60, 84)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_depth_to_space_matches_torch_pixel_shuffle():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 5, 9).astype(np.float32)  # NHWC, C = 1 * 3²
    got = np.asarray(depth_to_space(jnp.asarray(x), 3))
    want = (
        torch.nn.functional.pixel_shuffle(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 3
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_tree_bytes_counts_params():
    cfg = configs.TINY_UNET
    params = unet.init_params(cfg)
    n = tree_bytes(params)
    assert n > 100_000  # tiny but non-trivial
    half = tree_bytes(cast_tree(params, jnp.bfloat16))
    assert abs(half * 2 - n) / n < 0.01
