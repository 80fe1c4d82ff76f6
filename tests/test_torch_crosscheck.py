"""Cross-framework numerics: this framework's layers/models vs torch and
transformers implementations (both available CPU-only in this image).

The CLIP check is end-to-end: a transformers CLIPTextModel with random
weights is exported through the production converter and must produce the
same hidden states / pooled output — validating the converter key mapping
AND the model math against the upstream implementation the reference uses
(rknnlcm.py drives the same tower as an ONNX graph).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from dreamlab_tpu.loader import convert_clip_text, text_config_from_json
from dreamlab_tpu.models import clip_text
from dreamlab_tpu.models.layers import conv2d, group_norm, layer_norm


def test_conv2d_matches_torch():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 9, 11, 5).astype(np.float32)  # NHWC
    w = rs.randn(3, 3, 5, 7).astype(np.float32)  # HWIO
    b = rs.randn(7).astype(np.float32)
    got = np.asarray(conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                            jnp.asarray(x)))
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(3, 2, 0, 1)),
        torch.from_numpy(b), padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_strided_conv_matches_torch():
    rs = np.random.RandomState(1)
    x = rs.randn(1, 8, 8, 4).astype(np.float32)
    w = rs.randn(3, 3, 4, 6).astype(np.float32)
    got = np.asarray(conv2d({"w": jnp.asarray(w)}, jnp.asarray(x), stride=2))
    # SAME padding with stride 2 on even dims == torch pad=1 semantics
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(3, 2, 0, 1)),
        stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_group_norm_matches_torch():
    rs = np.random.RandomState(2)
    x = rs.randn(2, 6, 5, 8).astype(np.float32)
    scale = rs.randn(8).astype(np.float32)
    bias = rs.randn(8).astype(np.float32)
    got = np.asarray(group_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        jnp.asarray(x), groups=4,
    ))
    want = torch.nn.functional.group_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 4,
        torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    rs = np.random.RandomState(3)
    x = rs.randn(2, 7, 16).astype(np.float32)
    scale = rs.randn(16).astype(np.float32)
    bias = rs.randn(16).astype(np.float32)
    got = np.asarray(layer_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        jnp.asarray(x),
    ))
    want = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(scale),
        torch.from_numpy(bias), eps=1e-5,
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_clip_text_matches_transformers():
    """Full text tower vs transformers CLIPTextModel (random weights,
    converted through the production key mapping)."""
    transformers = pytest.importorskip("transformers")

    cfg_json = {
        "vocab_size": 120,
        "hidden_size": 64,
        "num_hidden_layers": 3,
        "num_attention_heads": 4,
        "intermediate_size": 128,
        "max_position_embeddings": 77,
        "hidden_act": "quick_gelu",
        "architectures": ["CLIPTextModel"],
    }
    # eos_token_id must name the toy vocab's EOS (119): transformers pools at
    # the first EOS occurrence; this framework uses CLIP's argmax convention
    # (EOS is the max id, and padding reuses it — identical position)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=120, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=77, hidden_act="quick_gelu",
        bos_token_id=0, eos_token_id=119,
    )
    torch.manual_seed(0)
    hf_model = transformers.CLIPTextModel(hf_cfg).eval()

    state = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    my_cfg = text_config_from_json(cfg_json)
    params = convert_clip_text(state, my_cfg)

    rs = np.random.RandomState(0)
    ids = np.full((2, 77), 49407 % 120, np.int64)
    lens = [9, 30]
    for row, n in enumerate(lens):
        ids[row, 0] = 0
        ids[row, 1:n - 1] = rs.randint(1, 119, n - 2)
        ids[row, n - 1] = 119  # highest id = EOS position via argmax

    with torch.no_grad():
        out = hf_model(input_ids=torch.from_numpy(ids))
    want_seq = out.last_hidden_state.numpy()
    want_pooled = out.pooler_output.numpy()

    got_seq, got_pooled = clip_text.encode_text(
        params, jnp.asarray(ids, jnp.int32), my_cfg
    )
    np.testing.assert_allclose(np.asarray(got_seq), want_seq,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_pooled), want_pooled,
                               rtol=2e-4, atol=2e-5)


def test_resnet_block_matches_torch_reference():
    """_resnet vs a torch block written from the diffusers ResnetBlock2D
    semantics (GN→SiLU→conv → +time → GN→SiLU→conv → +skip)."""
    from dreamlab_tpu.models.unet import _resnet
    from dreamlab_tpu.models import unet as unet_mod
    from dreamlab_tpu.models import configs

    rs = np.random.RandomState(0)
    cin, cout, temb_dim, groups = 8, 12, 16, 4
    p = unet_mod._init_resnet(rs, cin, cout, temb_dim, groups, np.float32)
    x = rs.randn(2, 6, 6, cin).astype(np.float32)
    emb = rs.randn(2, temb_dim).astype(np.float32)

    got = np.asarray(_resnet(
        {k: {kk: jnp.asarray(vv) for kk, vv in v.items()} for k, v in p.items()},
        jnp.asarray(x), jnp.asarray(emb), groups=groups,
    ))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    et = torch.from_numpy(emb)

    def t_conv(pp, inp, stride=1):
        return torch.nn.functional.conv2d(
            inp, torch.from_numpy(pp["w"].transpose(3, 2, 0, 1)),
            torch.from_numpy(pp["b"]), stride=stride,
            padding=pp["w"].shape[0] // 2,
        )

    def t_gn(pp, inp):
        return torch.nn.functional.group_norm(
            inp, groups, torch.from_numpy(pp["scale"]),
            torch.from_numpy(pp["bias"]), eps=1e-5,
        )

    with torch.no_grad():
        h = t_conv(p["conv1"], torch.nn.functional.silu(t_gn(p["norm1"], xt)))
        t = torch.nn.functional.linear(
            torch.nn.functional.silu(et),
            torch.from_numpy(p["time_emb_proj"]["w"].T),
            torch.from_numpy(p["time_emb_proj"]["b"]),
        )
        h = h + t[:, :, None, None]
        h = t_conv(p["conv2"], torch.nn.functional.silu(t_gn(p["norm2"], h)))
        skip = t_conv(p["shortcut"], xt)
        want = (skip + h).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_unet_attention_matches_torch_sdpa():
    from dreamlab_tpu.models.unet import _attention, _init_attn

    rs = np.random.RandomState(1)
    c, heads, n, m, ctx_dim = 16, 4, 10, 7, 12
    p = _init_attn(rs, c, ctx_dim, np.float32)
    x = rs.randn(2, n, c).astype(np.float32)
    ctx = rs.randn(2, m, ctx_dim).astype(np.float32)

    got = np.asarray(_attention(
        {k: {kk: jnp.asarray(vv) for kk, vv in v.items()} for k, v in p.items()},
        jnp.asarray(x), jnp.asarray(ctx), heads=heads,
    ))

    def lin(pp, inp):
        w = torch.from_numpy(pp["w"].T)
        b = torch.from_numpy(pp["b"]) if "b" in pp else None
        return torch.nn.functional.linear(inp, w, b)

    with torch.no_grad():
        xt, ct = torch.from_numpy(x), torch.from_numpy(ctx)
        q = lin(p["q"], xt).reshape(2, n, heads, c // heads).transpose(1, 2)
        k = lin(p["k"], ct).reshape(2, m, heads, c // heads).transpose(1, 2)
        v = lin(p["v"], ct).reshape(2, m, heads, c // heads).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(2, n, c)
        want = lin(p["out"], o).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_timestep_embedding_matches_diffusers_formula():
    """flip_sin_to_cos=True, freq_shift=0 — the SD1.5 convention; an error
    here would silently corrupt all denoising."""
    from dreamlab_tpu.models.layers import timestep_embedding

    t = np.array([0, 1, 999], np.float32)
    dim = 32
    got = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float64) / half
    emb = t[:, None].astype(np.float64) * np.exp(exponent)[None]
    want = np.concatenate([np.cos(emb), np.sin(emb)], axis=-1)  # flipped
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # t=0: cos half = 1, sin half = 0
    np.testing.assert_allclose(got[0, :half], 1.0, atol=1e-6)
    np.testing.assert_allclose(got[0, half:], 0.0, atol=1e-6)
