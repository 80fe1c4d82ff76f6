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


# ---------------------------------------------------------------------------
# full-graph UNet cross-check: an independent torch forward over the same
# (torch-named) tensors produced by the test exporters
# ---------------------------------------------------------------------------


class _TorchUNetRef:
    """Minimal torch UNet2DConditionModel forward, written from the
    diffusers semantics (not from this repo's JAX code): NCHW, torch ops
    only. Consumes the flat torch-named dict from tests.test_loader.export_unet."""

    def __init__(self, sd, cfg):
        self.sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
        self.cfg = cfg

    def p(self, key):
        return self.sd[key + ".weight"], self.sd.get(key + ".bias")

    def conv(self, key, x, stride=1):
        w, b = self.p(key)
        return torch.nn.functional.conv2d(x, w, b, stride=stride,
                                          padding=w.shape[-1] // 2)

    def lin(self, key, x):
        w, b = self.p(key)
        return torch.nn.functional.linear(x, w, b)

    def gn(self, key, x, eps=1e-5):
        w, b = self.p(key)
        return torch.nn.functional.group_norm(x, self.cfg.norm_groups, w, b, eps)

    def ln(self, key, x):
        w, b = self.p(key)
        return torch.nn.functional.layer_norm(x, (x.shape[-1],), w, b, 1e-5)

    def time_embedding(self, t):
        dim = self.cfg.block_out_channels[0]
        half = dim // 2
        expo = -np.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
        ang = t[:, None].double() * torch.exp(expo)[None]
        emb = torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1).float()
        return emb

    def resnet(self, key, x, emb):
        h = self.conv(key + ".conv1", torch.nn.functional.silu(self.gn(key + ".norm1", x)))
        t = self.lin(key + ".time_emb_proj", torch.nn.functional.silu(emb))
        h = h + t[:, :, None, None]
        h = self.conv(key + ".conv2", torch.nn.functional.silu(self.gn(key + ".norm2", h)))
        if key + ".conv_shortcut.weight" in self.sd:
            x = self.conv(key + ".conv_shortcut", x)
        return x + h

    def attn(self, key, x, ctx, heads):
        b, n, c = x.shape
        d = c // heads
        q = self.lin(key + ".to_q", x).view(b, n, heads, d).transpose(1, 2)
        k = self.lin(key + ".to_k", ctx).view(b, ctx.shape[1], heads, d).transpose(1, 2)
        v = self.lin(key + ".to_v", ctx).view(b, ctx.shape[1], heads, d).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        return self.lin(key + ".to_out.0", o.transpose(1, 2).reshape(b, n, c))

    def transformer(self, key, x, ctx, heads, n_layers):
        b, c, hh, ww = x.shape
        res = x
        h = torch.nn.functional.group_norm(
            x, self.cfg.norm_groups, *self.p(key + ".norm"), 1e-6)
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = self.lin(key + ".proj_in", h)
        for i in range(n_layers):
            bk = f"{key}.transformer_blocks.{i}"
            h = h + self.attn(bk + ".attn1", self.ln(bk + ".norm1", h), self.ln(bk + ".norm1", h), heads)
            h = h + self.attn(bk + ".attn2", self.ln(bk + ".norm2", h), ctx, heads)
            ff = self.lin(bk + ".ff.net.0.proj", self.ln(bk + ".norm3", h))
            a, g = ff.chunk(2, dim=-1)
            h = h + self.lin(bk + ".ff.net.2", a * torch.nn.functional.gelu(g))
        h = self.lin(key + ".proj_out", h)
        return h.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + res

    def fourier(self, t, dim):
        half = dim // 2
        expo = -np.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
        ang = t.reshape(-1)[:, None].double() * torch.exp(expo)[None]
        return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1).float()

    def forward(self, sample, t, ctx, w_cond=None, pooled=None, time_ids=None):
        cfg = self.cfg
        temb = self.time_embedding(t)
        if w_cond is not None and "time_embedding.cond_proj.weight" in self.sd:
            temb = temb + torch.nn.functional.linear(
                w_cond, self.sd["time_embedding.cond_proj.weight"])
        emb = self.lin("time_embedding.linear_1", temb)
        emb = self.lin("time_embedding.linear_2", torch.nn.functional.silu(emb))
        if cfg.addition_embed_type == "text_time":
            tid = self.fourier(time_ids, cfg.addition_time_embed_dim)
            tid = tid.reshape(time_ids.shape[0], -1)
            add = torch.cat([pooled, tid], dim=-1)
            a = self.lin("add_embedding.linear_1", add)
            emb = emb + self.lin("add_embedding.linear_2",
                                 torch.nn.functional.silu(a))

        x = self.conv("conv_in", sample)
        skips = [x]
        n_blocks = cfg.num_blocks
        for i in range(n_blocks):
            tl = cfg.transformer_layers_per_block[i]
            for j in range(cfg.layers_per_block):
                x = self.resnet(f"down_blocks.{i}.resnets.{j}", x, emb)
                if tl:
                    x = self.transformer(f"down_blocks.{i}.attentions.{j}", x,
                                         self._ctx, cfg.num_attention_heads[i], tl)
                skips.append(x)
            if i < n_blocks - 1:
                x = self.conv(f"down_blocks.{i}.downsamplers.0.conv", x, stride=2)
                skips.append(x)

        x = self.resnet("mid_block.resnets.0", x, emb)
        if cfg.has_mid_attention:
            x = self.transformer("mid_block.attentions.0", x, self._ctx,
                                 cfg.num_attention_heads[-1],
                                 cfg.mid_block_transformer_layers)
        x = self.resnet("mid_block.resnets.1", x, emb)

        for k in range(n_blocks):
            i = n_blocks - 1 - k
            tl = cfg.transformer_layers_per_block[i]
            for j in range(cfg.layers_per_block + 1):
                x = torch.cat([x, skips.pop()], dim=1)
                x = self.resnet(f"up_blocks.{k}.resnets.{j}", x, emb)
                if tl:
                    x = self.transformer(f"up_blocks.{k}.attentions.{j}", x,
                                         self._ctx, cfg.num_attention_heads[i], tl)
            if k < n_blocks - 1:
                x = torch.nn.functional.interpolate(x, scale_factor=2, mode="nearest")
                x = self.conv(f"up_blocks.{k}.upsamplers.0.conv", x)

        x = torch.nn.functional.silu(self.gn("conv_norm_out", x))
        return self.conv("conv_out", x)


def test_unet_full_graph_matches_torch_reference():
    from dreamlab_tpu.models import configs, unet
    from tests.test_loader import export_unet

    cfg = configs.TINY_UNET
    params = unet.init_params(cfg, np.random.RandomState(0))
    sd = export_unet(params, cfg)

    rs = np.random.RandomState(7)
    sample = rs.randn(2, 8, 8, 4).astype(np.float32)
    t = np.array([999, 17], np.float32)
    ctx = rs.randn(2, 77, cfg.cross_attention_dim).astype(np.float32)
    w_cond = rs.randn(2, cfg.time_cond_proj_dim).astype(np.float32)

    got = np.asarray(unet.forward(
        params, cfg, jnp.asarray(sample), jnp.asarray(t, jnp.int32),
        jnp.asarray(ctx), timestep_cond=jnp.asarray(w_cond),
    ))

    ref = _TorchUNetRef(sd, cfg)
    ref._ctx = torch.from_numpy(ctx)
    with torch.no_grad():
        want = ref.forward(
            torch.from_numpy(sample.transpose(0, 3, 1, 2)),
            torch.from_numpy(t), torch.from_numpy(ctx),
            torch.from_numpy(w_cond),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-4)


def test_unet_sdxl_full_graph_matches_torch_reference():
    from dreamlab_tpu.models import configs, unet
    from tests.test_loader import export_unet

    cfg = configs.TINY_UNET_XL
    params = unet.init_params(cfg, np.random.RandomState(1))
    sd = export_unet(params, cfg)

    rs = np.random.RandomState(8)
    sample = rs.randn(1, 8, 8, 4).astype(np.float32)
    t = np.array([500], np.float32)
    ctx = rs.randn(1, 77, cfg.cross_attention_dim).astype(np.float32)
    pooled = rs.randn(1, 32).astype(np.float32)
    time_ids = np.array([[64, 64, 0, 0, 64, 64]], np.float32)

    got = np.asarray(unet.forward(
        params, cfg, jnp.asarray(sample), jnp.asarray(t, jnp.int32),
        jnp.asarray(ctx), added_text_embeds=jnp.asarray(pooled),
        added_time_ids=jnp.asarray(time_ids),
    ))

    ref = _TorchUNetRef(sd, cfg)
    ref._ctx = torch.from_numpy(ctx)
    with torch.no_grad():
        want = ref.forward(
            torch.from_numpy(sample.transpose(0, 3, 1, 2)),
            torch.from_numpy(t), torch.from_numpy(ctx),
            pooled=torch.from_numpy(pooled),
            time_ids=torch.from_numpy(time_ids),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-4)


def test_vae_decoder_full_graph_matches_torch_reference():
    from dreamlab_tpu.models import configs, vae
    from tests.test_loader import export_vae_decoder

    cfg = configs.TINY_VAE
    params = vae.init_decoder_params(cfg, np.random.RandomState(2))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_vae_decoder(params, cfg).items()}

    def conv(key, x, stride=1):
        w = sd[key + ".weight"]
        return torch.nn.functional.conv2d(x, w, sd.get(key + ".bias"),
                                          stride=stride, padding=w.shape[-1] // 2)

    def gn(key, x, eps=1e-5):
        return torch.nn.functional.group_norm(
            x, cfg.norm_groups, sd[key + ".weight"], sd[key + ".bias"], eps)

    def resnet(key, x):
        h = conv(key + ".conv1", torch.nn.functional.silu(gn(key + ".norm1", x)))
        h = conv(key + ".conv2", torch.nn.functional.silu(gn(key + ".norm2", h)))
        if key + ".conv_shortcut.weight" in sd:
            x = conv(key + ".conv_shortcut", x)
        return x + h

    def mid_attn(key, x):
        b, c, hh, ww = x.shape
        h = torch.nn.functional.group_norm(
            x, cfg.norm_groups, sd[key + ".group_norm.weight"],
            sd[key + ".group_norm.bias"], 1e-6)
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)

        def lin(k2, inp):
            return torch.nn.functional.linear(inp, sd[k2 + ".weight"],
                                              sd.get(k2 + ".bias"))

        q = lin(key + ".to_q", h)[:, None]
        k = lin(key + ".to_k", h)[:, None]
        v = lin(key + ".to_v", h)[:, None]
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)[:, 0]
        o = lin(key + ".to_out.0", o)
        return o.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + x

    rs = np.random.RandomState(9)
    lat = rs.randn(1, 8, 8, 4).astype(np.float32)
    got = np.asarray(vae.decode(params, cfg, jnp.asarray(lat)))

    with torch.no_grad():
        x = torch.from_numpy(lat.transpose(0, 3, 1, 2))
        x = conv("post_quant_conv", x)
        x = conv("decoder.conv_in", x)
        x = resnet("decoder.mid_block.resnets.0", x)
        x = mid_attn("decoder.mid_block.attentions.0", x)
        x = resnet("decoder.mid_block.resnets.1", x)
        n = len(cfg.block_out_channels)
        for k in range(n):
            for j in range(cfg.layers_per_block + 1):
                x = resnet(f"decoder.up_blocks.{k}.resnets.{j}", x)
            if k < n - 1:
                x = torch.nn.functional.interpolate(x, scale_factor=2,
                                                    mode="nearest")
                x = conv(f"decoder.up_blocks.{k}.upsamplers.0.conv", x)
        x = torch.nn.functional.silu(gn("decoder.conv_norm_out", x))
        want = conv("decoder.conv_out", x).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-4)
