"""Packed q/k/v projections (round-4 MFU lever).

The pipeline packs every attention site's projections into one stacked
weight at placement time (models.unet.pack_attention_params): q/k/v for
self-attention, k/v for cross. These tests pin the invariants:

- packed forward ≡ unpacked forward (same contraction, same reduction axis);
- the LoRA merge addresses slices of packed weights and matches the
  merge-then-pack result;
- tensor-parallel sharding rules cover the packed leaves (output features
  sharded, the Megatron head-parallel property preserved).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dreamlab_tpu.models import configs, unet
from dreamlab_tpu.models.unet import pack_attention_params


@pytest.fixture(scope="module")
def tiny():
    cfg = configs.TINY_UNET
    params = unet.init_params(cfg, np.random.RandomState(0))
    return cfg, params


def _forward(cfg, params, seed=0):
    rs = np.random.RandomState(seed)
    sample = jnp.asarray(rs.randn(2, 16, 16, cfg.in_channels), jnp.float32)
    t = jnp.asarray([999, 500], jnp.int32)
    ctx = jnp.asarray(rs.randn(2, 7, cfg.cross_attention_dim), jnp.float32)
    kw = {}
    if cfg.time_cond_proj_dim:
        kw["timestep_cond"] = jnp.asarray(
            rs.randn(2, cfg.time_cond_proj_dim), jnp.float32
        )
    return np.asarray(unet.forward(params, cfg, sample, t, ctx, **kw))


def test_packed_structure(tiny):
    cfg, params = tiny
    packed = pack_attention_params(params)
    blk = packed["down"][0]["attentions"][0]["blocks"][0]
    a1, a2 = blk["attn1"], blk["attn2"]
    assert set(a1) == {"qkv", "out"}
    assert set(a2) == {"q", "kv", "out"}
    c = cfg.block_out_channels[0]
    assert a1["qkv"]["w"].shape == (c, 3, c)
    assert a2["kv"]["w"].shape == (cfg.cross_attention_dim, 2, c)
    # idempotent; original untouched
    repacked = pack_attention_params(packed)
    assert set(repacked["down"][0]["attentions"][0]["blocks"][0]["attn1"]) == {
        "qkv", "out",
    }
    assert "q" in params["down"][0]["attentions"][0]["blocks"][0]["attn1"]


def test_packed_forward_matches_unpacked(tiny):
    cfg, params = tiny
    want = _forward(cfg, params)
    got = _forward(cfg, pack_attention_params(params))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_lora_merge_targets_packed_slices(tiny):
    from dreamlab_tpu.lora import merge_lora_into_tree

    cfg, params = tiny
    packed = pack_attention_params(params)
    c = cfg.block_out_channels[0]
    rs = np.random.RandomState(3)
    rank = 4
    mods = {
        # self-attention q and v (packed into qkv slots 0 and 2)
        "down.0.attentions.0.blocks.0.attn1.q": (
            rs.randn(rank, c).astype(np.float32),
            rs.randn(c, rank).astype(np.float32), float(rank)),
        "down.0.attentions.0.blocks.0.attn1.v": (
            rs.randn(rank, c).astype(np.float32),
            rs.randn(c, rank).astype(np.float32), float(rank)),
        # cross-attention k (packed into kv slot 0) and unpacked-q (direct)
        "down.0.attentions.0.blocks.0.attn2.k": (
            rs.randn(rank, cfg.cross_attention_dim).astype(np.float32),
            rs.randn(c, rank).astype(np.float32), float(rank)),
        "down.0.attentions.0.blocks.0.attn2.q": (
            rs.randn(rank, c).astype(np.float32),
            rs.randn(c, rank).astype(np.float32), float(rank)),
    }
    merged_unpacked = merge_lora_into_tree(params, mods, scale=0.7)
    merged_packed = merge_lora_into_tree(packed, mods, scale=0.7)

    want = pack_attention_params(merged_unpacked)
    blk = "down", 0, "attentions", 0, "blocks", 0

    def get(tree, *extra):
        node = tree
        for part in blk + extra:
            node = node[part]
        return np.asarray(node)

    np.testing.assert_allclose(
        get(merged_packed, "attn1", "qkv", "w"),
        get(want, "attn1", "qkv", "w"), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        get(merged_packed, "attn2", "kv", "w"),
        get(want, "attn2", "kv", "w"), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        get(merged_packed, "attn2", "q", "w"),
        get(want, "attn2", "q", "w"), rtol=1e-5, atol=1e-6)
    # untouched slot (attn1 k) unchanged
    np.testing.assert_array_equal(
        get(merged_packed, "attn1", "qkv", "w")[:, 1],
        get(pack_attention_params(params), "attn1", "qkv", "w")[:, 1])
    # merged forward agrees between layouts end-to-end
    np.testing.assert_allclose(
        _forward(cfg, merged_packed), _forward(cfg, merged_unpacked),
        rtol=2e-5, atol=2e-5)


def test_tp_spec_covers_packed_leaves(tiny):
    from jax.sharding import PartitionSpec as P

    from dreamlab_tpu.parallel.sharding import _tp_spec_for_path

    assert _tp_spec_for_path("down.0.attentions.0.blocks.0.attn1.qkv.w", 3) \
        == P(None, None, "model")
    assert _tp_spec_for_path("mid.attention.blocks.0.attn2.kv.w", 3) \
        == P(None, None, "model")
    assert _tp_spec_for_path("up.1.attentions.2.blocks.0.attn2.q.w", 2) \
        == P(None, "model")
    assert _tp_spec_for_path("up.1.attentions.2.blocks.0.attn1.out.w", 2) \
        == P("model", None)
