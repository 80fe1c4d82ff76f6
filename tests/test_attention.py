"""Flash-attention kernel vs the XLA reference path.

On CPU the Pallas kernel runs in interpreter mode — numerics only; the
compiled path is exercised by the TPU-gated suite and the benchmarks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from dreamlab_tpu.ops.attention import _xla_attention, dot_product_attention


def _rand_qkv(rs, b, n, m, h, d, dtype=jnp.float32):
    q = jnp.asarray(rs.randn(b, n, h, d), dtype)
    k = jnp.asarray(rs.randn(b, m, h, d), dtype)
    v = jnp.asarray(rs.randn(b, m, h, d), dtype)
    return q, k, v


def test_xla_attention_matches_numpy():
    rs = np.random.RandomState(0)
    q, k, v = _rand_qkv(rs, 2, 16, 8, 2, 4)
    scale = 4**-0.5
    got = np.asarray(_xla_attention(q, k, v, scale))

    qn, kn, vn = map(np.asarray, (q, k, v))
    logits = np.einsum("bnhd,bmhd->bhnm", qn, kn) * scale
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    want = np.einsum("bhnm,bmhd->bnhd", p, vn)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "n,m,d",
    [
        (256, 256, 40),   # SD1.5 spatial self-attention shape class
        (256, 77, 40),    # cross-attention: kv padded 77→128 + masked
        (512, 256, 64),   # SDXL head dim
        (256, 300, 128),  # full-lane head dim, multi-block masked kv
    ],
)
def test_flash_matches_xla_interpret(n, m, d):
    rs = np.random.RandomState(1)
    q, k, v = _rand_qkv(rs, 1, n, m, 2, d)
    scale = d**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale))
    with pltpu.force_tpu_interpret_mode():
        from dreamlab_tpu.ops.flash_attention import flash_attention

        got = np.asarray(flash_attention(q, k, v, scale=scale, block_q=128))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_block_q_falls_to_divisor():
    """Non-square sizes (512x640 → n=1280 at the second UNet level) give
    query lengths that are 128-multiples but not 512-multiples; block_q must
    drop to the largest dividing 128-multiple instead of crashing at trace
    (ADVICE round 1)."""
    rs = np.random.RandomState(3)
    q, k, v = _rand_qkv(rs, 1, 1280, 1280, 1, 40)
    scale = 40**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale))
    with pltpu.force_tpu_interpret_mode():
        from dreamlab_tpu.ops.flash_attention import flash_attention

        got = np.asarray(flash_attention(q, k, v, scale=scale, block_q=512))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dispatcher_falls_back_off_tpu():
    rs = np.random.RandomState(2)
    q, k, v = _rand_qkv(rs, 1, 256, 256, 2, 40)
    out = dot_product_attention(q, k, v)  # auto → xla on CPU
    assert out.shape == q.shape


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 32), 8), ((1, 16, 12, 64), 16)])
def test_fused_groupnorm_matches_reference(shape, groups):
    from dreamlab_tpu.models.layers import group_norm, silu
    from dreamlab_tpu.ops.groupnorm import fused_group_norm_silu

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    scale = jnp.asarray(rs.randn(shape[-1]), jnp.float32)
    bias = jnp.asarray(rs.randn(shape[-1]), jnp.float32)
    want = silu(group_norm({"scale": scale, "bias": bias}, x, groups=groups))
    with pltpu.force_tpu_interpret_mode():
        got = fused_group_norm_silu(x, scale, bias, groups=groups, tile=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fused_groupnorm_padding_path():
    from dreamlab_tpu.models.layers import group_norm
    from dreamlab_tpu.ops.groupnorm import fused_group_norm_silu

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 5, 3, 16), jnp.float32)  # 15 rows, tile 8
    scale = jnp.ones((16,), jnp.float32)
    bias = jnp.zeros((16,), jnp.float32)
    want = group_norm({"scale": scale, "bias": bias}, x, groups=4)
    with pltpu.force_tpu_interpret_mode():
        got = fused_group_norm_silu(x, scale, bias, groups=4, silu=False, tile=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "h,d,expect_pack",
    [
        (8, 40, 2),    # SD1.5: largest divisor of 8 within 128/40 → 2
        (6, 40, 3),    # 3 heads/block when h divides
        (10, 64, 2),   # SDXL: 2 heads/block, no dead slots
        (8, 80, 1),    # narrow fallback: lane width 80, no pad to 128
        (2, 40, 2),    # pack capped at h
        (3, 24, 3),    # lane budget allows 5; h's divisors cap at 3
        (7, 40, 1),    # prime h: no divisor ≤ lane budget → unpacked
        (2, 20, 2),    # 20 not a multiple of 8 → 128-pad fallback
    ],
)
def test_flash_head_packing_matches_xla(h, d, expect_pack):
    """Round-5 packed kernel: PACK head-instances share each lane block
    (independent problems → MXU/VPU overlap, measured ~14% faster at the
    hot shape — scripts/ab_head_packing.py). Every geometry, including the
    dead-slot and fallback cases, must match XLA numerics."""
    from dreamlab_tpu.ops.flash_attention import _pack_geometry

    pack, L = _pack_geometry(h, d)
    if d % 8 == 0 and d <= 64:
        assert pack == expect_pack
        assert L == pack * d and h % pack == 0  # pack always divides h
    else:
        assert pack == 1

    rs = np.random.RandomState(7)
    q, k, v = _rand_qkv(rs, 2, 256, 256, h, d)
    scale = d**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale))
    with pltpu.force_tpu_interpret_mode():
        from dreamlab_tpu.ops.flash_attention import flash_attention

        got = np.asarray(flash_attention(q, k, v, scale=scale, block_q=128))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_packed_masked_kv_per_head():
    """kv masking must apply identically to every packed head (a bug that
    leaked NEG_INF into one lane group would skew exactly one head)."""
    rs = np.random.RandomState(9)
    q, k, v = _rand_qkv(rs, 1, 128, 77, 6, 40)  # pack=3, kv 77→128 masked
    scale = 40**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale))
    with pltpu.force_tpu_interpret_mode():
        from dreamlab_tpu.ops.flash_attention import flash_attention

        got = np.asarray(flash_attention(q, k, v, scale=scale, block_q=128))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
