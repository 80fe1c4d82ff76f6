"""CLIP vision tower: transformers cross-check + native Yume scorer wiring.

The reference scores dream candidates with a real CLIPModel
(/root/reference/yume/scoring.py:27-130); round-1 shipped only a torch
adapter that cannot run in this image. These tests pin the native JAX tower
to transformers' CLIPModel numerics (random weights through the production
key mapping) and drive CLIPScorer end-to-end without torch at score time.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from dreamlab_tpu.loader import (
    clip_vision_config_from_json,
    convert_clip_text,
    convert_clip_vision,
    text_config_from_json,
)
from dreamlab_tpu.models import clip_vision
from dreamlab_tpu.models.configs import TINY_VISION
from dreamlab_tpu.yume.scoring import CLIPScorer, NativeCLIP

torch = pytest.importorskip("torch")


def _tiny_hf_clip(transformers):
    cfg = transformers.CLIPConfig(
        projection_dim=16,
        text_config_dict=dict(
            vocab_size=120, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=77, hidden_act="quick_gelu",
            bos_token_id=0, eos_token_id=119, projection_dim=16,
        ),
        vision_config_dict=dict(
            image_size=32, patch_size=8, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, hidden_act="quick_gelu", projection_dim=16,
        ),
    )
    torch.manual_seed(0)
    return transformers.CLIPModel(cfg).eval()


def test_vision_tower_matches_transformers():
    transformers = pytest.importorskip("transformers")
    hf = _tiny_hf_clip(transformers)
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_vision(state, TINY_VISION)

    rs = np.random.RandomState(0)
    pixels = rs.randn(2, 32, 32, 3).astype(np.float32)  # already "normalized"
    with torch.no_grad():
        want = hf.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(clip_vision.encode_image(params, jnp.asarray(pixels), TINY_VISION))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_text_features_match_transformers():
    """get_text_features (projected pooled output) through the same mapping."""
    transformers = pytest.importorskip("transformers")
    hf = _tiny_hf_clip(transformers)
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = text_config_from_json({
        "vocab_size": 120, "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 2, "intermediate_size": 64,
        "max_position_embeddings": 77, "hidden_act": "quick_gelu",
        "projection_dim": 16, "architectures": ["CLIPModel"],
    })
    assert cfg.projection_dim == 16
    params = convert_clip_text(state, cfg)

    ids = np.full((1, 77), 119, np.int64)
    ids[0, 0] = 0
    ids[0, 1:5] = [3, 10, 42, 7]
    with torch.no_grad():
        want = hf.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    from dreamlab_tpu.models import clip_text

    _, got = clip_text.encode_text(params, jnp.asarray(ids, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_preprocess_matches_clip_convention():
    """Resize-shortest-edge + center-crop + normalize, any input size."""
    rs = np.random.RandomState(1)
    imgs = [
        rs.randint(0, 256, (48, 64, 3), np.uint8),
        rs.randint(0, 256, (32, 32, 3), np.uint8),
    ]
    out = clip_vision.preprocess_images(imgs, TINY_VISION)
    assert out.shape == (2, 32, 32, 3)
    # the 32x32 input needs no resize: normalization must be exact
    want = (imgs[1].astype(np.float32) / 255.0 - clip_vision.IMAGE_MEAN) / clip_vision.IMAGE_STD
    np.testing.assert_allclose(out[1], want, rtol=1e-6, atol=1e-6)


def test_native_clip_scorer_end_to_end():
    """CLIPScorer over NativeCLIP: same-content image scores higher than
    noise for a text matched by construction (random towers — we assert the
    plumbing: caching, normalization, clamping, batching)."""
    from dreamlab_tpu.models import clip_text
    from dreamlab_tpu.models.configs import CLIPTextConfig
    from dreamlab_tpu.utils.tokenizer import make_test_tokenizer

    tok = make_test_tokenizer(["cat"])
    text_cfg = CLIPTextConfig(
        vocab_size=len(tok.encoder), hidden_size=32, num_layers=2,
        num_heads=2, intermediate_size=64, projection_dim=16,
    )
    model = NativeCLIP(
        text_params=clip_text.init_params(text_cfg, np.random.RandomState(0)),
        text_cfg=text_cfg,
        vision_params=clip_vision.init_params(TINY_VISION, np.random.RandomState(1)),
        vision_cfg=TINY_VISION,
        tokenizer=tok,
    )
    scorer = CLIPScorer(model)
    rs = np.random.RandomState(2)
    imgs = [rs.randint(0, 256, (32, 32, 3), np.uint8) for _ in range(3)]
    scores = scorer.score_batch(imgs, "a cat")
    assert len(scores) == 3
    assert all(0.0 <= s <= 1.0 for s in scores)
    # determinism + text cache
    assert scorer.score(imgs[0], "a cat") == scores[0]
    assert "a cat" in scorer._text_cache


def test_load_clip_model_dir(tmp_path):
    """loader.load_clip_model over an HF CLIPModel directory layout."""
    transformers = pytest.importorskip("transformers")
    from safetensors.numpy import save_file

    from dreamlab_tpu.loader import load_clip_model
    from dreamlab_tpu.utils.tokenizer import make_test_tokenizer

    hf = _tiny_hf_clip(transformers)
    d = tmp_path / "clip"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "projection_dim": 16,
        "text_config": {
            "vocab_size": 120, "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 2, "intermediate_size": 64,
            "max_position_embeddings": 77, "hidden_act": "quick_gelu",
        },
        "vision_config": {
            "image_size": 32, "patch_size": 8, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "intermediate_size": 64, "hidden_act": "quick_gelu",
        },
    }))
    state = {k: np.ascontiguousarray(v.numpy()) for k, v in hf.state_dict().items()}
    state.pop("logit_scale", None)
    save_file(state, str(d / "model.safetensors"))
    tok = make_test_tokenizer(["cat"])
    (d / "vocab.json").write_text(json.dumps(tok.encoder))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(
        " ".join(p) for p in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
    ) + "\n")

    model = load_clip_model(str(d))
    rs = np.random.RandomState(3)
    vecs = model.embed_images([rs.randint(0, 256, (40, 40, 3), np.uint8)])
    assert vecs.shape == (1, 16)
    tvec = model.embed_text("a cat")
    assert tvec.shape == (16,)
