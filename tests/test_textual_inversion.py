"""Textual-inversion embeddings: trigger words → learned embedding rows.

Beyond the reference (its A1111-compat ecosystem uses TI heavily but the
server never implemented it). Weights-as-inputs makes this natural: the
enlarged token table just flows into the jitted text tower.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dreamlab_tpu.textual_inversion import (
    apply_embeddings,
    load_embedding_file,
    trigger_word,
)
from dreamlab_tpu.utils.tokenizer import make_test_tokenizer


def _write_ti(path, vectors, key="emb_params"):
    from safetensors.numpy import save_file

    save_file({key: vectors.astype(np.float32)}, str(path))
    return str(path)


def test_load_formats(tmp_path):
    rs = np.random.RandomState(0)
    v = rs.randn(2, 32)
    # A1111 layout
    slots = load_embedding_file(_write_ti(tmp_path / "a.safetensors", v))
    np.testing.assert_array_equal(slots["clip_l"], v.astype(np.float32))
    # diffusers layout (single arbitrary key)
    slots = load_embedding_file(_write_ti(tmp_path / "b.safetensors", v, "<tok>"))
    assert slots["clip_l"].shape == (2, 32)
    # SDXL dual layout
    from safetensors.numpy import save_file

    save_file({"clip_l": v.astype(np.float32),
               "clip_g": rs.randn(2, 64).astype(np.float32)},
              str(tmp_path / "xl.safetensors"))
    slots = load_embedding_file(str(tmp_path / "xl.safetensors"))
    assert set(slots) == {"clip_l", "clip_g"}
    # 1-D single vector becomes [1, C]
    slots = load_embedding_file(_write_ti(tmp_path / "c.safetensors",
                                          rs.randn(32)))
    assert slots["clip_l"].shape == (1, 32)

    with pytest.raises(ValueError, match="unrecognized"):
        save_file({"x": v.astype(np.float32), "y": v.astype(np.float32)},
                  str(tmp_path / "bad.safetensors"))
        load_embedding_file(str(tmp_path / "bad.safetensors"))


def test_trigger_word():
    assert trigger_word("/x/MyStyle.safetensors") == "mystyle"
    assert trigger_word("/x/e.safetensors", "Custom") == "custom"


def test_tokenizer_trigger_expansion():
    tok = make_test_tokenizer(["cat"])
    tok.add_trigger("mystyle", [900, 901])
    ids = tok.tokenize("a cat mystyle")
    assert ids[-2:] == [900, 901]
    # padded encode keeps BOS/EOS framing
    row = tok("mystyle")[0]
    assert row[0] == tok.bos_id and 900 in row and 901 in row


def test_apply_embeddings_end_to_end(tmp_path):
    """TI changes generation output; trigger maps to the appended rows;
    unknown/missing files warn-and-skip."""
    from dreamlab_tpu.engine.mode_config import EmbeddingConfig
    from dreamlab_tpu.pipeline import LCMPipeline
    from dreamlab_tpu.testing import random_bundle

    rs = np.random.RandomState(1)
    bundle = random_bundle("sd15", tiny=True)
    base_vocab = bundle.text_params["token_embedding"]["w"].shape[0]
    hidden = bundle.text_params["token_embedding"]["w"].shape[1]
    ti = _write_ti(tmp_path / "vivid.safetensors", rs.randn(2, hidden))

    n = apply_embeddings(bundle, [
        EmbeddingConfig(file=ti),
        EmbeddingConfig(file=str(tmp_path / "missing.safetensors")),
    ])
    assert n == 1
    table = bundle.text_params["token_embedding"]["w"]
    assert table.shape[0] == base_vocab + 2
    assert bundle.tokenizer.triggers["vivid"] == [base_vocab, base_vocab + 1]

    pipe = LCMPipeline(bundle, dtype=jnp.float32)
    with_ti = pipe.generate("a vivid cat", height=32, width=32,
                            num_inference_steps=1, seed=3)

    plain_bundle = random_bundle("sd15", tiny=True)
    plain = LCMPipeline(plain_bundle, dtype=jnp.float32).generate(
        "a vivid cat", height=32, width=32, num_inference_steps=1, seed=3,
    )
    assert not np.array_equal(with_ti.images, plain.images), (
        "trigger word must change conditioning"
    )


def test_factory_applies_mode_embeddings(tmp_path):
    """embeddings: entries in modes.yaml reach the loaded worker."""
    from dreamlab_tpu.engine.mode_config import EmbeddingConfig
    from dreamlab_tpu.engine.worker_factory import create_tpu_worker
    from tests.test_loader import make_tiny_checkpoint

    rs = np.random.RandomState(2)
    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    ti = _write_ti(tmp_path / "glow.safetensors", rs.randn(1, 768))
    worker = create_tpu_worker(
        0, ckpt, embeddings=[EmbeddingConfig(file=ti)],
    )
    tok = worker.pipeline.bundle.tokenizer
    assert "glow" in tok.triggers
    from dreamlab_tpu.engine.base import GenSpec

    png, seed = worker.run_job(GenSpec(
        prompt="a glow cat", size="32x32", num_inference_steps=1, seed=4,
    ))
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
