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
    # digit/hyphen trigger names and trailing punctuation still fire
    tok.add_trigger("style2", [910])
    tok.add_trigger("my-style", [911])
    assert 910 in tok.tokenize("a style2 cat")
    assert 911 in tok.tokenize("my-style cat")
    assert 910 in tok.tokenize("a cat, style2, photo")
    # no trigger: identical to plain BPE
    tok2 = make_test_tokenizer(["cat"])
    assert tok.tokenize("a plain cat") == tok2.tokenize("a plain cat")


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


def test_pooled_output_ignores_trigger_ids(tmp_path):
    """CLIP pooling finds EOS by id equality, not argmax — TI ids beyond the
    base vocab must not steal the pooled position (SDXL/refiner
    micro-conditioning corruption otherwise)."""
    from dreamlab_tpu.models import clip_text
    from dreamlab_tpu.models.configs import CLIPTextConfig

    tok = make_test_tokenizer(["cat"])
    vocab = len(tok.encoder)
    cfg = CLIPTextConfig(
        vocab_size=vocab, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64,
    )
    params = clip_text.init_params(cfg, np.random.RandomState(0))
    # extend the table with 2 TI rows; ids beyond vocab-1 (the EOS id)
    table = params["token_embedding"]["w"]
    params["token_embedding"]["w"] = np.concatenate(
        [table, np.random.RandomState(1).randn(2, 32).astype(table.dtype)]
    )
    tok.add_trigger("vivid", [vocab, vocab + 1])

    ids_plain = tok("a cat")
    ids_ti = tok("a cat vivid")
    _, pooled_plain = clip_text.encode_text(
        params, jnp.asarray(ids_plain), cfg
    )
    _, pooled_ti = clip_text.encode_text(params, jnp.asarray(ids_ti), cfg)
    # pooled must come from the EOS position in both cases; with argmax
    # pooling the TI row (id vocab+1 > eos) would have been selected.
    eos_pos_ti = list(ids_ti[0]).index(tok.eos_id)
    assert eos_pos_ti > 0
    assert np.all(np.isfinite(np.asarray(pooled_ti)))
    # sanity: the pooled vector changes with the prompt (EOS state differs)
    assert not np.allclose(np.asarray(pooled_plain), np.asarray(pooled_ti))


def test_dual_ti_applies_to_refiner_single_tower(tmp_path):
    """A standard SDXL dual TI file routes by tower WIDTH: on a refiner
    bundle (single bigG tower) the clip_g half applies and clip_l drops."""
    from safetensors.numpy import save_file

    from dreamlab_tpu.engine.mode_config import EmbeddingConfig
    from tests.test_refiner import _tiny_refiner_bundle

    bundle = _tiny_refiner_bundle()
    hidden = bundle.text_params["token_embedding"]["w"].shape[1]
    base_vocab = bundle.text_params["token_embedding"]["w"].shape[0]
    rs = np.random.RandomState(3)
    save_file({
        "clip_l": rs.randn(2, hidden + 1).astype(np.float32),  # wrong width
        "clip_g": rs.randn(2, hidden).astype(np.float32),      # matches
    }, str(tmp_path / "xlstyle.safetensors"))

    n = apply_embeddings(bundle, [
        EmbeddingConfig(file=str(tmp_path / "xlstyle.safetensors")),
    ])
    assert n == 1
    assert bundle.text_params["token_embedding"]["w"].shape[0] == base_vocab + 2
    assert "xlstyle" in bundle.tokenizer.triggers


def test_partial_failure_leaves_no_orphan_rows(tmp_path):
    """If no slot matches any tower, nothing is mutated."""
    from safetensors.numpy import save_file

    from dreamlab_tpu.engine.mode_config import EmbeddingConfig
    from dreamlab_tpu.testing import random_bundle

    bundle = random_bundle("sd15", tiny=True)
    base_vocab = bundle.text_params["token_embedding"]["w"].shape[0]
    save_file({"emb_params": np.random.RandomState(4).randn(2, 9999)
               .astype(np.float32)}, str(tmp_path / "bad.safetensors"))
    n = apply_embeddings(bundle, [
        EmbeddingConfig(file=str(tmp_path / "bad.safetensors")),
    ])
    assert n == 0
    assert bundle.text_params["token_embedding"]["w"].shape[0] == base_vocab
    assert not bundle.tokenizer.triggers
