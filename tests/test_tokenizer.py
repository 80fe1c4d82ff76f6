"""CLIP BPE tokenizer: algorithmic properties + cross-check against
transformers' CLIPTokenizer when constructible from the same files."""

import json
import os

import numpy as np
import pytest

from dreamlab_tpu.utils.tokenizer import CLIPTokenizer, make_test_tokenizer


def test_specials_and_padding():
    tok = make_test_tokenizer(["cat"])
    out = tok("a cat")
    assert out.shape == (1, 77)
    assert out[0, 0] == tok.bos_id
    assert tok.eos_id in out[0]
    # padding fills with pad (== eos) id
    assert (out[0, 10:] == tok.pad_id).all()


def test_merges_apply_in_rank_order():
    tok = make_test_tokenizer(["cat", "dog"])
    ids = tok.tokenize("cat dog")
    # each trained word collapses to exactly one token
    assert len(ids) == 2
    assert tok.decoder[ids[0]] == "cat</w>"
    assert tok.decoder[ids[1]] == "dog</w>"


def test_unknown_words_fall_back_to_chars():
    tok = make_test_tokenizer(["cat"])
    ids = tok.tokenize("zebra")
    assert len(ids) == 5  # z e b r a, last with </w>


def test_lowercase_and_whitespace_collapse():
    tok = make_test_tokenizer(["cat"])
    assert tok.tokenize("  CAT  ") == tok.tokenize("cat")


def test_truncation_keeps_eos(caplog):
    tok = make_test_tokenizer([])
    long_prompt = " ".join("xy" for _ in range(200))
    out = tok(long_prompt)
    assert out.shape == (1, 77)
    assert out[0, -1] == tok.eos_id


def test_batch_encode():
    tok = make_test_tokenizer(["cat", "dog"])
    out = tok(["a cat", "two dog dog"])
    assert out.shape == (2, 77)
    assert (out[:, 0] == tok.bos_id).all()


def test_decode_roundtrip():
    tok = make_test_tokenizer(["hello", "world"])
    ids = tok("hello world")[0]
    assert tok.decode(ids) == "hello world"


def test_matches_transformers_clip(tmp_path):
    """Build a transformers CLIPTokenizerFast-compatible dir from our synthetic
    vocab and compare outputs token-for-token."""
    transformers = pytest.importorskip("transformers")
    tok = make_test_tokenizer(["red", "cat", "on", "the", "mat"])
    d = tmp_path / "tokenizer"
    d.mkdir()
    (d / "vocab.json").write_text(json.dumps(tok.encoder))
    merges = ["#version: 0.2"] + [" ".join(p) for p in sorted(
        tok.bpe_ranks, key=tok.bpe_ranks.get
    )]
    (d / "merges.txt").write_text("\n".join(merges) + "\n")
    try:
        hf = transformers.CLIPTokenizer(
            str(d / "vocab.json"), str(d / "merges.txt"),
            model_max_length=77,
        )
    except Exception as e:  # offline-env tokenizer deps can be missing
        pytest.skip(f"transformers CLIPTokenizer unavailable: {e}")
    prompt = "the red cat on the mat zq"
    want = hf(prompt, padding="max_length", max_length=77)["input_ids"]
    got = tok(prompt)[0].tolist()
    assert got == want


def test_from_pretrained_layout(tmp_path):
    tok = make_test_tokenizer(["sun"])
    d = tmp_path / "tokenizer"
    d.mkdir()
    (d / "vocab.json").write_text(json.dumps(tok.encoder))
    merges = ["#version: 0.2"] + [" ".join(p) for p in sorted(
        tok.bpe_ranks, key=tok.bpe_ranks.get
    )]
    (d / "merges.txt").write_text("\n".join(merges) + "\n")
    (d / "tokenizer_config.json").write_text(json.dumps({"model_max_length": 77}))
    loaded = CLIPTokenizer.from_pretrained(str(d))
    np.testing.assert_array_equal(loaded("a sun"), tok("a sun"))


def test_from_pretrained_reads_pad_token(tmp_path):
    """SDXL's tokenizer_2 pads with "!" (id 0), not EOS — from_pretrained
    must honour the checkpoint's declared pad token (round-1 ADVICE)."""
    tok = make_test_tokenizer(["sun"])
    d = tmp_path / "tokenizer_2"
    d.mkdir()
    (d / "vocab.json").write_text(json.dumps(tok.encoder))
    merges = ["#version: 0.2"] + [" ".join(p) for p in sorted(
        tok.bpe_ranks, key=tok.bpe_ranks.get
    )]
    (d / "merges.txt").write_text("\n".join(merges) + "\n")
    (d / "tokenizer_config.json").write_text(json.dumps({
        "model_max_length": 77,
        "pad_token": {"content": "!", "lstrip": False},
    }))
    loaded = CLIPTokenizer.from_pretrained(str(d))
    assert loaded.pad_id == tok.encoder["!"]
    row = loaded("a sun")[0]
    assert row[-1] == tok.encoder["!"]

    # the EOS fallback stays for SD1.5-style dirs without a declared pad
    d2 = tmp_path / "tokenizer"
    d2.mkdir()
    (d2 / "vocab.json").write_text(json.dumps(tok.encoder))
    (d2 / "merges.txt").write_text("\n".join(merges) + "\n")
    (d2 / "special_tokens_map.json").write_text(json.dumps({
        "pad_token": "<|endoftext|>",
    }))
    loaded2 = CLIPTokenizer.from_pretrained(str(d2))
    assert loaded2.pad_id == loaded2.eos_id
