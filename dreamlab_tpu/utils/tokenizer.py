"""Self-contained CLIP BPE tokenizer.

Loads the ``tokenizer/vocab.json`` + ``tokenizer/merges.txt`` files that
diffusers-layout checkpoints ship (the reference instantiates transformers'
CLIPTokenizer over the same files — /root/reference/backends/rknnlcm.py:296ff,
server/lcm_sr_server.py:199-201). Reimplemented here so the framework has no
runtime dependency on the transformers library for its hot path.

CLIP specifics honoured:
- byte-level BPE over GPT-2's printable byte alphabet,
- lowercasing + whitespace collapse,
- word-final ``</w>`` variants,
- specials ``<|startoftext|>`` (49406) / ``<|endoftext|>`` (49407),
- pad-to-77 with the EOS id (PadTokenId 49407 — see
  /root/reference/model/Assets/LCM-Dreamshaper-V7-ONNX.json:8-10),
- truncation at 77 tokens with a warning, mirroring rknnlcm.py:313-322.
"""

from __future__ import annotations

import json
import logging
import os
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import numpy as np
import regex as re

logger = logging.getLogger(__name__)

_WORD_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte→printable-unicode table."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def _get_pairs(word: Tuple[str, ...]):
    return {(a, b) for a, b in zip(word, word[1:])}


class CLIPTokenizer:
    """BPE tokenizer for CLIP text towers.

    Args:
        vocab: token string → id.
        merges: ordered list of merge pairs ("a b" per line).
        max_length: model context (77).
    """

    def __init__(
        self,
        vocab: Dict[str, int],
        merges: List[str],
        max_length: int = 77,
        bos_token: str = "<|startoftext|>",
        eos_token: str = "<|endoftext|>",
        pad_token: Optional[str] = None,
    ):
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in vocab.items()}
        self.bpe_ranks = {
            tuple(m.split()): i for i, m in enumerate(merges)
        }
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.max_length = max_length
        self.bos_id = self.encoder[bos_token]
        self.eos_id = self.encoder[eos_token]
        # CLIP pads with EOS (PadTokenId 49407)
        self.pad_id = self.encoder[pad_token] if pad_token else self.eos_id
        self._cache: Dict[str, List[str]] = {}
        # textual-inversion triggers: lowercased word → learned token ids
        self.triggers: Dict[str, List[int]] = {}

    def add_trigger(self, word: str, ids: List[int]) -> None:
        """Map a whole word to explicit token ids (textual inversion):
        the word bypasses BPE and expands to its learned vectors' ids."""
        self.triggers[word.lower()] = list(ids)

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, tokenizer_dir: str, **kwargs) -> "CLIPTokenizer":
        """Load from a diffusers-layout ``tokenizer/`` directory."""
        with open(os.path.join(tokenizer_dir, "vocab.json"), encoding="utf-8") as f:
            vocab = json.load(f)
        with open(os.path.join(tokenizer_dir, "merges.txt"), encoding="utf-8") as f:
            lines = f.read().split("\n")
        # first line is the "#version" header; drop empties
        merges = [l for l in lines if l and not l.startswith("#")]
        def special(v):
            # HF serializes specials either as plain strings or as
            # AddedToken dicts {"content": "!", ...}
            return v.get("content") if isinstance(v, dict) else v

        pad = None
        cfg_path = os.path.join(tokenizer_dir, "tokenizer_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path, encoding="utf-8") as f:
                cfg = json.load(f)
            kwargs.setdefault(
                "max_length", cfg.get("model_max_length", 77) or 77
            )
            pad = special(cfg.get("pad_token"))
        if pad is None:
            map_path = os.path.join(tokenizer_dir, "special_tokens_map.json")
            if os.path.exists(map_path):
                with open(map_path, encoding="utf-8") as f:
                    pad = special(json.load(f).get("pad_token"))
        # SDXL's tokenizer_2 pads with "!" (id 0), not EOS — honour the
        # checkpoint's declared pad token, keeping the EOS fallback for SD1.5
        if pad is not None and pad in vocab:
            kwargs.setdefault("pad_token", pad)
        return cls(vocab, merges, **kwargs)

    # ------------------------------------------------------------------
    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return [token + "</w>"]
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = list(word)
        self._cache[token] = out
        return out

    def tokenize(self, text: str) -> List[int]:
        """Raw BPE ids, no specials."""
        text = " ".join(text.split()).strip().lower()
        ids: List[int] = []
        if self.triggers:
            # textual-inversion triggers match whole whitespace words (with
            # trailing punctuation tolerated) BEFORE the BPE word pattern —
            # names like "style2" or "my-style" would otherwise be split
            # into sub-words and never fire
            for chunk in text.split(" "):
                stripped = chunk.rstrip(",.;:!?")
                if stripped in self.triggers:
                    ids.extend(self.triggers[stripped])
                    chunk = chunk[len(stripped):]  # tokenize the punctuation
                    if not chunk:
                        continue
                ids.extend(self._bpe_ids(chunk))
            return ids
        return self._bpe_ids(text)

    def _bpe_ids(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in _WORD_PATTERN.findall(text):
            btok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(btok):
                pid = self.encoder.get(piece)
                if pid is None:
                    # unknown pieces degrade to per-character lookups
                    for ch in piece:
                        ids.append(self.encoder.get(ch, self.eos_id))
                else:
                    ids.append(pid)
        return ids

    def __call__(self, text, *, max_length: Optional[int] = None) -> np.ndarray:
        """Encode prompt(s) → int32 [B, max_length] with BOS/EOS/pad.

        Over-long prompts truncate (keeping the final EOS) with a warning,
        mirroring the reference's CLIPTokenizer behaviour.
        """
        if isinstance(text, str):
            text = [text]
        n = max_length or self.max_length
        batch = np.full((len(text), n), self.pad_id, dtype=np.int32)
        for row, prompt in enumerate(text):
            ids = self.tokenize(prompt)
            if len(ids) > n - 2:
                removed = ids[n - 2:]
                ids = ids[: n - 2]
                logger.warning(
                    "Prompt truncated to %d tokens (%d removed): %r",
                    n, len(removed), prompt[:80],
                )
            seq = [self.bos_id] + ids + [self.eos_id]
            batch[row, : len(seq)] = seq
        return batch

    def decode(self, ids) -> str:
        text = "".join(
            self.decoder.get(int(i), "")
            for i in ids
            if int(i) not in (self.bos_id, self.eos_id, self.pad_id)
        )
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()


def make_test_tokenizer(words: Optional[List[str]] = None) -> CLIPTokenizer:
    """Tiny synthetic tokenizer for the hardware-free test tier: full byte
    alphabet + ``</w>`` variants + merges for a few known words."""
    b2u = _bytes_to_unicode()
    alphabet = sorted(set(b2u.values()))
    vocab: Dict[str, int] = {}
    for ch in alphabet:
        vocab[ch] = len(vocab)
    for ch in alphabet:
        vocab[ch + "</w>"] = len(vocab)
    merges: List[str] = []
    for w in words or []:
        # build each word left-to-right: (ab, c), (abc, d)...
        chars = list(w[:-1]) + [w[-1] + "</w>"]
        prefix = chars[0]
        for nxt in chars[1:]:
            merges.append(f"{prefix} {nxt}")
            prefix += nxt
            if prefix not in vocab:
                vocab[prefix] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return CLIPTokenizer(vocab, merges)
