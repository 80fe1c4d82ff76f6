"""Textual-inversion embeddings: trigger words backed by learned vectors.

Beyond the reference (its ecosystem uses TI heavily via A1111, but the
reference server never implemented it): a ``.safetensors`` embedding file
adds one trigger word to the tokenizer, mapping to k learned vectors that
are appended as new rows of the CLIP token-embedding table. Because weights
are jit *inputs*, the enlarged table simply flows into the text encoder —
the only compile consequence is a new text-tower shape per distinct vocab
size, paid once per mode at load.

Supported file shapes (all safetensors — torch ``.pt`` pickles are not
loaded in this offline-first framework):
- A1111:     {"emb_params": [k, C]}
- diffusers: {"<token>": [k, C]}  (token name from the key)
- SDXL dual: {"clip_l": [k, C1], "clip_g": [k, C2]}

The trigger word defaults to the file stem (the A1111 convention for
``embeddings/<name>.safetensors`` → ``<name>`` in the prompt).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def load_embedding_file(path: str) -> Dict[str, np.ndarray]:
    """Return {slot: [k, C] float32} — slot is 'clip_l'/'clip_g' for SDXL
    dual embeddings, or the single key/'emb_params' collapsed to 'clip_l'."""
    from safetensors import numpy as st_numpy

    raw = st_numpy.load_file(path)
    out: Dict[str, np.ndarray] = {}
    if "clip_l" in raw or "clip_g" in raw:
        for k in ("clip_l", "clip_g"):
            if k in raw:
                out[k] = np.atleast_2d(np.asarray(raw[k], np.float32))
        return out
    if "emb_params" in raw:
        out["clip_l"] = np.atleast_2d(np.asarray(raw["emb_params"], np.float32))
        return out
    if len(raw) == 1:
        (only,) = raw.values()
        out["clip_l"] = np.atleast_2d(np.asarray(only, np.float32))
        return out
    raise ValueError(
        f"{path}: unrecognized textual-inversion layout (keys: {sorted(raw)})"
    )


def trigger_word(path: str, override: Optional[str] = None) -> str:
    return (override or os.path.splitext(os.path.basename(path))[0]).lower()


def _extend_tower(params, vectors: np.ndarray) -> Tuple[dict, List[int]]:
    """Append k rows to a text tower's token-embedding table; returns the
    updated params (same tree structure) and the new token ids."""
    table = np.asarray(params["token_embedding"]["w"])
    k, c = vectors.shape
    if c != table.shape[1]:
        raise ValueError(
            f"embedding width {c} != tower width {table.shape[1]}"
        )
    new_ids = list(range(table.shape[0], table.shape[0] + k))
    merged = np.concatenate([table, vectors.astype(table.dtype)], axis=0)
    out = dict(params)
    out["token_embedding"] = {**params["token_embedding"], "w": merged}
    return out, new_ids


def apply_embeddings(bundle, entries) -> int:
    """Merge TI files into a PipelineBundle in place.

    entries: sequence with ``.file`` (path) and optional ``.name``
    (trigger override) — the mode_config EmbeddingConfig shape, or any
    object with those attributes. Returns the number applied. Missing or
    incompatible files warn and skip (the degradation ladder used for
    mode LoRAs)."""
    applied = 0
    for entry in entries or []:
        path = getattr(entry, "file", entry)
        name = getattr(entry, "name", None)
        try:
            slots = load_embedding_file(path)
            word = trigger_word(path, name)
            # route each slot to the tower whose width matches — a refiner
            # bundle has ONE (bigG-width) tower, so a dual SDXL TI file's
            # clip_g half applies there and the clip_l half is dropped
            towers = [("text_params", bundle.tokenizer)]
            if bundle.text_params_2 is not None:
                towers.append(("text_params_2", bundle.tokenizer_2))
            widths = {
                attr: np.asarray(
                    getattr(bundle, attr)["token_embedding"]["w"]
                ).shape[1]
                for attr, _ in towers
            }
            # stage all updates, commit only if at least one slot lands and
            # none errors — no orphan rows on a partial failure
            staged = []  # (attr, new_params, ids, tokenizer)
            unmatched = []
            for slot, vectors in slots.items():
                target = None
                for attr, tok in towers:
                    if widths[attr] == vectors.shape[1] and all(
                        a != attr for a, _, _, _ in staged
                    ):
                        target = (attr, tok)
                        break
                if target is None:
                    unmatched.append(slot)
                    continue
                attr, tok = target
                new_params, ids = _extend_tower(getattr(bundle, attr), vectors)
                staged.append((attr, new_params, ids, tok))
            if not staged:
                raise ValueError(
                    f"no tower matches embedding widths "
                    f"{[v.shape[1] for v in slots.values()]} "
                    f"(towers: {sorted(widths.values())})"
                )
            for attr, new_params, ids, tok in staged:
                setattr(bundle, attr, new_params)
                if tok is not None:
                    tok.add_trigger(word, ids)
            if unmatched:
                logger.info(
                    "textual inversion %r: slots %s have no matching tower "
                    "in this bundle; skipped", word, unmatched,
                )
            logger.info(
                "textual inversion %r: %d vector(s) from %s",
                word, max(len(ids) for _, _, ids, _ in staged), path,
            )
            applied += 1
        except Exception as e:
            logger.warning("textual inversion %s not applied (%s)", path, e)
    return applied
