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
            ids_l: List[int] = []
            if "clip_l" in slots:
                bundle.text_params, ids_l = _extend_tower(
                    bundle.text_params, slots["clip_l"]
                )
            ids_g: List[int] = []
            if "clip_g" in slots:
                if bundle.text_params_2 is None:
                    raise ValueError("clip_g embedding but no second tower")
                bundle.text_params_2, ids_g = _extend_tower(
                    bundle.text_params_2, slots["clip_g"]
                )
            if ids_l:
                bundle.tokenizer.add_trigger(word, ids_l)
            if ids_g and bundle.tokenizer_2 is not None:
                bundle.tokenizer_2.add_trigger(word, ids_g)
            logger.info(
                "textual inversion %r: %d vector(s) from %s",
                word, max(len(ids_l), len(ids_g)), path,
            )
            applied += 1
        except Exception as e:
            logger.warning("textual inversion %s not applied (%s)", path, e)
    return applied
