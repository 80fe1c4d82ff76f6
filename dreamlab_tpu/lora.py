"""LoRA adapters: safetensors → on-device weight merging, no recompiles.

The north star requires LoRA/mode hot-swaps that never retrace
(/root/repo/BASELINE.json): because pipeline weights are *inputs* to the
jitted program, merging ``W' = W + scale·(alpha/r)·B·A`` produces a pytree
with identical structure/shapes — the compiled executable is reused as-is.
The merge itself is a jitted elementwise+matmul program on device, so a
style/strength change costs one pass over the touched weights (~ms), not a
model reload (the reference reloads LoRAs through diffusers at init and
applies one at a time — /root/reference/backends/cuda_worker.py:123-196).

Supported key dialects:
- diffusers/PEFT: ``unet.down_blocks.0....attn1.to_q.lora_A.weight``
- kohya:          ``lora_unet_down_blocks_0_..._attn1_to_q.lora_down.weight``
Text-encoder adapters (``lora_te_…`` / ``text_encoder.…``) are merged into
the text tower the same way.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class LoRATensors:
    """One adapter: tree-path → (down [r, in], up [out, r], alpha)."""

    unet: Dict[str, Tuple[np.ndarray, np.ndarray, float]]
    text: Dict[str, Tuple[np.ndarray, np.ndarray, float]]

    @property
    def num_modules(self) -> int:
        return len(self.unet) + len(self.text)


# ---------------------------------------------------------------------------
# key translation
# ---------------------------------------------------------------------------

_LEAF_MAP = {
    "to_q": "q",
    "to_k": "k",
    "to_v": "v",
    "to_out.0": "out",
    "ff.net.0.proj": "ff_geglu",
    "ff.net.2": "ff_out",
    "proj_in": "proj_in",
    "proj_out": "proj_out",
    "q_proj": "q",
    "k_proj": "k",
    "v_proj": "v",
    "out_proj": "out",
    "fc1": "fc1",
    "fc2": "fc2",
}


def _module_to_tree_path(module: str) -> Optional[str]:
    """diffusers module path → this framework's pytree path (dot-form)."""
    m = module
    m = m.replace("mid_block.attentions.0", "mid.attention")
    m = re.sub(r"down_blocks\.(\d+)", r"down.\1", m)
    m = re.sub(r"up_blocks\.(\d+)", r"up.\1", m)
    m = re.sub(r"transformer_blocks\.(\d+)", r"blocks.\1", m)
    m = re.sub(r"text_model\.encoder\.layers\.(\d+)", r"layers.\1", m)
    m = m.replace("self_attn.", "attn.")
    for suffix, leaf in _LEAF_MAP.items():
        if m.endswith("." + suffix):
            return m[: -len(suffix)] + leaf
    return None


def _normalize_kohya(key: str) -> str:
    """kohya underscores → diffusers dots: container separators become dots;
    module-name underscores (down_blocks, to_q, transformer_blocks…) stay."""
    for pat, rep in (
        (r"^lora_unet_", ""),
        (r"^lora_te\d?_text_model_encoder_layers_(\d+)_",
         r"text_model.encoder.layers.\1."),
        (r"(down|up)_blocks_(\d+)_", r"\1_blocks.\2."),
        (r"mid_block_", "mid_block."),
        (r"attentions_(\d+)_", r"attentions.\1."),
        (r"resnets_(\d+)_", r"resnets.\1."),
        (r"transformer_blocks_(\d+)_", r"transformer_blocks.\1."),
        (r"attn(\d)_", r"attn\1."),
        (r"to_out_0$", "to_out.0"),
        (r"ff_net_0_proj$", "ff.net.0.proj"),
        (r"ff_net_2$", "ff.net.2"),
        (r"self_attn_(q|k|v|out)_proj$", r"self_attn.\1_proj"),
        (r"mlp_fc(\d)$", r"mlp.fc\1"),
    ):
        key = re.sub(pat, rep, key)
    return key


def load_lora(path: str) -> LoRATensors:
    """Parse a LoRA safetensors file into tree-path-keyed tensors."""
    from safetensors import numpy as st_numpy

    raw = st_numpy.load_file(path)
    return parse_lora_state_dict(raw)


def parse_lora_state_dict(raw: Dict[str, np.ndarray]) -> LoRATensors:
    mods: Dict[str, Dict[str, np.ndarray]] = {}
    alphas: Dict[str, float] = {}
    for key, tensor in raw.items():
        if key.endswith(".alpha"):
            alphas[key[: -len(".alpha")]] = float(tensor)
            continue
        for tag, slot in (
            (".lora_A.weight", "down"), (".lora_down.weight", "down"),
            (".lora_B.weight", "up"), (".lora_up.weight", "up"),
        ):
            if key.endswith(tag):
                mods.setdefault(key[: -len(tag)], {})[slot] = tensor
                break

    unet: Dict[str, Tuple[np.ndarray, np.ndarray, float]] = {}
    text: Dict[str, Tuple[np.ndarray, np.ndarray, float]] = {}
    skipped = 0
    for module, parts in mods.items():
        if "down" not in parts or "up" not in parts:
            skipped += 1
            continue
        is_text = module.startswith(("lora_te", "text_encoder"))
        norm = module
        if norm.startswith("lora_"):
            norm = _normalize_kohya(norm)
        norm = norm.replace("unet.", "", 1).replace("text_encoder.", "", 1)
        tree_path = _module_to_tree_path(norm)
        if tree_path is None:
            skipped += 1
            continue
        down, up = parts["down"], parts["up"]
        if down.ndim == 4:  # 1×1 conv adapters
            down, up = down[:, :, 0, 0], up[:, :, 0, 0]
        if down.ndim != 2:
            skipped += 1
            continue
        rank = down.shape[0]
        alpha = alphas.get(module, float(rank))
        (text if is_text else unet)[tree_path] = (down, up, alpha)
    if skipped:
        logger.warning("lora: skipped %d unsupported modules", skipped)
    return LoRATensors(unet=unet, text=text)


# ---------------------------------------------------------------------------
# merging
# ---------------------------------------------------------------------------


def _tree_get(tree, path: str):
    node = tree
    for part in path.split("."):
        node = node[int(part)] if isinstance(node, (list, tuple)) else node[part]
    return node


@jax.jit
def _merged_w(w, down, up, eff_scale):
    # torch stores [out, in]: delta = up @ down → [out, in]; ours is [in, out]
    delta = jnp.matmul(
        up.astype(jnp.float32), down.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).T
    return (w.astype(jnp.float32) + eff_scale * delta).astype(w.dtype)


@functools.partial(jax.jit, static_argnames=("slot",))
def _merged_w_slot(w, down, up, eff_scale, *, slot: int):
    """Merge a delta into slot ``slot`` of a packed projection w [Cin,S,Cout]
    (pipeline packs q/k/v at placement time — models.unet.pack_attention_params)."""
    delta = jnp.matmul(
        up.astype(jnp.float32), down.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).T
    new = (w[:, slot].astype(jnp.float32) + eff_scale * delta).astype(w.dtype)
    return w.at[:, slot].set(new)


# packed layouts _attention accepts; maps the LoRA leaf name to its stack slot
_PACK_SLOTS = {"qkv": {"q": 0, "k": 1, "v": 2}, "kv": {"k": 0, "v": 1}}


def merge_lora_into_tree(params, modules, scale: float):
    """Return a new param tree with LoRA deltas merged (device compute).

    params structure/shapes are preserved exactly → downstream compiled
    programs never retrace. Handles both the loader layout (separate q/k/v
    linears) and the pipeline's packed layout (stacked qkv/kv projections).
    """
    if not modules or scale == 0.0:
        return params
    flat: Dict[str, object] = {}
    packed: Dict[str, List] = {}  # packed-dict path → [(slot, down, up, eff)]
    for path, (down, up, alpha) in modules.items():
        rank = down.shape[0]
        eff = scale * (alpha / rank)
        try:
            target = _tree_get(params, path)
        except (KeyError, IndexError, TypeError):
            # q/k/v may live inside a packed projection
            parent_path, _, leaf = path.rpartition(".")
            try:
                parent = _tree_get(params, parent_path) if parent_path else {}
            except (KeyError, IndexError, TypeError):
                parent = {}
            hit = None
            for pk, slots in _PACK_SLOTS.items():
                if isinstance(parent, dict) and pk in parent and leaf in slots:
                    hit = (f"{parent_path}.{pk}", slots[leaf])
                    break
            if hit is None:
                logger.warning("lora: path %s not found in params", path)
                continue
            packed.setdefault(hit[0], []).append((hit[1], down, up, eff))
            continue
        flat[path] = _merged_w(
            target["w"], jnp.asarray(down), jnp.asarray(up), jnp.float32(eff)
        )
    for ppath, updates in packed.items():
        w = _tree_get(params, ppath)["w"]
        for slot, down, up, eff in updates:
            w = _merged_w_slot(
                w, jnp.asarray(down), jnp.asarray(up), jnp.float32(eff),
                slot=slot,
            )
        flat[ppath] = w

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                p = f"{prefix}{k}"
                if p in flat and isinstance(v, dict) and "w" in v:
                    out[k] = {**v, "w": flat[p]}
                else:
                    out[k] = rebuild(v, p + ".")
            return out
        if isinstance(tree, list):
            return [rebuild(v, f"{prefix}{i}.") for i, v in enumerate(tree)]
        return tree

    return rebuild(params)


@dataclasses.dataclass
class StyleDef:
    """A named, exclusive style backed by one LoRA file with a strength
    ladder (behavioral port of /root/reference/backends/styles.py:6-18)."""

    name: str
    path: str
    strengths: Tuple[float, ...] = (0.4, 0.6, 0.8, 1.0, 1.2, 1.4, 1.6, 1.8)
    required_cross_attention_dim: Optional[int] = None

    def strength_for_level(self, level: int) -> float:
        """1-indexed ladder; level 0 = off."""
        if level <= 0:
            return 0.0
        return self.strengths[min(level, len(self.strengths)) - 1]


def parse_style_request(style: Optional[str], level) -> Tuple[Optional[str], int]:
    """Validate a style request (reference styles.py:21-38): returns
    (style_name|None, level); level clamps to [0, 8]."""
    try:
        lvl = int(level)
    except (TypeError, ValueError):
        lvl = 0
    lvl = max(0, min(8, lvl))
    if not style or lvl == 0:
        return None, 0
    return str(style), lvl
