"""Extensible model detection: what is this checkpoint, and how do we serve it?

Design port of the reference's interceptor-stack detector
(/root/reference/utils/model_detector.py): a chain of small detectors each
augments a ``ModelInfo``; classification keys off tensor *shapes* (the
``attn2.to_k`` input width = cross_attention_dim), never off filenames.
Safetensors headers are read without loading tensor data.

Variants (reference model_detector.py:391-451):
  cross_attention_dim 768 → SD15, 1024 → SD21, 2048 → SDXL.
Worker resolution (reference worker_factory.py:17-70): SD15/SD21-class and
SDXL-class both map to the TPU worker here, with arch + size policy attached.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, List, Optional


class DetectionError(Exception):
    pass


@dataclasses.dataclass
class ModelInfo:
    path: str
    format: Optional[str] = None  # diffusers_dir | safetensors | lora | controlnet | unknown
    is_lora: bool = False
    is_controlnet: bool = False
    cross_attention_dim: Optional[int] = None
    variant: Optional[str] = None  # SD15 | SD21 | SDXL
    arch: Optional[str] = None  # sd15 | sdxl (serving class)
    native_size: Optional[int] = None
    downsample: int = 8
    recommended_sizes: List[str] = dataclasses.field(default_factory=list)
    worker: Optional[str] = None
    extra: Dict = dataclasses.field(default_factory=dict)


Detector = Callable[[ModelInfo], Optional[ModelInfo]]


# ---------------------------------------------------------------------------
# detectors
# ---------------------------------------------------------------------------


def _safetensors_shapes(path: str) -> Dict[str, List[int]]:
    """Read tensor shapes from the safetensors header only."""
    import safetensors

    shapes = {}
    with safetensors.safe_open(path, framework="numpy") as f:
        for k in f.keys():
            shapes[k] = list(f.get_slice(k).get_shape())
    return shapes


def controlnet_detector(info: ModelInfo) -> Optional[ModelInfo]:
    """Recognize ControlNet checkpoints — they have no cross_attention UNet
    in the servable sense (the trunk exists but there is no up stack), so
    neither shape-based rule above fires; detection keys off the
    class name (diffusers dirs) or the ``controlnet_*`` tensor prefixes
    (single files)."""
    if os.path.isdir(info.path):
        cfg_path = os.path.join(info.path, "config.json")
        # ControlNet dirs carry config.json at the ROOT (no unet/ subdir)
        if os.path.exists(cfg_path) and not os.path.exists(
            os.path.join(info.path, "unet", "config.json")
        ):
            with open(cfg_path) as f:
                cfg = json.load(f)
            if cfg.get("_class_name") == "ControlNetModel":
                info.format = "controlnet"
                info.is_controlnet = True
                info.cross_attention_dim = cfg.get("cross_attention_dim")
                info.extra["controlnet_config"] = cfg
                return info
        return None
    if info.format == "safetensors":
        shapes = info.extra.get("safetensors_shapes") or {}
        if any(
            k.startswith("controlnet_cond_embedding")
            or k.startswith("controlnet_down_blocks")
            or "control_model." in k  # ldm single-file layout
            for k in shapes
        ):
            info.format = "controlnet"
            info.is_controlnet = True
    return info


def diffusers_dir_detector(info: ModelInfo) -> Optional[ModelInfo]:
    """Recognize a diffusers-layout directory via unet/config.json
    (reference DiffusersDetector, model_detector.py:287-333)."""
    if not os.path.isdir(info.path):
        return None
    unet_cfg = os.path.join(info.path, "unet", "config.json")
    if not os.path.exists(unet_cfg):
        return None
    with open(unet_cfg) as f:
        cfg = json.load(f)
    info.format = "diffusers_dir"
    info.cross_attention_dim = cfg.get("cross_attention_dim")
    info.extra["unet_config"] = cfg
    idx = os.path.join(info.path, "model_index.json")
    if os.path.exists(idx):
        with open(idx) as f:
            info.extra["pipeline_class"] = json.load(f).get("_class_name")
    return info


def safetensors_detector(info: ModelInfo) -> Optional[ModelInfo]:
    """Single-file safetensors: classify LoRA vs checkpoint and read the
    cross-attention width from tensor shapes (reference
    SafetensorsDetector, model_detector.py:219-252)."""
    if not (os.path.isfile(info.path) and info.path.endswith(".safetensors")):
        return None
    shapes = _safetensors_shapes(info.path)
    info.format = "safetensors"
    info.extra["safetensors_shapes"] = shapes

    if any(".lora_down." in k or ".lora_A." in k or k.startswith("lora_") for k in shapes):
        info.is_lora = True
        info.format = "lora"
        # LoRA compat: to_k adapters' input width is the cross-attn dim
        for k, s in shapes.items():
            if ("attn2" in k and ("to_k" in k) and ("lora_down" in k or "lora_A" in k)):
                info.cross_attention_dim = s[1]
                break
        return info

    # original "ldm" layout or diffusers-layout single file
    for k, s in shapes.items():
        if k.endswith("attn2.to_k.weight") and len(s) == 2:
            info.cross_attention_dim = s[1]
            break
    return info


def _pickle_strings(data) -> List[str]:
    """Collect string opcode arguments from a pickle stream WITHOUT
    executing it — enough to read a torch state dict's key names (the keys
    are BINUNICODE ops) with zero deserialization risk. ``data`` may be
    bytes or an open binary file (legacy multi-GB .ckpt files stream
    instead of materializing in RAM)."""
    import pickletools

    out: List[str] = []
    try:
        for op, arg, _pos in pickletools.genops(data):
            if op.name in (
                "BINUNICODE", "SHORT_BINUNICODE", "BINUNICODE8", "UNICODE",
                "STRING", "SHORT_BINSTRING", "BINSTRING",
            ) and isinstance(arg, str):
                out.append(arg)
    except Exception:
        pass  # truncated/corrupt stream: return what we saw
    return out


def checkpoint_detector(info: ModelInfo) -> Optional[ModelInfo]:
    """Torch .ckpt/.pt/.pth files (reference CheckpointDetector,
    model_detector.py:336-388) — key names are read from the pickle stream
    via pickletools.genops, never torch.load: no code execution, no tensor
    data materialized."""
    ext = os.path.splitext(info.path)[1].lower()
    if not (os.path.isfile(info.path) and ext in (".ckpt", ".pt", ".pth")):
        return None
    import zipfile

    info.format = "checkpoint"
    keys: List[str] = []
    try:
        if zipfile.is_zipfile(info.path):
            with zipfile.ZipFile(info.path) as zf:
                pkls = [n for n in zf.namelist() if n.endswith("data.pkl")]
                if pkls:
                    keys = _pickle_strings(zf.read(pkls[0]))
        else:  # legacy raw-pickle .ckpt: stream, tensors ride inline (GBs)
            with open(info.path, "rb") as f:
                keys = _pickle_strings(f)
    except Exception as e:
        info.extra["checkpoint_error"] = str(e)
        return info

    if any("lora" in k.lower() for k in keys):
        info.is_lora = True
        info.format = "lora"
        has_te2 = any("text_encoder_2" in k or "lora_te2" in k for k in keys)
        info.cross_attention_dim = 2048 if has_te2 else 768
        return info

    has_te2 = any(
        "text_encoder_2" in k or "conditioner.embedders.1" in k for k in keys
    )
    info.extra["has_dual_text_encoders"] = has_te2
    if has_te2:
        info.cross_attention_dim = 2048
    elif any(k.endswith("attn2.to_k.weight") for k in keys):
        # single-tower UNet present: SD1.x-class (shapes are not in the
        # pickle stream, so 768 is the reference's same assumption)
        info.cross_attention_dim = 768
    elif keys:
        info.cross_attention_dim = 768
    return info


def variant_classifier(info: ModelInfo) -> Optional[ModelInfo]:
    """(reference VariantClassifier, model_detector.py:391-451)."""
    cad = info.cross_attention_dim
    if cad is None:
        return info
    info.variant = {768: "SD15", 1024: "SD21", 2048: "SDXL", 1280: "SDXL"}.get(cad)
    return info


def _recommended_sizes(native_px: int) -> List[str]:
    """Reference size table (model_detector.py:669-693): the SDXL bucket
    ladder above 1024, the conservative SD set below."""
    if native_px >= 1024:
        return [
            "1024x1024", "1152x896", "1216x832", "1344x768", "1536x640",
            "896x1152", "832x1216", "768x1344", "640x1536",
        ]
    return ["512x512", "640x512", "768x512", "512x640", "512x768"]


def resolution_detector(info: ModelInfo) -> Optional[ModelInfo]:
    """Size policy (reference ResolutionDetector, model_detector.py:563-693):
    diffusers ``unet.config.sample_size`` when available, variant heuristic
    otherwise; LoRAs get a policy note instead of a fake native size."""
    down = 8
    if info.is_lora:
        info.extra["size_policy"] = {
            "note": "LoRA has no native resolution; policy determined by base model.",
            "divisible_by_px": down,
            "downsample_factor": down,
            "source": "lora",
        }
        return info

    native = None
    source = "heuristic:variant"
    cfg = info.extra.get("unet_config")
    sample_size = cfg.get("sample_size") if isinstance(cfg, dict) else None
    if isinstance(sample_size, int) and sample_size > 0:
        native = sample_size * down
        source = "diffusers:unet.config"
    if native is None:
        native = {"SD15": 512, "SD21": 768, "SDXL": 1024}.get(info.variant or "")
    if native is None:
        return info
    info.native_size = native
    info.downsample = down
    info.recommended_sizes = _recommended_sizes(native)
    info.extra["size_policy"] = {
        "downsample_factor": down,
        "divisible_by_px": down,
        "latent_sample_size": native // down,
        "native_resolution_px": native,
        "recommended_sizes": info.recommended_sizes,
        "source": source,
    }
    return info


def compatibility_resolver(info: ModelInfo) -> Optional[ModelInfo]:
    """Variant → serving worker class (reference CompatibilityResolver,
    model_detector.py:454-558; here every supported variant serves through
    the TPU worker with an arch tag)."""
    if info.is_lora or info.is_controlnet:
        return info
    if info.variant in ("SD15", "SD21"):
        info.arch = "sd15"
        info.worker = "dreamlab_tpu.engine.tpu_worker.TPUPipelineWorker"
    elif info.variant == "SDXL":
        info.arch = "sdxl"
        info.worker = "dreamlab_tpu.engine.tpu_worker.TPUPipelineWorker"
    return info


DEFAULT_STACK: List[Detector] = [
    diffusers_dir_detector,
    safetensors_detector,
    checkpoint_detector,
    controlnet_detector,
    variant_classifier,
    resolution_detector,
    compatibility_resolver,
]


class ModelDetector:
    """Run an (extensible) detector stack over a path."""

    def __init__(self, stack: Optional[List[Detector]] = None):
        self.stack = list(stack or DEFAULT_STACK)

    def add_detector(self, det: Detector, *, index: Optional[int] = None):
        if index is None:
            self.stack.append(det)
        else:
            self.stack.insert(index, det)

    def detect(self, path: str) -> ModelInfo:
        if not os.path.exists(path):
            raise DetectionError(f"path does not exist: {path}")
        info = ModelInfo(path=path)
        for det in self.stack:
            out = det(info)
            if out is not None:
                info = out
        if info.format is None:
            info.format = "unknown"
        # working scratch for inter-detector communication, not a result
        info.extra.pop("safetensors_shapes", None)
        return info


def detect_model(path: str) -> ModelInfo:
    return ModelDetector().detect(path)


def scan_directory(root: str) -> list:
    """Classify every candidate under a directory (the reference's
    detect_model_type.py --scan behavior)."""
    results = []
    for entry in sorted(os.listdir(root)):
        path = os.path.join(root, entry)
        try:
            if os.path.isdir(path) and os.path.exists(
                os.path.join(path, "unet", "config.json")
            ):
                results.append(detect_model(path))
            elif path.endswith((".safetensors",)):
                results.append(detect_model(path))
        except DetectionError:
            continue
    return results


def main(argv=None):  # pragma: no cover - CLI convenience
    import argparse

    p = argparse.ArgumentParser(description="classify model checkpoints")
    p.add_argument("paths", nargs="*")
    p.add_argument("--scan", action="append", default=[],
                   help="scan a directory of checkpoints")
    args = p.parse_args(argv)
    infos = [detect_model(path) for path in args.paths]
    for root in args.scan:
        infos.extend(scan_directory(root))
    for info in infos:
        print(json.dumps(dataclasses.asdict(info), indent=2, default=str))


if __name__ == "__main__":  # pragma: no cover
    main()
