"""Thread-safe registry of loaded models with real HBM accounting.

Behavioral port of the reference's VRAM registry
(/root/reference/backends/model_registry.py:31-257) with
``torch.cuda.memory_allocated`` replaced by JAX device memory stats
(``device.memory_stats()``), keeping the same stats schema so the
``/api/vram`` + ``/api/models/status`` responses are contract-compatible.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import threading
import time
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class LoadedModel:
    name: str
    model_path: str
    worker_id: int
    hbm_bytes: int
    loras: List[str] = dataclasses.field(default_factory=list)
    loaded_at: float = dataclasses.field(default_factory=time.time)


def _device():
    import jax

    return jax.devices()[0]


def device_memory_stats() -> Dict[str, int]:
    """(total, allocated) bytes for the serving device; degrades to zeros
    when the backend exposes no stats (CPU tests)."""
    try:
        stats = _device().memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "total": int(stats.get("bytes_limit", 0)),
        "allocated": int(stats.get("bytes_in_use", 0)),
        "peak": int(stats.get("peak_bytes_in_use", 0)),
    }


class ModelRegistry:
    """Tracks which models occupy HBM and whether a new one fits."""

    def __init__(self, total_hbm_bytes: Optional[int] = None, headroom: float = 0.9):
        self._lock = threading.Lock()
        self._models: Dict[str, LoadedModel] = {}
        self._total_override = total_hbm_bytes
        self.headroom = headroom

    # ------------------------------------------------------------------
    def register_model(
        self, name: str, model_path: str, worker_id: int, hbm_bytes: int,
        loras: Optional[List[str]] = None,
    ) -> LoadedModel:
        with self._lock:
            if name in self._models:
                logger.warning("registry: overwriting entry %s", name)
            entry = LoadedModel(
                name=name, model_path=model_path, worker_id=worker_id,
                hbm_bytes=hbm_bytes, loras=list(loras or []),
            )
            self._models[name] = entry
            return entry

    def unregister_model(self, name: str) -> bool:
        with self._lock:
            return self._models.pop(name, None) is not None

    def clear(self):
        with self._lock:
            self._models.clear()

    def get_model(self, name: str) -> Optional[LoadedModel]:
        with self._lock:
            return self._models.get(name)

    def list_models(self) -> List[LoadedModel]:
        with self._lock:
            return list(self._models.values())

    # ------------------------------------------------------------------
    def total_hbm(self) -> int:
        if self._total_override is not None:
            return self._total_override
        return device_memory_stats()["total"]

    def get_used_hbm(self) -> int:
        """Real allocated bytes when the backend reports them; else the sum
        of registered model sizes."""
        stats = device_memory_stats()
        if stats["allocated"]:
            return stats["allocated"]
        with self._lock:
            return sum(m.hbm_bytes for m in self._models.values())

    def can_fit(self, required_bytes: int) -> bool:
        total = self.total_hbm()
        if not total:
            return True  # no stats → don't block loading
        return self.get_used_hbm() + required_bytes <= total * self.headroom

    @staticmethod
    def estimate_model_hbm(model_path: str, dtype_bytes: int = 2) -> int:
        """Size estimate from checkpoint files ×1.2 activations/fragmentation
        margin (same heuristic as reference model_registry.py:185-214),
        halved when serving bf16 from fp32 checkpoints."""
        total = 0
        if os.path.isfile(model_path):  # single-file checkpoints
            total = os.path.getsize(model_path)
        else:
            for root, _, files in os.walk(model_path):
                for f in files:
                    if f.endswith((".safetensors", ".bin", ".ckpt")):
                        total += os.path.getsize(os.path.join(root, f))
        return int(total * 1.2 * (dtype_bytes / 4))

    # ------------------------------------------------------------------
    def get_hbm_stats(self) -> Dict:
        """Schema-compatible with the reference's /api/vram payload."""
        stats = device_memory_stats()
        total = self.total_hbm()
        used = self.get_used_hbm()
        with self._lock:
            models = [
                {
                    "name": m.name,
                    "path": m.model_path,
                    "worker_id": m.worker_id,
                    "vram_gb": round(m.hbm_bytes / 1e9, 2),
                    "loras": m.loras,
                    "loaded_at": m.loaded_at,
                }
                for m in self._models.values()
            ]
        return {
            "device": str(_device()),
            "total_gb": round(total / 1e9, 2),
            "allocated_gb": round(stats["allocated"] / 1e9, 2),
            "used_gb": round(used / 1e9, 2),
            "available_gb": round(max(total - used, 0) / 1e9, 2),
            "used_percent": round(100.0 * used / total, 1) if total else 0.0,
            "models": models,
        }


_registry: Optional[ModelRegistry] = None
_registry_lock = threading.Lock()


def get_model_registry() -> ModelRegistry:
    global _registry
    with _registry_lock:
        if _registry is None:
            _registry = ModelRegistry()
        return _registry


def reset_model_registry():
    global _registry
    with _registry_lock:
        _registry = None
