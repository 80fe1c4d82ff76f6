"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so the *real* jitted code paths —
including multi-chip sharding — execute everywhere, without TPU hardware.
This replaces the reference's MagicMock-torch tier (reference
tests/conftest.py): JAX's CPU backend runs the actual compiled programs.

Set DREAMLAB_TEST_TPU=1 to run the suite against real devices instead.
"""

import os

if not os.environ.get("DREAMLAB_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # Some environments pre-register a TPU platform plugin at interpreter
    # start (sitecustomize), which overrides JAX_PLATFORMS — force the CPU
    # backend through the config API as well, before any backend initializes.
    import jax

    jax.config.update("jax_platforms", "cpu")

import io

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


def make_png_bytes(seed: int, size: int = 64) -> bytes:
    """Deterministic PNG from a seed — hardware-free stand-in for a full
    diffusion worker (pattern from reference tests/conftest.py:124-160)."""
    from PIL import Image

    rs = np.random.RandomState(seed)
    arr = rs.randint(0, 256, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def fake_png():
    return make_png_bytes


def pytest_collection_modifyitems(config, items):
    """Auto-mark tests by filename, mirroring the reference's taxonomy."""
    for item in items:
        name = item.fspath.basename
        if "integration" in name:
            item.add_marker(pytest.mark.integration)
        else:
            item.add_marker(pytest.mark.unit)
