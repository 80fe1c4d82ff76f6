"""TPU environment smoke check (container/startup verification).

Behavioral port of /root/reference/utils/verify_cuda.py:14-90: confirm the
accelerator is reachable, run a matmul, report device + memory — exit 0/1.

    python -m dreamlab_tpu.utils.verify_tpu
"""

from __future__ import annotations

import sys
import time


def verify_tpu(verbose: bool = True) -> bool:
    def log(msg):
        if verbose:
            print(msg, flush=True)

    try:
        import jax
        import jax.numpy as jnp
    except Exception as e:
        log(f"FAIL: jax import: {e}")
        return False

    log(f"jax {jax.__version__}")
    try:
        devices = jax.devices()
    except Exception as e:
        log(f"FAIL: no devices: {e}")
        return False
    log(f"backend: {jax.default_backend()}; devices: {devices}")

    try:
        x = jnp.ones((512, 512), jnp.bfloat16)
        t0 = time.time()
        y = (x @ x).block_until_ready()
        log(f"matmul ok in {1e3 * (time.time() - t0):.0f} ms "
            f"(checksum {float(jnp.sum(y.astype(jnp.float32))):.0f})")
    except Exception as e:
        log(f"FAIL: matmul: {e}")
        return False

    try:
        stats = devices[0].memory_stats() or {}
        total = stats.get("bytes_limit", 0)
        used = stats.get("bytes_in_use", 0)
        log(f"memory: {used / 1e9:.2f} / {total / 1e9:.2f} GB")
    except Exception:
        log("memory stats unavailable (ok on some backends)")

    log("PASS")
    return True


if __name__ == "__main__":
    sys.exit(0 if verify_tpu() else 1)
