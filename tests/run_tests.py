#!/usr/bin/env python
"""Suite launcher (parity with the reference's tests/run_tests.py).

    python tests/run_tests.py            # everything
    python tests/run_tests.py unit       # fast tier
    python tests/run_tests.py integration
    python tests/run_tests.py tpu        # against real devices
"""

import os
import subprocess
import sys

SUITES = {
    "all": ["tests/", "-q"],
    "unit": ["tests/", "-m", "unit", "-q"],
    "integration": ["tests/", "-m", "integration", "-q"],
    "fast": ["tests/test_scheduler.py", "tests/test_engine.py",
             "tests/test_persistence.py", "tests/test_tokenizer.py", "-q"],
    "tpu": ["tests/", "-q"],
}


def main():
    suite = sys.argv[1] if len(sys.argv) > 1 else "all"
    if suite not in SUITES:
        print(f"unknown suite {suite!r}; choose from {sorted(SUITES)}")
        return 2
    env = dict(os.environ)
    if suite == "tpu":
        env["DREAMLAB_TEST_TPU"] = "1"
    cmd = [sys.executable, "-m", "pytest", *SUITES[suite]]
    print("+", " ".join(cmd))
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    sys.exit(main())
