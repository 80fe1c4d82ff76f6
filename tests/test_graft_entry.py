"""Driver-contract tests for __graft_entry__.

Round-1 postmortem: 229 tests passed but the one function the driver calls
(`dryrun_multichip`) crashed, because conftest.py forced the CPU platform and
the entry did not (VERDICT.md "What's weak" #1). These tests invoke the entry
in a clean subprocess — no conftest, no JAX_PLATFORMS/XLA_FLAGS in the
environment — exactly as the driver does.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Environment as the driver would have it: no CPU-forcing vars."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("DREAMLAB_DRYRUN_REAL_DEVICES", None)
    return env


def test_dryrun_multichip_in_clean_subprocess():
    code = (
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed in driver-like subprocess\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "dryrun_multichip ok" in proc.stdout


def test_entry_returns_fn_and_args_without_jit():
    """entry() must be importable and return (callable, tuple) cheaply.

    Compilation itself is the driver's job (and covered by the UNet test
    suite); here we assert the contract shape only, in-process.
    """
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.remove(REPO)
    fn, args = ge.entry()
    assert callable(fn)
    assert isinstance(args, tuple) and len(args) == 5
