"""Entry point: ``python -m dreamlab_tpu.serving.run``
(port of /root/reference/server/run.py — with the reaper started *before*
the blocking server loop, fixing the reference's unreachable call,
SURVEY.md §7.3).

``--reload`` (or RELOAD=1) runs the server under a dependency-free
supervisor that restarts it whenever a source file changes — the
development hot-reload loop the reference gets from ``uvicorn --reload``
(/root/reference/Dockerfile.live-test CMD). The watcher is the same
polling strategy as engine/file_watcher.py: scan ``dreamlab_tpu/`` (and
``ui/dist`` when present) for ``.py``/``.js``/``.html``/``.css`` mtime
changes once a second, debounce, SIGTERM the child, re-exec.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

_WATCH_EXTS = (".py", ".js", ".html", ".css", ".yaml", ".yml")


def _snapshot(roots):
    state = {}
    for root in roots:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in filenames:
                if f.endswith(_WATCH_EXTS):
                    p = os.path.join(dirpath, f)
                    try:
                        state[p] = os.stat(p).st_mtime
                    except OSError:
                        pass
    return state


def _supervise(cmd=None, roots=None, poll_s: float = 1.0) -> int:
    """Run the server as a child; restart it when watched sources change.

    ``cmd``/``roots``/``poll_s`` exist for tests; production callers use
    the defaults (serve this package, watch this package + ui/dist).
    """
    if roots is None:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        roots = [pkg_root]
        ui_dist = os.path.join(os.path.dirname(pkg_root), "ui", "dist")
        if os.path.isdir(ui_dist):
            roots.append(ui_dist)
    if cmd is None:
        cmd = [sys.executable, "-m", "dreamlab_tpu.serving.run"]
    env = dict(os.environ)
    env.pop("RELOAD", None)  # the child serves; only the parent watches

    while True:
        child = subprocess.Popen(cmd, env=env)
        state = _snapshot(roots)
        try:
            while True:
                rc = child.poll()
                if rc is not None:
                    # child died on its own: propagate (crash loops are
                    # better surfaced than hidden behind silent restarts)
                    return rc
                time.sleep(poll_s)
                new = _snapshot(roots)
                if new != state:
                    changed = [
                        p for p in set(new) | set(state)
                        if new.get(p) != state.get(p)
                    ]
                    print(
                        f"[reload] change detected ({changed[0]}…), "
                        "restarting server",
                        file=sys.stderr,
                    )
                    break
        except KeyboardInterrupt:
            child.terminate()
            try:
                child.wait(timeout=10)
            except subprocess.TimeoutExpired:
                child.kill()
                child.wait()
            return 0
        child.send_signal(signal.SIGTERM)
        try:
            child.wait(timeout=10)
        except subprocess.TimeoutExpired:
            child.kill()
            child.wait()


def main():
    argv = sys.argv[1:]
    if "--reload" in argv or os.environ.get("RELOAD") == "1":
        raise SystemExit(_supervise())
    from .app import main as app_main

    app_main()


if __name__ == "__main__":
    main()
