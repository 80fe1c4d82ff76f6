"""Hot-reload supervisor (serving/run.py --reload).

Parity target: the reference's live-test loop restarts the server on
source change (/root/reference/Dockerfile.live-test CMD `uvicorn --reload`,
docker-compose.live-test.yml:5-46). Ours is a dependency-free polling
supervisor; these tests drive it against a stub child process.
"""

import os
import sys
import threading
import time

from dreamlab_tpu.serving.run import _snapshot, _supervise

CHILD = """\
import os, sys, time
pid_log = sys.argv[1]
stop_flag = sys.argv[2]
with open(pid_log, "a") as f:
    f.write(str(os.getpid()) + "\\n")
while True:
    if os.path.exists(stop_flag):
        sys.exit(7)
    time.sleep(0.02)
"""


def _read_pids(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def test_snapshot_tracks_watched_extensions(tmp_path):
    (tmp_path / "a.py").write_text("x = 1\n")
    (tmp_path / "b.txt").write_text("not watched\n")
    (tmp_path / "__pycache__").mkdir()
    (tmp_path / "__pycache__" / "a.cpython-312.py").write_text("ignored\n")
    state = _snapshot([str(tmp_path)])
    assert set(state) == {str(tmp_path / "a.py")}
    (tmp_path / "a.py").write_text("x = 2\n")
    os.utime(tmp_path / "a.py", (time.time() + 5, time.time() + 5))
    assert _snapshot([str(tmp_path)]) != state


def test_supervisor_restarts_on_change_and_propagates_exit(tmp_path):
    watched = tmp_path / "src"
    watched.mkdir()
    (watched / "app.py").write_text("# v1\n")
    child_py = tmp_path / "child.py"
    child_py.write_text(CHILD)
    pid_log = tmp_path / "pids.log"
    stop_flag = tmp_path / "stop"

    cmd = [sys.executable, str(child_py), str(pid_log), str(stop_flag)]
    result = {}

    def run():
        result["rc"] = _supervise(cmd=cmd, roots=[str(watched)], poll_s=0.05)

    t = threading.Thread(target=run, daemon=True)
    t.start()

    deadline = time.time() + 10
    while not _read_pids(pid_log) and time.time() < deadline:
        time.sleep(0.02)
    assert _read_pids(pid_log), "first child never started"

    # source change → supervisor SIGTERMs the child and starts a new one
    (watched / "app.py").write_text("# v2\n")
    os.utime(watched / "app.py", (time.time() + 5, time.time() + 5))
    while len(_read_pids(pid_log)) < 2 and time.time() < deadline:
        time.sleep(0.02)
    pids = _read_pids(pid_log)
    assert len(pids) >= 2 and pids[0] != pids[1], f"no restart: {pids}"

    # child exiting on its own → supervisor returns its exit code
    stop_flag.write_text("")
    t.join(timeout=10)
    assert not t.is_alive(), "supervisor did not exit after child death"
    assert result["rc"] == 7
