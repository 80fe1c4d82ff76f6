"""Static contract checks for the vanilla SPA (ui/dist).

No JS runtime ships in this image, so these pin the *presence and wiring*
of the round-4 scroll-ergonomics rebuild (reference useScrollManagement.js
sticky-bottom + useSnapScroll.js snap/keyboard behaviors) and the existing
lifecycle invariants — the behaviors themselves are exercised manually via
the live-test stack (docker-compose.live-test.yml).
"""

import re
from pathlib import Path

UI = Path(__file__).resolve().parent.parent / "ui" / "dist"


def test_ui_files_exist():
    for name in ("index.html", "app.js", "style.css"):
        assert (UI / name).is_file(), name


def test_scroll_ergonomics_present():
    js = (UI / "app.js").read_text()
    # sticky bottom: addMessage must follow only while stuck — the old
    # unconditional scrollIntoView stole the position during history reads
    assert "scrollIntoView" not in js
    assert "SCROLL.stuck" in js
    assert "initChatScroll" in js
    # snap mechanics: velocity-gated, center-threshold, keyboard nav
    for marker in ("VELOCITY_THRESHOLD", "SNAP_THRESHOLD", "closestImage",
                   "ArrowDown", "ArrowUp"):
        assert marker in js, marker
    # eviction preserves the reading position
    assert re.search(r"scrollTop = Math\.max\(0, box\.scrollTop - h\)", js)


def test_jump_pill_wired():
    html = (UI / "index.html").read_text()
    js = (UI / "app.js").read_text()
    css = (UI / "style.css").read_text()
    assert 'id="jump-latest"' in html
    assert "jump-latest" in js and "jump-latest" in css


def test_blob_lifecycle_still_bounded():
    js = (UI / "app.js").read_text()
    assert "MAX_MESSAGES" in js
    assert "revokeObjectURL" in js


def test_js_brackets_balanced():
    js = (UI / "app.js").read_text()
    # strip strings/comments crudely before counting
    stripped = re.sub(r"//[^\n]*", "", js)
    stripped = re.sub(r'"(?:[^"\\]|\\.)*"', '""', stripped)
    stripped = re.sub(r"'(?:[^'\\]|\\.)*'", "''", stripped)
    stripped = re.sub(r"`(?:[^`\\]|\\.)*`", "``", stripped)
    for o, c in (("{", "}"), ("(", ")"), ("[", "]")):
        assert stripped.count(o) == stripped.count(c), (o, c)
