"""Entry point: ``python -m dreamlab_tpu.serving.run``
(port of /root/reference/server/run.py — with the reaper started *before*
the blocking server loop, fixing the reference's unreachable call,
SURVEY.md §7.3)."""

from __future__ import annotations


def main():
    from .app import main as app_main

    app_main()


if __name__ == "__main__":
    main()
