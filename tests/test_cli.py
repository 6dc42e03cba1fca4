"""CLI surface test: the request_manage-style client emits chunked
JSON messages and errors cleanly on unknown handlers."""

from __future__ import annotations

import json
import subprocess
import sys

CMD = [sys.executable, "-m", "listenbrainz_server_spark.cli"]


def test_cli_list_names_handlers():
    out = subprocess.run(
        CMD + ["list"], capture_output=True, text=True, cwd="/root/repo", timeout=120
    )
    assert out.returncode == 0
    names = out.stdout.split()
    assert "stats.user.entity" in names and "echo.echo" in names


def test_cli_unknown_handler_fails_cleanly():
    out = subprocess.run(
        CMD + ["no.such.query"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert out.returncode == 2
    assert "unknown query" in out.stderr


def test_cli_emits_chunked_json():
    out = subprocess.run(
        CMD
        + [
            "popularity.popularity",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--chunk-size",
            "2",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-500:]
    msgs = [json.loads(line) for line in out.stdout.strip().splitlines()]
    assert all(m["type"] == "popularity.popularity" for m in msgs)
    assert all(len(m["data"]) <= 2 for m in msgs)
    rows = [r for m in msgs for r in m["data"]]
    assert {"event_type", "total_listen_count", "total_user_count"} <= set(rows[0])
