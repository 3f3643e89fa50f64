"""Vanilla-session parity at HEAD (round-8 verdict ask #6): the rest
of the suite runs on ``session.get_spark`` (pinned semantic configs),
but the DRIVER runs entries on a vanilla SparkSession — this test
keeps that surface covered in-repo by running tools/vanilla_parity.py
in a SUBPROCESS (fresh JVM, no inherited session/confs): a core of
events.ts-consuming entries (one oracle entry per plans module,
auto-discovered) plus seeded-rotating extras, each against its DuckDB
oracle at sf0.01."""

from __future__ import annotations

import json
import subprocess
import sys

from tests.conftest import REPO


def test_vanilla_session_registry_parity():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "vanilla_parity.py"), "--n", "12"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    rec = json.loads(line)
    assert proc.returncode == 0 and rec.get("ok"), (
        f"vanilla-session parity failed: {rec.get('mismatches')}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    # the core must cover every plans module with an events consumer
    assert len(rec["core"]) >= 8, rec["core"]
