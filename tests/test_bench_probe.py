"""tools/bench_probe.py — the isolated-probe protocol (r13-verdict ask #4:
">2x movers get adjudicated with committed evidence instead of prose")."""

from __future__ import annotations

import json
import subprocess
import sys

from tests.conftest import SF_SMOKE


def test_probe_protocol_shape(spark):
    """probe() runs the interleaved-rep protocol and reports reps,
    median, min and the load stamps for every probed query."""
    sys.path.insert(0, "/root/repo/tools")
    import bench_probe

    out = bench_probe.probe(
        spark, ["pricing_summary", "revenue_by_nation"], SF_SMOKE, reps=2
    )
    assert out["reps"] == 2 and out["sf_dir"] == SF_SMOKE
    assert set(out["probe"]) == {"pricing_summary", "revenue_by_nation"}
    for rec in out["probe"].values():
        assert len(rec["reps"]) == 2
        assert rec["min"] == min(rec["reps"])
        assert rec["min"] <= rec["median"] <= max(rec["reps"])
    assert out["load_avg_max"] >= out["load_avg_before"] * 0  # stamped floats
    assert isinstance(out["warmup_sec"], float)


def test_probe_rejects_unknown_query(spark):
    sys.path.insert(0, "/root/repo/tools")
    import bench_probe
    import pytest

    with pytest.raises(SystemExit):
        bench_probe.probe(spark, ["no_such_query"], SF_SMOKE, reps=1)


import os

import pytest


@pytest.mark.slow  # boots a second Spark JVM
def test_probe_cli_prints_one_json_line():
    """The CLI contract mirrors bench.py: exactly one JSON line on
    stdout (stderr free for warnings)."""
    r = subprocess.run(
        [sys.executable, "tools/bench_probe.py", SF_SMOKE, "point_lookup"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_PROBE_REPS": "1"},
        timeout=600,
    )
    lines = [l for l in r.stdout.strip().split("\n") if l.strip()]
    assert len(lines) == 1, r.stdout + r.stderr
    parsed = json.loads(lines[0])
    assert "point_lookup" in parsed["probe"]
