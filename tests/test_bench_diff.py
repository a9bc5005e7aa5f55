"""tools/bench_diff.py — per-query bench regression diffing (r11 verdict ask #2)."""

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
import bench_diff  # noqa: E402

REPO = Path(__file__).resolve().parents[1]


def test_diff_flags_only_real_moves():
    old = {"a": 2.0, "b": 5.0, "c": 0.2, "gone": 1.0}
    new = {"a": 2.1, "b": 12.0, "c": 0.9, "fresh": 3.0}
    d = bench_diff.diff(old, new, ratio=1.5, min_sec=1.0)
    # b regressed 2.4x; a within tolerance; c under the noise floor both sides
    assert [m["query"] for m in d["moved"]] == ["b"]
    assert d["moved"][0]["ratio"] == 2.4
    assert d["added"] == ["fresh"] and d["removed"] == ["gone"]
    assert d["common"] == 3


def test_diff_flags_speedups_too():
    d = bench_diff.diff({"a": 9.0}, {"a": 3.0}, ratio=1.5, min_sec=1.0)
    assert [m["query"] for m in d["moved"]] == ["a"]


def test_cli_fail_flag(tmp_path):
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps({"queries": {"q": 2.0}}))
    new.write_text(json.dumps({"queries": {"q": 8.0}}))
    script = REPO / "tools" / "bench_diff.py"
    ok = subprocess.run([sys.executable, str(script), str(old), str(new)],
                        capture_output=True, text=True)
    assert ok.returncode == 0 and "q" in ok.stdout
    bad = subprocess.run([sys.executable, str(script), str(old), str(new), "--fail"],
                         capture_output=True, text=True)
    assert bad.returncode == 1


def test_r11_snapshot_committed_and_loadable():
    # The r11 verdict requires a per-round detail snapshot in git.
    snap = REPO / "BENCH_DETAIL_r11.json"
    assert snap.exists()
    q = bench_diff._load(str(snap))
    assert len(q) >= 251
