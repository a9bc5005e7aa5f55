"""Streaming-replay phase profiler (the r15-verdict ask #1: "split
per-query engine-start vs micro-batch commit time" BEFORE tuning the
state store).

Attaches a StreamingQueryListener for the whole run and times each
streaming entry query like bench_probe does (gc + clearCache + noop
materialize).  For every micro-batch the listener records Spark's own
durationMs breakdown (triggerExecution, queryPlanning, getBatch,
latestOffset, addBatch, walCommit, commitOffsets) plus the state-store
operator commit times, so the per-query wall clock decomposes into

    wall = artifact/setup + N x (stream start + batches + stop) + sink

where "batches" is the sum of triggerExecution and "stream start" is
everything between .start() and the first trigger (checkpoint dir
creation, source listing, first offset WAL write).

Usage:
    python tools/stream_probe.py [SF_DIR] NAME [NAME ...]
    SPARK_GRAFT_PROBE_REPS=3 python tools/stream_probe.py sf0.1 dedup_stream

Prints ONE JSON line:
  {"stream_probe": {name: {"wall": {...}, "starts": n, "batches": n,
      "duration_ms_sum": {...}, "state_commit_ms": n}}, ...}
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402


class _Collector(StreamingQueryListener):
    """Accumulates per-batch durationMs + state operator commit times for
    every streaming query started while active.  Thread-safe enough for
    the probe (events arrive on the listener bus thread)."""

    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.reset()

    def reset(self) -> None:
        with getattr(self, "lock", threading.Lock()):
            self.starts = 0
            self.batches = 0
            self.durations: dict[str, int] = {}
            self.state_commit_ms = 0
            self.state_rows = 0
            self.start_walls: list[float] = []
            self.first_progress_walls: list[float] = []
            self._started_at: dict[str, float] = {}

    def onQueryStarted(self, event) -> None:
        with self.lock:
            self.starts += 1
            self._started_at[str(event.id)] = time.time()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self.lock:
            qid = str(p.id)
            if qid in self._started_at:
                # wall from .start() to the END of the first progress:
                # includes source listing + batch 0 itself
                self.first_progress_walls.append(time.time() - self._started_at.pop(qid))
            self.batches += 1
            for k, v in (p.durationMs or {}).items():
                self.durations[k] = self.durations.get(k, 0) + int(v)
            for op in p.stateOperators or []:
                self.state_commit_ms += int(op.commitTimeMs or 0)
                self.state_rows += int(op.numRowsTotal or 0)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    def snapshot(self) -> dict:
        with self.lock:
            return {
                "starts": self.starts,
                "batches": self.batches,
                "duration_ms_sum": dict(self.durations),
                "state_commit_ms": self.state_commit_ms,
                "state_rows": self.state_rows,
                "first_progress_wall_s": [round(w, 3) for w in self.first_progress_walls],
            }


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def probe(spark, names: list[str], sf_dir: str, reps: int) -> dict:
    import __spark_entry__ as E

    qs = E.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    col = _Collector()
    spark.streams.addListener(col)
    # warmup (bench_probe discipline)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        for w in ("pricing_summary", "revenue_by_nation"):
            materialize(qs[w](spark, "/root/testdata/sf0.001"))
    except Exception:
        pass

    out: dict[str, dict] = {}
    walls: dict[str, list[float]] = {n: [] for n in names}
    snaps: dict[str, list[dict]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            gc.collect()
            spark.catalog.clearCache()
            col.reset()
            t0 = time.time()
            materialize(qs[n](spark, sf_dir))
            wall = round(time.time() - t0, 3)
            # listener events are async: give the bus a beat to drain
            time.sleep(0.25)
            walls[n].append(wall)
            snaps[n].append(col.snapshot())
    for n in names:
        last = snaps[n][-1]
        out[n] = {
            "wall": {
                "reps": walls[n],
                "median": round(statistics.median(walls[n]), 3),
                "min": round(min(walls[n]), 3),
            },
            **last,
            "trigger_exec_s": round(last["duration_ms_sum"].get("triggerExecution", 0) / 1000, 3),
        }
    try:
        spark.streams.removeListener(col)
    except Exception:
        pass
    return out


def main() -> None:
    from tools.bench_probe import parse_args

    sf_dir, names = parse_args(sys.argv[1:])
    if not names:
        raise SystemExit("usage: stream_probe.py [SF_DIR] NAME [NAME ...]")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "3"))

    from usearch_spark.session import get_spark

    spark = get_spark("stream_probe")
    load_before = round(os.getloadavg()[0], 2)
    res = probe(spark, names, sf_dir, reps)
    print(
        json.dumps(
            {
                "stream_probe": res,
                "reps": reps,
                "sf_dir": sf_dir,
                "load_avg_before": load_before,
                "load_avg_after": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
