"""Isolated-probe protocol for adjudicating bench movers (the r13-verdict
ask: ">2x movers get adjudicated with committed evidence instead of
prose").

Usage:
    python tools/bench_probe.py [SF_DIR] NAME [NAME ...]
    SPARK_GRAFT_PROBE_REPS=5 python tools/bench_probe.py sf0.1 graph_harmonic

Protocol (what makes a probe number trustworthy where an in-suite bench
number is not):
  - INTERLEAVED reps: rep r runs every probed query once before rep r+1
    starts, so a transient contention window hits all queries alike
    instead of poisoning one query's whole sample;
  - each timing starts from gc.collect() + spark.catalog.clearCache()
    (the bench.py discipline) so a probe number never depends on the
    previous query's cached relations or pending checkpoint blocks;
  - the 1-minute load average is stamped before the run, after every
    timing, and the max is published — a probe taken above LA 2 is
    flagged exactly like bench.py flags its headline;
  - median AND min are reported: the median is the comparable number,
    the min is the contention-free floor (a query whose min matches its
    old median was jitter, not regression).

Prints ONE JSON line:
  {"probe": {name: {"reps": [..], "median": m, "min": lo}}, "reps": N,
   "sf_dir": ..., "load_avg_before": .., "load_avg_max": ..,
   "warmup_sec": ..}
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def probe(spark, names: list[str], sf_dir: str, reps: int) -> dict:
    """Run the probe protocol; returns the result dict (separated from
    main() so pytest can drive it on a tiny SF)."""
    import __spark_entry__ as E

    qs = E.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    load_before = round(os.getloadavg()[0], 2)
    # warmup: JIT scan/agg/join codegen on the smallest SF so rep 0 of the
    # first query doesn't carry one-time classloading
    t_warm = time.time()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        for w in ("pricing_summary", "revenue_by_nation"):
            materialize(qs[w](spark, "/root/testdata/sf0.001"))
    except Exception:
        pass
    warmup = round(time.time() - t_warm, 3)

    samples: dict[str, list[float]] = {n: [] for n in names}
    la: list[float] = [load_before]
    for _ in range(reps):
        for n in names:
            gc.collect()
            spark.catalog.clearCache()
            t0 = time.time()
            materialize(qs[n](spark, sf_dir))
            samples[n].append(round(time.time() - t0, 3))
            la.append(round(os.getloadavg()[0], 2))
    return {
        "probe": {
            n: {
                "reps": ts,
                "median": round(statistics.median(ts), 3),
                "min": round(min(ts), 3),
            }
            for n, ts in samples.items()
        },
        "reps": reps,
        "sf_dir": sf_dir,
        "load_avg_before": load_before,
        "load_avg_max": max(la),
        "warmup_sec": warmup,
    }


def main() -> None:
    args = sys.argv[1:]
    if args and (os.path.sep in args[0] or args[0].startswith("sf")):
        sf_dir, names = args[0], args[1:]
        if not os.path.sep in sf_dir:
            sf_dir = f"/root/testdata/{sf_dir}"
    else:
        sf_dir, names = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ), args
    if not names:
        raise SystemExit("usage: bench_probe.py [SF_DIR] NAME [NAME ...]")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "5"))

    from usearch_spark.session import get_spark

    out = probe(get_spark("bench_probe"), names, sf_dir, reps)
    if out["load_avg_max"] > 2.0:
        print(
            f"probe WARNING: load average peaked at {out['load_avg_max']} > 2 "
            "during the run — medians may be contaminated",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
