"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop sink (full execution, no driver
collect).  A warmup query amortizes JVM/codegen startup out of q1's number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from usearch_spark.session import get_spark


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def pagerank_100k(spark) -> dict:
    """BASELINE.md graph-compute gate: 100k-vertex random graph (seed 42,
    1-7 out-links each) must converge (SAD < 0.001) without lineage blowup
    — mirrors the reference's pagerank/calculator_test.go:197-251.

    The graph is generated JVM-side (xxhash64 pseudo-randomness, seed 42)
    instead of as driver-built Python tuples: at any real scale the input
    would be generated/read distributively, and driver pickling of 700k
    tuples was dominating the gate's wall clock, hiding the algorithm.

    Also MEASURES the incremental claim instead of asserting it: a second
    run warm-started from the converged scores (the engine's periodic
    re-rank path, ST3) must re-converge in far fewer steps — the
    warm/cold step counts and times are published side by side."""
    from pyspark.sql import functions as F

    from usearch_spark.plans.pagerank import pagerank

    n = 100_000
    v = spark.range(n).select(F.col("id").cast("string"))
    deg = F.pmod(F.xxhash64(F.col("id"), F.lit(42)), F.lit(7)) + F.lit(1)
    e = (
        spark.range(n)
        .select(F.col("id"), F.explode(F.sequence(F.lit(1), deg)).alias("k"))
        .select(
            F.col("id").cast("string").alias("src"),
            F.pmod(F.xxhash64(F.col("id"), F.col("k"), F.lit(42)), F.lit(n)).cast("string").alias("dst"),
        )
    )
    t0 = time.time()
    res = pagerank(v, e, max_steps=80)
    cold_sec = round(time.time() - t0, 3)
    scores = res.state.localCheckpoint(eager=True)
    t1 = time.time()
    warm = pagerank(v, e, max_steps=80, init_scores=scores)
    return {
        "sec": cold_sec,
        "steps": res.steps,
        "converged": res.converged,
        "warm_sec": round(time.time() - t1, 3),
        "warm_steps": warm.steps,
        "warm_converged": warm.converged,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # Stamp the 1-minute load average before any work: round-12's committed
    # headline was taken on a box with external load (LA 5-7, uniform
    # 1.3-1.7x inflation on byte-identical code) and only the builder's ad-hoc
    # log caught it.  A pre-run LA above ~2 means the number will not be
    # comparable across rounds — warn loudly so the runner re-runs on idle.
    load_before = round(os.getloadavg()[0], 2)
    if load_before > 2.0:
        print(
            f"bench WARNING: pre-run load average {load_before} > 2 — "
            "timings will be contaminated by external load; prefer re-running idle",
            file=sys.stderr,
        )
    spark = get_spark("bench")

    import __spark_entry__ as E

    qs = E.queries()

    # warmup: JIT the scan/agg/join paths on the smallest SF so the first
    # measured query doesn't pay one-time codegen/classloading costs
    t_warm = time.time()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        warm_dir = "/root/testdata/sf0.001"
        for name in ("pricing_summary", "revenue_by_nation", "search_match", "dedup_minhash_lsh"):
            materialize(qs[name](spark, warm_dir))
    except Exception:
        pass
    warm = time.time() - t_warm

    import gc
    import statistics

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    per_run: dict[str, list[float]] = {name: [] for name in qs}
    # External load can arrive MID-run (round 13: pre-run LA 0.46, but a
    # contention window opened during the sweep and inflated the common
    # set 2-3x) — sample the 1-minute LA after every query so the detail
    # file records the run's actual load profile, not just the endpoints.
    la_samples: list[float] = []
    for run in range(n_runs):
        for name, fn in qs.items():
            # drop py4j refs from the previous query so the ContextCleaner
            # can release its localCheckpoint blocks — otherwise checkpoint
            # RDDs pile up across the session and late queries pay
            # GC/eviction spikes
            gc.collect()
            # each timing starts from an empty relation cache so a query's
            # number does not depend on which queries ran before it (round
            # 3→4 showed ordering alone moved light queries 2×+); run 0 is
            # still "colder" (artifact builds, first parquet touch) and is
            # published separately as cold_sec
            spark.catalog.clearCache()
            t0 = time.time()
            try:
                materialize(fn(spark, sf_dir))
                per_run[name].append(time.time() - t0)
            except Exception as exc:  # a failing query must not hide the rest
                print(f"bench error in {name}: {exc}", file=sys.stderr)
            la_samples.append(round(os.getloadavg()[0], 2))

    # median of n_runs so round-over-round deltas are signal, not the box's
    # +/-30% wall-clock noise; cold (run-0), the WARM median (runs 1..,
    # excluding run-0's artifact builds / first parquet touch — the number
    # that isolates plan changes from JIT/cache noise) and spread (max-min)
    # are published alongside
    timings = {
        name: (round(statistics.median(ts), 3) if ts else -1.0) for name, ts in per_run.items()
    }
    cold = {name: round(ts[0], 3) for name, ts in per_run.items() if ts}
    warm_med = {
        name: round(statistics.median(ts[1:]), 3)
        for name, ts in per_run.items()
        if len(ts) > 1
    }
    spread = {
        name: round(max(ts) - min(ts), 3) for name, ts in per_run.items() if len(ts) > 1
    }
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    total_cold = round(sum(cold.values()), 3)
    total_warm = round(sum(warm_med.values()), 3)

    gc.collect()  # release the query loop's checkpoint blocks before the gate
    try:
        pr_gate = pagerank_100k(spark)
    except Exception as exc:
        pr_gate = {"error": str(exc)[:200]}

    # The driver records only a 2000-char tail of stdout: a full per-query
    # dict for 110+ queries (~3.3 KB) truncates the line head and the JSON
    # never parses (round 3 lost its headline total this way).  Keep the
    # stdout line compact — totals + the top-10 slowest — and write the
    # complete medians/spread to BENCH_DETAIL.json beside this script.
    load_after = round(os.getloadavg()[0], 2)
    detail = {
        "queries": timings,
        "cold_sec": cold,
        "warm_sec": warm_med,
        "spread_sec": spread,
        "warmup_sec": round(warm, 3),
        "runs": n_runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pagerank_100k": pr_gate,
        "load_avg_before": load_before,
        "load_avg_after": load_after,
        "load_avg_max": max(la_samples) if la_samples else load_after,
        "load_avg_samples": la_samples[:: max(1, len(la_samples) // 100)],
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "usearch_spark_headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(timings),
                "total_cold_sec": total_cold,
                "total_warm_sec": total_warm,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "runs": n_runs,
                "pagerank_100k": pr_gate,
                "load_avg_before": load_before,
                "load_avg_after": load_after,
                "load_avg_max": max(la_samples) if la_samples else load_after,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
