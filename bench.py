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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    import __spark_entry__ as E

    qs = E.queries()

    # warmup: touch each table + JIT the scan path once
    t_warm = time.time()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = time.time() - t_warm

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            materialize(fn(spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # a failing query must not hide the rest
            timings[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "usearch_spark_headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "warmup_sec": round(warm, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
