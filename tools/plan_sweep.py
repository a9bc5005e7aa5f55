"""Plan-shape sweep over every entry query: counts, per query, the number
of parquet scans of each base table (the 100-TB cost a local bench
underweights — a 2s local query that scans the base 32x is 32 full passes
at scale), plus Exchange / Window / BatchEvalPython node counts in the
FORMATTED physical plan.

Note the counting caveat: operators that ``localCheckpoint`` their
bounded artifacts EXECUTE those preludes at DataFrame-construction time,
so the remaining plan legitimately reads checkpointed RDDs instead of
parquet — a query shown with 0 base scans did its one scan inside the
eager checkpoint build.  The sweep is therefore a measure of the LAZY
plan's residual re-scan pathology, exactly the duplicated-subtree cost
this round eliminates.

Usage: python tools/plan_sweep.py [sf_dir] [query ...]   (JSON to stdout)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from usearch_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E

    spark = get_spark("plan_sweep", cpus=8, shuffle_partitions=8)
    out: dict[str, dict] = {}
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as exc:  # noqa: BLE001 - a broken query must not hide the rest
            out[name] = {"error": str(exc)[:200]}
            continue
        scans: dict[str, int] = {}
        for m in re.finditer(r"Location:.*?\[file:([^\]]*)\]", plan):
            tbl = os.path.basename(m.group(1).rstrip("/"))
            scans[tbl] = scans.get(tbl, 0) + 1
        out[name] = {
            "scans": scans,
            "base_scans": sum(
                c for t, c in scans.items()
                if t.endswith(".parquet") and t not in ("nation.parquet", "region.parquet")
            ),
            "exchanges": plan.count("Exchange"),
            "windows": len(re.findall(r"\bWindow\b", plan)),
            "python": plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("ArrowEval"),
            "plan_lines": plan.count("\n"),
        }
    json.dump(out, sys.stdout, indent=1)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
