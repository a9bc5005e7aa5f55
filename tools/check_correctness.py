"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
against the same sf directory, then compares row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name).

Usage:  python tools/check_correctness.py [sf_dir] [query_name ...]
Set SPARK_GRAFT_SWEEP_JSON=<path> to also write the per-query results
(rows/schema/hash match booleans, the driver-gate record shape) to JSON —
the committed sweep-snapshot artifact the judge asked for in round 12.
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from usearch_spark.schema import TESTDATA_TABLES
from usearch_spark.session import get_spark


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    import json
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    json_path = os.environ.get("SPARK_GRAFT_SWEEP_JSON")
    results: dict[str, dict] = {}
    only = set(sys.argv[2:])

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    spark = get_spark("correctness", cpus=8, shuffle_partitions=8)

    qs = E.queries()
    oracles = E.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must FAIL, not silently filter to zero queries —
        # "0 failures" on a misspelled query reads as a pass
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        return 1
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            results[name] = {"err": f"spark: {exc}"[:300]}
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            results[name] = {"spark_rows": len(srows), "err": None, "rows_only": True}
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            results[name] = {"err": f"duckdb: {exc}"[:300]}
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
        ok_hash = sh == oh
        status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        results[name] = {
            "rows_match": ok_rows,
            "schema_match": ok_cols,
            "hash_match": ok_hash,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": None,
        }
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)} cols={'ok' if ok_cols else f'{scols} vs {ocols}'} "
            f"hash={'ok' if ok_hash else f'{sh} vs {oh}'} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows and not ok_hash:
                # each side's index order comes from its OWN column list —
                # the engines may return the same columns in different order
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                smat = sorted(tuple(canon(r[i]) for i in order) for r in srows)
                omat = sorted(tuple(canon(r[i]) for i in order_o) for r in orows)
                shown = 0
                for a, b in zip(smat, omat):
                    if a != b and shown < 3:
                        print(f"    spark:  {a}\n    duckdb: {b}")
                        shown += 1
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_path:
        with open(json_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_path} ({len(results)} entries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
