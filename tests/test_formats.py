"""Source-format round-trip fidelity: JSON-lines and CSV copies of a table
must reproduce the original rows exactly under an explicit read schema."""

from __future__ import annotations

from pyspark.sql import functions as F

SCHEMA = "id long, name string, score double, n long"
ROWS = [
    (1, "alpha", 0.1 + 0.2, 7),            # classic non-representable double
    (2, "comma, quoted \"x\"", -1.5e-300, 0),  # csv-hostile string, denormal-ish
    (3, None, float("inf"), -9),
    (4, "unicode ünïcødé", 12345.678901234567, 2**52),
]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_json_roundtrip_exact(spark, tmp_path):
    p = str(tmp_path / "j")
    _df(spark).write.json(p)
    back = spark.read.schema(SCHEMA).json(p)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_csv_roundtrip_exact(spark, tmp_path):
    p = str(tmp_path / "c")
    _df(spark).write.option("header", True).csv(p)
    back = spark.read.schema(SCHEMA).option("header", True).csv(p)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_orc_roundtrip_exact(spark, tmp_path):
    """ORC is the third columnar format Spark ships natively; same exact
    round-trip contract as parquet (plus predicate pushdown on read)."""
    p = str(tmp_path / "o")
    _df(spark).write.orc(p)
    back = spark.read.schema(SCHEMA).orc(p)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)
    pushed = spark.read.schema(SCHEMA).orc(p).filter(F.col("id") >= 3)
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(id,3)" in plan
    assert sorted(r["id"] for r in pushed.collect()) == [3, 4]


def test_partitioned_write_roundtrip(spark, tmp_path):
    """Hive-layout partitioned write/read: partition column round-trips
    through the directory name and prunes on read."""
    p = str(tmp_path / "part")
    _df(spark).withColumn("bucket", F.col("id") % 2).write.partitionBy(
        "bucket"
    ).parquet(p)
    back = spark.read.parquet(p)
    assert back.count() == len(ROWS)
    pruned = back.filter(F.col("bucket") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert sorted(r["id"] for r in pruned.collect()) == [1, 3]
