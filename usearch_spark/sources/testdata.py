"""Loaders for the driver-generated TPC-H-ish parquet testdata.

Plain ``spark.read.parquet`` — columnar scan with predicate pushdown and
column pruning courtesy of Catalyst.  Never infer schemas from JSON/CSV in
this repo; parquet carries its own.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from usearch_spark.schema import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TESTDATA_TABLES}
