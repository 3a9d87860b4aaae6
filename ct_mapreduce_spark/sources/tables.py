"""Readers for the driver-generated parquet tables (TESTDATA.md).

Thin on purpose: `spark.read.parquet` already gives columnar scans,
predicate pushdown, and partition pruning; wrapping it further would only
hide the plan from Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ct_mapreduce_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one testdata table.

    events.parquet stores its `ts` as TIMESTAMP(NANOS), which the Spark
    parquet reader rejects. Read it as long (legacy conf) and truncate to
    microseconds with *integer* division — DuckDB truncates nanos->micros
    the same way, so oracle comparisons agree. (Float division here would
    round, not truncate, and drift by 1us on ~half the rows.)
    """
    path = f"{sf_dir or DEFAULT_SF_DIR}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
