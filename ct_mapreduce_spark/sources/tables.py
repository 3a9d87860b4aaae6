"""Readers for the driver-generated parquet tables (TESTDATA.md).

Thin on purpose: `spark.read.parquet` already gives columnar scans,
predicate pushdown, and partition pruning; wrapping it further would only
hide the plan from Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ct_mapreduce_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    return spark.read.parquet(f"{sf_dir or DEFAULT_SF_DIR}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
