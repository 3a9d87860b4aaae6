"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2);
                registry lives in ct_mapreduce_spark/plans/corpus.py.
oracle_sql()  — matching DuckDB SQL per query (omitted => rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ct_mapreduce_spark.plans.corpus import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the storage-statistics rollup analog (SURVEY §3.2) over
    the sf0.001 events table."""
    fn = REGISTRY["a3_stats_rollup"].fn
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None
    }
