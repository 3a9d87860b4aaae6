"""Bucketed co-located joins: the 100 TB pattern for repeated joins on the
same key — both sides pre-bucketed so the join needs NO shuffle at all
(SURVEY §4 physical-execution notes; pyspark guide 'Partitioning & shuffle')."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is static; tables land in ./spark-warehouse
    # (gitignored)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
    # the catalog is per-session but the warehouse dir persists on disk;
    # a leftover location fails CREATE with LOCATION_ALREADY_EXISTS
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bkt", "o_bkt"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bkt")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("o_bkt")
    )
    return li, o


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    li, o = bucketed_tables
    j = (
        spark.table("li_bkt")
        .join(spark.table("o_bkt"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _plan_of(j)
    join_section = plan.split("Physical Plan")[-1]
    # SortMergeJoin with no Exchange feeding it: bucket layout is reused
    n_exchanges_before_agg = join_section.count("Exchange hashpartitioning(l_orderkey")
    n_exchanges_o = join_section.count("Exchange hashpartitioning(o_orderkey")
    assert n_exchanges_before_agg == 0 and n_exchanges_o == 0, join_section

    # correctness identical to the shuffle join on raw parquet
    want = {
        r.o_orderstatus: r.n
        for r in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        ).collect()
    }
    got = {r.o_orderstatus: r.n for r in j.collect()}
    assert got == want
