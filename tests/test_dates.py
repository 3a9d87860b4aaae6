"""ExpDate bucketing/expiry boundary tests (storage/types_test.go:203-252)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from ct_mapreduce_spark.functions.dates import (
    exp_date_day,
    exp_date_hour,
    is_expired_at,
    parse_exp_date,
)

UTC = dt.timezone.utc


def test_bucket_formats(spark):
    ts = dt.datetime(2004, 1, 19, 4, 37, 12, tzinfo=UTC)
    row = (
        spark.createDataFrame([Row(t=ts)])
        .select(
            exp_date_hour("t").alias("h"), exp_date_day("t").alias("d")
        )
        .first()
    )
    assert row["h"] == "2004-01-19-04"
    assert row["d"] == "2004-01-19"


def test_expiry_boundaries_day(spark):
    # types_test.go:215-222: day bucket 2004-01-19 expired at
    # 2004-01-20T00:00:00Z, still valid at ...19T23:59:59.
    t = dt.datetime(2004, 1, 19, 12, 0, tzinfo=UTC)
    df = spark.createDataFrame([Row(t=t)])
    valid_at = F.lit(dt.datetime(2004, 1, 19, 23, 59, 59, tzinfo=UTC))
    expired_at = F.lit(dt.datetime(2004, 1, 20, 0, 0, 0, tzinfo=UTC))
    row = df.select(
        is_expired_at("t", valid_at, "day").alias("a"),
        is_expired_at("t", expired_at, "day").alias("b"),
    ).first()
    assert row["a"] is False and row["b"] is True


def test_expiry_boundaries_hour(spark):
    # types_test.go:223-230: hour bucket 2004-01-19-04 expired at 05:00,
    # valid at 04:59:59.
    t = dt.datetime(2004, 1, 19, 4, 30, tzinfo=UTC)
    df = spark.createDataFrame([Row(t=t)])
    row = df.select(
        is_expired_at("t", F.lit(dt.datetime(2004, 1, 19, 4, 59, 59, tzinfo=UTC))).alias("a"),
        is_expired_at("t", F.lit(dt.datetime(2004, 1, 19, 5, 0, 0, tzinfo=UTC))).alias("b"),
    ).first()
    assert row["a"] is False and row["b"] is True


def test_parse_exp_date_both_resolutions(spark):
    rows = (
        spark.createDataFrame([Row(s="2004-01-19-04"), Row(s="2004-01-19")])
        .select(parse_exp_date("s").alias("t"))
        .collect()
    )
    assert rows[0]["t"] == dt.datetime(2004, 1, 19, 4, 0)
    assert rows[1]["t"] == dt.datetime(2004, 1, 19, 0, 0)
