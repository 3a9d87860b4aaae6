"""ExpDate bucketing and expiry predicates (reference: storage/types.go:333-384).

The reference truncates NotAfter to the hour and renders two resolutions:
day ``2006-01-02`` and hour ``2006-01-02-15`` (types.go:21-23). A bucket is
expired at time t when t > bucket_end - 1ms (types.go:348-369). We
standardize on hour resolution as the canonical bucket (SURVEY §7) and
derive the day view.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HOUR_FORMAT = "yyyy-MM-dd-HH"  # kTemplateTime, storage/types.go:22
DAY_FORMAT = "yyyy-MM-dd"  # kTemplateDate, storage/types.go:23


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exp_date_hour(not_after: Column | str) -> Column:
    """Hour-resolution bucket key (NewExpDateFromTime, types.go:339-346)."""
    return F.date_format(F.date_trunc("hour", _col(not_after)), HOUR_FORMAT)


def exp_date_day(not_after: Column | str) -> Column:
    """Day-resolution bucket key (ExpDate.String day form, types.go:371-377)."""
    return F.date_format(F.date_trunc("day", _col(not_after)), DAY_FORMAT)


def bucket_end(not_after: Column | str, resolution: str = "hour") -> Column:
    """Exclusive end instant of the bucket containing not_after."""
    interval = "INTERVAL 1 HOUR" if resolution == "hour" else "INTERVAL 1 DAY"
    return F.date_trunc(resolution, _col(not_after)) + F.expr(interval)


def is_expired_at(not_after: Column | str, at: Column, resolution: str = "hour") -> Column:
    """ExpDate.IsExpiredAt (types.go:348-369): the bucket's last good
    instant is bucket_end - 1ms; expired iff at > last_good. Spark
    timestamps are microsecond-resolution, so this is evaluated exactly as
    `at > bucket_end - 1ms` — times in the open interval (end-1ms, end)
    count as expired, matching the reference's strict Before(lastGood)."""
    return at > bucket_end(not_after, resolution) - F.expr("INTERVAL 1 MILLISECOND")


def parse_exp_date(s: Column | str) -> Column:
    """Parse either resolution of a bucket key back to its start timestamp
    (NewExpDate, types.go:335-346): 13-char keys are hourly, 10-char daily."""
    c = _col(s)
    return F.when(
        F.length(c) > 10, F.to_timestamp(c, HOUR_FORMAT)
    ).otherwise(F.to_timestamp(c, DAY_FORMAT))
