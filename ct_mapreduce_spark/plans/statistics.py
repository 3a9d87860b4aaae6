"""End-to-end storage-statistics plan (cmd/storage-statistics analog).

Composes: ingest prep → first-seen dedup → rollup counts + issuer metadata
report. See operators/statistics.py for the per-operator mapping.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame

from ct_mapreduce_spark.operators.dedup import first_seen
from ct_mapreduce_spark.operators.metadata import issuer_metadata
from ct_mapreduce_spark.operators.statistics import full_report, stats_rollup
from ct_mapreduce_spark.plans.ingest import prepare


def statistics_report(
    certs: DataFrame, now: dt.datetime | None = None
) -> tuple[DataFrame, DataFrame]:
    """Returns (rollup, per_issuer_report) for a raw certificates frame."""
    prepared = prepare(certs, now=now)
    deduped = first_seen(prepared)
    meta = issuer_metadata(prepared)
    return stats_rollup(deduped), full_report(deduped, meta)
