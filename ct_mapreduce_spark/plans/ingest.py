"""Batch ingest pipeline — the `ct-fetch` insert path as one logical plan.

Reference flow (cmd/ct-fetch/ct-fetch.go:180-246 insertCTWorker →
storage/filesystemdatabase.go:158-211 Store): parse → filter → derive keys
→ dedup-gate → write PEM partitioned by (expDate, issuer) → accumulate
metadata. Here the whole thing is declarative; Catalyst orders the filters
before the shuffle and the parquet writer gets the partition columns.

Filters (SURVEY §2.2):
  P1 drop CA certs            (ct-fetch.go:47-50)
  P2 drop expired             (ct-fetch.go:52-55) unless log_expired
  P3 issuer-CN prefix keep-set(ct-fetch.go:57-69)
  P5 drop empty-chain rows    (ct-fetch.go:215-219)
"""

from __future__ import annotations

import datetime as dt
from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ct_mapreduce_spark.functions.codecs import serial_hex, spki_or_fallback
from ct_mapreduce_spark.functions.dates import exp_date_hour
from ct_mapreduce_spark.operators.dedup import first_seen


def ingest_filter(
    now: dt.datetime | None = None,
    cn_prefixes: list[str] | None = None,
    log_expired: bool = False,
) -> Column:
    """The combined P1 ∧ P2 ∧ P3 ∧ P5 predicate (certIsFilteredOut,
    ct-fetch.go:44-70, negated)."""
    not_ca = ~(F.col("basic_constraints_valid") & F.col("is_ca"))  # P1
    if log_expired:  # P2
        not_expired = F.lit(True)
    else:
        not_expired = F.col("not_after") >= F.lit(now or dt.datetime.now(dt.timezone.utc))
    if cn_prefixes:  # P3: empty prefix set = keep all (ct-fetch.go:59-61)
        cn_ok = reduce(or_, [F.col("issuer_cn").startswith(p) for p in cn_prefixes])
    else:
        cn_ok = F.lit(True)
    has_issuer = F.col("chain_len") >= 1  # P5
    return not_ca & not_expired & cn_ok & has_issuer


def prepare(
    certs: DataFrame,
    now: dt.datetime | None = None,
    cn_prefixes: list[str] | None = None,
    log_expired: bool = False,
) -> DataFrame:
    """Filter + derive partition/identity keys. No shuffle yet."""
    return (
        certs.where(ingest_filter(now, cn_prefixes, log_expired))
        .withColumn("exp_date", exp_date_hour("not_after"))
        .withColumn("authority_key", spki_or_fallback("skid", "issuer_spki"))
    )


def ingest_batch(
    certs: DataFrame,
    now: dt.datetime | None = None,
    cn_prefixes: list[str] | None = None,
    log_expired: bool = False,
) -> DataFrame:
    """prepare → first-seen dedup. The deduped frame is what gets written
    (S5) and aggregated (A*/D3)."""
    return first_seen(prepare(certs, now, cn_prefixes, log_expired))


def write_store(
    deduped: DataFrame,
    path: str,
    mode: str = "overwrite",
    sort_serials: bool = False,
) -> None:
    """S5: the blob-store layout `root/<expDate>/<issuer>/<serial>` (one PEM
    file per cert, storage/localdiskbackend.go:194-199) becomes partitioned
    parquet — same pruning keys, columnar payload, no per-cert files.

    At 100 TB the (exp_date, issuer_id) directory tree has the same shape
    the reference chose for pruning; files within a partition stay
    task-sized rather than one-row.

    Clustering rows by the partition keys before the write is load-bearing:
    without it every shuffle partition holds rows for most (date, issuer)
    combinations, so N_tasks x N_partitions tiny files get opened — the
    small-file explosion that kills partitioned stores at scale.

    The clustering uses an AQE REBALANCE hint rather than a plain
    `repartition(keys)`: a hash repartition serializes each hot (date,
    issuer) pair into a single task (measured 2x ingest wall-clock at
    sf0.1), while REBALANCE clusters by the keys but lets AQE split
    oversized partitions into multiple tasks and coalesce tiny ones — so
    each directory gets a small bounded number of right-sized files and
    parallelism survives skewed issuers. This is the posture that holds at
    100 TB: file count per partition stays O(data volume / target file
    size), not O(shuffle partitions).
    sort_serials=True additionally sorts rows by serial inside each
    output file so parquet row-group min/max statistics prune serial
    point lookups (S4/S10) to one row group. Off by default: it costs a
    local sort (~+20% write time measured), and pays off only when
    files span multiple row groups — i.e., at real store scale, not in
    local tests.
    """
    clustered = deduped.hint("rebalance", "exp_date", "issuer_id")
    if sort_serials:
        clustered = clustered.sortWithinPartitions(
            "exp_date", "issuer_id", "serial"
        )
    (
        clustered.write.partitionBy("exp_date", "issuer_id")
        .mode(mode)
        .parquet(path)
    )
