"""Point lookups (SURVEY §2.1 S4, cmd/ct-getcert/ct-getcert.go:16-57).

`ct-getcert -log URL -index N` becomes a two-predicate scan; on the
partitioned store the (exp_date, issuer_id) form is partition-pruned to a
single directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ct_mapreduce_spark.functions.codecs import pem_encode


def get_entry(certs: DataFrame, log_url: str, entry_id: int) -> DataFrame:
    """S4: single log entry, PEM-projected (P9)."""
    return certs.where(
        (F.col("log_url") == log_url) & (F.col("entry_id") == entry_id)
    ).select("log_url", "entry_id", pem_encode("raw_der").alias("pem"))


def get_cert(store: DataFrame, exp_date: str, issuer_id: str, serial_hex: str) -> DataFrame:
    """Point read on the partitioned store: prunes to one partition."""
    return store.where(
        (F.col("exp_date") == exp_date)
        & (F.col("issuer_id") == issuer_id)
        & (F.lower(F.hex("serial")) == serial_hex.lower())
    )
