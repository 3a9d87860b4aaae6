"""Storage-layout conformance suite — the engine's analog of the exported
BackendTest* helpers (storage/storagebackend_tests.go:39-215):

- store/load byte-equality incl. empty and ~1 MiB payloads (:39-53)
- partition listing with day- and hour-resolution dates (:55-101, :171-215)
- per-partition serial listing (:171-215)
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ct_mapreduce_spark.functions.dates import parse_exp_date

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """A small store with known payload edge cases, written through the
    engine's partitioned layout."""
    rows = [
        # (exp_date hour-res, issuer, serial, payload)
        ("2024-01-01-06", "issuerA", b"\x01", b""),  # empty payload
        ("2024-01-01-06", "issuerA", b"\x02", b"\xca\xfe" * 4),
        ("2024-01-01-06", "issuerB", b"\x00\xaa", b"pem bytes"),
        ("2024-01-02-00", "issuerA", b"\x03", bytes(range(256)) * 4096),  # ~1 MiB
        ("2024-06-15-13", "issuerC", b"\x01\x04\xaa\xff", b"x"),
    ]
    df = spark.createDataFrame(
        [Row(exp_date=e, issuer_id=i, serial=s, raw_der=p) for e, i, s, p in rows],
        "exp_date string, issuer_id string, serial binary, raw_der binary",
    )
    path = str(tmp_path_factory.mktemp("store") / "parquet")
    df.write.partitionBy("exp_date", "issuer_id").parquet(path)
    return path, rows


def test_store_load_byte_equality(spark, store):
    """BackendTestStoreLoad (:39-53): payloads byte-identical after a
    store/load round trip, including empty and ~1 MiB rows."""
    path, rows = store
    got = {
        (r.exp_date, r.issuer_id, bytes(r.serial)): bytes(r.raw_der)
        for r in spark.read.parquet(path).collect()
    }
    for e, i, s, p in rows:
        assert got[(e, i, s)] == p


def test_list_expiration_dates_pruned(spark, store):
    """BackendTestListFiles / ListExpirationDates (:55-101,
    localdiskbackend.go:93-119): enumerate date partitions not expired at
    a reference time (day-truncated, like :97)."""
    path, _ = store
    df = spark.read.parquet(path)
    not_before = F.lit(dt.datetime(2024, 1, 2, 0, 0))
    live = (
        df.where(parse_exp_date("exp_date") >= F.date_trunc("day", not_before))
        .select("exp_date")
        .distinct()
    )
    assert {r.exp_date for r in live.collect()} == {"2024-01-02-00", "2024-06-15-13"}


def test_list_issuers_for_expiration_date(spark, store):
    """ListIssuersForExpirationDate (localdiskbackend.go:121-139)."""
    path, _ = store
    df = spark.read.parquet(path)
    issuers = {
        r.issuer_id
        for r in df.where(F.col("exp_date") == "2024-01-01-06")
        .select("issuer_id")
        .distinct()
        .collect()
    }
    assert issuers == {"issuerA", "issuerB"}


def test_serials_for_partition_sorted(spark, store):
    """StreamSerialsForExpirationDateAndIssuer (localdiskbackend.go:141-186)
    + byte-wise serial ordering (types.go:257-271: BinaryType ordering ==
    bytes.Compare)."""
    path, _ = store
    df = spark.read.parquet(path)
    serials = [
        bytes(r.serial)
        for r in df.where(
            (F.col("exp_date") == "2024-01-01-06") & (F.col("issuer_id") == "issuerA")
        )
        .orderBy("serial")
        .collect()
    ]
    assert serials == [b"\x01", b"\x02"]
