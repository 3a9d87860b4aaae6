"""CRL URL normalization (storage/issuermetadata_test.go:16-60)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ct_mapreduce_spark.functions.urls import normalize_crl_dps


def test_crl_filter_table(spark):
    cases = [
        (["http://a/crl"], ["http://a/crl"]),
        (["https://a/crl"], ["https://a/crl"]),
        (["ldap://d/cn=x"], []),  # silently dropped
        (["ldaps://d/cn=x"], []),
        (["ftp://f/ca.crl"], []),  # non-http
        (["  http://a/crl  ", "http://a/crl"], ["http://a/crl"]),  # trim+dedup
        ([], []),
    ]
    df = spark.createDataFrame([Row(i=i, u=u) for i, (u, _) in enumerate(cases)])
    got = {
        r["i"]: sorted(r["n"])
        for r in df.select("i", normalize_crl_dps("u").alias("n")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == sorted(want), f"case {i}"
