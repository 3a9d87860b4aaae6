"""Golden-vector tests ported from the reference's unit suite
(storage/types_test.go, see FIXTURES.md §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ct_mapreduce_spark.functions import (
    base64url,
    pem_encode,
    serial_bigint,
    serial_hex,
    serial_id,
    spki_issuer_id,
    spki_or_fallback,
    unique_cert_id,
)
from ct_mapreduce_spark.functions.codecs import log_url_id, parse_unique_cert_id


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_serial_hex_golden(spark):
    # types_test.go:59-79: DE AD BE EF -> "deadbeef"
    assert one(spark, serial_hex(F.lit(bytes([0xDE, 0xAD, 0xBE, 0xEF])))) == "deadbeef"


def test_serial_leading_zero(spark):
    # types_test.go:81-101: 00 AA keeps its leading zero; ID is "AKo="
    row = (
        spark.range(1)
        .select(
            serial_hex(F.lit(b"\x00\xaa")).alias("hex"),
            serial_id(F.lit(b"\x00\xaa")).alias("id"),
        )
        .first()
    )
    assert row["hex"] == "00aa"
    assert row["id"] == "AKo="


def test_spki_issuer_id_golden(spark):
    # types_test.go:41-57: SPKI 0xFF -> qBAK5qoZQNC2Y7sxzUZhQuu9vVGHExuS2TgYmHgy64k=
    got = one(spark, spki_issuer_id(F.lit(b"\xff")))
    assert got == "qBAK5qoZQNC2Y7sxzUZhQuu9vVGHExuS2TgYmHgy64k="


def test_log_url_id_golden(spark):
    # types_test.go:185-188
    got = one(spark, log_url_id(F.lit("log.example.com/2525")))
    assert got == "bG9nLmV4YW1wbGUuY29tLzI1MjU="


def test_base64url_long_input_no_wrap(spark):
    import base64

    payload = bytes(range(256)) * 10
    got = one(spark, base64url(F.lit(payload)))
    assert got == base64.urlsafe_b64encode(payload).decode()


def test_serial_bigint(spark):
    # types_test.go:251-255 big-int view; 17-byte serials must not be
    # silently wrong, and >8-byte serials must not hit conv()'s uint64
    # ANSI overflow throw.
    assert one(spark, serial_bigint(F.lit(b"\x01\x00"))) == 256
    assert one(spark, serial_bigint(F.lit(bytes([0xDE, 0xAD, 0xBE, 0xEF])))) == 0xDEADBEEF
    assert one(spark, serial_bigint(F.lit(b""))) == 0
    # 9 bytes: past uint64, must be exact
    nine = bytes.fromhex("0102030405060708090A")[:9]
    assert one(spark, serial_bigint(F.lit(nine))) == int.from_bytes(nine, "big")
    # 15 bytes: the widest exact width
    fifteen = bytes(range(1, 16))
    assert one(spark, serial_bigint(F.lit(fifteen))) == int.from_bytes(fifteen, "big")
    # 17 bytes (types_test.go:130-150): NULL, never a wrong number
    seventeen = bytes.fromhex("0102030405060708090A0B0C0D0E0F1011")
    assert one(spark, serial_bigint(F.lit(seventeen))) is None


def test_unique_cert_id_roundtrip(spark):
    # types_test.go:254-269: "2019-04-28-22::an issuer::AESq_w=="
    key = one(
        spark,
        unique_cert_id(
            F.lit("2019-04-28-22"), F.lit("an issuer"), F.lit(b"\x01\x04\xaa\xff")
        ),
    )
    assert key == "2019-04-28-22::an issuer::AQSq_w=="
    parsed = one(spark, parse_unique_cert_id(F.lit(key)))
    assert parsed["exp_date"] == "2019-04-28-22"
    assert parsed["issuer_id"] == "an issuer"
    assert bytes(parsed["serial"]) == b"\x01\x04\xaa\xff"


def test_spki_fallback(spark):
    # filesystemdatabase.go:146-156: SKID <8 bytes -> sha1(spki)
    import hashlib

    spki = b"some-spki-bytes"
    rows = (
        spark.createDataFrame(
            [Row(skid=b"\x01\x02\x03", spki=spki), Row(skid=b"\x01" * 20, spki=spki),
             Row(skid=None, spki=spki)],
        )
        .select(spki_or_fallback("skid", "spki").alias("ak"))
        .collect()
    )
    assert bytes(rows[0]["ak"]) == hashlib.sha1(spki).digest()
    assert bytes(rows[1]["ak"]) == b"\x01" * 20
    assert bytes(rows[2]["ak"]) == hashlib.sha1(spki).digest()


def test_pem_encode(spark):
    got = one(spark, pem_encode(F.lit(b"\x01\x02\x03" * 40)))
    assert got.startswith("-----BEGIN CERTIFICATE-----\n")
    assert got.endswith("\n-----END CERTIFICATE-----\n")
    body = got.split("-----")[2].strip()
    import base64

    assert max(len(line) for line in body.split("\n")) <= 64
    assert base64.b64decode(body) == b"\x01\x02\x03" * 40
