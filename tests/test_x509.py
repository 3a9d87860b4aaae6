"""parse_cert UDF tests with dynamically generated ECDSA certs — the same
strategy as the reference's issuermetadata_test.go:62-98 makeCert."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ct_mapreduce_spark.functions.x509 import (
    HAVE_CRYPTOGRAPHY,
    parse_cert,
    serial_int_to_asn1_bytes,
)

pytestmark = pytest.mark.skipif(
    not HAVE_CRYPTOGRAPHY, reason="cryptography not installed"
)


def make_cert(
    serial: int,
    cn: str = "test.example.com",
    issuer_cn: str = "My First Issuer (tm)",
    ca: bool = False,
    crl_dps: list[str] | None = None,
) -> bytes:
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.x509.oid import NameOID

    key = ec.generate_private_key(ec.SECP256R1())
    subject = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])
    issuer = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, issuer_cn)])
    b = (
        x509.CertificateBuilder()
        .subject_name(subject)
        .issuer_name(issuer)
        .public_key(key.public_key())
        .serial_number(serial)
        .not_valid_before(dt.datetime(2024, 1, 1))
        .not_valid_after(dt.datetime(2025, 6, 15, 13, 30))
        .add_extension(x509.BasicConstraints(ca=ca, path_length=None), critical=True)
        .add_extension(
            x509.SubjectKeyIdentifier.from_public_key(key.public_key()), critical=False
        )
    )
    if crl_dps:
        b = b.add_extension(
            x509.CRLDistributionPoints(
                [
                    x509.DistributionPoint(
                        full_name=[x509.UniformResourceIdentifier(u)],
                        relative_name=None,
                        reasons=None,
                        crl_issuer=None,
                    )
                    for u in crl_dps
                ]
            ),
            critical=False,
        )
    from cryptography.hazmat.primitives.serialization import Encoding

    return b.sign(key, hashes.SHA256()).public_bytes(Encoding.DER)


def test_serial_asn1_bytes_goldens():
    # types_test.go:81-101: 0xAA encodes with leading zero -> 00aa
    assert serial_int_to_asn1_bytes(0xAA) == b"\x00\xaa"
    assert serial_int_to_asn1_bytes(0xDEADBEEF).hex() == "00deadbeef"
    assert serial_int_to_asn1_bytes(0x7F) == b"\x7f"
    assert serial_int_to_asn1_bytes(0) == b"\x00"
    big = int.from_bytes(b"\x01" + b"\xff" * 16, "big")  # 17-byte serial
    assert len(serial_int_to_asn1_bytes(big)) == 17


def test_parse_cert_roundtrip(spark):
    ders = [
        make_cert(0xAA, cn="leadingZeros.example.com"),
        make_cert(0x0102030405, ca=True),
        make_cert(
            7,
            crl_dps=["http://crl.example.com/r.crl", "ldap://dir.example/cn=x"],
        ),
    ]
    rows = [Row(entry_id=i, raw_der=d) for i, d in enumerate(ders)]
    df = spark.createDataFrame(rows).withColumn("cert", parse_cert("raw_der"))
    out = {r.entry_id: r.cert for r in df.collect()}

    assert bytes(out[0]["serial"]) == b"\x00\xaa"
    assert out[0]["subject_cn"] == "leadingZeros.example.com"
    assert out[0]["is_ca"] is False and out[0]["basic_constraints_valid"] is True
    assert out[0]["not_after"] == dt.datetime(2025, 6, 15, 13, 30)
    assert len(bytes(out[0]["skid"])) == 20

    assert out[1]["is_ca"] is True
    assert bytes(out[1]["serial"]) == b"\x01\x02\x03\x04\x05"

    # CRL DPs carried through raw; P6 filtering happens downstream
    assert out[2]["crl_dps"] == [
        "http://crl.example.com/r.crl",
        "ldap://dir.example/cn=x",
    ]
    assert "My First Issuer" in out[2]["issuer_dn"]


def test_parse_cert_garbage_tolerant(spark):
    rows = [
        Row(entry_id=0, raw_der=b"not a cert"),
        Row(entry_id=1, raw_der=make_cert(99)),
        Row(entry_id=2, raw_der=None),
    ]
    df = spark.createDataFrame(rows).withColumn("cert", parse_cert("raw_der"))
    out = {r.entry_id: r.cert for r in df.collect()}
    assert out[0]["serial"] is None  # tolerated, not fatal (ct-fetch.go:453-459)
    assert bytes(out[1]["serial"]) == b"\x63"
    assert out[2]["serial"] is None
    # downstream filter: parsed rows only
    assert df.where(F.col("cert.serial").isNotNull()).count() == 1
