"""Deterministic DER certificate fixtures for the x509 parse gate.

Mirrors the reference's in-test cert factory (issuermetadata_test.go:62-98
makeCert: fixed names/validity, per-case serial/extensions) plus the serial
goldens of types_test.go:81-101 (leading-zero "00aa") and :130-150
(17-byte serial).

Determinism: the signing key is *derived* from a fixed scalar, not
generated, so SPKI bytes are identical across runs. ECDSA signatures are
randomized, so the raw DER differs per run — but every field the engine
parses out (serial, names, validity, flags, SKID, SPKI, CRL DPs) is
byte-stable, which is what the oracle goldens pin.
"""

from __future__ import annotations

import datetime as dt

from cryptography import x509
from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.asymmetric import ec
from cryptography.hazmat.primitives.serialization import Encoding
from cryptography.x509.oid import NameOID

# Fixed scalar -> fixed P-256 keypair -> fixed SPKI bytes.
_KEY = ec.derive_private_key(
    0x1234_5678_9ABC_DEF0_1234_5678_9ABC_DEF0, ec.SECP256R1()
)

_NOT_BEFORE = dt.datetime(2019, 4, 27, 22, 0, 0, tzinfo=dt.timezone.utc)
_NOT_AFTER = dt.datetime(2019, 4, 28, 22, 15, 32, tzinfo=dt.timezone.utc)


def _name(cn: str) -> x509.Name:
    return x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])


def _build(
    serial: int,
    subject_cn: str,
    ca: bool | None,
    skid: bytes | None,
    crl_uris: list[str] | None,
) -> bytes:
    b = (
        x509.CertificateBuilder()
        .serial_number(serial)
        .subject_name(_name(subject_cn))
        .issuer_name(_name("My First Issuer (tm)"))
        .not_valid_before(_NOT_BEFORE)
        .not_valid_after(_NOT_AFTER)
        .public_key(_KEY.public_key())
    )
    if ca is not None:
        b = b.add_extension(
            x509.BasicConstraints(ca=ca, path_length=None), critical=True
        )
    if skid is not None:
        b = b.add_extension(x509.SubjectKeyIdentifier(skid), critical=False)
    if crl_uris is not None:
        b = b.add_extension(
            x509.CRLDistributionPoints(
                [
                    x509.DistributionPoint(
                        full_name=[x509.UniformResourceIdentifier(u)],
                        relative_name=None,
                        reasons=None,
                        crl_issuer=None,
                    )
                    for u in crl_uris
                ]
            ),
            critical=False,
        )
    return b.sign(_KEY, hashes.SHA256()).public_bytes(Encoding.DER)


def make_fixture_certs() -> list[tuple[str, bytes | None]]:
    """(name, der) rows covering the parse surface. The final row is
    deliberately not DER — the parse-failure tolerance path
    (ct-fetch.go:452-459: log and skip, never abort the batch)."""
    return [
        # serial 0x00AA: DER re-encode must preserve the leading zero
        # (types_test.go:81-101 asserts hex "00aa")
        ("leading_zero_serial", _build(0xAA, "leadingZeros", None, None, None)),
        # plain end-entity with SKID + CRL DPs (http kept downstream,
        # ldap dropped by P6 — the parser itself reports both)
        (
            "end_entity",
            _build(
                0x0104AAFF,
                "www.example.com",
                False,
                bytes.fromhex("0102030405060708090A"),
                ["http://a/crl", "ldap://d/cn=x"],
            ),
        ),
        # CA cert (P1 filter input)
        (
            "ca_cert",
            _build(
                0x02,
                "My First Issuer (tm)",
                True,
                bytes.fromhex("AABBCCDDEEFF00112233"),
                ["https://b/int.crl"],
            ),
        ),
        # short SKID (<8 bytes): downstream P8 must sha1-fallback
        ("short_skid", _build(0x03, "short-skid", False, b"\x01\x02\x03", None)),
        # no BasicConstraints at all: basic_constraints_valid = false
        ("no_bc", _build(0x04, "no-bc", None, None, None)),
        # 17-byte serial (types_test.go:130-150): identity stays binary
        (
            "serial_17_bytes",
            _build(
                int.from_bytes(
                    bytes.fromhex("0102030405060708090A0B0C0D0E0F1011"), "big"
                ),
                "wide-serial",
                False,
                None,
                None,
            ),
        ),
        # garbage bytes: parse yields NULL struct, row survives
        ("not_a_cert", b"definitely not DER"),
    ]
