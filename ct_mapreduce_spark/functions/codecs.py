"""Key derivations and binary codecs (reference: storage/types.go).

All of these are built-in Spark expressions — no UDFs — so they participate
in whole-stage codegen and constant folding. Serials stay BinaryType
end-to-end (SURVEY §7 watch-list: >16-byte serials overflow LongType, so
binary/hex is the canonical identity, never a numeric cast).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def base64url(c: Column | str) -> Column:
    """URL-safe base64 with padding, matching Go's base64.URLEncoding
    (storage/types.go:210-212 Serial.ID, :36-42 CertificateLog.ID,
    :147-149 SPKI digest rendering).

    Spark's ``base64`` emits the standard alphabet; translate to URL-safe.
    Spark 4 wraps base64 output at 76 chars (RFC 2045) for long inputs, so
    strip any embedded newlines too.
    """
    return F.translate(F.regexp_replace(F.base64(_col(c)), "[\r\n]", ""), "+/", "-_")


def serial_hex(c: Column | str) -> Column:
    """Lowercase-hex rendering of a serial (storage/types.go:222-224
    Serial.HexString via %x). Leading zero bytes are preserved because the
    source is the raw ASN.1 value bytes (types.go:165-178)."""
    return F.lower(F.hex(_col(c)))


def serial_id(c: Column | str) -> Column:
    """URL-safe-base64 serial ID (storage/types.go:210-212)."""
    return base64url(c)


def serial_bigint(c: Column | str) -> Column:
    """Big-integer rendering of a serial (storage/types.go:251-255
    Serial.Cmp/big.Int). Returned as DECIMAL(38,0) — callers must not use
    this as an identity key (17-byte serials exist: types_test.go:130-150);
    it is a display/interop projection only.

    Serials wider than 15 bytes come back NULL rather than wrong (15 bytes
    = 2^120 always fits DECIMAL(38,0) ~ 2^126; beyond that Spark decimals
    can't represent the value exactly). A plain ``conv(hex, 16, 10)`` is
    NOT usable here: it computes in unsigned 64-bit, so any serial over 8
    bytes throws under ANSI mode (Spark 4 default). Instead the hex string
    is split into 7-byte chunks and folded with exact decimal arithmetic:
    v = (c0 * 2^56 + c1) * 2^56 + c2 — every conv input is < 2^56 and every
    intermediate < 2^120, so no overflow path exists."""
    col = _col(c)
    p56 = F.lit(1 << 56).cast("decimal(38,0)")
    chunks = F.regexp_extract_all(
        F.lpad(F.hex(col), 42, "0"), F.lit("(.{14})"), 1
    )
    val = F.aggregate(
        chunks,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, ch: acc * p56 + F.conv(ch, 16, 10).cast("decimal(38,0)"),
    )
    return F.when(F.length(col) <= 15, val).otherwise(
        F.lit(None).cast("decimal(38,0)")
    )


def spki_issuer_id(spki: Column | str) -> Column:
    """Issuer ID = URL-safe base64 of SHA-256 of the SPKI bytes
    (storage/types.go:124-130, :155-159)."""
    return base64url(F.unhex(F.sha2(_col(spki), 256)))


def spki_or_fallback(skid: Column | str, spki_raw: Column | str) -> Column:
    """Authority-key bytes with the reference's fallback: when the
    SubjectKeyId is shorter than 8 bytes, use SHA-1(RawSubjectPublicKeyInfo)
    (storage/filesystemdatabase.go:146-156)."""
    skid_c, spki_c = _col(skid), _col(spki_raw)
    return F.when(
        F.coalesce(F.length(skid_c), F.lit(0)) < 8, F.unhex(F.sha1(spki_c))
    ).otherwise(skid_c)


def log_url_id(url: Column | str) -> Column:
    """Log-state key: base64(short URL) (storage/types.go:36-42)."""
    return base64url(F.encode(_col(url), "UTF-8"))


def unique_cert_id(
    exp_date: Column | str, issuer_id: Column | str, serial: Column | str
) -> Column:
    """The composite key string ``<expDate>::<issuerID>::<serialID>``
    (storage/types.go:273-306 UniqueCertIdentifier)."""
    return F.concat_ws("::", _col(exp_date), _col(issuer_id), serial_id(serial))


def parse_unique_cert_id(key: Column | str) -> Column:
    """Inverse of :func:`unique_cert_id`: struct(exp_date, issuer_id,
    serial) from the ``::``-separated key (storage/types.go:279-302)."""
    parts = F.split(_col(key), "::")
    return F.struct(
        parts.getItem(0).alias("exp_date"),
        parts.getItem(1).alias("issuer_id"),
        F.unbase64(F.translate(parts.getItem(2), "-_", "+/")).alias("serial"),
    )


def pem_encode(der: Column | str, block_type: str = "CERTIFICATE") -> Column:
    """Wrap raw DER bytes in a PEM block (storage/filesystemdatabase.go:
    167-175; headers intentionally absent per :168-170). Body wrapped at
    64 chars like encoding/pem."""
    b64 = F.regexp_replace(F.base64(_col(der)), "[\r\n]", "")
    wrapped = F.array_join(
        F.regexp_extract_all(b64, F.lit("(.{1,64})"), 1), "\n"
    )
    return F.concat(
        F.lit(f"-----BEGIN {block_type}-----\n"),
        wrapped,
        F.lit(f"\n-----END {block_type}-----\n"),
    )
