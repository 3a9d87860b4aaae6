"""x509 parsing UDF surface (SURVEY §2.9) — the reference's only logic not
expressible in SQL: x509.ParseCertificate (ct-fetch.go:202,221), raw-serial
extraction (types.go:165-178), leaf decode tolerance (ct-fetch.go:452-459).

Arrow-vectorized scalar pandas_udf: one Python hop per *batch*, not per
row. Parse failures yield a NULL struct (the reference logs and skips
non-fatal parse errors; we keep the row with nulls so callers can count
failures — same tolerance contract).

Serial semantics: the reference stores the raw ASN.1 INTEGER value bytes,
preserving the DER-mandated leading zero for high-bit serials
(types_test.go:81-101 asserts "00aa"). DER integer encoding is canonical,
so re-encoding the parsed int reproduces those bytes exactly.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ct_mapreduce_spark.schemas import PARSED_CERT

try:  # gate: keeps the module importable on clusters without cryptography
    from cryptography import x509 as _x509
    from cryptography.hazmat.primitives.serialization import (
        Encoding,
        PublicFormat,
    )

    HAVE_CRYPTOGRAPHY = True
except Exception:  # pragma: no cover
    HAVE_CRYPTOGRAPHY = False


def serial_int_to_asn1_bytes(n: int) -> bytes:
    """int -> DER INTEGER value bytes (leading 0x00 when high bit set),
    matching Go's RawTBSCertificate extraction (types.go:165-178)."""
    if n == 0:
        return b"\x00"
    if n < 0:  # negative serials are invalid but occur in the wild
        length = (n.bit_length() + 8) // 8
        return n.to_bytes(length, "big", signed=True)
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return b


def _parse_one(der: Optional[bytes]) -> Optional[dict]:
    if der is None:
        return None
    try:
        cert = _x509.load_der_x509_certificate(bytes(der))
    except Exception:
        return None
    try:
        skid = cert.extensions.get_extension_for_class(
            _x509.SubjectKeyIdentifier
        ).value.digest
    except _x509.ExtensionNotFound:
        skid = None
    try:
        crl_ext = cert.extensions.get_extension_for_class(
            _x509.CRLDistributionPoints
        ).value
        crl_dps = [
            name.value
            for dp in crl_ext
            if dp.full_name
            for name in dp.full_name
            if isinstance(name, _x509.UniformResourceIdentifier)
        ]
    except _x509.ExtensionNotFound:
        crl_dps = []
    is_ca = False
    bc_valid = False
    try:
        bc = cert.extensions.get_extension_for_class(_x509.BasicConstraints)
        is_ca = bool(bc.value.ca)
        bc_valid = True
    except _x509.ExtensionNotFound:
        pass
    subject_cn = None
    cns = cert.subject.get_attributes_for_oid(_x509.NameOID.COMMON_NAME)
    if cns:
        subject_cn = cns[0].value
    return {
        "serial": serial_int_to_asn1_bytes(cert.serial_number),
        "issuer_dn": cert.issuer.rfc4514_string(),
        "subject_cn": subject_cn,
        "not_before": pd.Timestamp(cert.not_valid_before_utc).tz_localize(None),
        "not_after": pd.Timestamp(cert.not_valid_after_utc).tz_localize(None),
        "is_ca": is_ca,
        "basic_constraints_valid": bc_valid,
        "skid": skid,
        "spki_raw": cert.public_key().public_bytes(
            Encoding.DER, PublicFormat.SubjectPublicKeyInfo
        ),
        "crl_dps": crl_dps,
    }


def parse_cert(der_col: Column | str) -> Column:
    """Scalar pandas_udf: binary DER -> PARSED_CERT struct (NULL on parse
    failure). Usage: df.withColumn('cert', parse_cert('raw_der'))."""
    if not HAVE_CRYPTOGRAPHY:  # pragma: no cover
        raise ImportError(
            "cryptography not installed: parse_cert UDF unavailable; "
            "use the pre-flattened certificates schema instead"
        )

    @F.pandas_udf(PARSED_CERT)
    def _udf(ser: pd.Series) -> pd.DataFrame:
        parsed = [_parse_one(v) for v in ser]
        cols = [f.name for f in PARSED_CERT.fields]
        return pd.DataFrame(
            [p if p is not None else {c: None for c in cols} for p in parsed],
            columns=cols,
        )

    return _udf(F.col(der_col) if isinstance(der_col, str) else der_col)
