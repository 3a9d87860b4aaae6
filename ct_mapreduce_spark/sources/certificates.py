"""Deterministic synthetic `certificates` fixture (FIXTURES.md §1).

Stands in for the parsed CT-log-entry stream the reference ingests
(cmd/ct-fetch/ct-fetch.go:191-229). Seeded; generated driver-side with
numpy (row counts are test-scale) and handed to Spark with the fixed
schema. Required structure (FIXTURES.md):

- serials of 1-17 bytes incl. leading-zero and >16-byte values
- heavy-tailed issuer distribution (skew exercise)
- ~20% exact (exp-bucket, issuer, serial) duplicates with differing
  entry_id, spread across log_urls
- not_after clustered into shared hour buckets incl. +/-1ms boundary rows
- crl_dps with ldap/non-http/whitespace/duplicate variants
- ~5% CA certs, some chain_len == 0 rows, ~10% precerts
"""

from __future__ import annotations

import datetime as dt
import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ct_mapreduce_spark.schemas import CERTIFICATES

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

_CRL_POOL = [
    "http://crl.example.com/root.crl",
    "https://crl.example.org/int.crl",
    "  http://crl.example.com/root.crl  ",  # dedups after trim
    "ldap://directory.example.com/cn=crl",  # dropped silently
    "ldaps://directory.example.com/cn=crl",  # dropped silently
    "ftp://files.example.com/ca.crl",  # dropped (non-http)
    "http://crl2.example.net/x.crl",
]


def _issuer_id(i: int) -> str:
    # URL-safe-base64-looking stable ids, like storage/types.go:124-130
    import base64

    return base64.urlsafe_b64encode(hashlib.sha256(f"spki-{i}".encode()).digest()).decode()


def synthetic_certificates(
    spark: SparkSession,
    n: int = 2000,
    n_issuers: int = 12,
    seed: int = 42,
    hot_issuer_weight: float = 0.55,
) -> DataFrame:
    rng = np.random.default_rng(seed)

    # Heavy-tailed issuer mix: issuer 0 gets ~hot_issuer_weight of rows
    # (Let's Encrypt-style skew noted in SURVEY §4; raise toward 0.8 for
    # adversarial hot-partition benchmarks).
    rest = 1.0 - hot_issuer_weight
    weights = np.array(
        [hot_issuer_weight] + list(rest * np.ones(n_issuers - 1) / (n_issuers - 1))
    )
    issuer_idx = rng.choice(n_issuers, size=n, p=weights)

    # Serials: mostly 8-16 bytes; inject 1-byte, leading-zero, and 17-byte.
    serials: list[bytes] = []
    for i in range(n):
        k = int(rng.integers(8, 17))
        b = rng.integers(0, 256, size=k, dtype=np.uint8).tobytes()
        if i % 97 == 0:
            b = b"\x00\xaa"  # leading-zero golden (types_test.go:81-101)
        elif i % 89 == 0:
            b = bytes([int(rng.integers(1, 6))])  # 1-byte serial
        elif i % 83 == 0:
            b = b"\x01" + rng.integers(0, 256, size=16, dtype=np.uint8).tobytes()  # 17B
        serials.append(b)

    # not_after clustered into ~40 shared hour buckets + boundary rows.
    bucket = rng.integers(0, 40, size=n)
    offset_s = rng.integers(0, 3600, size=n)
    not_after = [
        _EPOCH + dt.timedelta(hours=int(6 * b), seconds=int(s))
        for b, s in zip(bucket, offset_s)
    ]
    not_after[0] = _EPOCH + dt.timedelta(hours=6) - dt.timedelta(milliseconds=1)
    not_after[1] = _EPOCH + dt.timedelta(hours=6)
    not_after[2] = _EPOCH + dt.timedelta(hours=6, milliseconds=1)

    n_logs = 3
    rows = []
    for i in range(n):
        ii = int(issuer_idx[i])
        k_crl = int(rng.integers(0, 4))
        crls = list(rng.choice(_CRL_POOL, size=k_crl, replace=False)) if k_crl else []
        spki = hashlib.sha256(f"spki-{ii}".encode()).digest()
        skid = spki[:20] if i % 7 else spki[:4]  # some short SKIDs (<8B fallback)
        if i % 113 == 0:
            skid = b""
        rows.append(
            {
                "log_url": f"ct.example/log{i % n_logs}",
                "entry_id": i,
                "entry_type": "precert" if rng.random() < 0.10 else "x509",
                "entry_ts": _EPOCH + dt.timedelta(seconds=i),
                "raw_der": hashlib.sha256(serials[i] + spki).digest() * 4,
                "serial": serials[i],
                "issuer_id": _issuer_id(ii),
                # 1-2 DN spellings per issuer (issuermetadata_test.go:100-136)
                "issuer_dn": f"CN=Issuer {ii}" + (", O=Alt" if i % 11 == 0 else ""),
                "issuer_cn": ("Let's Encrypt R" if ii == 0 else f"Issuer {ii} CA"),
                "issuer_spki": spki,
                "skid": skid,
                "subject_cn": f"host{i}.example.com",
                "not_before": not_after[i] - dt.timedelta(days=365),
                "not_after": not_after[i],
                "is_ca": bool(rng.random() < 0.05),
                "basic_constraints_valid": bool(rng.random() < 0.95),
                "crl_dps": crls,
                "chain_len": 0 if i % 101 == 0 else int(rng.integers(1, 4)),
            }
        )

    # ~20% duplicates: same (bucket, issuer, serial), new entry_id, possibly
    # different log_url — first-seen (min entry_id) must win.
    n_dup = n // 5
    dup_src = rng.integers(0, n, size=n_dup)
    for j, src in enumerate(dup_src):
        r = dict(rows[int(src)])
        r["entry_id"] = n + j
        r["log_url"] = f"ct.example/log{(j + 1) % n_logs}"
        r["entry_ts"] = _EPOCH + dt.timedelta(seconds=n + j)
        rows.append(r)

    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf, schema=CERTIFICATES)
