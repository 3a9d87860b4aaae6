"""Issuer-metadata accumulation (reference: storage/issuermetadata.go).

The reference keeps per-issuer Redis sets of distinct CRL distribution
points (`crl::<issuer>`) and distinct issuer DNs (`issuer::<issuer>`),
accumulated record-at-a-time with local-map short-circuits
(issuermetadata.go:92-138). Declaratively that is one grouped aggregation
with `collect_set`; "must tolerate duplicate information"
(issuermetadata.go:89) is inherent.

Scale: collect_set per issuer is fine — CRL/DN cardinality per issuer is
tiny (a handful) even when the issuer has billions of certs; the aggregate
is map-side combined so the hot issuer's set never materializes more than
once per task. The exp-date set per issuer is bounded by (years x 8760).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ct_mapreduce_spark.functions.urls import normalize_crl_dps


def issuer_metadata(certs: DataFrame) -> DataFrame:
    """Per-issuer distinct CRLs, DNs and exp dates.

    Input: certificates frame with `issuer_id`, `issuer_dn`, `crl_dps`
    (raw), `exp_date`. CRL normalization (P6: trim, http(s)-only) happens
    element-wise *before* aggregation so rejected URLs never shuffle.
    """
    return (
        certs.select(
            "issuer_id",
            "issuer_dn",
            "exp_date",
            F.explode_outer(normalize_crl_dps("crl_dps")).alias("crl_dp"),
        )
        .groupBy("issuer_id")
        .agg(
            F.array_sort(F.array_compact(F.collect_set("crl_dp"))).alias("crl_set"),
            F.array_sort(F.collect_set("issuer_dn")).alias("dn_set"),
            F.array_sort(F.collect_set("exp_date")).alias("exp_date_set"),
        )
    )


def issuer_and_dates(certs: DataFrame) -> DataFrame:
    """GetIssuerAndDatesFromCache analog (storage/filesystemdatabase.go:
    59-100): the reference SCANs `serials::*` keys and groups the parsed
    (expDate, issuer) pairs by issuer. Relationally: distinct group keys,
    grouped."""
    return (
        certs.select("issuer_id", "exp_date")
        .distinct()
        .groupBy("issuer_id")
        .agg(F.array_sort(F.collect_set("exp_date")).alias("exp_dates"))
    )
