"""Column-expression library (pure functions Column -> Column).

Everything here stays JVM-side (whole-stage codegen); no Python UDFs.
"""

from ct_mapreduce_spark.functions.codecs import (  # noqa: F401
    base64url,
    pem_encode,
    serial_bigint,
    serial_hex,
    serial_id,
    spki_issuer_id,
    spki_or_fallback,
    unique_cert_id,
)
from ct_mapreduce_spark.functions.dates import (  # noqa: F401
    exp_date_day,
    exp_date_hour,
    is_expired_at,
)
from ct_mapreduce_spark.functions.urls import normalize_crl_dps  # noqa: F401
