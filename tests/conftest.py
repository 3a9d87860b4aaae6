from __future__ import annotations

import pytest

from ct_mapreduce_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ct_mapreduce_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def certs(spark):
    from ct_mapreduce_spark.sources.certificates import synthetic_certificates

    df = synthetic_certificates(spark, n=2000, seed=42)
    df.cache().count()
    return df
