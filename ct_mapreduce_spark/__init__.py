"""ct_mapreduce_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jcjones/ct-mapreduce.

The reference (at /root/reference, Go) is a distributed ETL + aggregation
pipeline over Certificate Transparency logs. This package re-expresses that
surface Spark-first:

- the ingest pipeline (cmd/ct-fetch) -> DataFrame / Structured Streaming
  transformations (:mod:`ct_mapreduce_spark.plans.ingest`,
  :mod:`ct_mapreduce_spark.streaming.ingest_stream`)
- the Redis distinct-set state (storage/rediscache.go) -> declarative
  aggregations (:mod:`ct_mapreduce_spark.operators.dedup`,
  :mod:`ct_mapreduce_spark.operators.metadata`)
- the storage-statistics report (cmd/storage-statistics) -> a single
  ROLLUP query (:mod:`ct_mapreduce_spark.plans.statistics`)
- the key/codec helpers (storage/types.go) -> a column-expression library
  (:mod:`ct_mapreduce_spark.functions`)

Beyond reference parity the engine adds LLM-data-pipeline operators
(dedup families, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.
"""

__version__ = "0.1.0"

from ct_mapreduce_spark.session import get_spark  # noqa: F401
