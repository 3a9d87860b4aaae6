from ct_mapreduce_spark.sources.tables import load_table, register_views  # noqa: F401
from ct_mapreduce_spark.sources.certificates import synthetic_certificates  # noqa: F401
