"""aprs2influxdb_spark — a PySpark-native analytics engine with the data
model and operator surface of FaradayRF/aprs2influxdb (reference at
/root/reference, cited `file:line` throughout), re-expressed Spark-first:

- canonical wide ``packets`` DataFrame (fixed StructType, SURVEY.md §1.1)
- pure-column-expression scalar library (no Python UDFs on hot paths)
- per-format projections + InfluxDB line-protocol serializer
- batch as-of calibration join (window last IGNORE NULLS) and its
  streaming stateful twin
- analytics layer (agg/window/setop/topk) the reference delegated to
  InfluxDB/Grafana
- LLM-pipeline north-star operators: dedup (exact/MinHash/SimHash/
  n-gram Jaccard), similarity search, text analysis, multimodal columns
"""

from aprs2influxdb_spark import compat as _compat  # noqa: F401  (env export must precede JVM start)
from aprs2influxdb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
