"""pipelines_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL framework (prefeitura-rio/pipelines,
a Prefect/pandas/BigQuery capture->pretreat->load->materialize system)
as an idiomatic Apache Spark engine:

- ``sources``   : readers (parquet/csv/json/fixed-width/jdbc scaffolding)
                  with schema normalization (SURVEY §2.1)
- ``sinks``     : Hive-partitioned writer with dynamic partition
                  overwrite, capture-log sink (SURVEY §2.2)
- ``operators`` : filters, dedup, joins (incl. anti/range/kNN),
                  time-spine gap detection, pivot (SURVEY §2.4-2.9)
- ``functions`` : scalar column expressions — timestamp parsing,
                  tz handling, cleaning, safe casts, JSON nesting,
                  geo distance (SURVEY §2.10)
- ``state``     : watermark table, id-resume, backfill windows
                  (SURVEY §2.9 T2/T3/T7/T8)
- ``plans``     : SQL model runner (dbt-equivalent, SURVEY U4),
                  data-check harness (U5), scan cost guard
- ``streaming`` : Structured Streaming capture with watermark dedup
                  and dual raw/staging sinks (SURVEY §3.2)
- ``llm``       : large-scale training-data ops — dedup (exact,
                  MinHash-LSH, SimHash, n-gram Jaccard), embedding
                  similarity search, text analysis, multimodal columns

Everything is DataFrame/Spark-SQL first: logical plans are declared
declaratively and Catalyst/Tungsten pick the physical strategy. Python
UDFs appear only where built-ins cannot express the semantics, and
then always Arrow-batched (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"

from pipelines_spark.session import get_spark  # noqa: F401
from pipelines_spark.naming import normalize_column_name, normalize_columns  # noqa: F401
