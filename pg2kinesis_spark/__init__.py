"""pg2kinesis_spark — a PySpark-native analytics & CDC engine.

A from-scratch rebuild of the capabilities of the reference system
(surbas/pg2kinesis, a Postgres logical-decoding → Kinesis CDC pump) as an
idiomatic Apache Spark engine:

- batch DataFrame operators for every transformation the reference
  performs (parse, filter, enrich, format — SURVEY.md §2),
- a Structured Streaming pipeline with an LSN-offset replay source and an
  ordered, packing, retrying sink (SURVEY.md §2.9),
- the declared relational query surface (SURVEY.md §2.13, Q1–Q23) checked
  against a DuckDB oracle,
- large-scale training-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal columns) designed for 100 TB scale.

Everything is public-PySpark only: DataFrame/SQL + Catalyst, Pandas UDFs
where column expressions can't express the semantics, Structured
Streaming for streams. No Catalyst modifications.
"""

__version__ = "0.1.0"

from pg2kinesis_spark.session import get_spark  # noqa: F401
