"""music_streaming_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference repo ``KPrince-coder/music-streaming-etl``
(an Airflow + pandas batch ETL; see SURVEY.md). Everything here is
expressed on the Spark DataFrame/SQL API so Catalyst/Tungsten plan the
physical execution: broadcast vs sort-merge joins, partial+final
aggregation, whole-stage codegen, AQE skew handling.

Layout
------
- ``session``    : SparkSession builder (AQE, UTC, Arrow).
- ``schemas``    : explicit StructTypes for every table (never infer).
- ``sources``    : scan/sink operators (CSV multi-path, Parquet, JDBC).
- ``operators``  : joins, deterministic aggregates, validation,
                   dedup, similarity, text analysis.
- ``functions``  : scalar helpers (list-literal stringification, …).
- ``plans``      : composed pipelines (genre_kpis / hourly_kpis) in
                   both the music domain and the testdata mapping.
- ``streaming``  : Structured Streaming variants of the KPI pipeline.
"""

__version__ = "0.1.0"
