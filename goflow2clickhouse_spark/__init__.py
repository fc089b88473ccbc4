"""goflow2clickhouse_spark — a PySpark-native analytics engine with the
capabilities of the reference `meirdev/goflow2clickhouse` streaming flow
relay (see /root/reference/main.go), re-expressed Spark-first.

Layout:
  session    — SparkSession factory tuned for the engine
  schema     — single source of truth for the `flows` schema (reference
               initdb/create_tables.sql:1-35 + main.go:45-77) and fixtures
  sources    — batch + streaming source specs (reference main.go:207-244)
  operators  — flow transform, dedup, similarity, text, multimodal, topk
  functions  — ip formatting (main.go:133,138,139), ClickHouse dialect shim
  plans      — the named analytical query inventory + DuckDB oracles
  streaming  — ingest pipeline (main.go:111-175), windows, metrics
  sinks      — parquet / JDBC(ClickHouse) sink adapters (main.go:156-173)
"""

__version__ = "0.1.0"
