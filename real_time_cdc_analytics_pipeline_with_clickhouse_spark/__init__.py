"""PySpark-native analytics engine with the query and data-processing
capabilities of ``Abdulelah-Aldhafer1/Real-Time-CDC-Analytics-Pipeline-with-ClickHouse``.

The reference composes Debezium + Flink DataStream + ClickHouse + Redis
(see SURVEY.md).  This package re-expresses the same semantics
Spark-first:

- ``sources``   — CDC-envelope feeds (Debezium shape) + table loaders.
- ``operators`` — CDC normalization, enrichment join + scoring,
  warehouse rollups/dedup, relational breadth, and the LLM-data-pipeline
  extensions (dedup, similarity search, text analysis, multimodal).
- ``functions`` — reusable column expressions (scoring, portable
  hashing, text/vector helpers).  All JVM-side; no row-at-a-time UDFs.
- ``streaming`` — Structured Streaming wiring: watermarked rollups,
  stream-static enrichment, foreachBatch MERGE-style upsert, outbox.
- ``plans``     — plan-inspection helpers (pushdown/broadcast asserts).
"""

__version__ = "0.1.0"
