"""flink_big_query_connector_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``vinted/flink-big-query-connector`` (a Flink -> BigQuery Storage Write API
sink connector) on top of Apache Spark:

- Structured Streaming sinks with at-least-once, exactly-once (two-phase
  commit via idempotent ``foreachBatch``) and async delivery
  (reference: ``sink/defaultStream/``, ``sink/buffered/``, ``sink/async/``).
- Count/size/time batching operators (reference: ``process/BatchTrigger.java``,
  ``process/RowBatcher.java``).
- Keyed write-stream state with TTL (reference: ``process/StreamStateHandler.java``).
- BigQuery schema <-> Spark StructType tooling (reference:
  ``schema/SchemaTransformer.java``, ``schema/SchemaTools.java``).
- A full declarative relational query surface (scan/filter/join/agg/window/
  rollup/set-ops/subqueries) executed by Catalyst — see ``plans/``.
- LLM-data-pipeline operators: dedup (exact / minhash-LSH / simhash /
  n-gram Jaccard / embedding cosine), similarity search, text analysis,
  multimodal binary columns — see ``operators/``.

Everything is DataFrame-first: logical plans are declared with the
DataFrame/SQL API so Catalyst + Tungsten choose the physical strategy;
Python only runs in Arrow-batched Pandas UDFs where built-ins cannot
express the semantics.
"""

__version__ = "0.1.0"
