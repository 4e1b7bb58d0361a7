"""realtime_datawarehouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference project
``baiyao-jrd/realTime-dataWarehouse`` (a Flink 1.13 layered streaming
warehouse; see SURVEY.md) as idiomatic, composable PySpark:

- declarative DataFrame/SQL logical plans (Catalyst optimizes; no custom rules
  needed — SURVEY.md §4),
- batch (window-function) + streaming (Structured Streaming) formulations of
  every stateful operator family ST1–ST8 (SURVEY.md §2.7),
- broadcast dim enrichment in place of the reference's async Phoenix/Redis
  machinery (SURVEY.md §2.5 J7),
- plus the large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) the reference lacks.

Package layout::

    session.py    SparkSession factory with scale-aware defaults
    tables.py     canonical readers for the test/bench star schema
    functions/    scalar layer: hashing, text, vectors, time
    sources/      input-surface parsers (tracking-log JSON, Maxwell/Debezium CDC)
    operators/    operator families from SURVEY.md §2 (+ LLM-data ops)
    plans/        the query registry (Spark callable + DuckDB oracle per op)
    streaming/    Structured Streaming formulations
"""

__version__ = "0.1.0"
