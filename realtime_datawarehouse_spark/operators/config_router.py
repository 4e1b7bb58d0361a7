"""Config-driven dimension routing + upsert sinks (R4, K4, K5, P7).

The reference's DIM layer is config-as-data: a MySQL ``table_process`` table
says which CDC source tables are dimensions, which columns to keep, and the
sink PK; the config is broadcast and applied per record, creating Phoenix
tables on demand (rt/app/dim/DimApp.java:146-171,
rt/app/func/TableProcessFunction.java:42-155, DimSinkFunction.java:27-51).

Spark-first design:
- config snapshot (tiny) broadcast-joined against the CDC stream (R4);
- ``sink_columns`` pruning is a per-sink dynamic ``map_filter`` (P7);
- routing = one filtered projection per configured sink (K4) — in streaming
  mode each micro-batch MERGEs into its dim table keyed on ``sink_pk``; in
  batch/test mode ``route`` returns the per-sink DataFrames and ``upsert``
  materializes last-write-wins state the way a MERGE would (SURVEY.md §1.4:
  HBase/Phoenix dim store → keyed table; K5's dynamic DDL collapses to
  "writer creates the table if absent").

Scale: the CDC stream never shuffles for routing (broadcast join + filters);
the only wide op is the per-PK MERGE/last-write-wins collapse, hashed on the
dim PK — exactly as partitioned as the dim itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.sources.maxwell import etl_filter


def route(env: DataFrame, config: DataFrame) -> DataFrame:
    """Tag + prune CDC rows per broadcast config (R4 + P7).

    Returns envelope rows joined to their config row, with ``data`` pruned
    to the configured ``sink_columns`` CSV — the Spark form of
    TableProcessFunction.processElement (…:42-65).
    """
    cfg = F.broadcast(config.select("source_table", "sink_table", "sink_columns", "sink_pk"))
    tagged = etl_filter(env).join(
        cfg, F.col("table") == cfg["source_table"], "inner"
    )
    keep = F.split(F.col("sink_columns"), ",")
    pruned = F.map_filter(
        F.col("data"), lambda k, _v: F.array_contains(keep, k)
    )
    return tagged.select(
        "sink_table",
        F.coalesce(F.col("sink_pk"), F.lit("id")).alias("sink_pk"),
        F.col("type"),
        F.col("ts").cast("long").alias("ts"),
        pruned.alias("data"),
    )


def split_by_sink(routed: DataFrame, sink_tables: list[str]) -> dict[str, DataFrame]:
    """K4: one output DataFrame per configured sink table."""
    return {
        t: routed.where(F.col("sink_table") == t).drop("sink_table")
        for t in sink_tables
    }


def upsert_state(routed: DataFrame) -> DataFrame:
    """Collapse the routed changelog to final dim state per (sink_table, pk):
    newest change wins; a trailing delete removes the row — semantically the
    result of replaying per-row Phoenix upserts/deletes (DimSinkFunction).

    Batch form used for tests/oracles; the streaming form applies the same
    collapse per micro-batch via MERGE (streaming/jobs.py).
    """
    from pyspark.sql import Window

    pk = F.col("data")[F.col("sink_pk")]
    keyed = routed.withColumn("pk", pk)
    w = Window.partitionBy("sink_table", "pk").orderBy(F.col("ts").desc())
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("type") != "delete"))
        .select("sink_table", "pk", "data")
    )
