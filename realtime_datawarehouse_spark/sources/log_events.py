"""Tracking-log (topic_log) surface: schema, tolerant parse, 5-way split.

Reference semantics re-expressed Spark-first:

- Schema: the nested event shape consumed by
  rt/app/dwd/log/DwdTrafficBaseLogSplit.java:159-216 (FIXTURES.md §1):
  common{mid,uid,vc,ch,ar,is_new}, page{page_id,last_page_id,item,item_type,
  during_time}, err, start, displays[], actions[], ts.
- P1/P2 parse + dirty routing (DwdTrafficBaseLogSplit.java:76-100): a failed
  parse must route to the dirty output, never crash the job. Spark:
  ``from_json`` yields null on failure → split into clean/dirty DataFrames
  (two filtered projections of one parse — one scan with Catalyst subquery
  reuse, not two jobs).
- R1/R2 5-way demultiplex (DwdTrafficBaseLogSplit.java:148-237): one event
  fans out to err / start / page / display / action. Spark: filtered
  projections + ``explode`` for the array children; each output is a
  DataFrame the caller sinks independently (≡ side-output topics K6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DISPLAY_SCHEMA = StructType(
    [
        StructField("display_type", StringType()),
        StructField("item", StringType()),
        StructField("item_type", StringType()),
        StructField("pos_id", StringType()),
        StructField("order", StringType()),
    ]
)

ACTION_SCHEMA = StructType(
    [
        StructField("action_id", StringType()),
        StructField("item", StringType()),
        StructField("item_type", StringType()),
        StructField("ts", LongType()),
    ]
)

LOG_EVENT_SCHEMA = StructType(
    [
        StructField(
            "common",
            StructType(
                [
                    StructField("mid", StringType()),
                    StructField("uid", StringType()),
                    StructField("vc", StringType()),
                    StructField("ch", StringType()),
                    StructField("ar", StringType()),
                    StructField("is_new", StringType()),
                ]
            ),
        ),
        StructField(
            "page",
            StructType(
                [
                    StructField("page_id", StringType()),
                    StructField("last_page_id", StringType()),
                    StructField("item", StringType()),
                    StructField("item_type", StringType()),
                    StructField("during_time", LongType()),
                ]
            ),
        ),
        StructField("err", StructType([StructField("error_code", StringType())])),
        StructField("start", StructType([StructField("entry", StringType())])),
        StructField("displays", ArrayType(DISPLAY_SCHEMA)),
        StructField("actions", ArrayType(ACTION_SCHEMA)),
        StructField("ts", LongType()),
    ]
)


def parse_with_dirty_routing(
    raw: DataFrame, json_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """(clean, dirty): tolerant JSON parse; failures keep the raw line.

    ``from_json`` in PERMISSIVE/null mode never throws; a null struct (or a
    null ``ts``, the one field every valid event has) marks the row dirty —
    the Spark analog of the try/catch side-output at
    DwdTrafficBaseLogSplit.java:79-100.
    """
    parsed = raw.withColumn(
        "event", F.from_json(F.col(json_col), LOG_EVENT_SCHEMA)
    )
    is_clean = F.col("event").isNotNull() & F.col("event.ts").isNotNull()
    clean = parsed.where(is_clean).select("event.*")
    dirty = parsed.where(~is_clean).select(F.col(json_col).alias("dirty_value"))
    return clean, dirty


def _has(col: str) -> Column:
    return F.col(col).isNotNull()


def split_log(clean: DataFrame) -> dict[str, DataFrame]:
    """R1 5-way demultiplex of parsed events.

    One parsed event can emit to several outputs (err + start, or err +
    page + N displays + M actions) — exactly the side-output routing at
    DwdTrafficBaseLogSplit.java:160-220: ``err`` is emitted for every event
    carrying an err field (start events included — the reference removes err
    and keeps routing), ``start`` for every event carrying start, and the
    page/display/action family is the reference's else-branch: every
    NON-start event, gated on nothing else.
    """
    err = clean.where(_has("err")).select("common", "err", "ts")
    start = clean.where(_has("start")).select("common", "start", "ts")
    main = clean.where(~_has("start"))
    page = main.select("common", "page", "ts")
    display = (
        main.where(_has("displays"))
        .select("common", "page", "ts", F.explode("displays").alias("display"))
    )
    action = (
        main.where(_has("actions"))
        .select("common", "page", "ts", F.explode("actions").alias("action"))
    )
    return {
        "err": err,
        "start": start,
        "page": page,
        "display": display,
        "action": action,
    }
