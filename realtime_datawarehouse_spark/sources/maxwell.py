"""Maxwell CDC envelope surface (topic_db, S3/P3/P4/P6).

Envelope (rt/util/MyKafkaUtil.java:72-82):
    {database, table, type, ts (epoch-seconds string),
     old:  MAP<string,string>   -- previous values of changed columns only
     data: MAP<string,string>}  -- full row after change
    type ∈ insert|update|delete|bootstrap-start|bootstrap-insert|bootstrap-complete

Operators:
- ``etl_filter`` — P3 (rt/app/dim/DimApp.java:127-144): drop bootstrap
  markers, require a non-empty data payload.
- ``project_data`` — P4 (DwdTradeCartAdd.java:31-44): ``data['col']``
  map-access projection.
- ``cart_add_delta`` — P5/P6 (DwdTradeCartAdd.java:31-44): keep inserts and
  quantity-increase updates; delta = if(insert, sku_num, new − old).
- ``status_change_filter`` — P6 (DwdTradeOrderCancelDetail.java:80-82, also
  DwdTradeRefundPaySuc.java:40-44,56-60,73-77): keep updates where a status
  column changed TO a target value, using the old-map as change detector.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType

MAXWELL_SCHEMA = StructType(
    [
        StructField("database", StringType()),
        StructField("table", StringType()),
        StructField("type", StringType()),
        StructField("ts", StringType()),
        StructField("old", MapType(StringType(), StringType())),
        StructField("data", MapType(StringType(), StringType())),
    ]
)

BOOTSTRAP_TYPES = ("bootstrap-start", "bootstrap-complete")


def parse_envelope(raw: DataFrame, json_col: str = "value") -> DataFrame:
    return raw.select(
        F.from_json(F.col(json_col), MAXWELL_SCHEMA).alias("m")
    ).select("m.*")


def etl_filter(env: DataFrame) -> DataFrame:
    """P3: drop bootstrap markers and rows without a data payload
    (rt/app/dim/DimApp.java:127-144 — also treats bootstrap-insert as
    insert-equivalent, which the dim layer keeps)."""
    return env.where(
        (~F.col("type").isin(*BOOTSTRAP_TYPES))
        & F.col("data").isNotNull()
        & (F.size("data") > 0)
    )


def data_col(name: str) -> Column:
    return F.col("data").getItem(name)


def old_col(name: str) -> Column:
    return F.col("old").getItem(name)


def project_data(env: DataFrame, cols: dict[str, str]) -> DataFrame:
    """P4: {output_name: data_key} map-access projection."""
    return env.select(
        *[data_col(k).alias(out) for out, k in cols.items()]
    )


def cart_add_delta(env: DataFrame, extra_cols: tuple = ()) -> DataFrame:
    """P5/P6 cart-add fact: inserts + quantity-increase updates with delta.

    Filter (DwdTradeCartAdd.java:42-44):
        type='insert' OR (type='update' AND old['sku_num'] IS NOT NULL
                          AND cast(data.sku_num) > cast(old.sku_num))
    Delta (…:38-40): if(insert, sku_num, new − old) — all values arrive as
    strings per the Maxwell contract (cast at use, SURVEY.md §1.3).
    """
    new_num = data_col("sku_num").cast("int")
    prev_num = old_col("sku_num").cast("int")
    keep = (F.col("type") == "insert") | (
        (F.col("type") == "update")
        & old_col("sku_num").isNotNull()
        & (new_num > prev_num)
    )
    delta = F.when(F.col("type") == "insert", new_num).otherwise(
        new_num - prev_num
    )
    return env.where(keep).select(
        data_col("id").alias("id"),
        data_col("user_id").alias("user_id"),
        data_col("sku_id").alias("sku_id"),
        delta.alias("sku_num_delta"),
        F.col("type").alias("change_type"),
        *[F.col(c) for c in extra_cols],
    )


def status_change_filter(
    env: DataFrame, status_key: str, target: str
) -> DataFrame:
    """P6 status-transition filter (DwdTradeOrderCancelDetail.java:80-82).

    Keeps rows where ``type='update' AND data[status_key]=target AND
    old[status_key] IS NOT NULL`` — the old-map presence check is what
    distinguishes a genuine status transition from an update that merely
    carries the status unchanged (Maxwell's old holds only CHANGED columns).
    Pushed into the scan as three conjunctive predicates; no shuffle.
    """
    return env.where(
        (F.col("type") == "update")
        & (data_col(status_key) == target)
        & old_col(status_key).isNotNull()
    )
