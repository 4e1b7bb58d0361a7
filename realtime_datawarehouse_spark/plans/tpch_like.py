"""Flagship + ADS/serving-style queries (SURVEY.md §2.6 A7, §2.12).

The reference's serving layer is two ClickHouse aggregations behind REST
(pub/controller/TradeStatController.java:28-79, pub/mapper/TradeStatMapper.java:16-21):
day-filtered GMV and per-province order amount. Here they are ordinary Spark
SQL over the star schema — grouped by day instead of parameter-filtered so a
single deterministic result covers every parameter value.

``tpch_q1_pricing_summary`` is the flagship/bench head: the canonical
multi-metric scan-heavy aggregation, the batch analog of the reference's DWS
multi-counter window reduce (rt/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:173-216).
Scale notes: single scan of the fact table, map-side partial aggregation into
a tiny key space (|flag×status| ≈ 4) — shuffle is O(cores), not O(rows);
survives 100 TB unchanged. Money sums use exact decimal accumulation
(functions/compare.py) so results are order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.functions.compare import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
)
from realtime_datawarehouse_spark.plans.registry import query
from realtime_datawarehouse_spark.tables import table

Q1_CUTOFF = "1998-09-02 00:00:00"

Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity')}                                        AS sum_qty,
  {dsum_sql('l_extendedprice')}                                   AS sum_base_price,
  {dsum_sql('l_extendedprice * (1 - l_discount)')}                AS sum_disc_price,
  {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}  AS sum_charge,
  {davg_sql('l_quantity')}                                        AS avg_qty,
  {davg_sql('l_extendedprice')}                                   AS avg_price,
  {davg_sql('l_discount', 4)}                                     AS avg_disc,
  count(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1_pricing_summary", oracle=Q1_ORACLE)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        davg(F.col("l_quantity")).alias("avg_qty"),
        davg(F.col("l_extendedprice")).alias("avg_price"),
        davg(F.col("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


GMV_ORACLE = f"""
SELECT
  strftime(o_orderdate, '%Y%m%d')   AS dt,
  {dsum_sql('o_totalprice')}        AS gmv,
  count(*)                          AS order_ct
FROM orders
GROUP BY 1
"""


@query("ads_gmv_daily", oracle=GMV_ORACLE)
def ads_gmv_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADS GMV endpoint generalized to all days.

    Reference: sum(order_amount) WHERE toYYYYMMDD(stt)=? —
    pub/mapper/TradeStatMapper.java:16-17.
    """
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_format("o_orderdate", "yyyyMMdd").alias("dt")
    ).agg(
        dsum(F.col("o_totalprice")).alias("gmv"),
        F.count("*").alias("order_ct"),
    )


PROVINCE_ORACLE = f"""
SELECT
  n.n_name                          AS province_name,
  {dsum_sql('o.o_totalprice')}      AS order_amount,
  count(*)                          AS order_ct
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""


@query("ads_province_order_amount", oracle=PROVINCE_ORACLE)
def ads_province_order_amount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADS per-province order amount (map widget).

    Reference: group by province_name over dws_trade_province_order_window —
    pub/mapper/TradeStatMapper.java:19-21. ``nation`` plays the province dim
    (FIXTURES.md §4). Scale: both dims broadcast — the only shuffle is the
    final small-key aggregation; the fact table never repartitions.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("province_name"))
        .agg(
            dsum(F.col("o_totalprice")).alias("order_amount"),
            F.count("*").alias("order_ct"),
        )
    )
