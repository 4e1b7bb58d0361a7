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


# --------------------------------------------------------------------------
# Q3 — shipping-priority: selective fact⋈fact⋈dim join + revenue top-k.
# The join-heavy bench head. Scale shape: customer filter prunes before the
# broadcast; orders⋈lineitem shuffles once on orderkey; the agg keyspace is
# bounded by qualifying orders. (shippriority → o_orderpriority on the
# fixture schema.)
# --------------------------------------------------------------------------

Q3_DATE = "1997-06-30 00:00:00"
Q3_SEGMENT = "BUILDING"

Q3_ORACLE = f"""
SELECT
  l.l_orderkey                                         AS order_id,
  {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
  strftime(o.o_orderdate, '%Y-%m-%d')                  AS order_dt,
  o.o_orderpriority                                    AS order_priority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l.l_shipdate  > TIMESTAMP '{Q3_DATE}'
GROUP BY 1, 3, 4
"""


@query("tpch_q3_shipping_priority", oracle=Q3_ORACLE)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("order_id"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_dt"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q5 — local-supplier volume: the 6-table snowflake join. Scale shape: the
# region→nation chain broadcasts; customer and supplier broadcast; only
# orders⋈lineitem shuffles, and the customer-nation = supplier-nation
# equality is a residual filter on the joined row.
# --------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_LO = "1996-01-01 00:00:00"
Q5_HI = "1997-01-01 00:00:00"

Q5_ORACLE = f"""
SELECT
  n.n_name                                             AS nation,
  {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q5_LO}'
  AND o.o_orderdate <  TIMESTAMP '{Q5_HI}'
GROUP BY 1
"""


@query("tpch_q5_local_supplier_volume", oracle=Q5_ORACLE)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").where(F.col("r_name") == Q5_REGION)
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q5_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_HI).cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# J10/J11 — semi-join and anti-join, completing the regular-join family
# (TestSqlJoin.java covers inner/left/right/full; EXISTS / NOT EXISTS are
# the remaining relational join shapes a reference user would write in
# Flink SQL). Spark: left_semi / left_anti joins — both deduplicate the
# probe side build-free and never widen rows, the shapes Catalyst picks
# for (NOT) EXISTS subqueries.
# --------------------------------------------------------------------------

Q4_CUTOFF_LO = "1994-07-01 00:00:00"
Q4_CUTOFF_HI = "1994-10-01 00:00:00"

Q4_ORACLE = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_CUTOFF_LO}'
  AND o.o_orderdate <  TIMESTAMP '{Q4_CUTOFF_HI}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


@query("tpch_q4_order_priority", oracle=Q4_ORACLE)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left_semi): date-pruned orders semi-joined to
    flagged lineitems (the fixture's reduced lineitem carries returnflag, not
    commit/receipt dates — the join SHAPE is the point). The semi-join
    shuffles only the join key from the right side and emits each order at
    most once — no post-join distinct needed."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q4_CUTOFF_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_CUTOFF_HI).cast("timestamp"))
    )
    late = table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


J11_ORACLE = """
SELECT c.c_custkey AS custkey, c.c_name AS c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
)
"""


@query("j11_anti_join_never_ordered", oracle=J11_ORACLE)
def j11_anti_join_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left_anti: customers with no orders. The anti-join keeps
    rows with NO match — the dirty-data / orphan-detection shape (a
    dimension row whose facts never arrived)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.custkey == o.o_custkey, "left_anti")


# --------------------------------------------------------------------------
# Q10-style top-N: revenue-ranked customers in a date window. The shape that
# matters is GLOBAL top-k over an aggregate — Spark plans orderBy+limit as
# TakeOrderedAndProject: each partition keeps its local top-k and only
# k×partitions rows reach the driver-side merge, never the full sort
# (plan-asserted). Ties broken by custkey so both engines rank identically.
# --------------------------------------------------------------------------

Q10_CUTOFF_LO = "1993-10-01 00:00:00"
Q10_CUTOFF_HI = "1994-01-01 00:00:00"
Q10_TOPN = 20

Q10_ORACLE = f"""
SELECT c.c_custkey AS custkey, c.c_name AS c_name,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '{Q10_CUTOFF_LO}'
  AND o.o_orderdate <  TIMESTAMP '{Q10_CUTOFF_HI}'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2
ORDER BY revenue DESC, custkey
LIMIT {Q10_TOPN}
"""


@query("tpch_q10_top_returners", oracle=Q10_ORACLE)
def tpch_q10_top_returners(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q10_CUTOFF_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_CUTOFF_HI).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.custkey)
        .groupBy("custkey", "c_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    return rev.orderBy(F.desc("revenue"), "custkey").limit(Q10_TOPN)


# --------------------------------------------------------------------------
# Q18-style: orders whose total quantity exceeds a threshold (IN-subquery
# over a HAVING-filtered aggregate → semi-join against aggregated keys).
# Completes the subquery-shape family next to Q4's EXISTS.
# --------------------------------------------------------------------------

Q18_MIN_QTY = 150

Q18_ORACLE = f"""
SELECT o.o_orderkey AS order_id,
       o.o_custkey  AS user_id,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_dt,
       {dsum_sql('l.l_quantity')} AS total_qty
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > {Q18_MIN_QTY}
)
GROUP BY 1, 2, 3
"""


@query("tpch_q18_large_orders", oracle=Q18_ORACLE)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery over a HAVING aggregate: the qualifying key set is an
    aggregation output, semi-joined back to the fact join. Scale shape:
    the key set aggregates map-side first; the semi-join carries only
    orderkeys; the big join reuses the same orderkey partitioning."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > Q18_MIN_QTY)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(big, o.o_orderkey == big.big_orderkey, "left_semi")
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("user_id"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_dt"),
        )
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
    )
