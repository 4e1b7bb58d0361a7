"""Trade-side operator queries: the join family J1–J7 and aggregation family
A5/A6, plus conditional/pruning projections (SURVEY.md §2.3/§2.5/§2.6).

Fixture binding (FIXTURES.md §4): ``orders`` plays ``order_info``,
``lineitem`` plays ``order_detail`` (orderkey=order_id, partkey=sku_id,
quantity=sku_num, extendedprice=order_price), ``part`` plays the sku dim,
``supplier``→``nation``→``region`` plays the snowflake dim chain, ``nation``
doubles as the base_dic lookup table.

Scale stance per query is noted inline; the recurring principles:
- dims are broadcast (replaces the reference's async Phoenix+Redis lookup
  machinery, rt/app/func/DimAsyncFunction.java:25-77 — SURVEY §2.5 J7);
- fact⋈fact joins shuffle on the join key once and reuse that partitioning;
- exact count-distinct shuffles (key, dedup-col) pairs — the Spark planner's
  two-phase expand handles it; approx_count_distinct is the documented
  escape hatch at extreme cardinality (not used: the oracle needs exact —
  SURVEY §2.6 A5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.functions.compare import (
    dsum,
    dsum_sql,
    pround,
    pround_sql,
)
from realtime_datawarehouse_spark.plans.registry import query
from realtime_datawarehouse_spark.tables import table

# --------------------------------------------------------------------------
# J1 — stream-stream inner equi-join (rt/app/dwd/db/DwdTradeOrderPreProcess.java:125-127).
# Batch form: plain shuffled inner join on the key; split_original_amount
# reproduces the decimal(16,2) money math at :43-44.
# --------------------------------------------------------------------------

J1_ORACLE = f"""
SELECT
  l.l_orderkey                       AS order_id,
  l.l_linenumber                     AS detail_id,
  l.l_partkey                        AS sku_id,
  o.o_custkey                        AS user_id,
  strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS create_time,
  {pround_sql('l.l_quantity * l.l_extendedprice')} AS split_original_amount
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


@query("j1_order_detail_inner_join", oracle=J1_ORACLE)
def j1_order_detail_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return l.join(o, l.l_orderkey == o.o_orderkey).select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("detail_id"),
        F.col("l_partkey").alias("sku_id"),
        F.col("o_custkey").alias("user_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("create_time"),
        pround(F.col("l_quantity") * F.col("l_extendedprice")).alias(
            "split_original_amount"
        ),
    )


# --------------------------------------------------------------------------
# J2 — LEFT OUTER join with downstream PK-collapse (DwdTradeOrderPreProcess.java:128-131).
# Flink emits +I/-D/+I retract churn; Spark computes the final state directly
# (SURVEY §7.4 #1): orders left-joined to per-order detail rollups, absent
# right side coalesced — identical to the post-MERGE table.
# --------------------------------------------------------------------------

J2_ORACLE = f"""
SELECT
  o.o_orderkey                        AS order_id,
  o.o_orderstatus                     AS order_status,
  coalesce(d.item_ct, 0)              AS item_ct,
  coalesce(d.detail_amount, 0.0)      AS detail_amount
FROM orders o
LEFT JOIN (
  SELECT l_orderkey, count(*) AS item_ct,
         {dsum_sql('l_quantity * l_extendedprice')} AS detail_amount
  FROM lineitem GROUP BY l_orderkey
) d ON o.o_orderkey = d.l_orderkey
"""


@query("j2_left_outer_join_collapsed", oracle=J2_ORACLE)
def j2_left_outer_join_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("item_ct"),
            dsum(F.col("l_quantity") * F.col("l_extendedprice")).alias(
                "detail_amount"
            ),
        )
    )
    return o.join(d, o.o_orderkey == d.l_orderkey, "left").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("order_status"),
        F.coalesce("item_ct", F.lit(0)).alias("item_ct"),
        F.coalesce("detail_amount", F.lit(0.0)).alias("detail_amount"),
    )


# --------------------------------------------------------------------------
# J3 — lookup/temporal join FOR SYSTEM_TIME AS OF (DwdTradeCartAdd.java:54-56;
# cache mechanics rt/util/MySqlUtil.java:10-30). Spark: broadcast join against
# the dim snapshot — per-micro-batch re-broadcast subsumes the 1 h JDBC cache.
# --------------------------------------------------------------------------

J3_ORACLE = """
SELECT
  l.l_orderkey     AS order_id,
  l.l_linenumber   AS detail_id,
  l.l_partkey      AS sku_id,
  p.p_brand        AS dic_name,
  p.p_type         AS sku_type
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
"""


@query("j3_lookup_join_dic", oracle=J3_ORACLE)
def j3_lookup_join_dic(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    return l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("detail_id"),
        F.col("l_partkey").alias("sku_id"),
        F.col("p_brand").alias("dic_name"),
        F.col("p_type").alias("sku_type"),
    )


# --------------------------------------------------------------------------
# J4 — double lookup join to the same dim under two aliases
# (DwdTradeOrderRefund.java:85-94: base_dic twice for refund_type /
# refund_reason_type). Here: nation twice, via customer and via supplier.
# --------------------------------------------------------------------------

J4_ORACLE = f"""
SELECT
  n1.n_name  AS cust_nation,
  n2.n_name  AS supp_nation,
  count(*)   AS pair_ct,
  {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS volume
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation n1   ON c.c_nationkey = n1.n_nationkey
JOIN nation n2   ON s.s_nationkey = n2.n_nationkey
GROUP BY 1, 2
"""


@query("j4_double_lookup_same_dim", oracle=J4_ORACLE)
def j4_double_lookup_same_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.alias("n1")
    n2 = n.alias("n2")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(
            F.col("n1.n_name").alias("cust_nation"),
            F.col("n2.n_name").alias("supp_nation"),
        )
        .agg(
            F.count("*").alias("pair_ct"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
        )
    )


# --------------------------------------------------------------------------
# J5 — 5-table mixed inner/left join in one query
# (DwdTradeOrderPreProcess.java:92-133: od ⋈ oi ⟕ act ⟕ cou ⋈ dic).
# Analog: lineitem ⋈ orders ⟕ part ⟕ supplier ⋈ broadcast(nation-as-dic).
# --------------------------------------------------------------------------

J5_ORACLE = """
SELECT
  l.l_orderkey                                  AS order_id,
  l.l_linenumber                                AS detail_id,
  o.o_custkey                                   AS user_id,
  p.p_brand                                     AS activity_id,
  s.s_name                                      AS coupon_id,
  n.n_name                                      AS source_type_name,
  CAST(CAST(l.l_quantity * l.l_extendedprice AS DECIMAL(16,2)) AS DOUBLE) AS split_original_amount
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
LEFT JOIN part p     ON l.l_partkey = p.p_partkey
LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
"""


@query("j5_five_table_mixed_join", oracle=J5_ORACLE)
def j5_five_table_mixed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey, "left")
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").alias("detail_id"),
            F.col("o_custkey").alias("user_id"),
            F.col("p_brand").alias("activity_id"),
            F.col("s_name").alias("coupon_id"),
            F.col("n_name").alias("source_type_name"),
            # decimal(16,2) IS the rounding (reference's money type at
            # DwdTradeOrderPreProcess.java:43-44); no double re-round needed
            (F.col("l_quantity") * F.col("l_extendedprice"))
            .cast("decimal(16,2)")
            .cast("double")
            .alias("split_original_amount"),
        )
    )


# --------------------------------------------------------------------------
# J6 — composite-key equi-join (DwdTradeRefundPaySuc.java:101-104:
# rp.order_id = ri.order_id AND rp.sku_id = ri.sku_id). Analog: returned
# lines ("refunds") joined back to order lines on (order_id, sku_id).
# --------------------------------------------------------------------------

J6_ORACLE = f"""
SELECT
  l.l_orderkey    AS order_id,
  l.l_partkey     AS sku_id,
  l.l_linenumber  AS detail_id,
  r.refund_qty    AS refund_qty,
  r.refund_amount AS refund_amount
FROM lineitem l
JOIN (
  SELECT l_orderkey, l_partkey,
         {dsum_sql('l_quantity')} AS refund_qty,
         {dsum_sql('l_extendedprice')} AS refund_amount
  FROM lineitem WHERE l_returnflag = 'R'
  GROUP BY l_orderkey, l_partkey
) r ON l.l_orderkey = r.l_orderkey AND l.l_partkey = r.l_partkey
"""


@query("j6_composite_key_join", oracle=J6_ORACLE)
def j6_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    r = (
        l.where(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey", "l_partkey")
        .agg(
            dsum(F.col("l_quantity")).alias("refund_qty"),
            dsum(F.col("l_extendedprice")).alias("refund_amount"),
        )
        .withColumnsRenamed({"l_orderkey": "r_orderkey", "l_partkey": "r_partkey"})
    )
    return l.join(
        r,
        (l.l_orderkey == r.r_orderkey) & (l.l_partkey == r.r_partkey),
    ).select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("sku_id"),
        F.col("l_linenumber").alias("detail_id"),
        F.col("refund_qty"),
        F.col("refund_amount"),
    )


# --------------------------------------------------------------------------
# J7 — dimension-enrichment chain. The reference chains 6 async Phoenix
# lookups with Redis caching (DwsTradeSkuOrderWindow.java:270-380,
# DimAsyncFunction.java:25-77). Spark-first: a chain of broadcast hash joins —
# no async, no cache, no thread pool; the snapshot ships once per executor.
# --------------------------------------------------------------------------

J7_ORACLE = """
SELECT
  l.l_orderkey    AS order_id,
  l.l_linenumber  AS detail_id,
  p.p_brand       AS tm_name,
  p.p_type        AS category3_name,
  n.n_name        AS nation_name,
  r.r_name        AS region_name
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
"""


@query("j7_dim_snowflake_enrich", oracle=J7_ORACLE)
def j7_dim_snowflake_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").alias("detail_id"),
            F.col("p_brand").alias("tm_name"),
            F.col("p_type").alias("category3_name"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


# --------------------------------------------------------------------------
# A5 — exact count-distinct via set accumulation
# (DwsTradeSkuOrderWindow.java:238-265: HashSet<order_id>, size at window
# close, set excluded from sink by @TransientSink). Spark: countDistinct —
# exact, as the oracle requires; the transient set column simply never exists.
# --------------------------------------------------------------------------

A5_ORACLE = f"""
SELECT
  l_partkey                          AS sku_id,
  count(DISTINCT l_orderkey)         AS order_ct,
  count(*)                           AS line_ct,
  {dsum_sql('l_quantity')}      AS sku_num,
  {dsum_sql('l_extendedprice')}  AS original_amount
FROM lineitem
GROUP BY l_partkey
"""


@query("a5_sku_order_count_distinct", oracle=A5_ORACLE)
def a5_sku_order_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy(F.col("l_partkey").alias("sku_id")).agg(
        F.countDistinct("l_orderkey").alias("order_ct"),
        F.count("*").alias("line_ct"),
        dsum(F.col("l_quantity")).alias("sku_num"),
        dsum(F.col("l_extendedprice")).alias("original_amount"),
    )


# --------------------------------------------------------------------------
# A6 — null-coalesced money sums (DwsTradeSkuOrderWindow.java:177-180,244-247:
# activity/coupon amounts default 0.0 before summation).
# Analog: discount/tax amounts as the nullable splits.
# --------------------------------------------------------------------------

A6_ORACLE = f"""
SELECT
  strftime(o.o_orderdate, '%Y-%m-%d') AS dt,
  {dsum_sql('coalesce(l.l_extendedprice, 0)')}                      AS original_amount,
  {dsum_sql('coalesce(l.l_extendedprice * l.l_discount, 0)')}       AS activity_reduce_amount,
  {dsum_sql('coalesce(l.l_extendedprice * l.l_tax, 0)')}            AS coupon_reduce_amount,
  {dsum_sql('coalesce(l.l_extendedprice * (1 - l.l_discount), 0)')} AS order_amount
FROM orders o
LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""


@query("a6_money_sums_coalesced", oracle=A6_ORACLE)
def a6_money_sums_coalesced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation: lineitem partially aggregates per order key
    BELOW the join (quantized sums are associative — compare.q6), so the
    join carries one row per order instead of every lineitem, and the final
    per-day aggregation just sums int64 partials. Bit-identical to the flat
    left-join + dsum formulation (A/B'd), ~25% faster at bench sf0.1 and
    far less join-shuffle traffic at scale."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    from realtime_datawarehouse_spark.functions.compare import dsum_finalize, q6

    per_order = l.groupBy("l_orderkey").agg(
        F.sum(q6(F.col("l_extendedprice"))).alias("s_orig"),
        F.sum(q6(F.col("l_extendedprice") * F.col("l_discount"))).alias("s_act"),
        F.sum(q6(F.col("l_extendedprice") * F.col("l_tax"))).alias("s_coup"),
        F.sum(
            q6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("s_ord"),
    )
    j = o.join(per_order, o.o_orderkey == per_order.l_orderkey, "left")
    zero64 = F.lit(0).cast("bigint")

    def fin(c: str) -> F.Column:
        return dsum_finalize(F.sum(F.coalesce(F.col(c), zero64)))

    return j.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("dt")).agg(
        fin("s_orig").alias("original_amount"),
        fin("s_act").alias("activity_reduce_amount"),
        fin("s_coup").alias("coupon_reduce_amount"),
        fin("s_ord").alias("order_amount"),
    )


# --------------------------------------------------------------------------
# P5 — conditional delta expression (DwdTradeCartAdd.java:38-40:
# if(type='insert', sku_num, new - old)). Analog on lineitem: returned lines
# contribute negative quantity.
# --------------------------------------------------------------------------

P5_ORACLE = """
SELECT
  l_orderkey     AS order_id,
  l_linenumber   AS detail_id,
  l_partkey      AS sku_id,
  CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END AS sku_num_delta,
  CASE WHEN l_returnflag = 'R' THEN 'refund' ELSE 'order' END       AS change_type
FROM lineitem
"""


@query("p5_conditional_delta", oracle=P5_ORACLE)
def p5_conditional_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    is_refund = F.col("l_returnflag") == "R"
    return l.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("detail_id"),
        F.col("l_partkey").alias("sku_id"),
        F.when(is_refund, -F.col("l_quantity"))
        .otherwise(F.col("l_quantity"))
        .alias("sku_num_delta"),
        F.when(is_refund, F.lit("refund")).otherwise(F.lit("order")).alias(
            "change_type"
        ),
    )


# --------------------------------------------------------------------------
# P7 — config-driven column pruning (TableProcessFunction.java:70-76:
# sink_columns CSV controls which JSON keys survive). Spark: a dynamic
# ``select`` assembled from a config row — the plan itself is built from
# config-as-data, as in the reference's broadcast-config design (§2.4 R4).
# --------------------------------------------------------------------------

SINK_CONFIG = {
    # sink_table          source    sink_columns (CSV, as the config table stores them)
    "dim_part": ("part", "p_partkey,p_brand,p_type"),
    "dim_customer": ("customer", "c_custkey,c_nationkey,c_mktsegment"),
}

P7_ORACLE = """
SELECT p_partkey, p_brand, p_type FROM part
"""


@query("p7_config_driven_pruning", oracle=P7_ORACLE)
def p7_config_driven_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    source, cols_csv = SINK_CONFIG["dim_part"]
    cols = [c.strip() for c in cols_csv.split(",")]
    return table(spark, sf_dir, source).select(*cols)
