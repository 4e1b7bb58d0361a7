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
    dsum_finalize,
    dsum_sql,
    pround,
    pround_sql,
    q6,
    q6_sql,
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

# Fixture orderdates span 1995-01-01..2001-08-01; the classic 1994 window
# would select nothing (caught in round 2: both sides agreed on 0 rows).
Q4_CUTOFF_LO = "1996-07-01 00:00:00"
Q4_CUTOFF_HI = "1996-10-01 00:00:00"

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

Q10_CUTOFF_LO = "1996-10-01 00:00:00"
Q10_CUTOFF_HI = "1997-01-01 00:00:00"
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


# --------------------------------------------------------------------------
# Round-2 widening: the remaining classic subquery/join shapes, adapted to
# the reduced fixture schema (no partsupp/shipmode columns — the SHAPE of
# each plan is the point; supplier-part incidence comes from lineitem).
# --------------------------------------------------------------------------

Q2_BRAND = "Brand#11"

Q2_ORACLE = f"""
SELECT p.p_partkey AS partkey, p.p_name AS p_name,
       s.s_suppkey AS suppkey, s.s_name AS s_name, s.s_acctbal AS s_acctbal
FROM part p
JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
  ON p.p_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE p.p_brand = '{Q2_BRAND}'
  AND s.s_acctbal = (
    SELECT min(s2.s_acctbal)
    FROM supplier s2
    JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps2
      ON s2.s_suppkey = ps2.l_suppkey
    WHERE ps2.l_partkey = p.p_partkey
  )
"""


@query("tpch_q2_min_cost_supplier", oracle=Q2_ORACLE)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — correlated scalar-min subquery, decorrelated as a
    per-part window min (one pass; see inline note). Supplier-part
    incidence is the DISTINCT (l_partkey, l_suppkey) projection of
    lineitem (the fixture has no partsupp), semi-joined down to the brand
    BEFORE the dedup shuffle. Part filter and supplier broadcast. Ties on
    min acctbal keep all winners — identical in both engines."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == Q2_BRAND)
    s = table(spark, sf_dir, "supplier")
    # broadcast-semi BEFORE the distinct: the pair-dedup shuffle then
    # carries only the selected brand's lineitems (~1/|brands| of rows)
    pairs = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    ps = (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(F.broadcast(s), pairs.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )
    # per-part min as a WINDOW agg, not groupBy+join-back: the naive
    # decorrelation re-executes the whole ps subtree for the mins side and
    # join-backs on a float key via sort-merge (observed); the window runs
    # the pipeline ONCE with a single hash exchange on p_partkey.
    from pyspark.sql import Window

    w = Window.partitionBy("p_partkey")
    return (
        ps.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            F.col("p_partkey").alias("partkey"),
            "p_name",
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            "s_acctbal",
        )
    )


Q12_LO = "1997-01-01 00:00:00"
Q12_HI = "1998-01-01 00:00:00"
Q12_HIGH = ("1-URGENT", "2-HIGH")

Q12_ORACLE = f"""
SELECT l.l_linestatus AS linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{Q12_LO}'
  AND l.l_shipdate <  TIMESTAMP '{Q12_HI}'
GROUP BY 1
"""


@query("tpch_q12_priority_class", oracle=Q12_ORACLE)
def tpch_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape — conditional CASE-sums over a fact join (the reference's
    multi-flag window reduce in SQL form). The shipdate range filter is
    pushed to the lineitem scan; the date-pruned fact side drives one
    shuffled join; counts are exact integers (no float discipline needed)."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q12_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_HI).cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q14_LO = "1997-09-01 00:00:00"
Q14_HI = "1997-10-01 00:00:00"

# Ratio of two quantized-int64 sums: both engines divide the SAME two
# integers, then apply the same portable rounding — bit-identical.
_Q14_REV = "l.l_extendedprice * (1 - l.l_discount)"
_Q14_Q6 = f"CAST(floor(({_Q14_REV}) * 1000000 + 0.5) AS BIGINT)"

Q14_ORACLE = f"""
SELECT floor(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_Q14_Q6}
                                   ELSE 0 END) AS DOUBLE)
             / CAST(sum({_Q14_Q6}) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
       AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '{Q14_LO}'
  AND l.l_shipdate <  TIMESTAMP '{Q14_HI}'
"""


@query("tpch_q14_promo_revenue", oracle=Q14_ORACLE)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape — conditional-ratio aggregate over a dim join: one
    date-pruned fact scan, part broadcast, two map-side-combinable integer
    sums, one final division (order-free cross-engine: see compare.py)."""
    from realtime_datawarehouse_spark.functions.compare import pround, q6

    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q14_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_HI).cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev6 = q6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev6).otherwise(0)).alias("pq"),
            F.sum(rev6).alias("tq"),
        )
    )
    ratio = F.lit(100.0) * F.col("pq").cast("double") / F.col("tq").cast("double")
    return agg.select(pround(ratio, 6).alias("promo_revenue_pct"))


Q16_EXCL_BRAND = "Brand#45"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 4, 7, 10, 13, 16, 19, 23)
Q16_MIN_BAL = 1000.0

Q16_ORACLE = f"""
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS psize,
       count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
  AND p.p_type <> '{Q16_EXCL_TYPE}'
  AND p.p_size IN {Q16_SIZES}
  AND ps.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < {Q16_MIN_BAL}
  )
GROUP BY 1, 2, 3
"""


@query("tpch_q16_supplier_cnt", oracle=Q16_ORACLE)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape — NOT IN (anti-join; suppkey is non-null so NOT IN ≡
    left_anti) + count(DISTINCT) over a filtered dim join. The excluded
    supplier set broadcasts; distinct-count shuffles once on the group key
    with partial distinct below."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < Q16_MIN_BAL)
        .select("s_suppkey")
    )
    # both reducing joins run BEFORE the pair-dedup shuffle: the distinct
    # only sees qualifying-part, qualified-supplier lineitems
    pairs = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("psize"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q19_ARMS = (
    ("Brand#12", 1, 15, 1, 11),
    ("Brand#23", 1, 25, 10, 20),
    ("Brand#34", 1, 35, 20, 30),
)

Q19_ORACLE = f"""
SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       count(*) AS matched_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE {' OR '.join(
    f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}"
    f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in Q19_ARMS
)}
"""


@query("tpch_q19_disjunctive_revenue", oracle=Q19_ORACLE)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — disjunction of brand/size/quantity conjunctions across a
    join. The part-only disjuncts (brand OR'd sizes) are implied by the OR
    and get pushed to the broadcast side scan; the mixed predicate applies
    post-join. One scan each side, no shuffle but the final 1-row agg."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    arm = None
    for b, slo, shi, qlo, qhi in Q19_ARMS:
        this = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        arm = this if arm is None else (arm | this)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(arm)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("matched_lines"),
        )
    )


# Every fixture customer has at least one order, so classic "never ordered"
# is vacuous — dormancy here is "no order since the cutoff", keeping the
# anti-join + scalar-subquery shape with a nonzero answer.
Q22_CUTOFF = "1999-01-01 00:00:00"

Q22_ORACLE = f"""
SELECT n.n_name AS nation,
       count(*) AS numcust,
       {dsum_sql('c.c_acctbal')} AS totacctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.c_acctbal > (
    SELECT {davg_sql('c2.c_acctbal', 4)}
    FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF}'
  )
GROUP BY 1
"""


@query("tpch_q22_dormant_customers", oracle=Q22_ORACLE)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape — scalar-avg subquery threshold + NOT EXISTS anti-join
    (by nation; the fixture has no phone column). The 1-row threshold
    broadcasts as a cross join (no collect — stays a distributed plan);
    the anti-join shuffles customer against the DISTINCT o_custkey
    projection. Threshold uses the order-free davg so both engines compare
    against the identical double; summed acctbals are positive (above a
    positive mean), so dsum applies."""
    from realtime_datawarehouse_spark.functions.compare import davg

    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    thr = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(davg(F.col("c_acctbal"), 4).alias("thr"))
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("thr"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Remaining classic shapes expressible on the fixture schema: Q6 (pure
# filtered scan-agg), Q7 (two-nation volume by year), Q13 (distribution of
# counts — join then aggregate the aggregate), Q15 (argmax against a scalar
# subquery over an aggregate), Q17 (correlated per-part average threshold).
# --------------------------------------------------------------------------

Q6_LO = "1997-01-01 00:00:00"
Q6_HI = "1998-01-01 00:00:00"

Q6_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
       count(*) AS matched
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_LO}' AND l_shipdate < TIMESTAMP '{Q6_HI}'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


@query("tpch_q6_forecast_revenue", oracle=Q6_ORACLE)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — the canonical predicate-pushdown probe: every filter reaches
    the parquet scan, the agg is one map-side-combined row. The simplest
    query that distinguishes a scan-bound engine from a shuffle-bound one."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q6_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_HI).cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("matched"),
    )


Q7_N1 = "NATION_3"
Q7_N2 = "NATION_7"

Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS volume
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE (n1.n_name = '{Q7_N1}' AND n2.n_name = '{Q7_N2}')
   OR (n1.n_name = '{Q7_N2}' AND n2.n_name = '{Q7_N1}')
GROUP BY 1, 2, 3
"""


@query("tpch_q7_nation_volume", oracle=Q7_ORACLE)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 — cross-nation trade volume. Scale shape: all four dims
    broadcast; lineitem⋈orders is the only real shuffle; the disjunctive
    nation pair filter applies once both sides are attached (each side's
    IN-list pushes to its dim scan)."""
    pair = [Q7_N1, Q7_N2]
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    joined = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == Q7_N1) & (F.col("cust_nation") == Q7_N2))
            | ((F.col("supp_nation") == Q7_N2) & (F.col("cust_nation") == Q7_N1))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '5-LOW'
  GROUP BY 1
)
GROUP BY 1
"""


@query("tpch_q13_order_distribution", oracle=Q13_ORACLE)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 — aggregate OF an aggregate over a left join (customers with
    zero qualifying orders must appear in the 0 bucket). First agg shuffles
    on custkey, second on the tiny count keyspace."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q15_LO = "1997-01-01 00:00:00"
Q15_HI = "1997-04-01 00:00:00"

Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO}' AND l_shipdate < TIMESTAMP '{Q15_HI}'
  GROUP BY 1
)
SELECT s.s_suppkey AS suppkey, s.s_name AS s_name, r.total_revenue AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
"""


@query("tpch_q15_top_supplier", oracle=Q15_ORACLE)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 — argmax against a scalar subquery over an aggregate (the view
    in the original). The 1-row max broadcasts back onto the aggregate —
    the rev subtree is computed once and self-compared via the broadcast,
    ties keep every argmax supplier (both engines)."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_HI).cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"), "s_name", "total_revenue"
        )
    )


Q17_BRAND = "Brand#23"

Q17_ORACLE = f"""
WITH avg_q AS (
  SELECT l_partkey, {davg_sql('l_quantity', 4)} AS threshold
  FROM lineitem GROUP BY 1
)
SELECT {dsum_sql('l.l_extendedprice')} AS total_price, count(*) AS line_ct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN avg_q a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = '{Q17_BRAND}'
  AND l.l_quantity < 0.2 * a.threshold
"""


@query("tpch_q17_small_quantity", oracle=Q17_ORACLE)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 — correlated per-part average threshold, decorrelated to a
    groupBy + join-back on partkey (both sides reuse the same partkey
    partitioning; the brand filter broadcasts and prunes the probe side).
    The threshold uses the order-free davg so both engines compare against
    identical doubles."""
    from realtime_datawarehouse_spark.functions.compare import davg

    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        F.col("p_brand") == Q17_BRAND
    ).select("p_partkey")
    avg_q = l.groupBy(F.col("l_partkey").alias("ak")).agg(
        davg(F.col("l_quantity"), 4).alias("threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_q, l.l_partkey == F.col("ak"))
        .where(F.col("l_quantity") < 0.2 * F.col("threshold"))
        .agg(
            dsum(F.col("l_extendedprice")).alias("total_price"),
            F.count("*").alias("line_ct"),
        )
    )


# --------------------------------------------------------------------------
# Round-3 widening: the last classic shapes — Q8/Q9/Q11/Q20/Q21 — adapted to
# the reduced fixture schema (no partsupp, no commit/receipt dates; lineitem
# provides supplier-part incidence, l_returnflag='R' plays the "late" flag).
# --------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_2"
Q8_TYPE = "PROMO"
Q8_LO = "1996-01-01 00:00:00"
Q8_HI = "1998-01-01 00:00:00"

# per-row 1e-6-quantized int64 volume summand (the q6/dsum discipline —
# both engines sum exact integers, then run one identical double division)
_Q6_VOL = q6_sql("l.l_extendedprice * (1 - l.l_discount)")

Q8_ORACLE = f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       {pround_sql(
           f"CAST(sum(CASE WHEN n1.n_name = '{Q8_NATION}' THEN {_Q6_VOL}"
           f" ELSE 0 END) AS DOUBLE) / CAST(sum({_Q6_VOL}) AS DOUBLE)", 6)}
         AS mkt_share
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n2.n_regionkey
WHERE r.r_name = '{Q8_REGION}' AND p.p_type = '{Q8_TYPE}'
  AND o.o_orderdate >= TIMESTAMP '{Q8_LO}'
  AND o.o_orderdate <  TIMESTAMP '{Q8_HI}'
GROUP BY 1
"""


@query("tpch_q8_market_share", oracle=Q8_ORACLE)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape — national market share: ratio of two conditional sums per
    order year. Scale shape: part/supplier/customer/nation/region all
    broadcast (the part filter prunes the probe before its broadcast join);
    lineitem joins orders on the one real shuffle; the share division runs
    over exact q6 int64 partials so both engines divide identical numbers.
    Reference semantics: the ADS ratio-style indicators over grouped sums
    (pub/mapper/TradeStatMapper.java:16-21 generalized)."""
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    l = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_type") == Q8_TYPE)
        .select("p_partkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q8_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_HI).cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), "n_regionkey"
    )
    r = (
        table(spark, sf_dir, "region")
        .where(F.col("r_name") == Q8_REGION)
        .select("r_regionkey")
    )
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    num = F.sum(
        F.when(F.col("supp_nation") == Q8_NATION, q6(vol)).otherwise(0)
    ).cast("double")
    den = F.sum(q6(vol)).cast("double")
    return joined.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(pround(num / den, 6).alias("mkt_share"))


Q9_PART_LIKE = "widget"
Q9_COST_FRAC = 0.1  # p_retailprice * qty * frac stands in for ps_supplycost

Q9_ORACLE = f"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       floor(CAST(sum({_Q6_VOL})
                  - sum({q6_sql(f'p.p_retailprice * l.l_quantity * {Q9_COST_FRAC}')})
             AS DOUBLE) / 10000.0 + 0.5) / 100.0 AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%{Q9_PART_LIKE}%'
GROUP BY 1, 2
"""


@query("tpch_q9_product_profit", oracle=Q9_ORACLE)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape — product-type profit by (supplier nation, order year).
    The fixture has no partsupp, so supply cost is modeled as
    ``p_retailprice * quantity * {frac}`` — preserving the
    revenue-minus-cost expression over a 5-way join. Profit sums the two
    q6 int64 partials separately (each summand non-negative) and
    finalizes their difference — order-free and engine-exact even though
    per-row profit may be negative. Only lineitem⋈orders shuffles; the
    name LIKE filter prunes part before broadcast."""
    l = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").contains(Q9_PART_LIKE))
        .select("p_partkey", "p_retailprice")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cost = F.col("p_retailprice") * F.col("l_quantity") * F.lit(Q9_COST_FRAC)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            dsum_finalize(F.sum(q6(vol)) - F.sum(q6(cost))).alias("profit")
        )
    )


Q11_NATION = "NATION_5"
Q11_FRAC = 0.001

Q11_ORACLE = f"""
WITH pv AS (
  SELECT l.l_partkey AS partkey, sum({_Q6_VOL}) AS s6
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = '{Q11_NATION}'
  GROUP BY 1
)
SELECT partkey,
       floor(CAST(s6 AS DOUBLE) / 10000.0 + 0.5) / 100.0 AS part_value
FROM pv
WHERE CAST(s6 AS DOUBLE) > (SELECT CAST(sum(s6) AS DOUBLE) FROM pv) * {Q11_FRAC}
"""


@query("tpch_q11_important_stock", oracle=Q11_ORACLE)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape — grouped value vs a global-fraction threshold (HAVING
    against a scalar subquery over the SAME aggregate). The fixture has no
    partsupp, so part value = lineitem volume from the nation's suppliers.
    Scale shape: the per-part aggregate is computed once; the grand total
    re-aggregates the tiny per-part table and broadcasts one row back —
    the fact table is scanned and shuffled exactly once. The threshold
    compares doubles derived from identical int64 q6 sums in both
    engines."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name") == Q11_NATION)
        .select("n_nationkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pv = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(q6(vol)).alias("s6"))
    )
    total = pv.agg(F.sum("s6").alias("t6"))
    return (
        pv.crossJoin(F.broadcast(total))
        .where(
            F.col("s6").cast("double")
            > F.col("t6").cast("double") * F.lit(Q11_FRAC)
        )
        .select("partkey", dsum_finalize(F.col("s6")).alias("part_value"))
    )


Q20_PART_PREFIX = "small"
Q20_NATION = "NATION_1"
Q20_LO = "1997-01-01 00:00:00"
Q20_HI = "1998-01-01 00:00:00"
Q20_MIN_QTY = 40.0

Q20_ORACLE = f"""
SELECT s.s_suppkey AS suppkey, s.s_name AS s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = '{Q20_NATION}'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_PART_PREFIX}%'
      )
      AND l.l_shipdate >= TIMESTAMP '{Q20_LO}'
      AND l.l_shipdate <  TIMESTAMP '{Q20_HI}'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(l.l_quantity) > {Q20_MIN_QTY}
  )
"""


@query("tpch_q20_part_promotion", oracle=Q20_ORACLE)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — double-nested IN subqueries compiled to a semi-join
    chain: part-name prefix → qualifying (supplier, part) shipment
    volumes → suppliers of a nation. The fixture has no partsupp
    availqty, so the inner threshold is an absolute shipped-quantity
    floor (the original compares to 0.5×shipped; same plan shape).
    Scale shape: the part filter broadcasts into a semi-join that prunes
    lineitem BEFORE its (suppkey, partkey) aggregation shuffle; the
    qualifying-supplier set broadcasts into the final semi-join — the
    supplier table never shuffles."""
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith(Q20_PART_PREFIX))
        .select("p_partkey")
    )
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q20_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_HI).cast("timestamp"))
    )
    qual_supp = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > Q20_MIN_QTY)
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name") == Q20_NATION)
        .select("n_nationkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(
            F.broadcast(qual_supp),
            s.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_name"))
    )


Q21_NATION = "NATION_2"

Q21_ORACLE = f"""
SELECT s.s_name AS s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders o   ON o.o_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n.n_name = '{Q21_NATION}'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY 1
"""


@query("tpch_q21_waiting_supplier", oracle=Q21_ORACLE)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — suppliers solely responsible for a "late" line on a
    multi-supplier order (l_returnflag='R' plays the late flag; the
    fixture has no receipt/commit dates).

    Spark-first decorrelation: the EXISTS / NOT-EXISTS pair over lineitem
    self-joins is one per-order aggregate — n_supp = distinct suppliers on
    the order, n_late_supp = distinct suppliers with a late line. A late
    line qualifies iff n_supp >= 2 (someone else was on the order) and
    n_late_supp = 1 (nobody else was late — the late supplier set is
    exactly {{l1.suppkey}}). One orderkey aggregation + one orderkey join
    replaces two correlated self-joins; both shuffles share the orderkey
    partitioning. The oracle keeps the literal EXISTS form — same rows."""
    l = table(spark, sf_dir, "lineitem")
    # two-level aggregate instead of two countDistincts: a pair of
    # countDistinct aggs plans an Expand (doubles the shuffled rows);
    # pre-aggregating to (orderkey, suppkey, any_late) first keeps one
    # map-side-combinable shuffle and both counts become plain sums
    per_pair = l.groupBy(
        F.col("l_orderkey").alias("agg_ok"), "l_suppkey"
    ).agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("late")
    )
    per_order = per_pair.groupBy("agg_ok").agg(
        F.count("*").alias("n_supp"),
        F.sum("late").alias("n_late_supp"),
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name") == Q21_NATION)
        .select("n_nationkey")
    )
    l1 = l.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(per_order, l1.l_orderkey == F.col("agg_ok"))
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
