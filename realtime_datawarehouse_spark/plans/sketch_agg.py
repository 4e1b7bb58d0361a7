"""Registered queries for the sketch/approx aggregation layer
(operators/sketches.py) — the scale counterparts of A5's exact
set-distinct (rt/app/dws/DwsTradeSkuOrderWindow.java:113-155) and the
exact top-N serving queries.

``hh_top_parts_per_brand`` is exact and oracle-checked. The two approx
queries register without an oracle (Spark's HLL++/GK sketches are
deterministic but not bit-compatible with DuckDB's approx aggregates);
their accuracy is pinned by tests/test_plans.py::test_sketch_accuracy_bounds
against the exact aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.operators import sketches
from realtime_datawarehouse_spark.plans.registry import query
from realtime_datawarehouse_spark.tables import table


@query("sk_hll_daily_uv")
def sk_hll_daily_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2's daily-UV with HLL++ state instead of an exact per-day set:
    constant memory per day regardless of user cardinality — the form the
    100 TB deployment runs when the exact set no longer fits state."""
    ev = table(spark, sf_dir, "events")
    return sketches.approx_distinct_by_key(
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("dt"), "user_id"),
        "dt",
        "user_id",
        rsd=0.02,
    )


@query("sk_quantile_order_value")
def sk_quantile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 order value per priority via mergeable GK summaries —
    the sketch form of a sort-based exact percentile."""
    o = table(spark, sf_dir, "orders")
    qs = sketches.approx_quantiles_by_key(
        o.select(F.col("o_orderpriority").alias("priority"), "o_totalprice"),
        "priority",
        "o_totalprice",
        [0.5, 0.9, 0.99],
    )
    # Project the sketch array to scalar columns: the driver's result
    # canonicalizer sorts by every column and cannot hash an array cell.
    return qs.select(
        "priority",
        F.col("quantiles")[0].alias("p50"),
        F.col("quantiles")[1].alias("p90"),
        F.col("quantiles")[2].alias("p99"),
    )


HH_K = 5

HH_ORACLE = f"""
SELECT brand, partkey, cnt, rank FROM (
  SELECT p.p_brand AS brand, l.l_partkey AS partkey,
         count(*) AS cnt,
         row_number() OVER (
           PARTITION BY p.p_brand ORDER BY count(*) DESC, l.l_partkey ASC
         ) AS rank
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
)
WHERE rank <= {HH_K}
"""


@query("hh_top_parts_per_brand", oracle=HH_ORACLE)
def hh_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: top-5 parts by line count per brand. The count
    pre-aggregates map-side (shuffle = distinct (brand, part) pairs), the
    rank runs over the count table only. Deterministic tiebreak on partkey
    makes the result unique in both engines."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"), F.col("l_partkey").alias("partkey")
    )
    return sketches.heavy_hitters(joined, "brand", "partkey", k=HH_K)
