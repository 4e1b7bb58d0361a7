"""Registered queries for the sketch/approx aggregation layer
(operators/sketches.py) — the scale counterparts of A5's exact
set-distinct (rt/app/dws/DwsTradeSkuOrderWindow.java:113-155) and the
exact top-N serving queries.

``hh_top_parts_per_brand`` is exact and oracle-checked. The two approx
queries cannot oracle against DuckDB's approx aggregates (different sketch
implementations), but both ARE deterministic: HLL++ merge is a per-register
max (order/partition independent), and GK summaries at the driver's sf0.01
stay below ``accuracy`` so no compression runs (verified order-independent
across partitionings, see tests). Their oracles are therefore PINNED VALUES
literals computed once at the driver's contract scale (sf=0.01) — the
driver's full rows+schema+hash check then guards the engine's continued
reproduction of the accuracy-verified values
(tests/test_plans.py::test_sketch_accuracy_bounds pins the values against
the exact aggregations; test_sketch_pinned_oracles re-derives the literals
at sf0.01). The pins are sf0.01-specific by design — the driver only ever
runs oracles at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.operators import sketches
from realtime_datawarehouse_spark.plans.registry import query
from realtime_datawarehouse_spark.tables import table


# Pinned expected values at the driver's oracle scale (sf=0.01), computed
# from the accuracy-verified sketch output (see module docstring). HLL++ is
# partition/order independent (register-max merge); regenerate with
# tests/test_plans.py::test_sketch_pinned_oracles if the input data or rsd
# ever changes.
HLL_PINNED_SF001: list[tuple[str, int]] = [
    ("2024-01-01", 134), ("2024-01-02", 137), ("2024-01-03", 129),
    ("2024-01-04", 136), ("2024-01-05", 132), ("2024-01-06", 129),
    ("2024-01-07", 124), ("2024-01-08", 134), ("2024-01-09", 136),
    ("2024-01-10", 133), ("2024-01-11", 132), ("2024-01-12", 134),
    ("2024-01-13", 140), ("2024-01-14", 130), ("2024-01-15", 129),
    ("2024-01-16", 129), ("2024-01-17", 135), ("2024-01-18", 137),
    ("2024-01-19", 133), ("2024-01-20", 135), ("2024-01-21", 133),
    ("2024-01-22", 131), ("2024-01-23", 136), ("2024-01-24", 135),
    ("2024-01-25", 136), ("2024-01-26", 132), ("2024-01-27", 139),
    ("2024-01-28", 128), ("2024-01-29", 134), ("2024-01-30", 133),
]

HLL_ORACLE = "SELECT dt, CAST(approx_distinct AS BIGINT) AS approx_distinct FROM (VALUES\n" + ",\n".join(
    f"  ('{dt}', {n})" for dt, n in HLL_PINNED_SF001
) + "\n) AS t(dt, approx_distinct)"


@query("sk_hll_daily_uv", oracle=HLL_ORACLE)
def sk_hll_daily_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2's daily-UV with HLL++ state instead of an exact per-day set:
    constant memory per day regardless of user cardinality — the form the
    100 TB deployment runs when the exact set no longer fits state.

    Oracle: pinned VALUES at sf0.01 (HLL++ is deterministic — per-register
    max merge — but not bit-compatible with DuckDB's approx_count_distinct;
    the pin's accuracy vs the exact count is asserted in
    test_sketch_accuracy_bounds)."""
    ev = table(spark, sf_dir, "events")
    return sketches.approx_distinct_by_key(
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("dt"), "user_id"),
        "dt",
        "user_id",
        rsd=0.02,
    )


# GK quantile pins at sf0.01: each priority group (~3 000 orders) is under
# ``accuracy`` (10 000), so the summary holds every sample uncompressed and
# the lookup is the exact order-statistic element — order/partition
# independent (empirically verified across 2/8/32-partition runs).
GK_PINNED_SF001: list[tuple[str, float, float, float]] = [
    ("1-URGENT", 256652.45, 452741.76, 494687.66),
    ("2-HIGH", 252176.99, 454911.97, 493791.65),
    ("3-MEDIUM", 249557.73, 447029.9, 495232.84),
    ("4-NOT SPECIFIED", 251597.2, 449702.88, 494629.04),
    ("5-LOW", 247766.54, 444191.02, 494582.69),
]

GK_ORACLE = (
    "SELECT priority, CAST(p50 AS DOUBLE) AS p50, CAST(p90 AS DOUBLE) AS p90,"
    " CAST(p99 AS DOUBLE) AS p99 FROM (VALUES\n" + ",\n".join(
        f"  ('{p}', {p50!r}, {p90!r}, {p99!r})"
        for p, p50, p90, p99 in GK_PINNED_SF001
    ) + "\n) AS t(priority, p50, p90, p99)"
)


@query("sk_quantile_order_value", oracle=GK_ORACLE)
def sk_quantile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 order value per priority via mergeable GK summaries —
    the sketch form of a sort-based exact percentile.

    Oracle: pinned VALUES at sf0.01 (see GK_PINNED_SF001 note — groups
    under ``accuracy`` make the summary exact and order-independent)."""
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


@query(
    "sk_cms_heavy_hitters", oracle=sketches.cms_heavy_hitters_oracle(k=10)
)
def sk_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch top-10 part keys by estimated line count, with the
    exact count and the (non-negative) CMS overestimate alongside. Sketch
    state is 4×1024 counters independent of data volume — the heavy-hitter
    form that still fits in memory when the key domain doesn't
    (operators/sketches.py::cms_heavy_hitters has the 100 TB shape).
    Cell placement uses the portable universal-hash family, so every
    collision is reproduced bit-for-bit by the SQL oracle."""
    li = table(spark, sf_dir, "lineitem")
    cand = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    return sketches.cms_heavy_hitters(li, cand, "l_partkey", k=10)
