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

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — a sketch with a FULL SQL oracle
# ---------------------------------------------------------------------------

KMV_K = 64
_HASH_SPACE = float(1 << 60)  # hash64 is uniform on [0, 2^60)


def _kmv_oracle(k: int = KMV_K) -> str:
    from realtime_datawarehouse_spark.functions.hashing import hash64_sql

    h = hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH hashed AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS dt, {h} AS h
  FROM events
),
ranked AS (
  SELECT dt, h, row_number() OVER (PARTITION BY dt ORDER BY h) AS rn
  FROM hashed
),
agg AS (
  SELECT dt,
         CAST(count(*) AS BIGINT)                         AS nd,
         max(CASE WHEN rn <= {k} THEN h END)              AS hk
  FROM ranked GROUP BY 1
)
SELECT dt,
       CAST(CASE WHEN nd <= {k} THEN nd
                 ELSE CAST(floor(({k}.0 - 1.0) * {_HASH_SPACE}
                                 / CAST(hk AS DOUBLE)) AS BIGINT)
            END AS BIGINT) AS est_uv
FROM agg
"""


@query("sk_kmv_distinct", oracle=_kmv_oracle())
def sk_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily unique visitors via the KMV (k-minimum-values / bottom-k)
    sketch: keep the {KMV_K} smallest 60-bit hashes per day; when more
    than {KMV_K} distinct values exist, estimate N ≈ (k−1)·2^60 / h_(k).

    Unlike HLL++ / GK (pinned-VALUES oracles), KMV is built entirely from
    the portable md5-derived hash64 — the DuckDB oracle replays the exact
    bottom-k selection, so this sketch gets a FULL value-hash oracle at
    any scale, and it doubles as the mergeable distinct-sample the
    theta-sketch family generalizes (union = merge bottom-k sets).

    Cross-engine exactness: the estimator runs in doubles, but both
    inputs are exact integers < 2^60 and (k−1)·2^60 = 63·2^60 is exactly
    representable, so the single multiply/divide/floor chain is
    bit-identical IEEE in both engines.

    Scale shape: the window ranks the per-day DISTINCT hash set (already
    one hash-agg down from raw events), and the rank sort shares the
    distinct's (dt, h) exchange. At 100 TB, prepend a static prefilter
    ``h < k·2^60 / N_floor`` (any safe lower bound on daily UV) so the
    sort sees only the candidate bottom slice; the estimator itself is
    unchanged — that filter is a pure optimization, invisible to the
    oracle."""
    from realtime_datawarehouse_spark.functions.hashing import hash64
    from realtime_datawarehouse_spark.functions.timeutil import fmt_date

    ev = table(spark, sf_dir, "events")
    hashed = ev.select(
        fmt_date("ts").alias("dt"),
        hash64(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("dt").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy("dt").agg(
        F.count("*").alias("nd"),
        F.max(F.when(F.col("rn") <= KMV_K, F.col("h"))).alias("hk"),
    )
    est = (
        F.when(F.col("nd") <= KMV_K, F.col("nd").cast("double"))
        .otherwise(
            F.floor(
                (F.lit(float(KMV_K) - 1.0) * F.lit(_HASH_SPACE))
                / F.col("hk").cast("double")
            )
        )
        .cast("bigint")
    )
    return agg.select("dt", est.alias("est_uv"))


def _kmv_union_oracle(k: int = KMV_K) -> str:
    from realtime_datawarehouse_spark.functions.hashing import hash64_sql

    h = hash64_sql("CAST(user_id AS VARCHAR)")
    space_int = 1 << 60
    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type AS seg, {h} AS h FROM events
),
ranked AS (
  SELECT seg, h, row_number() OVER (PARTITION BY seg ORDER BY h) AS rn
  FROM hashed
),
agg AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS nd,
         max(CASE WHEN rn <= {k} THEN h END) AS hk
  FROM ranked GROUP BY 1
),
seg_est AS (
  SELECT seg,
         CAST(CASE WHEN nd <= {k} THEN nd
                   ELSE CAST(floor(({k}.0 - 1.0) * {_HASH_SPACE}
                                   / CAST(hk AS DOUBLE)) AS BIGINT)
              END AS BIGINT) AS est_uv
  FROM agg
),
theta AS (
  SELECT min(CASE WHEN nd <= {k} THEN CAST({space_int} AS BIGINT)
                  ELSE hk END) AS th
  FROM agg
),
kept AS (
  SELECT CAST(count(DISTINCT r.h) AS BIGINT) AS ct, any_value(t.th) AS th
  FROM ranked r CROSS JOIN theta t
  WHERE r.rn <= {k} AND r.h < t.th
)
SELECT seg, est_uv FROM seg_est
UNION ALL
SELECT 'ALL' AS seg,
       CAST(CASE WHEN th >= CAST({space_int} AS BIGINT) THEN ct
                 ELSE CAST(floor(CAST(ct AS DOUBLE) * {_HASH_SPACE}
                                 / CAST(th AS DOUBLE)) AS BIGINT)
            END AS BIGINT) AS est_uv
FROM kept
"""


@query("sk_kmv_union", oracle=_kmv_union_oracle())
def sk_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style UNION of per-segment KMV sketches: per-event-type
    distinct-user estimates PLUS an 'ALL' row estimated purely from the
    MERGED bottom-k sets — never from a second scan of the raw data. This
    is the property that makes KMV/theta sketches warehouse-composable
    (per-partition sketches roll up to any grouping), demonstrated under a
    full value oracle: theta = min over segment thresholds, keep retained
    hashes below theta, estimate = |kept|·2^60/theta.

    Same cross-engine-exact double chain as sk_kmv_distinct; the merge
    touches only |segments|·k retained hashes (constant-size state per
    segment at any scale — the 100 TB rollup cost is independent of user
    cardinality)."""
    from realtime_datawarehouse_spark.functions.hashing import hash64

    space_int = 1 << 60
    ev = table(spark, sf_dir, "events")
    hashed = ev.select(
        F.col("event_type").alias("seg"),
        hash64(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("seg").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy("seg").agg(
        F.count("*").alias("nd"),
        F.max(F.when(F.col("rn") <= KMV_K, F.col("h"))).alias("hk"),
    )
    seg_est = agg.select(
        "seg",
        F.when(F.col("nd") <= KMV_K, F.col("nd").cast("double"))
        .otherwise(
            F.floor(
                (F.lit(float(KMV_K) - 1.0) * F.lit(_HASH_SPACE))
                / F.col("hk").cast("double")
            )
        )
        .cast("bigint")
        .alias("est_uv"),
    )
    theta = agg.agg(
        F.min(
            F.when(F.col("nd") <= KMV_K, F.lit(space_int)).otherwise(
                F.col("hk")
            )
        ).alias("th")
    )
    kept = (
        ranked.where(F.col("rn") <= KMV_K)
        .crossJoin(F.broadcast(theta))
        .where(F.col("h") < F.col("th"))
        .agg(
            F.count_distinct(F.col("h")).alias("ct"),
            F.any_value(F.col("th")).alias("th"),
        )
    )
    union_est = kept.select(
        F.lit("ALL").alias("seg"),
        F.when(F.col("th") >= F.lit(space_int), F.col("ct").cast("double"))
        .otherwise(
            F.floor(
                F.col("ct").cast("double")
                * F.lit(_HASH_SPACE)
                / F.col("th").cast("double")
            )
        )
        .cast("bigint")
        .alias("est_uv"),
    )
    return seg_est.unionByName(union_est)


def _kmv_intersect_oracle(k: int = KMV_K) -> str:
    from realtime_datawarehouse_spark.functions.hashing import hash64_sql

    h = hash64_sql("CAST(user_id AS VARCHAR)")
    space_int = 1 << 60
    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type AS seg, {h} AS h FROM events
),
ranked AS (
  SELECT seg, h, row_number() OVER (PARTITION BY seg ORDER BY h) AS rn
  FROM hashed
),
agg AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS nd,
         CASE WHEN count(*) <= {k} THEN CAST({space_int} AS BIGINT)
              ELSE max(CASE WHEN rn <= {k} THEN h END) END AS theta
  FROM ranked GROUP BY 1
),
kept AS (SELECT seg, h FROM ranked WHERE rn <= {k}),
pairs AS (
  SELECT a.seg AS seg_a, b.seg AS seg_b,
         least(ta.theta, tb.theta) AS th,
         CAST(count(*) FILTER (WHERE a.h < least(ta.theta, tb.theta))
              AS BIGINT) AS ct
  FROM kept a
  JOIN kept b ON b.h = a.h AND a.seg < b.seg
  JOIN agg ta ON ta.seg = a.seg
  JOIN agg tb ON tb.seg = b.seg
  GROUP BY 1, 2, 3
)
SELECT seg_a, seg_b,
       CAST(CASE WHEN th >= CAST({space_int} AS BIGINT) THEN ct
                 ELSE CAST(floor(CAST(ct AS DOUBLE) * {_HASH_SPACE}
                                 / CAST(th AS DOUBLE)) AS BIGINT)
            END AS BIGINT) AS est_overlap
FROM pairs
"""


@query("sk_kmv_intersect", oracle=_kmv_intersect_oracle())
def sk_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch INTERSECTION over the per-segment KMV sketches: the
    estimated audience overlap |users(a) ∩ users(b)| for every event-type
    pair, computed purely from the retained bottom-k sets (kept hashes
    present in BOTH sketches below θ = min threshold, scaled by 2^60/θ)
    — with union (sk_kmv_union) this completes the sketch set algebra
    that makes constant-size distinct state composable across any
    grouping. Exact-regime pairs (both sketches complete) return exact
    overlaps. Same cross-engine-exact double chain as the union; the
    pair join touches |segments|·k retained hashes only. Accuracy vs
    the exact overlap is pinned in tests (the exact form is
    olap_bitmap_audience_overlap)."""
    from realtime_datawarehouse_spark.functions.hashing import hash64

    space_int = 1 << 60
    ev = table(spark, sf_dir, "events")
    hashed = ev.select(
        F.col("event_type").alias("seg"),
        hash64(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("seg").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy("seg").agg(
        F.when(F.count("*") <= KMV_K, F.lit(space_int))
        .otherwise(F.max(F.when(F.col("rn") <= KMV_K, F.col("h"))))
        .alias("theta")
    )
    kept = ranked.where(F.col("rn") <= KMV_K).select("seg", "h")
    a = kept.select(F.col("seg").alias("seg_a"), "h")
    b = kept.select(F.col("seg").alias("seg_b"), F.col("h").alias("h2"))
    ta = agg.select(F.col("seg").alias("seg_a"), F.col("theta").alias("th_a"))
    tb = agg.select(F.col("seg").alias("seg_b"), F.col("theta").alias("th_b"))
    pairs = (
        a.join(b, (F.col("h2") == F.col("h")) & (F.col("seg_a") < F.col("seg_b")))
        .join(F.broadcast(ta), "seg_a")
        .join(F.broadcast(tb), "seg_b")
        .withColumn("th", F.least("th_a", "th_b"))
        .groupBy("seg_a", "seg_b", "th")
        .agg(
            F.sum(F.when(F.col("h") < F.col("th"), 1).otherwise(0)).alias("ct")
        )
    )
    est = (
        F.when(F.col("th") >= F.lit(space_int), F.col("ct").cast("double"))
        .otherwise(
            F.floor(
                F.col("ct").cast("double")
                * F.lit(_HASH_SPACE)
                / F.col("th").cast("double")
            )
        )
        .cast("bigint")
    )
    return pairs.select("seg_a", "seg_b", est.alias("est_overlap"))
