"""OLAP analytic surface: ROLLUP grouping sets, pivot, and the SQL window
function family (row_number / lag / lead / dense_rank / ntile).

The reference uses none of these (SURVEY.md §2.8: no OVER/ranking windows
anywhere) — they are the next ring of capability an ADS layer grows, and
they complete the engine's coverage of the standard warehouse query
surface. All three are pure Catalyst constructs with exact DuckDB oracles.

Scale notes: ROLLUP expands each input row into |levels| grouping-set rows
before the (map-side combinable) aggregation — same shuffle keyspace as the
finest level plus the small super-aggregate keys. Pivot with an explicit
value list is a single conditional aggregation (one shuffle, no second
pass to discover values — always pass the list at 100 TB). Window functions
shuffle once on the partition key; every function here is O(1) per row
within the sorted frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.functions.compare import (
    dsum,
    dsum_sql,
    pround,
    pround_sql,
)
from realtime_datawarehouse_spark.functions.timeutil import fmt_date
from realtime_datawarehouse_spark.plans.registry import query
from realtime_datawarehouse_spark.tables import table

ROLLUP_ORACLE = f"""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL')   AS status,
       {dsum_sql('o_totalprice')}       AS gmv,
       count(*)                         AS order_ct
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


@query("olap_rollup_gmv", oracle=ROLLUP_ORACLE)
def olap_rollup_gmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP (priority, status): per-pair, per-priority, and
    grand-total GMV in one aggregation pass. NULL grouping markers are
    projected to 'ALL' (no fixture value collides) so both engines hash
    the same strings."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            dsum(F.col("o_totalprice")).alias("gmv"),
            F.count("*").alias("order_ct"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gmv",
            "order_ct",
        )
    )


PIVOT_STATUSES = ("O", "F", "P")

PIVOT_ORACLE = f"""
SELECT o_orderpriority AS priority,
       {', '.join(
           f"CAST(sum(CASE WHEN o_orderstatus = '{s}' THEN 1 ELSE 0 END)"
           f" AS BIGINT) AS status_{s.lower()}_ct"
           for s in PIVOT_STATUSES
       )}
FROM orders
GROUP BY 1
"""


@query("olap_pivot_status", oracle=PIVOT_ORACLE)
def olap_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns per priority. The explicit value
    list makes the pivot a single conditional aggregation — no discovery
    pass over the data (mandatory at scale). Empty cells coalesce to 0 to
    match the conditional-sum oracle."""
    o = table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", list(PIVOT_STATUSES))
        .count()
    )
    return pivoted.select(
        "priority",
        *[
            F.coalesce(F.col(s), F.lit(0)).alias(f"status_{s.lower()}_ct")
            for s in PIVOT_STATUSES
        ],
    )


WINFN_ORACLE = """
SELECT event_id,
       user_id,
       row_number() OVER seq AS seq,
       CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER seq AS BIGINT) AS gap_us,
       lead(event_type) OVER seq AS next_type,
       dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS type_rank,
       ntile(4) OVER seq AS quartile
FROM events
WINDOW seq AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("olap_window_functions", oracle=WINFN_ORACLE)
def olap_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OVER-clause family on the event stream: sequence numbers,
    inter-event gaps (lag), next-event lookahead (lead), dense rank over a
    tie-heavy key, and quartile bucketing — one hash exchange on user_id,
    one sort, every function evaluated in the same window pass. Ordering is
    made total by (ts, event_id) so each engine's result is unique."""
    ev = table(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(seq).alias("seq"),
        (us - F.lag(us).over(seq)).cast("bigint").alias("gap_us"),
        F.lead("event_type").over(seq).alias("next_type"),
        F.dense_rank()
        .over(Window.partitionBy("user_id").orderBy("event_type"))
        .alias("type_rank"),
        F.ntile(4).over(seq).alias("quartile"),
    )


CUBE_ORACLE = f"""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL')   AS status,
       {dsum_sql('o_totalprice')}       AS gmv,
       count(*)                         AS order_ct
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


@query("olap_cube_gmv", oracle=CUBE_ORACLE)
def olap_cube_gmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all 2^k grouping sets in one pass (adds the
    per-status margin ROLLUP lacks). Same expansion mechanics and shuffle
    profile as the rollup."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            dsum(F.col("o_totalprice")).alias("gmv"),
            F.count("*").alias("order_ct"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gmv",
            "order_ct",
        )
    )


MEDIAN_ORACLE = """
SELECT o_orderpriority AS priority,
       floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)
             * 100 + 0.5) / 100.0 AS median_price,
       floor(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)
             * 100 + 0.5) / 100.0 AS p90_price
FROM orders
GROUP BY 1
"""


@query("olap_exact_percentile", oracle=MEDIAN_ORACLE)
def olap_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles (the sort-based counterpart of the GK
    sketch in sk_quantile_order_value): both engines interpolate
    lower + frac·(upper−lower) over the sorted group, rounded portably.
    At 100 TB this is the one you DON'T run — it buffers each group — but
    the contrast (exact per-group sort vs mergeable sketch) is the point
    of registering both."""
    o = table(spark, sf_dir, "orders")
    med = F.percentile(F.col("o_totalprice"), F.lit(0.5))
    p90 = F.percentile(F.col("o_totalprice"), F.lit(0.9))
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        (F.floor(med * 100 + F.lit(0.5)) / 100.0).alias("median_price"),
        (F.floor(p90 * 100 + F.lit(0.5)) / 100.0).alias("p90_price"),
    )


# --------------------------------------------------------------------------
# Round-3: behavioral analytics over the event stream — funnel conversion
# and retention cohorts, the two ADS queries every product warehouse ends
# up serving next to GMV.
# --------------------------------------------------------------------------

FUNNEL_ORACLE = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY 1
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON t1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= t1.t1
  GROUP BY 1
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON t2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= t2.t2
  GROUP BY 1
)
SELECT count(*)                                         AS n_view,
       CAST(count(t2.user_id) AS BIGINT)                AS n_click_after,
       CAST(count(t3.user_id) AS BIGINT)                AS n_purchase_after
FROM t1
LEFT JOIN t2 ON t2.user_id = t1.user_id
LEFT JOIN t3 ON t3.user_id = t1.user_id
"""


@query("olap_funnel_conversion", oracle=FUNNEL_ORACLE)
def olap_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel: each stage's time is the earliest
    qualifying event AT OR AFTER the previous stage's time (chain-of-mins;
    deterministic regardless of tie order since each stage is a min over
    an explicit predicate).

    Scale shape: three user-keyed aggregations and joins that all share
    the user_id partitioning (co-partitioned at scale, ReusedExchange in
    local mode); the final count is a single-row reduce. Per-user event
    arrays never materialize — the chain works on (user, min-ts) rows."""
    ev = table(spark, sf_dir, "events")
    t1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.where(F.col("event_type") == "click")
        .join(t1, "user_id")
        .where(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .where(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .agg(
            F.count("*").alias("n_view"),
            F.count("t2").alias("n_click_after"),
            F.count("t3").alias("n_purchase_after"),
        )
    )


RETENTION_MAX_OFFSET = 7

RETENTION_ORACLE = f"""
WITH first_day AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
  FROM events GROUP BY 1
)
SELECT strftime(f.cohort_day, '%Y-%m-%d')                   AS cohort_dt,
       CAST(datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS BIGINT)
                                                            AS day_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT)            AS active_users
FROM events e
JOIN first_day f ON f.user_id = e.user_id
WHERE datediff('day', f.cohort_day, CAST(e.ts AS DATE))
      BETWEEN 0 AND {RETENTION_MAX_OFFSET}
GROUP BY 1, 2
"""


@query("olap_retention_cohorts", oracle=RETENTION_ORACLE)
def olap_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-0 cohort (first event day per user) × day-offset retention
    counts for offsets 0..7 — the classic retention triangle.

    Scale shape: the cohort map is a user-keyed min aggregation joined
    back on the same partitioning; the triangle is a distinct-count over
    a (cohort, offset) keyspace of |days| × 8 — tiny. At 100 TB swap the
    exact countDistinct for the HLL sketch layer per partition budget."""
    ev = table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    offset = F.datediff(F.to_date("ts"), F.col("cohort_day"))
    return (
        ev.join(first_day, "user_id")
        .where(offset.between(0, RETENTION_MAX_OFFSET))
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_dt"),
            offset.cast("bigint").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# --------------------------------------------------------------------------
# Table profiling — the ANALYZE/stats pass (null counts, exact NDV,
# numeric ranges) every warehouse runs to feed its optimizer and data
# quality monitors. One scan, one reduce: all per-column aggregates
# compute in a single pass and the per-column rows are unpivoted from the
# one-row result (no per-column re-scan — at 100 TB that is the entire
# point; swap exact NDV for HLL per column when the budget demands).
# --------------------------------------------------------------------------

_PROFILE_COLS: list[tuple[str, str]] = [
    # (column, kind) — kind drives how min/max are surfaced numerically
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_min_max_sql(col: str, kind: str) -> tuple[str, str]:
    if kind == "num":
        return (
            f"CAST(min({col}) AS DOUBLE)",
            f"CAST(max({col}) AS DOUBLE)",
        )
    if kind == "ts":
        return (
            f"CAST(epoch(min({col})) AS DOUBLE)",
            f"CAST(epoch(max({col})) AS DOUBLE)",
        )
    return "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"


PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       CAST(count(*) - count({c}) AS BIGINT) AS null_ct,
       CAST(count(DISTINCT {c}) AS BIGINT)   AS ndv,
       {_profile_min_max_sql(c, k)[0]}       AS min_num,
       {_profile_min_max_sql(c, k)[1]}       AS max_num
FROM orders"""
    for c, k in _PROFILE_COLS
)


@query("olap_table_profile", oracle=PROFILE_ORACLE)
def olap_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of ``orders``: null count, exact NDV,
    numeric min/max (timestamps as epoch seconds, strings NULL). The
    oracle's UNION-ALL-per-column form is the semantic spec; the engine
    computes every aggregate in ONE scan and unpivots the 1-row result.

    Cost note: N exact countDistincts in one agg plan an Expand (N+1 row
    multiplication before the shuffle) — the price of exactness in one
    pass. The 100 TB profile swaps them for approx_count_distinct (HLL,
    no Expand, one buffer per column) and keeps everything else."""
    o = table(spark, sf_dir, "orders")

    def mm(c: str, kind: str) -> tuple[F.Column, F.Column]:
        if kind == "num":
            return (
                F.min(c).cast("double"),
                F.max(c).cast("double"),
            )
        if kind == "ts":
            return (
                F.unix_timestamp(F.min(c)).cast("double"),
                F.unix_timestamp(F.max(c)).cast("double"),
            )
        return (
            F.lit(None).cast("double"),
            F.lit(None).cast("double"),
        )

    aggs = []
    for c, k in _PROFILE_COLS:
        lo, hi = mm(c, k)
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            lo.alias(f"{c}__min"),
            hi.alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__null").alias("null_ct"),
                F.col(f"{c}__ndv").alias("ndv"),
                F.col(f"{c}__min").alias("min_num"),
                F.col(f"{c}__max").alias("max_num"),
            )
            for c, _ in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select(
        "r.col_name", "r.null_ct", "r.ndv", "r.min_num", "r.max_num"
    )


# --------------------------------------------------------------------------
# Data-quality expectation checks — declarative row constraints with
# violation counts (the Great-Expectations/dbt-test pattern): range,
# nullability, and referential integrity in one pass each.
# --------------------------------------------------------------------------

DQ_DATE_LO = "1990-01-01 00:00:00"
DQ_DATE_HI = "2030-01-01 00:00:00"

DQ_ORACLE = f"""
SELECT 'nonpositive_totalprice' AS rule,
       CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) AS violation_ct,
       CAST(count(*) AS BIGINT) AS checked_ct
FROM orders
UNION ALL
SELECT 'orderdate_out_of_range' AS rule,
       CAST(count(*) FILTER (WHERE o_orderdate IS NULL
             OR o_orderdate <  TIMESTAMP '{DQ_DATE_LO}'
             OR o_orderdate >= TIMESTAMP '{DQ_DATE_HI}') AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orphan_custkey' AS rule,
       CAST(count(*) AS BIGINT),
       (SELECT CAST(count(*) AS BIGINT) FROM orders)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


@query("olap_dq_checks", oracle=DQ_ORACLE)
def olap_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over ``orders``: value range,
    temporal sanity, and referential integrity (orphan FK via anti-join),
    each reported as (rule, violation_ct, checked_ct).

    Scale shape: the two predicate rules are conditional counts in ONE
    scan (no per-rule re-scan); the FK rule is a left-anti join that
    broadcasts the customer KEY projection — at 100 TB the same anti-join
    runs co-partitioned on custkey. Rules short-circuit nothing: DQ wants
    complete counts, not fail-fast."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    total = F.count("*")
    pred_counts = o.agg(
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("nonpos"),
        F.sum(
            F.when(
                F.col("o_orderdate").isNull()
                | (F.col("o_orderdate") < F.lit(DQ_DATE_LO).cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit(DQ_DATE_HI).cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("badrange"),
        total.alias("n"),
    )
    orphans = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("orphan_ct"))
        .crossJoin(F.broadcast(o.agg(total.alias("n2"))))
    )
    rules = pred_counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("nonpositive_totalprice").alias("rule"),
                    F.col("nonpos").alias("violation_ct"),
                    F.col("n").alias("checked_ct"),
                ),
                F.struct(
                    F.lit("orderdate_out_of_range").alias("rule"),
                    F.col("badrange").alias("violation_ct"),
                    F.col("n").alias("checked_ct"),
                ),
            )
        ).alias("r")
    ).select("r.rule", "r.violation_ct", "r.checked_ct")
    fk = orphans.select(
        F.lit("orphan_custkey").alias("rule"),
        F.col("orphan_ct").alias("violation_ct"),
        F.col("n2").alias("checked_ct"),
    )
    return rules.unionByName(fk)


# --------------------------------------------------------------------------
# Round-4: sessionization, behavioral transitions, and outlier flagging —
# the remaining event-stream analytics a warehouse serves beside funnels
# and retention.
# --------------------------------------------------------------------------

SESSION_GAP_S = 6 * 3600

SESSIONIZE_ORACLE = f"""
WITH seq AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   >= {SESSION_GAP_S * 1_000_000} THEN 1
              WHEN lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tagged AS (
  SELECT user_id, ts, value,
         CAST(sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS session_seq
  FROM seq
)
SELECT user_id, session_seq,
       min(ts) AS session_start,
       CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT)
         AS duration_s,
       count(*) AS n_events,
       {dsum_sql('value')} AS session_value
FROM tagged
GROUP BY 1, 2
"""


@query("olap_sessionize", oracle=SESSIONIZE_ORACLE)
def olap_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than SESSION_GAP_S; session ids are the running count of
    session-start markers (the standard lag + cumulative-sum construction).

    Scale shape: ONE hash exchange on user_id serves the lag window, the
    running sum, AND the final per-session aggregation (all three are
    user_id-prefixed partitionings — Catalyst reuses the sort). No
    per-user arrays are buffered; state per row is O(1). Duration is
    computed in integer microseconds end-to-end, so both engines divide
    exactly."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    # >= so a gap of exactly SESSION_GAP_S starts a new session — the same
    # half-open-window rule as Spark's builtin session_window (equivalence
    # pinned by test_sessionize_matches_builtin_session_window)
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us >= SESSION_GAP_S * 1_000_000), 1
    ).otherwise(0)
    tagged = ev.select(
        "user_id",
        "ts",
        "value",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )
    return tagged.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        # integer floor-division on both sides: DuckDB's CAST(double AS
        # BIGINT) rounds-half-even while Spark's truncates — // and div
        # agree exactly on the integer microsecond domain
        F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000")
        .alias("duration_s"),
        F.count("*").alias("n_events"),
        dsum(F.col("value")).alias("session_value"),
    )


TRANSITIONS_ORACLE = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_type
  FROM events
), counted AS (
  SELECT from_type, to_type, count(*) AS transition_ct
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, transition_ct,
       CAST(transition_ct * 1000000 // sum(transition_ct) OVER (
         PARTITION BY from_type
       ) AS BIGINT) AS p_micro
FROM counted
"""


@query("olap_event_transitions", oracle=TRANSITIONS_ORACLE)
def olap_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each ordered per-user
    event pair, count (from_type → to_type) and its per-source probability
    (micro-units via integer floor-division — exact in both engines, no
    float ratio to hash-diverge).

    Scale shape: the lead window shuffles once on user_id; the count
    aggregation is map-side combinable into a |types|² table; the
    probability normalization is a window over that TINY table, not the
    events. At 100 TB only the first exchange touches data-sized rows."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counted = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("transition_ct")
    )
    return counted.select(
        "from_type",
        "to_type",
        "transition_ct",
        F.expr("transition_ct * 1000000 div sum(transition_ct) over (partition by from_type)")
        .alias("p_micro"),
    )


ANOMALY_ORACLE = """
WITH stats AS (
  SELECT event_type,
         count(*) AS n,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sum_c
  FROM events
  GROUP BY 1
)
SELECT e.event_type,
       s.n AS total_ct,
       CAST(sum(CASE WHEN CAST(floor(e.value * 100 + 0.5) AS BIGINT) * s.n
                     > 2 * s.sum_c THEN 1 ELSE 0 END) AS BIGINT) AS outlier_ct,
       CAST(sum(CASE WHEN CAST(floor(e.value * 100 + 0.5) AS BIGINT) * s.n
                     > 2 * s.sum_c THEN 1 ELSE 0 END)
         * 1000000 // s.n AS BIGINT) AS outlier_micro
FROM events e JOIN stats s USING (event_type)
GROUP BY 1, 2, s.n, s.sum_c
"""


@query("olap_anomaly_outliers", oracle=ANOMALY_ORACLE)
def olap_anomaly_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type outlier flagging: events whose value exceeds 2× the type's
    mean. The comparison runs ENTIRELY in the integer domain
    (cents·n > 2·Σcents avoids the float division that makes mean-based
    predicates hash-diverge across engines — same discipline as dsum).

    Scale shape: two map-side-combinable aggregations over one scan
    lineage; the per-type stats table (|types| rows) broadcasts back. The
    second pass re-reads the source rather than caching — at 100 TB a scan
    is cheaper than materializing the event set, and the stats join is a
    broadcast hash join with no shuffle of the fact side."""
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum(cents).alias("sum_c")
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    flag = F.when(cents * F.col("n") > 2 * F.col("sum_c"), 1).otherwise(0)
    return (
        joined.groupBy("event_type", F.col("n").alias("total_ct"))
        .agg(F.sum(flag).alias("outlier_ct"))
        .select(
            "event_type",
            "total_ct",
            "outlier_ct",
            F.expr("outlier_ct * 1000000 div total_ct").alias("outlier_micro"),
        )
    )


TS_FILL_MIN_PRICE = 400_000.0

TS_FILL_ORACLE = f"""
WITH hv AS (
  SELECT o_orderpriority AS priority,
         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
         count(*) AS order_ct,
         {dsum_sql('o_totalprice')} AS gmv
  FROM orders
  WHERE o_totalprice > {TS_FILL_MIN_PRICE}
  GROUP BY 1, 2
), bounds AS (
  SELECT CAST(date_trunc('day', min(o_orderdate)) AS DATE) AS lo,
         CAST(date_trunc('day', max(o_orderdate)) AS DATE) AS hi
  FROM orders
), spine AS (
  SELECT p.priority, CAST(unnest(generate_series(b.lo, b.hi,
                                                 INTERVAL 1 DAY)) AS DATE) AS d
  FROM (SELECT DISTINCT o_orderpriority AS priority FROM orders) p, bounds b
)
SELECT s.priority,
       strftime(s.d, '%Y-%m-%d') AS d,
       coalesce(hv.order_ct, 0) AS order_ct,
       coalesce(hv.gmv, 0.0) AS gmv,
       coalesce(last_value(hv.gmv IGNORE NULLS) OVER (
         PARTITION BY s.priority ORDER BY s.d
         ROWS UNBOUNDED PRECEDING
       ), 0.0) AS locf_gmv
FROM spine s LEFT JOIN hv ON hv.priority = s.priority AND hv.d = s.d
"""


@query("olap_timeseries_fill", oracle=TS_FILL_ORACLE)
def olap_timeseries_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling over a sparse daily series (high-value
    orders): every (priority, day) cell exists, additive metrics zero-fill,
    and a last-observation-carried-forward column demonstrates state-style
    fill — the standard dashboard/time-series densification.

    Scale shape: the spine is |keys| × |days| rows built from a broadcast
    1-row min/max aggregate and a tiny distinct — never from the fact
    table; the daily aggregate shuffles once on (priority, day); the LOCF
    window partitions by priority over the ALREADY-SMALL spine. At 100 TB
    the fact scan dominates and everything downstream is dashboard-sized."""
    o = table(spark, sf_dir, "orders")
    hv = (
        o.where(F.col("o_totalprice") > TS_FILL_MIN_PRICE)
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("day", F.col("o_orderdate")).alias("d"),
        )
        .agg(
            F.count("*").alias("order_ct"),
            dsum(F.col("o_totalprice")).alias("gmv"),
        )
    )
    bounds = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
    )
    prios = o.select(
        F.col("o_orderpriority").alias("priority")
    ).distinct()
    spine = (
        prios.crossJoin(F.broadcast(bounds))
        .select(
            "priority",
            F.explode(
                F.sequence(
                    F.col("lo"), F.col("hi"), F.expr("interval 1 day")
                )
            ).alias("d"),
        )
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = spine.join(
        hv,
        (spine.priority == hv.priority) & (spine.d == hv.d),
        "left",
    ).select(
        spine.priority,
        spine.d,
        hv.order_ct,
        hv.gmv,
    )
    return joined.select(
        "priority",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.coalesce("order_ct", F.lit(0)).alias("order_ct"),
        F.coalesce("gmv", F.lit(0.0)).alias("gmv"),
        F.coalesce(
            F.last("gmv", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("locf_gmv"),
    )


GROUPING_SETS_ORACLE = f"""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL')   AS status,
       {dsum_sql('o_totalprice')}       AS gmv,
       count(*)                         AS order_ct
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
"""


@query("olap_grouping_sets", oracle=GROUPING_SETS_ORACLE)
def olap_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((priority), (status)) — the two 1-D margins
    WITHOUT the cross or grand-total rows rollup/cube would add: the
    grouping family member where the analyst names exactly the summaries
    wanted. Same Expand-then-aggregate mechanics (each row fans out to
    |sets| copies; the aggregation stays map-side combinable)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            dsum(F.col("o_totalprice")).alias("gmv"),
            F.count("*").alias("order_ct"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gmv",
            "order_ct",
        )
    )


HIST_BUCKETS = 10

HISTOGRAM_ORACLE = f"""
WITH b AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders
), bounds AS (
  SELECT min(cents) AS lo, max(cents) AS hi FROM b
), bucketed AS (
  SELECT CAST(least((cents - lo) * {HIST_BUCKETS} // (hi - lo + 1),
                    {HIST_BUCKETS - 1}) AS BIGINT) AS bucket,
         cents
  FROM b, bounds
)
SELECT bucket, count(*) AS ct,
       CAST(min(cents) AS BIGINT) AS lo_cents,
       CAST(max(cents) AS BIGINT) AS hi_cents
FROM bucketed GROUP BY 1
"""


@query("olap_histogram", oracle=HISTOGRAM_ORACLE)
def olap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width value histogram of order totals, computed ENTIRELY in
    the integer domain: cents quantization + integer floor-division
    bucketing means both engines place every row in the identical bucket
    (a double-width division can flip boundary rows between engines).

    Scale shape: one tiny min/max aggregate broadcasts back; bucketing is
    a map expression; the final count shuffles |buckets| keys. This is
    the profiling histogram every column-stats pass runs at 100 TB."""
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    b = o.select(cents.alias("cents"))
    bounds = b.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    return (
        b.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.expr(
                    f"(cents - lo) * {HIST_BUCKETS} div (hi - lo + 1)"
                ),
                F.lit(HIST_BUCKETS - 1).cast("bigint"),
            ).alias("bucket"),
            "cents",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("ct"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


ABTEST_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(user_id % 2 AS BIGINT) AS variant,
         max(CASE WHEN event_type = 'purchase' AND value > 140.0
                  THEN 1 ELSE 0 END) AS conv
  FROM events
  GROUP BY 1
), s AS (
  SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS conv_a,
         sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
         sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS conv_b
  FROM u
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
       floor(((CAST(conv_a AS DOUBLE) / n_a) - (CAST(conv_b AS DOUBLE) / n_b))
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)) * 10000 + 0.5) / 10000.0 AS z
FROM s
"""


@query("olap_abtest_ztest", oracle=ABTEST_ORACLE)
def olap_abtest_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment readout (variant =
    user_id parity, conversion = any purchase event): the significance
    aggregate every experimentation platform serves. Every input to the
    float expression is an exact integer count and sqrt is IEEE-exact, so
    with an identically-parenthesized expression tree both engines emit
    the same z bit-for-bit (then portably rounded).

    Scale shape: one user-keyed aggregation (map-side combinable max), one
    4-counter reduce to a single row — the z arithmetic runs on scalars."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("bigint").alias("variant"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 140.0),
                1,
            ).otherwise(0)
        ).alias("conv"),
    )
    s = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return s.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        (F.floor((p_a - p_b) / se * 10_000 + F.lit(0.5)) / 10_000.0).alias(
            "z"
        ),
    )


BASKET_MIN_PAIR_CT = 2

BASKET_LIFT_ORACLE = f"""
WITH b AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n AS (
  SELECT count(DISTINCT ok) AS n_orders FROM b
), item AS (
  SELECT brand, count(*) AS ct FROM b GROUP BY 1
), pair AS (
  SELECT a.brand AS brand_a, b2.brand AS brand_b, count(*) AS pair_ct
  FROM b a JOIN b b2 ON a.ok = b2.ok AND a.brand < b2.brand
  GROUP BY 1, 2
)
SELECT p.brand_a, p.brand_b, p.pair_ct,
       floor(CAST(p.pair_ct AS DOUBLE) * n.n_orders
             / (CAST(ia.ct AS DOUBLE) * ib.ct) * 10000 + 0.5) / 10000.0
         AS lift
FROM pair p
JOIN item ia ON ia.brand = p.brand_a
JOIN item ib ON ib.brand = p.brand_b
CROSS JOIN n
WHERE p.pair_ct >= {BASKET_MIN_PAIR_CT}
"""


@query("olap_basket_lift", oracle=BASKET_LIFT_ORACLE)
def olap_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: co-occurrence lift per brand pair
    (lift = P(a,b) / P(a)P(b), the Apriori/recommendation primitive).
    All probabilities stay integer counts until ONE double expression,
    portably rounded — no per-engine ratio drift.

    Scale shape: baskets deduplicate on one (order, item) shuffle; pair
    generation is within-basket combinatorics via the sorted-members
    explode (no self-join re-computing the basket build — same pattern as
    the dedup inverted index); pair counts and item counts are map-side
    combinable; the lift join touches the |items|² count table only. The
    support threshold is the Apriori prune — at 100 TB it drops the long
    tail before the count table materializes."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    baskets = b.groupBy("ok").agg(
        F.array_sort(F.collect_set("brand")).alias("items")
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("items"),
            lambda x, i: F.transform(
                F.slice(F.col("items"), i + 2, F.size(F.col("items"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pair = (
        baskets.select(F.explode(pairs_arr).alias("pr"))
        .groupBy(
            F.col("pr.a").alias("brand_a"), F.col("pr.b").alias("brand_b")
        )
        .agg(F.count("*").alias("pair_ct"))
        .where(F.col("pair_ct") >= BASKET_MIN_PAIR_CT)
    )
    item = b.groupBy("brand").agg(F.count("*").alias("ct"))
    n = b.agg(F.countDistinct("ok").alias("n_orders"))
    ia = item.select(
        F.col("brand").alias("ia_brand"), F.col("ct").alias("ct_a")
    )
    ib = item.select(
        F.col("brand").alias("ib_brand"), F.col("ct").alias("ct_b")
    )
    lift = (
        F.col("pair_ct").cast("double")
        * F.col("n_orders")
        / (F.col("ct_a").cast("double") * F.col("ct_b"))
    )
    return (
        pair.join(F.broadcast(ia), F.col("brand_a") == F.col("ia_brand"))
        .join(F.broadcast(ib), F.col("brand_b") == F.col("ib_brand"))
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "pair_ct",
            (F.floor(lift * 10_000 + F.lit(0.5)) / 10_000.0).alias("lift"),
        )
    )


RFM_ASOF = "1998-08-02 00:00:00"  # analysis date: just past the fixture range

RFM_ORACLE = f"""
WITH c AS (
  SELECT o_custkey AS custkey,
         CAST((epoch_us(TIMESTAMP '{RFM_ASOF}') - epoch_us(max(o_orderdate)))
              // 86400000000 AS BIGINT) AS recency_days,
         count(*) AS frequency,
         {dsum_sql('o_totalprice')} AS monetary
  FROM orders
  GROUP BY 1
), th AS (
  SELECT floor(percentile_cont(1.0/3) WITHIN GROUP (ORDER BY recency_days)
               * 100 + 0.5) / 100.0 AS r1,
         floor(percentile_cont(2.0/3) WITHIN GROUP (ORDER BY recency_days)
               * 100 + 0.5) / 100.0 AS r2,
         floor(percentile_cont(1.0/3) WITHIN GROUP (ORDER BY frequency)
               * 100 + 0.5) / 100.0 AS f1,
         floor(percentile_cont(2.0/3) WITHIN GROUP (ORDER BY frequency)
               * 100 + 0.5) / 100.0 AS f2,
         floor(percentile_cont(1.0/3) WITHIN GROUP (ORDER BY monetary)
               * 100 + 0.5) / 100.0 AS m1,
         floor(percentile_cont(2.0/3) WITHIN GROUP (ORDER BY monetary)
               * 100 + 0.5) / 100.0 AS m2
  FROM c
)
SELECT c.custkey, c.recency_days, c.frequency, c.monetary,
       CASE WHEN c.recency_days <= th.r1 THEN 3
            WHEN c.recency_days <= th.r2 THEN 2 ELSE 1 END AS r_score,
       CASE WHEN c.frequency <= th.f1 THEN 1
            WHEN c.frequency <= th.f2 THEN 2 ELSE 3 END AS f_score,
       CASE WHEN c.monetary <= th.m1 THEN 1
            WHEN c.monetary <= th.m2 THEN 2 ELSE 3 END AS m_score
FROM c, th
"""


@query("olap_rfm_segmentation", oracle=RFM_ORACLE)
def olap_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency (integer days via
    floor-division — exact both engines), frequency, monetary (dsum), each
    scored 1–3 against broadcast tertile thresholds (recent = high score).

    Scale shape: one customer-keyed aggregation over the fact scan; the
    six thresholds are ONE tiny aggregate broadcast back (the same
    no-global-sort discipline as text_perplexity_buckets — an ntile
    formulation would single-partition-sort every customer row)."""
    o = table(spark, sf_dir, "orders")
    c = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.expr(
            f"(unix_micros(TIMESTAMP '{RFM_ASOF}')"
            " - unix_micros(max(o_orderdate))) div 86400000000"
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        dsum(F.col("o_totalprice")).alias("monetary"),
    )
    def _t(col, q):
        return (
            F.floor(
                F.percentile(F.col(col).cast("double"), F.lit(q)) * 100
                + F.lit(0.5)
            )
            / 100.0
        )
    th = c.agg(
        _t("recency_days", 1.0 / 3).alias("r1"),
        _t("recency_days", 2.0 / 3).alias("r2"),
        _t("frequency", 1.0 / 3).alias("f1"),
        _t("frequency", 2.0 / 3).alias("f2"),
        _t("monetary", 1.0 / 3).alias("m1"),
        _t("monetary", 2.0 / 3).alias("m2"),
    )
    return c.crossJoin(F.broadcast(th)).select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.when(F.col("recency_days") <= F.col("r1"), 3)
        .when(F.col("recency_days") <= F.col("r2"), 2)
        .otherwise(1)
        .alias("r_score"),
        F.when(F.col("frequency") <= F.col("f1"), 1)
        .when(F.col("frequency") <= F.col("f2"), 2)
        .otherwise(3)
        .alias("f_score"),
        F.when(F.col("monetary") <= F.col("m1"), 1)
        .when(F.col("monetary") <= F.col("m2"), 2)
        .otherwise(3)
        .alias("m_score"),
    )


BAND_CENTS = 2_000  # |price difference| <= $20.00

BAND_JOIN_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey AS okey, o_orderpriority AS priority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_totalprice > 450000
)
SELECT a.priority, a.okey AS okey_a, b.okey AS okey_b,
       CAST(abs(a.cents - b.cents) AS BIGINT) AS diff_cents
FROM o a JOIN o b
  ON a.priority = b.priority AND a.okey < b.okey
 AND abs(a.cents - b.cents) <= {BAND_CENTS}
"""


@query("ext_value_band_join", oracle=BAND_JOIN_ORACLE)
def ext_value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric band (range) self-join: same-priority order pairs within
    $20 of each other — the value-proximity analog of the interval join
    (J8), e.g. price-matching or near-duplicate transaction detection.

    Scale shape: a naive theta join is a per-priority cross product. The
    bucket trick makes it an EQUI-join: integer cents bucketized by the
    band width, the left side keyed by its bucket, the right side
    replicated to {b−1, b, b+1} — any qualifying pair shares a join key,
    the exact band predicate then filters. ONE hash shuffle whose key
    space is (priority × buckets); replication factor is exactly 3. The
    selective price filter also prunes both scans (PushedFilters)."""
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 450000)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderpriority").alias("priority"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
    )
    a = o.select(
        "okey", "priority", "cents", (F.col("cents") / BAND_CENTS).cast("bigint").alias("bucket")
    )
    b = o.select(
        F.col("okey").alias("okey_b"),
        F.col("priority").alias("priority_b"),
        F.col("cents").alias("cents_b"),
        F.explode(
            F.array(
                (F.col("cents") / BAND_CENTS).cast("bigint") - 1,
                (F.col("cents") / BAND_CENTS).cast("bigint"),
                (F.col("cents") / BAND_CENTS).cast("bigint") + 1,
            )
        ).alias("bucket"),
    )
    return (
        a.join(
            b,
            (a.priority == b.priority_b)
            & (a.bucket == b.bucket)
            & (a.okey < b.okey_b)
            & (F.abs(a.cents - b.cents_b) <= BAND_CENTS),
        )
        .select(
            "priority",
            F.col("okey").alias("okey_a"),
            "okey_b",
            F.abs(F.col("cents") - F.col("cents_b")).alias("diff_cents"),
        )
    )


PARETO_ORACLE = f"""
WITH c AS (
  SELECT o_custkey AS custkey, {dsum_sql('o_totalprice')} AS monetary
  FROM orders GROUP BY 1
), th AS (
  SELECT floor(percentile_cont(0.9) WITHIN GROUP (ORDER BY monetary)
               * 100 + 0.5) / 100.0 AS p90,
         floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY monetary)
               * 100 + 0.5) / 100.0 AS p50
  FROM c
), seg AS (
  SELECT CASE WHEN c.monetary > th.p90 THEN 'top10'
              WHEN c.monetary > th.p50 THEN 'mid40'
              ELSE 'bottom50' END AS segment,
         c.monetary
  FROM c, th
), s AS (
  SELECT segment, count(*) AS customer_ct,
         CAST(sum(CAST(floor(monetary * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM seg GROUP BY 1
), tot AS (
  SELECT sum(cents) AS total FROM s
)
SELECT s.segment, s.customer_ct,
       floor(s.cents / 100.0 * 100 + 0.5) / 100.0 AS revenue,
       CAST(s.cents * 1000000 // tot.total AS BIGINT) AS share_micro
FROM s, tot
"""


@query("olap_pareto_segments", oracle=PARETO_ORACLE)
def olap_pareto_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the 80/20 readout): customers split into
    top-10% / mid-40% / bottom-50% spend segments, with each segment's
    revenue share in integer micro-units. Thresholds are broadcast
    percentiles over the per-customer totals (no global sort, no ntile);
    shares divide exact int64 cent sums."""
    o = table(spark, sf_dir, "orders")
    c = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        dsum(F.col("o_totalprice")).alias("monetary")
    )
    th = c.agg(
        (
            F.floor(
                F.percentile(F.col("monetary"), F.lit(0.9)) * 100 + F.lit(0.5)
            )
            / 100.0
        ).alias("p90"),
        (
            F.floor(
                F.percentile(F.col("monetary"), F.lit(0.5)) * 100 + F.lit(0.5)
            )
            / 100.0
        ).alias("p50"),
    )
    cents = F.floor(F.col("monetary") * 100 + F.lit(0.5)).cast("bigint")
    seg = c.crossJoin(F.broadcast(th)).select(
        F.when(F.col("monetary") > F.col("p90"), "top10")
        .when(F.col("monetary") > F.col("p50"), "mid40")
        .otherwise("bottom50")
        .alias("segment"),
        cents.alias("cents"),
    )
    s = seg.groupBy("segment").agg(
        F.count("*").alias("customer_ct"), F.sum("cents").alias("cents")
    )
    tot = s.agg(F.sum("cents").alias("total"))
    return s.crossJoin(F.broadcast(tot)).select(
        "segment",
        "customer_ct",
        (F.floor(F.col("cents") / 100.0 * 100 + F.lit(0.5)) / 100.0).alias(
            "revenue"
        ),
        F.expr("cents * 1000000 div total").alias("share_micro"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------------

CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), w AS (
  SELECT event_type, dt, cents,
         count(*) OVER (PARTITION BY event_type) AS n_days,
         row_number() OVER (PARTITION BY event_type ORDER BY dt) AS i,
         sum(cents) OVER (PARTITION BY event_type ORDER BY dt
                          ROWS UNBOUNDED PRECEDING) AS prefix,
         sum(cents) OVER (PARTITION BY event_type) AS total
  FROM daily
), c AS (
  SELECT event_type, dt, n_days,
         abs(n_days * prefix - i * total) AS abs_cusum,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(n_days * prefix - i * total) DESC,
                                     dt) AS rnk
  FROM w
)
SELECT event_type, dt AS changepoint_dt,
       CAST(abs_cusum AS BIGINT) AS max_abs_cusum_scaled,
       CAST(n_days AS BIGINT) AS n_days
FROM c WHERE rnk = 1
"""


@query("olap_cusum_drift", oracle=CUSUM_ORACLE)
def olap_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detector over the daily value series per event
    type: the day d maximizing |n·prefix_d − i_d·total| — the max-CUSUM
    estimate of where the series' mean shifted (Page's test statistic with
    the mean multiplied through, so every step is exact int64; no float
    drift can move the argmax).

    Shape: one map-combinable (type, day) aggregation, then window
    functions over the tiny daily table partitioned by type — the raw
    event scan never re-shuffles. Int64 headroom: |n·prefix| caps at
    n_days × total_cents; at 100 TB revenue scale switch the two products
    to decimal(38,0) — same plan, wider accumulator."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("dt"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("c"),
        )
        .groupBy("event_type", "dt")
        .agg(F.sum("c").alias("cents"))
    )
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("dt")
    w = daily.select(
        "event_type",
        "dt",
        F.count("*").over(wp).alias("n_days"),
        F.row_number().over(wo).alias("i"),
        F.sum("cents").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "prefix"
        ),
        F.sum("cents").over(wp).alias("total"),
    )
    abs_cusum = F.abs(
        F.col("n_days") * F.col("prefix") - F.col("i") * F.col("total")
    )
    rnk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            abs_cusum.desc(), F.col("dt")
        )
    )
    return (
        w.select(
            "event_type",
            F.col("dt").alias("changepoint_dt"),
            abs_cusum.alias("max_abs_cusum_scaled"),
            F.col("n_days").cast("bigint").alias("n_days"),
            rnk.alias("rnk"),
        )
        .where(F.col("rnk") == 1)
        .drop("rnk")
    )


# ---------------------------------------------------------------------------
# Sequence pattern matching (batch MATCH_RECOGNIZE emulation)
# ---------------------------------------------------------------------------

# v→c→p with no intervening error: the conversion-journey pattern. Kept to
# a greedy leftmost regex subset where Java (Spark) and RE2 (DuckDB) agree
# (same discipline as text_pii_redact).
SEQ_PATTERN = "v[^e]*c[^e]*p"

SEQ_MATCH_ORACLE = f"""
WITH j AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS journey
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(len(journey) AS BIGINT) AS journey_len,
       CAST(len(regexp_extract_all(journey, '{SEQ_PATTERN}')) AS BIGINT)
         AS match_ct
FROM j
"""


@query("olap_sequence_match", oracle=SEQ_MATCH_ORACLE)
def olap_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching in batch: per user,
    count non-overlapping view→click→purchase journeys with no intervening
    error event. The event stream collapses to one ordered initial-string
    per user (the classic funnel-pattern reduction), then a single greedy
    regex pass counts matches — the batch emulation of Flink CEP /
    SQL:2016 MATCH_RECOGNIZE (the streaming twin is ST8's event-time CEP
    kernel, streaming/jobs.py).

    Shape: one user-keyed shuffle; per-user state is the journey string,
    bounded by that user's activity (cap or window it for adversarial
    skew at 100 TB). The regex runs inside codegen — no Python."""
    ev = table(spark, sf_dir, "events")
    j = (
        ev.select(
            "user_id",
            F.struct(
                "ts", "event_id", F.substring("event_type", 1, 1).alias("ini")
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("s")), lambda x: x["ini"]
                ),
                "",
            ).alias("journey")
        )
    )
    return j.select(
        "user_id",
        F.length("journey").cast("bigint").alias("journey_len"),
        F.regexp_count(F.col("journey"), F.lit(SEQ_PATTERN))
        .cast("bigint")
        .alias("match_ct"),
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view refresh algebra
# ---------------------------------------------------------------------------

INCR_BATCHES = 4

INCR_GMV_ORACLE = f"""
SELECT strftime(o_orderdate, '%Y-%m-%d') AS dt,
       {dsum_sql('o_totalprice')} AS gmv,
       count(*) AS order_ct
FROM orders GROUP BY 1
"""


@query("olap_incremental_gmv", oracle=INCR_GMV_ORACLE)
def olap_incremental_gmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily GMV computed as an incremental materialized view would be:
    each ingest batch contributes a PARTIAL aggregate (sum-of-cents,
    count), and the view is the MERGE of partials — never a re-scan of
    history. The batch id here simulates arrival slices; the refresh
    algebra (sum/count are commutative monoids; the merge is another sum)
    is what makes the DWS layer incrementally maintainable — append a new
    batch's partials and re-merge only the touched days.
    tests/test_plans.py::test_incremental_gmv_refresh_parity drives the
    real thing over the versioned table store (append → delta-merge →
    parity with full recompute).

    The oracle is the direct one-pass aggregate — merged partials must be
    indistinguishable from recomputation (exact int64 cents, order-free)."""
    o = table(spark, sf_dir, "orders")
    partials = (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("dt"),
            (F.col("o_orderkey") % INCR_BATCHES).alias("batch_id"),
            F.floor(F.col("o_totalprice") * 1_000_000 + F.lit(0.5))
            .cast("bigint")
            .alias("micros"),
        )
        .groupBy("dt", "batch_id")
        .agg(
            F.sum("micros").alias("p_micros"),
            F.count("*").alias("p_ct"),
        )
    )
    return partials.groupBy("dt").agg(
        (F.sum("p_micros") / 1_000_000.0).alias("gmv"),
        F.sum("p_ct").alias("order_ct"),
    )


# ---------------------------------------------------------------------------
# Bitmap distinct state (precomputed-UV pattern)
# ---------------------------------------------------------------------------

BITMAP_UV_ORACLE = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt,
         count(DISTINCT user_id) AS day_uv
  FROM events GROUP BY 1, 2
), per_type AS (
  SELECT event_type, count(*) AS days_active,
         CAST(sum(day_uv) AS BIGINT) AS sum_daily_uv
  FROM daily GROUP BY 1
), merged AS (
  SELECT event_type, count(DISTINCT user_id) AS distinct_uv
  FROM events GROUP BY 1
)
SELECT p.event_type, p.days_active, p.sum_daily_uv, m.distinct_uv
FROM per_type p JOIN merged m USING (event_type)
"""


@query("olap_bitmap_uv_state", oracle=BITMAP_UV_ORACLE)
def olap_bitmap_uv_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user state as mergeable BITMAPS (the ClickHouse /
    Doris precomputed-UV pattern): the raw events are scanned ONCE into
    per-(type, day, bucket) user bitmaps; every readout after that —
    per-day UV, cross-day distinct UV — is bitmap arithmetic over the
    state, never a re-scan. sum_daily_uv vs distinct_uv quantifies the
    double-counting a naive sum-of-daily-UVs commits.

    Scale: state size is |keys| × |user-space| / 32768 buckets of ≤ 4 KB
    bitmaps; bitmap_construct_agg / bitmap_or_agg are map-side combinable,
    so the shuffle carries bitmap buckets, not user ids. This is A5's
    third answer (exact sets → exact bitmaps → HLL) on the memory/accuracy
    curve — exact like the set, mergeable-small like the sketch for dense
    int key spaces."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("dt"),
        F.col("user_id"),
    )
    state = ev.groupBy(
        "event_type",
        "dt",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    daily = state.groupBy("event_type", "dt").agg(
        F.expr("sum(bitmap_count(bm))").alias("day_uv")
    )
    per_type = daily.groupBy("event_type").agg(
        F.count("*").alias("days_active"),
        F.sum("day_uv").alias("sum_daily_uv"),
    )
    merged = (
        state.groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("event_type")
        .agg(F.expr("sum(bitmap_count(bm))").alias("distinct_uv"))
    )
    return per_type.join(merged, "event_type")


# ---------------------------------------------------------------------------
# Per-key linear trend (exact integer least squares)
# ---------------------------------------------------------------------------

FORECAST_ORACLE = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT event_type, cents,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY dt)
              AS BIGINT) AS i
  FROM daily
), s AS (
  SELECT event_type, count(*) AS n, sum(i) AS sx, sum(cents) AS sy,
         sum(i * cents) AS sxy, sum(i * i) AS sxx
  FROM idx GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor((CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)) * 10000 + 0.5)
            AS BIGINT) AS slope_cents_e4,
       CAST(floor(((CAST(sy AS DOUBLE)
                    - (CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE))
                      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) * 100 + 0.5)
            AS BIGINT) AS intercept_cents_e2
FROM s
"""


@query("olap_forecast_linear", oracle=FORECAST_ORACLE)
def olap_forecast_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key linear trend over the daily series via exact integer power
    sums (n, Σx, Σy, Σxy, Σx²): the five sums are plain int64 aggregates —
    order-free and map-side combinable — and only the final slope /
    intercept division runs in floating point, an identical IEEE expression
    on both engines (never regr_slope, whose internal float accumulation is
    order-dependent). Output scaled-integer (slope ×1e4, intercept ×1e2
    cents) so the hash compare is bit-exact.

    Scale: one (key, day) aggregation, one tiny per-key reduce. Int64
    headroom: Σ i·cents caps at n²·max_daily_cents — switch the product
    sums to decimal(38,0) beyond ~1e14 daily cents."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("dt"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("c"),
        )
        .groupBy("event_type", "dt")
        .agg(F.sum("c").alias("cents"))
    )
    idx = daily.select(
        "event_type",
        "cents",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("dt"))
        .cast("bigint")
        .alias("i"),
    )
    s = idx.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("i").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("i") * F.col("cents")).alias("sxy"),
        F.sum(F.col("i") * F.col("i")).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.floor(slope * 10000 + F.lit(0.5)).cast("bigint").alias(
            "slope_cents_e4"
        ),
        F.floor(intercept * 100 + F.lit(0.5)).cast("bigint").alias(
            "intercept_cents_e2"
        ),
    )


# ---------------------------------------------------------------------------
# Bitmap audience overlap (exact set algebra over bitmap state)
# ---------------------------------------------------------------------------

AUDIENCE_OVERLAP_ORACLE = f"""
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
), uv AS (
  SELECT event_type, count(*) AS uv FROM tu GROUP BY 1
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM uv a JOIN uv b ON a.event_type < b.event_type
), ov AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS overlap_uv
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       CAST(COALESCE(o.overlap_uv, 0) AS BIGINT) AS overlap_uv,
       CAST(ua.uv + ub.uv - COALESCE(o.overlap_uv, 0) AS BIGINT) AS union_uv,
       {pround_sql("COALESCE(o.overlap_uv, 0) / (ua.uv + ub.uv - COALESCE(o.overlap_uv, 0))", 4)} AS jaccard
FROM pairs p
LEFT JOIN ov o ON o.type_a = p.type_a AND o.type_b = p.type_b
JOIN uv ua ON ua.event_type = p.type_a
JOIN uv ub ON ub.event_type = p.type_b
"""


@query("olap_bitmap_audience_overlap", oracle=AUDIENCE_OVERLAP_ORACLE)
def olap_bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types as exact bitmap set
    algebra: one scan builds per-(type, bucket) user bitmaps, then every
    |A∩B| is a bitmap AND over state — the raw events are never rejoined
    (the user-level self-join in the oracle is exactly the shuffle this
    operator exists to avoid). A (pair, bucket) group holding fewer than
    two bitmaps has an empty intersection — bitmap_and_agg over one row
    would wrongly pass it through, hence the n=2 guard.

    Scale: candidate volume is |pairs| × |buckets| of ≤ 4 KB bitmaps —
    independent of event count; union/jaccard come free by
    inclusion-exclusion from the per-type counts."""
    ev = table(spark, sf_dir, "events")
    state = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    uv = state.groupBy("event_type").agg(
        F.expr("sum(bitmap_count(bm))").alias("uv")
    )
    pairs = (
        uv.select(F.col("event_type").alias("type_a"))
        .join(
            uv.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    cand = state.join(
        F.broadcast(pairs),
        (F.col("event_type") == F.col("type_a"))
        | (F.col("event_type") == F.col("type_b")),
    )
    inter = (
        cand.groupBy("type_a", "type_b", "bkt")
        .agg(
            F.count("*").alias("n"),
            F.expr("bitmap_and_agg(bm)").alias("bma"),
        )
        .select(
            "type_a",
            "type_b",
            F.when(F.col("n") == 2, F.expr("bitmap_count(bma)"))
            .otherwise(F.lit(0))
            .alias("inter_ct"),
        )
        .groupBy("type_a", "type_b")
        .agg(F.sum("inter_ct").alias("overlap_uv"))
    )
    out = (
        pairs.join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .join(
            F.broadcast(uv.select(F.col("event_type").alias("type_a"),
                                  F.col("uv").alias("uv_a"))),
            "type_a",
        )
        .join(
            F.broadcast(uv.select(F.col("event_type").alias("type_b"),
                                  F.col("uv").alias("uv_b"))),
            "type_b",
        )
    )
    union_uv = F.col("uv_a") + F.col("uv_b") - F.coalesce(
        F.col("overlap_uv"), F.lit(0)
    )
    return out.select(
        "type_a",
        "type_b",
        F.coalesce(F.col("overlap_uv"), F.lit(0)).alias("overlap_uv"),
        union_uv.alias("union_uv"),
        pround(
            F.coalesce(F.col("overlap_uv"), F.lit(0)) / union_uv, 4
        ).alias("jaccard"),
    )


# --- round-4 (second half): OHLC time-bars over the event stream ----------

OHLC_ORACLE = f"""
WITH e AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar_start,
         value,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
           lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
  FROM events
)
SELECT event_type, bar_start,
       arg_min(value, ord) AS open,
       max(value)          AS high,
       min(value)          AS low,
       arg_max(value, ord) AS close,
       {dsum_sql('value')} AS volume,
       count(*)            AS trade_ct
FROM e GROUP BY 1, 2
"""


@query("olap_ohlc_bars", oracle=OHLC_ORACLE)
def olap_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time-bars: per (event_type, hour) open/high/low/close of
    ``value`` plus summed volume — the market-data rollup every tick store
    serves, and the time-bucketed first/last pattern (ClickHouse
    argMin/argMax, TimescaleDB first/last) the reference's ADS layer
    would grow next.

    Scale shape: ONE map-side-combinable aggregation — ``min_by``/
    ``max_by`` carry a single (value, order-key) pair per partition, so
    the shuffle is O(bars), never O(ticks). The order key is a
    zero-padded ``epoch_us || event_id`` string: lexicographic order
    equals numeric order for fixed-width non-negatives, making first/last
    picks total-ordered and engine-identical (DuckDB's arg_min rejects
    composite keys, so a composed scalar replaces struct ordering).
    """
    ev = table(spark, sf_dir, "events")
    ordk = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "bar_start"
            ),
            "value",
            ordk.alias("ordk"),
        )
        .groupBy("event_type", "bar_start")
        .agg(
            F.min_by("value", "ordk").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ordk").alias("close"),
            dsum(F.col("value")).alias("volume"),
            F.count("*").alias("trade_ct"),
        )
    )


# ClickHouse-parity windowFunnel: deepest view→click→purchase level where
# every step falls within WF_WINDOW of the ANCHOR view event (the classic
# bounded-window funnel, vs olap_funnel_conversion's unconstrained chain).
WF_WINDOW_S = 24 * 3600  # discriminative on the sparse fixture: levels 1/2/3 all populated

_WF_ORD = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || "
    "lpad(CAST(event_id AS VARCHAR), 12, '0')"
)

WINDOW_FUNNEL_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, {_WF_ORD} AS okey
  FROM events
), nx AS (
  SELECT user_id, event_type, us, okey,
         min(CASE WHEN event_type = 'click'    THEN okey END) OVER wafter
           AS nk_click,
         min(CASE WHEN event_type = 'purchase' THEN okey END) OVER wafter
           AS nk_purch
  FROM e
  WINDOW wafter AS (PARTITION BY user_id ORDER BY okey DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), anchors AS (
  SELECT a.user_id, a.us AS a_us,
         CAST(substr(a.nk_click, 1, 20) AS BIGINT) AS click_us,
         CAST(substr(c.nk_purch, 1, 20) AS BIGINT) AS purch_us
  FROM nx a
  LEFT JOIN nx c ON c.user_id = a.user_id AND c.okey = a.nk_click
  WHERE a.event_type = 'view'
), lv AS (
  SELECT user_id,
         max(CASE
               WHEN purch_us IS NOT NULL
                    AND purch_us - a_us <= {WF_WINDOW_S} * CAST(1000000 AS BIGINT) THEN 3
               WHEN click_us IS NOT NULL
                    AND click_us - a_us <= {WF_WINDOW_S} * CAST(1000000 AS BIGINT) THEN 2
               ELSE 1
             END) AS funnel_level
  FROM anchors GROUP BY 1
)
SELECT funnel_level, count(*) AS user_ct FROM lv GROUP BY 1
"""


@query("olap_window_funnel", oracle=WINDOW_FUNNEL_ORACLE)
def olap_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-window funnel (ClickHouse ``windowFunnel`` semantics): per
    user, the deepest view→click→purchase chain whose every step lands
    within WF_WINDOW_S (24 h) of the ANCHOR view; report user counts per
    level. Unlike ``olap_funnel_conversion`` (unconstrained chain of
    mins), each view event anchors its own window and the user scores
    the max over anchors — late-arriving conversions outside the window
    correctly don't count.

    Scale shape: both lookahead columns (earliest later click / later
    purchase) come from ONE window spec as running mins over the
    descending total order — no per-anchor scan, no quadratic pair work;
    one hash self-join fetches the purchase lookahead AT the matched
    click row (fixed funnel depth = fixed join count, each on
    (user, okey)); the level rollups are map-side combinable. The
    self-join instantiates the windowed subtree on both sides (Catalyst
    reuses the scan/shuffle where identical; at 100 TB materialize the
    lookahead table once — checkpoint or intermediate table — before the
    step joins). The okey (epoch_us‖event_id zero-padded) gives a total
    order so ties are engine-identical, and step timestamps parse back
    out of the key prefix — no extra join per step."""
    ev = table(spark, sf_dir, "events")
    okey = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    e = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        okey.alias("okey"),
    )
    wafter = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("okey"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nx = e.select(
        "user_id",
        "event_type",
        "us",
        "okey",
        F.min(
            F.when(F.col("event_type") == "click", F.col("okey"))
        ).over(wafter).alias("nk_click"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("okey"))
        ).over(wafter).alias("nk_purch"),
    )
    a = nx.where(F.col("event_type") == "view").select(
        "user_id", F.col("us").alias("a_us"), F.col("nk_click")
    )
    c = nx.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"),
        F.col("okey").alias("c_okey"),
        F.col("nk_purch"),
    )
    anchors = a.join(
        c.hint("shuffle_hash"),
        (F.col("user_id") == F.col("c_uid"))
        & (F.col("nk_click") == F.col("c_okey")),
        "left",
    ).select(
        "user_id",
        "a_us",
        F.substring("nk_click", 1, 20).cast("bigint").alias("click_us"),
        F.substring("nk_purch", 1, 20).cast("bigint").alias("purch_us"),
    )
    t_us = F.lit(WF_WINDOW_S * 1_000_000)
    level = (
        F.when(
            F.col("purch_us").isNotNull()
            & (F.col("purch_us") - F.col("a_us") <= t_us),
            3,
        )
        .when(
            F.col("click_us").isNotNull()
            & (F.col("click_us") - F.col("a_us") <= t_us),
            2,
        )
        .otherwise(1)
    )
    lv = anchors.groupBy("user_id").agg(F.max(level).alias("funnel_level"))
    return lv.groupBy("funnel_level").agg(F.count("*").alias("user_ct"))


UNPIVOT_ORACLE = f"""
WITH wide AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS dt,
         {dsum_sql('o_totalprice')}        AS gmv,
         CAST(count(*) AS DOUBLE)          AS order_ct,
         max(o_totalprice)                 AS max_price
  FROM orders GROUP BY 1
)
SELECT dt, metric, value FROM (
  SELECT dt, 'gmv'       AS metric, gmv       AS value FROM wide
  UNION ALL
  SELECT dt, 'order_ct'  AS metric, order_ct  AS value FROM wide
  UNION ALL
  SELECT dt, 'max_price' AS metric, max_price AS value FROM wide
)
"""


@query("olap_unpivot_metrics", oracle=UNPIVOT_ORACLE)
def olap_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long metric melt (UNPIVOT): per-day gmv / order count / max
    price pivoted into (dt, metric, value) rows — the reshape every
    metrics store and BI export runs. Spark's native ``unpivot``
    (Expand) emits the long rows in the SAME pass as the projection: one
    aggregation shuffle on dt, zero extra exchanges for the melt (the
    UNION-ALL oracle formulation would rescan the aggregate 3×; Expand
    doesn't). Counts are cast to double so the value column is
    single-typed in both engines."""
    o = table(spark, sf_dir, "orders")
    wide = o.groupBy(fmt_date("o_orderdate").alias("dt")).agg(
        dsum(F.col("o_totalprice")).alias("gmv"),
        F.count("*").cast("double").alias("order_ct"),
        F.max("o_totalprice").alias("max_price"),
    )
    return wide.unpivot(
        ["dt"], ["gmv", "order_ct", "max_price"], "metric", "value"
    )


GROWTH_ORACLE = f"""
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         {dsum_sql('o_totalprice')} AS gmv
  FROM orders GROUP BY 1
)
SELECT month, gmv,
       {pround_sql('(gmv - lag(gmv, 1) OVER w) * 100.0 / lag(gmv, 1) OVER w')}
         AS mom_pct,
       {pround_sql('(gmv - lag(gmv, 12) OVER w) * 100.0 / lag(gmv, 12) OVER w')}
         AS yoy_pct
FROM m
WINDOW w AS (ORDER BY month)
"""


@query("olap_monthly_growth", oracle=GROWTH_ORACLE)
def olap_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly GMV with month-over-month and year-over-year growth — the
    trend header of every revenue dashboard. The growth lags run over the
    ALREADY-AGGREGATED month table (|months| rows — ~80 here, bounded by
    calendar at any corpus size), so the unpartitioned window is a
    deliberate non-issue: the corpus-sized work is the one map-combined
    aggregation; everything after is O(months)."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias(
            "month"
        )
    ).agg(dsum(F.col("o_totalprice")).alias("gmv"))
    w = Window.orderBy("month")
    mom = (F.col("gmv") - F.lag("gmv", 1).over(w)) * 100.0 / F.lag("gmv", 1).over(w)
    yoy = (F.col("gmv") - F.lag("gmv", 12).over(w)) * 100.0 / F.lag("gmv", 12).over(w)
    return m.select(
        "month", "gmv", pround(mom, 2).alias("mom_pct"), pround(yoy, 2).alias("yoy_pct")
    )


SKYLINE_ORACLE = """
SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
)
"""


@query("olap_skyline_parts", oracle=SKYLINE_ORACLE)
def olap_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front): parts not dominated on
    (p_retailprice, p_size), both minimized — the multi-objective
    shortlist query ("no part is both cheaper AND smaller").

    The oracle is the textbook NOT EXISTS anti-join — O(n²) pair work.
    The Spark plan is the SORT-SWEEP identity instead: collapse to one
    min-size row per distinct price (map-combined agg), take the running
    min of size over strictly-smaller prices (a lag over the price-
    ordered window of the DISTINCT-PRICE table — |prices| rows, NOT the
    corpus), and a part is on the skyline iff its size equals its price
    group's min AND beats every smaller price's min strictly. Total cost
    one aggregation + one tiny window + one hash join back — O(n log n),
    zero pair joins; the same sweep is the inner step of grid-partitioned
    skylines in higher dimensions."""
    p = table(spark, sf_dir, "part")
    per_price = p.groupBy("p_retailprice").agg(
        F.min("p_size").alias("gmin")
    )
    wp = Window.orderBy("p_retailprice")
    ann = per_price.select(
        "p_retailprice",
        "gmin",
        F.min("gmin").over(
            wp.rowsBetween(Window.unboundedPreceding, -1)
        ).alias("rmin"),
    )
    sky_prices = ann.where(
        F.col("rmin").isNull() | (F.col("gmin") < F.col("rmin"))
    ).select("p_retailprice", "gmin")
    return (
        p.join(F.broadcast(sky_prices), "p_retailprice")
        .where(F.col("p_size") == F.col("gmin"))
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
    )


EWMA_ALPHA_NUM, EWMA_ALPHA_DEN = 3, 10  # α = 0.3

EWMA_ORACLE = f"""
WITH d AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mth,
         {dsum_sql('o_totalprice')} AS gmv
  FROM orders GROUP BY 1
), seq AS (
  SELECT mth, gmv, row_number() OVER (ORDER BY mth) - 1 AS i FROM d
), acc AS (
  SELECT mth, gmv, i,
         sum(gmv * power(10.0 / 7.0, i)) OVER (ORDER BY mth
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM seq
)
SELECT mth, gmv,
       {pround_sql('0.3 * power(0.7, i) * s + 0.7 * power(0.7, i)'
                   ' * first_value(gmv) OVER (ORDER BY mth)', 2)} AS ewma
FROM acc
"""


@query("olap_ewma_monthly_gmv", oracle=EWMA_ORACLE)
def olap_ewma_monthly_gmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of monthly GMV (α=0.3,
    seeded at the first day's value) — the smoothing every ops
    dashboard applies before alerting on revenue dips.

    EWMA is defined recursively (s_t = α·x_t + (1−α)·s_{t−1}) which no
    parallel engine evaluates directly; the plan uses the closed form
    s_t = α·(1−α)^t·Σ x_i/(1−α)^i + (1−α)^t·x_0 — a RUNNING SUM of
    rescaled terms, i.e. one ordered window over the |months| aggregate
    (calendar-bounded, same deliberate tiny-window exception as
    olap_monthly_growth). The rescale factor (1/0.7)^i caps at ~2.4e12
    over the fixture's 80 months — inside double range; the grain is
    MONTHLY precisely because a multi-year DAILY series (~2 400 points)
    overflows the closed form — at that length, chunk the series and
    carry the EWMA across chunk boundaries (the segmented-scan form).
    Both engines evaluate the identical pow/sum chain in the same frame
    order, with the libm-pow caveat of the unigram family."""
    o = table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias("mth")
    ).agg(dsum(F.col("o_totalprice")).alias("gmv"))
    w = Window.orderBy("mth")
    seq = d.select(
        "mth", "gmv", (F.row_number().over(w) - 1).alias("i")
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = F.sum(F.col("gmv") * F.pow(F.lit(10.0 / 7.0), F.col("i"))).over(run)
    ewma = (
        F.lit(0.3) * F.pow(F.lit(0.7), F.col("i")) * s
        + F.lit(0.7) * F.pow(F.lit(0.7), F.col("i"))
        * F.first("gmv").over(w)
    )
    return seq.select("mth", "gmv", pround(ewma, 2).alias("ewma"))


EQUIDEPTH_BUCKETS = 10

_ED_QS = ", ".join(
    f"{pround_sql(f'quantile_cont(o_totalprice, {k}/10.0)', 4)} AS q{k}"
    for k in range(1, EQUIDEPTH_BUCKETS)
)
_ED_BUCKET = " + ".join(
    f"CASE WHEN o_totalprice > b.q{k} THEN 1 ELSE 0 END"
    for k in range(1, EQUIDEPTH_BUCKETS)
)

EQUIDEPTH_ORACLE = f"""
WITH b AS (
  SELECT {_ED_QS} FROM orders
)
SELECT CAST(1 + {_ED_BUCKET} AS INT) AS bucket,
       count(*) AS order_ct,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi
FROM orders CROSS JOIN b
GROUP BY 1
"""


@query("olap_equidepth_histogram", oracle=EQUIDEPTH_ORACLE)
def olap_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order value (complement of the equi-width
    olap_histogram): boundaries are the exact interpolated deciles, then
    one broadcast comparison pass buckets every row — two scans total, no
    global sort, no per-row window. Boundaries are pround-ed to 4 dp in
    BOTH engines before comparison so a price sitting exactly on a
    boundary compares identically (prices live on the 0.01 grid, so the
    4 dp rounding is lossless there). At 100 TB swap the exact decile agg
    for approx_percentile — the bucketing pass is unchanged."""
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        *[
            pround(
                F.percentile(F.col("o_totalprice"), F.lit(k / 10.0)), 4
            ).alias(f"q{k}")
            for k in range(1, EQUIDEPTH_BUCKETS)
        ]
    )
    bucket = sum(
        F.when(F.col("o_totalprice") > F.col(f"q{k}"), 1).otherwise(0)
        for k in range(1, EQUIDEPTH_BUCKETS)
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .select((F.lit(1) + bucket).cast("int").alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("order_ct"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


USER_EWMA_ORACLE = """
WITH RECURSIVE e AS (
  SELECT user_id, event_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vq,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
           lpad(CAST(event_id AS VARCHAR), 12, '0') AS okey
  FROM events
), seq AS (
  SELECT user_id, event_id, vq,
         row_number() OVER (PARTITION BY user_id ORDER BY okey) - 1 AS i
  FROM e
), r AS (
  SELECT user_id, i, event_id, vq AS sq FROM seq WHERE i = 0
  UNION ALL
  SELECT seq.user_id, seq.i, seq.event_id,
         (3 * seq.vq + 7 * r.sq) // 10
  FROM seq JOIN r ON seq.user_id = r.user_id AND seq.i = r.i + 1
)
SELECT user_id, event_id, sq AS ewma_q6 FROM r
"""


@query("olap_ewma_user_value", oracle=USER_EWMA_ORACLE)
def olap_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-USER recursive EWMA of event values (α = 3/10, seeded at each
    user's first event), computed EXACTLY in integer fixed-point:
    s_t = ⌊(3·x_t + 7·s_{t−1}) / 10⌋ over 1e-6-quantized values — an
    ``aggregate`` fold over each user's time-sorted event array, so the
    result is bit-identical to the oracle's recursive CTE (the
    closed-form float identity used by olap_ewma_monthly_gmv amplifies
    pow/sum ulps across long chains and can flip a rounding boundary —
    measured 1-in-10⁴ rows at sf0.01 — so the per-key form does the
    recursion honestly instead).

    Scale shape: one hash exchange groups each user's events; the fold
    state is the user's own event array (bounded by per-key activity —
    the same bound any per-key sessionization carries; for unbounded
    keys, chunk by time and carry s across chunks, or run the streaming
    twin ``ewma_stream`` which holds ONE integer per key). Intermediate
    3·x+7·s ≤ 3.9e9 ≪ 2^53, so the %-and-divide floor division is exact
    in both engines."""
    ev = table(spark, sf_dir, "events")
    okey = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    e = ev.select(
        "user_id",
        okey.alias("okey"),
        F.col("event_id"),
        F.floor(F.col("value") * F.lit(1_000_000) + F.lit(0.5))
        .cast("bigint")
        .alias("vq"),
    )
    arr = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("okey", "event_id", "vq"))
        ).alias("evs")
    )

    def step(acc, x):
        t = 3 * x["vq"] + 7 * acc["s"]
        s_new = F.when(
            acc["s"] < 0, x["vq"]
        ).otherwise(((t - t % 10) / 10).cast("long"))
        return F.struct(
            s_new.alias("s"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["event_id"].alias("event_id"), s_new.alias("sq")
                    )
                ),
            ).alias("out"),
        )

    init = F.struct(
        F.lit(-1).cast("long").alias("s"),
        F.expr("array()").cast(
            "array<struct<event_id:bigint,sq:bigint>>"
        ).alias("out"),
    )
    folded = arr.select(
        "user_id",
        F.aggregate(F.col("evs"), init, step, lambda a: a["out"]).alias("out"),
    )
    return folded.select(
        "user_id", F.explode("out").alias("o")
    ).select(
        "user_id",
        F.col("o.event_id").alias("event_id"),
        F.col("o.sq").alias("ewma_q6"),
    )


BENFORD_ORACLE = f"""
WITH d AS (
  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
           AS digit
  FROM orders WHERE o_totalprice >= 1
)
SELECT digit, count(*) AS order_ct,
       {pround_sql('count(*) * 1.0 / (SELECT count(*) FROM d)', 4)} AS share
FROM d GROUP BY 1
"""


@query("olap_benford_check", oracle=BENFORD_ORACLE)
def olap_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of order values (the Benford fraud/DQ
    screen): digits extracted through the integer's STRING form — no
    log10, so both engines agree exactly. One map-combined count +
    a broadcast 1-row total."""
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count("*").alias("order_ct"))
    tot = counts.agg(F.sum("order_ct").alias("total"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        "order_ct",
        pround(
            F.col("order_ct").cast("double") / F.col("total").cast("double"), 4
        ).alias("share"),
    )


HEATMAP_ORACLE = """
SELECT CAST(isodow(ts) AS INT) AS dow,
       CAST(hour(ts) AS INT)   AS hod,
       count(*)                AS event_ct,
       CAST(count(DISTINCT user_id) AS BIGINT) AS uu
FROM events GROUP BY 1, 2
"""


@query("olap_calendar_heatmap", oracle=HEATMAP_ORACLE)
def olap_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap (events + unique users) — the
    usage-pattern matrix behind every ops dashboard. ISO weekday
    (Mon=1..Sun=7) matches DuckDB's isodow; one aggregation, 7×24 keys,
    exact count-distinct inside (HLL slots in at scale, as A5→sk_hll)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.dayofweek(F.col("ts")).alias("dow_sun1"),
            F.hour(F.col("ts")).alias("hod"),
            "user_id",
        )
        .select(
            # Spark dayofweek is Sun=1..Sat=7; convert to ISO Mon=1..Sun=7
            ((F.col("dow_sun1") + 5) % 7 + 1).alias("dow"),
            "hod",
            "user_id",
        )
        .groupBy("dow", "hod")
        .agg(
            F.count("*").alias("event_ct"),
            F.countDistinct("user_id").alias("uu"),
        )
    )


MARKOV_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), t AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS pair_ct
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT from_type, sum(pair_ct) AS out_ct FROM t GROUP BY 1
)
SELECT t.from_type, t.to_type, t.pair_ct,
       {pround_sql('t.pair_ct * 1.0 / tot.out_ct', 4)} AS prob
FROM t JOIN tot USING (from_type)
"""


@query("olap_markov_transition_probs", oracle=MARKOV_ORACLE)
def olap_markov_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition probabilities over the per-user
    event sequence — the normalized form of olap_event_transitions (the
    next-event model behind journey prediction and anomaly scoring).
    One user-keyed window for lead(), one map-combined pair count, a
    broadcast per-source total for the normalization (|event types|²
    keyspace)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").alias("pair_ct"))
    tot = t.groupBy("from_type").agg(F.sum("pair_ct").alias("out_ct"))
    return t.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "pair_ct",
        pround(
            F.col("pair_ct").cast("double") / F.col("out_ct").cast("double"), 4
        ).alias("prob"),
    )


WATERFALL_ORACLE = f"""
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mth,
         o_orderpriority AS priority,
         {dsum_sql('o_totalprice')} AS gmv
  FROM orders GROUP BY 1, 2
), d AS (
  SELECT mth, priority, gmv,
         {pround_sql('gmv - lag(gmv) OVER (PARTITION BY priority ORDER BY mth)')}
           AS delta
  FROM m
), t AS (
  -- deltas are 2-dp values; sum exact integer cents so partial-sum order
  -- can never flip a rounding boundary (the dsum discipline, signed form)
  SELECT mth,
         CAST(sum(CAST(floor(delta * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
           AS total_delta
  FROM d GROUP BY 1
)
SELECT d.mth, d.priority, d.gmv, d.delta,
       CASE WHEN t.total_delta <> 0 THEN
         {pround_sql('d.delta / t.total_delta', 4)}
       END AS contrib_share
FROM d JOIN t USING (mth)
WHERE d.delta IS NOT NULL
"""


@query("olap_gmv_waterfall", oracle=WATERFALL_ORACLE)
def olap_gmv_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting waterfall: each month's GMV delta decomposed by
    order priority — which segment drove the move (the bridge chart
    behind every revenue review). Per-priority lag over the month grain
    (partitioned window — |priorities| parallel series), month totals
    broadcast back for the contribution share; share is NULL on
    zero-delta months (division degenerate in both engines alike)."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias("mth"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(dsum(F.col("o_totalprice")).alias("gmv"))
    w = Window.partitionBy("priority").orderBy("mth")
    d = m.select(
        "mth",
        "priority",
        "gmv",
        pround(F.col("gmv") - F.lag("gmv").over(w), 2).alias("delta"),
    ).where(F.col("delta").isNotNull())
    dq = F.floor(F.col("delta") * 100 + F.lit(0.5)).cast("bigint")
    t = d.groupBy("mth").agg(
        (F.sum(dq).cast("double") / F.lit(100.0)).alias("total_delta")
    )
    return d.join(F.broadcast(t), "mth").select(
        "mth",
        "priority",
        "gmv",
        "delta",
        F.when(
            F.col("total_delta") != 0,
            pround(F.col("delta") / F.col("total_delta"), 4),
        ).alias("contrib_share"),
    )


LTV_ORACLE = f"""
WITH firsts AS (
  SELECT o_custkey,
         min(date_trunc('month', o_orderdate)) AS cohort_m
  FROM orders GROUP BY 1
), j AS (
  SELECT strftime(f.cohort_m, '%Y-%m') AS cohort,
         CAST((year(o.o_orderdate) - year(f.cohort_m)) * 12
              + (month(o.o_orderdate) - month(f.cohort_m)) AS INT)
           AS month_offset,
         o.o_totalprice
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
  WHERE (year(o.o_orderdate) - year(f.cohort_m)) * 12
        + (month(o.o_orderdate) - month(f.cohort_m)) <= 11
), g AS (
  SELECT cohort, month_offset,
         CAST(sum(CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT))
              AS BIGINT) AS gmv_q6
  FROM j GROUP BY 1, 2
)
SELECT cohort, month_offset,
       floor(CAST(gmv_q6 AS DOUBLE) / 10000.0 + 0.5) / 100.0 AS gmv,
       floor(CAST(sum(gmv_q6) OVER (PARTITION BY cohort ORDER BY month_offset
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 10000.0 + 0.5) / 100.0 AS cum_gmv
FROM g
"""


@query("olap_cohort_ltv", oracle=LTV_ORACLE)
def olap_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative revenue per acquisition cohort by
    month offset (first year) — the money twin of the retention
    triangle and the payback-period readout. First-order month per
    customer (map-combined min), one broadcast-free join back on
    custkey, integer-quantized sums, and the cumulative runs over the
    tiny (cohort × ≤12) grid; the running sum accumulates EXACT int64
    micro-units so the cumulative is order-free too."""
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_m")
    )
    off = (
        (F.year("o_orderdate") - F.year("cohort_m")) * 12
        + (F.month("o_orderdate") - F.month("cohort_m"))
    )
    j = (
        o.join(firsts.hint("shuffle_hash"), "o_custkey")
        .select(
            F.date_format("cohort_m", "yyyy-MM").alias("cohort"),
            off.cast("int").alias("month_offset"),
            "o_totalprice",
        )
        .where(F.col("month_offset") <= 11)
    )
    g = j.groupBy("cohort", "month_offset").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 1_000_000 + F.lit(0.5)).cast(
                "bigint"
            )
        ).alias("gmv_q6")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    to_money = lambda c: (  # noqa: E731
        F.floor(c.cast("double") / F.lit(10_000.0) + F.lit(0.5)) / F.lit(100.0)
    )
    return g.select(
        "cohort",
        "month_offset",
        to_money(F.col("gmv_q6")).alias("gmv"),
        to_money(F.sum("gmv_q6").over(w)).alias("cum_gmv"),
    )


ATTRIBUTION_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_id, event_type, value, ts,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   >= {SESSION_GAP_S} * CAST(1000000 AS BIGINT) THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tagged AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS session_seq
  FROM seq
), entry AS (
  SELECT user_id, session_seq,
         arg_min(event_type,
                 lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                 lpad(CAST(event_id AS VARCHAR), 12, '0')) AS entry_type
  FROM tagged GROUP BY 1, 2
)
SELECT e.entry_type,
       count(*) AS purchase_ct,
       {dsum_sql('t.value')} AS attributed_value
FROM tagged t
JOIN entry e ON e.user_id = t.user_id AND e.session_seq = t.session_seq
WHERE t.event_type = 'purchase'
GROUP BY 1
"""


@query("olap_session_attribution", oracle=ATTRIBUTION_ORACLE)
def olap_session_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-touch attribution: every purchase's value credited to the
    event type that OPENED its session (gap-sessionized like
    olap_sessionize) — the first-touch revenue attribution report.
    One user-keyed exchange feeds the gap tagging, the running session
    number, and the per-session entry pick (min over the total order
    key); purchases join their session's entry on (user, session) —
    hash join, same partitioning."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        F.lag("ts").over(w).isNull() | (gap_us >= SESSION_GAP_S * 1_000_000),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "ts",
        is_new.alias("is_new"),
    ).withColumn("session_seq", F.sum("is_new").over(run))
    okey = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    entry = tagged.groupBy("user_id", "session_seq").agg(
        F.min_by("event_type", okey).alias("entry_type")
    )
    purchases = tagged.where(F.col("event_type") == "purchase")
    return (
        purchases.join(
            entry.hint("shuffle_hash"), ["user_id", "session_seq"]
        )
        .groupBy("entry_type")
        .agg(
            F.count("*").alias("purchase_ct"),
            dsum(F.col("value")).alias("attributed_value"),
        )
    )


INTERARRIVAL_ORACLE = f"""
WITH seq AS (
  SELECT o_custkey,
         CAST((epoch_us(o_orderdate) - epoch_us(lag(o_orderdate) OVER w))
              // CAST(86400000000 AS BIGINT) AS BIGINT) AS gap_days
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), g AS (
  SELECT o_custkey, gap_days FROM seq WHERE gap_days IS NOT NULL
)
SELECT o_custkey AS custkey,
       count(*) AS n_gaps,
       min(gap_days) AS min_gap_days,
       max(gap_days) AS max_gap_days,
       {pround_sql('avg(gap_days)', 2)} AS avg_gap_days
FROM g GROUP BY 1
"""


@query("olap_order_interarrival", oracle=INTERARRIVAL_ORACLE)
def olap_order_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order cadence: inter-order gaps in whole days
    (min/max/avg) — the churn-risk precursor behind RFM recency. One
    customer-keyed window for the lag, one map-combined rollup; gaps
    are exact integer day counts (epoch floor-division), so the average
    is a ratio of exact ints rounded portably."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.expr(
        "(unix_micros(o_orderdate) - unix_micros(lag(o_orderdate) OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))) "
        "div 86400000000"
    )
    seq = o.select("o_custkey", gap.alias("gap_days")).where(
        F.col("gap_days").isNotNull()
    )
    return seq.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_gaps"),
        F.min("gap_days").alias("min_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
        pround(
            F.sum("gap_days").cast("double") / F.count("*").cast("double"), 2
        ).alias("avg_gap_days"),
    )


STICKINESS_ORACLE = f"""
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
  FROM events
), days AS (
  SELECT DISTINCT d FROM du
), wau AS (
  SELECT days.d, count(DISTINCT du.user_id) AS wau
  FROM days JOIN du ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
  GROUP BY 1
), dau AS (
  SELECT d, count(*) AS dau FROM du GROUP BY 1
)
SELECT strftime(dau.d, '%Y-%m-%d') AS dt, dau.dau, wau.wau,
       {pround_sql('dau.dau * 1.0 / wau.wau', 4)} AS stickiness
FROM dau JOIN wau ON wau.d = dau.d
"""


@query("olap_dau_wau_stickiness", oracle=STICKINESS_ORACLE)
def olap_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / rolling-7-day WAU stickiness per day — the engagement ratio
    every growth dashboard leads with. Rolling DISTINCT counts can't run
    in a plain window frame (distinct isn't subtractable), so the plan
    is the standard warehouse shape: collapse to distinct (day, user)
    pairs ONCE (the only corpus-sized aggregation), then a 7-row-per-day
    range join against the day spine (|days|×7 rows — calendar-bounded)
    re-counts distinct users per trailing window. At 100 TB the pair
    table is the reusable daily-activity atom every other engagement
    metric shares; bitmap state (olap_bitmap_uv_state) replaces the
    re-count when days×users outgrows it."""
    ev = table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct()
    win = days.alias("s").join(
        du.alias("u").hint("shuffle_hash"),
        (F.col("u.d") >= F.date_sub(F.col("s.d"), 6))
        & (F.col("u.d") <= F.col("s.d")),
    )
    wau = win.groupBy(F.col("s.d").alias("d")).agg(
        F.countDistinct("u.user_id").alias("wau")
    )
    dau = du.groupBy("d").agg(F.count("*").alias("dau"))
    return dau.join(F.broadcast(wau), "d").select(
        F.date_format("d", "yyyy-MM-dd").alias("dt"),
        "dau",
        "wau",
        pround(
            F.col("dau").cast("double") / F.col("wau").cast("double"), 4
        ).alias("stickiness"),
    )


WINFN2_ORACLE = """
SELECT o_orderkey,
       o_custkey,
       CAST(floor(percent_rank() OVER seq * 1000000 + 0.5) AS BIGINT)
         AS pct_rank6,
       CAST(floor(cume_dist() OVER seq * 1000000 + 0.5) AS BIGINT)
         AS cume6,
       nth_value(o_orderkey, 2) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS second_order,
       first_value(o_orderkey) OVER seq  AS first_order,
       last_value(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS latest_order
FROM orders
WINDOW seq AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("olap_window_functions_v2", oracle=WINFN2_ORACLE)
def olap_window_functions_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining OVER-clause family (completes olap_window_functions'
    row_number/lag/lead/dense_rank/ntile set): percent_rank, cume_dist,
    nth_value, first_value, and whole-partition last_value — all with
    EXPLICIT frames where the default could differ, over the same total
    order (o_orderdate, o_orderkey), so both engines bit-agree. The rank
    ratios are 1e-6-quantized before crossing the oracle boundary. One
    exchange + one sort serves every function."""
    o = table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = seq.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)).cast("bigint")  # noqa: E731
    return o.select(
        "o_orderkey",
        "o_custkey",
        q6(F.percent_rank().over(seq)).alias("pct_rank6"),
        q6(F.cume_dist().over(seq)).alias("cume6"),
        F.nth_value("o_orderkey", 2).over(run).alias("second_order"),
        F.first("o_orderkey").over(seq).alias("first_order"),
        F.last("o_orderkey").over(full).alias("latest_order"),
    )


MAD_ORACLE = """
WITH med AS (
  SELECT event_type,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m ON m.event_type = e.event_type
),
mad AS (
  SELECT event_type, any_value(med) AS med,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type,
       floor(m.med * 100 + 0.5) / 100.0 AS median_value,
       floor(m.mad * 100 + 0.5) / 100.0 AS mad_value,
       CAST(sum(CASE WHEN abs(d.value - m.med)
                          > 3.0 * 1.4826 * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON m.event_type = d.event_type
GROUP BY 1, 2, 3
"""


@query("olap_mad_outliers", oracle=MAD_ORACLE)
def olap_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen via Median-Absolute-Deviation: per event
    type, the median, the MAD, and the count of values beyond the
    standard 3σ-equivalent fence (3·1.4826·MAD) — the heavy-tail-safe
    complement to olap_anomaly_outliers' moment-based z-scores (one
    extreme value shifts a mean/stddev fence; it cannot move a median
    fence).

    Both medians are exact interpolated percentiles (the
    olap_exact_percentile discipline — identical percentile_cont
    formula both engines); the fence compare runs on raw doubles with
    the same literal constants, so the counts agree exactly. Two
    aggregation passes over events + one broadcast of the |types|-row
    median table; medians at 100 TB swap to the GK-sketch quantile
    (sk_quantile_order_value) with a documented tolerance."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.any_value("med").alias("med"),
        F.percentile(F.col("adev"), F.lit(0.5)).alias("mad"),
    )
    fenced = dev.drop("med").join(F.broadcast(mad), "event_type")
    return fenced.groupBy(
        "event_type",
        pround(F.col("med"), 2).alias("median_value"),
        pround(F.col("mad"), 2).alias("mad_value"),
    ).agg(
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("med"))
                > F.lit(3.0) * F.lit(1.4826) * F.col("mad"),
                1,
            ).otherwise(0)
        ).alias("n_outliers")
    )


# --------------------------------------------------------------------------
# Sweep-line interval concurrency: how many order lines were "in
# fulfillment" (ordered but not yet shipped) at once, per supplier — the
# classic max-concurrent-intervals operator (room bookings, concurrent
# sessions, WIP inventory). No interval self-join anywhere: each interval
# contributes two ±1 boundary events and a running sum over the day-level
# net recovers the concurrency profile.
# --------------------------------------------------------------------------

CONCURRENT_INTERVALS_ORACLE = """
WITH iv AS (
  SELECT l.l_suppkey AS suppkey,
         CAST(o.o_orderdate AS DATE) AS d0,
         CAST(l.l_shipdate  AS DATE) AS d1
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > o.o_orderdate
), ev AS (
  SELECT suppkey, d0 AS d, 1 AS delta FROM iv
  UNION ALL
  SELECT suppkey, d1 AS d, -1 AS delta FROM iv
), daily AS (
  SELECT suppkey, d, sum(delta) AS net FROM ev GROUP BY 1, 2
), conc AS (
  SELECT suppkey, d,
         sum(net) OVER (PARTITION BY suppkey ORDER BY d
                        ROWS UNBOUNDED PRECEDING) AS open_ct
  FROM daily
), mx AS (
  SELECT suppkey, d, open_ct,
         max(open_ct) OVER (PARTITION BY suppkey) AS peak_open
  FROM conc
)
SELECT suppkey,
       CAST(peak_open AS BIGINT) AS peak_open,
       strftime(min(d), '%Y-%m-%d') AS peak_date
FROM mx
WHERE open_ct = peak_open
GROUP BY 1, 2
"""


@query("olap_max_concurrent_intervals", oracle=CONCURRENT_INTERVALS_ORACLE)
def olap_max_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open intervals per supplier via sweep line: each
    [orderdate, shipdate) order-line interval emits a +1/-1 boundary pair,
    day-level nets are summed, and a running sum recovers the concurrency
    profile; the peak and its earliest date are read off with a partition
    max. (Fixture shipdates are synthetic and uncorrelated with order
    dates, so intervals are restricted to the shipdate > orderdate subset —
    the operator shape is unchanged.)

    Scale shape: the orders⋈lineitem equi-join is the standard fact join
    (shuffle on orderkey); after the day-level pre-aggregation the sweep
    state is |supplier × active-days| rows, and the running sum, the
    partition max, and the final min-date aggregation all share ONE
    suppkey-prefixed partitioning (Catalyst reuses the exchange+sort). An
    interval SELF-join formulation would be O(n·k) pairs; this is O(n)
    boundary events — the difference between feasible and not at 100 TB.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    iv = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.to_date("o_orderdate").alias("d0"),
            F.to_date("l_shipdate").alias("d1"),
        )
    )
    ev = iv.select(
        "suppkey",
        F.explode(
            F.array(
                F.struct(F.col("d0").alias("d"), F.lit(1).alias("delta")),
                F.struct(F.col("d1").alias("d"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
    ).select("suppkey", "e.d", "e.delta")
    # r14 (guide §2.4 — share one exchange): establish the suppkey
    # partitioning ONCE on the boundary events; hash(suppkey) satisfies
    # the daily agg's clustered(suppkey, d) requirement AND both windows'
    # clustered(suppkey), so the plan drops from two data exchanges
    # (suppkey,d then suppkey) to one. The map-side partial agg this
    # forgoes is worthless here: (suppkey, day) cardinality per map
    # partition is near the event count, so partials barely reduced rows.
    # Interleaved A/B at sf0.1: 1.35–1.37 → 0.98–0.99 s best-of-5,
    # identical 1000 rows. Skew posture unchanged at 100 TB — the window
    # already partitions by suppkey; AQE picks the partition count.
    daily = (
        ev.repartition("suppkey")
        .groupBy("suppkey", "d")
        .agg(F.sum("delta").alias("net"))
    )
    w_run = (
        Window.partitionBy("suppkey")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("suppkey")
    conc = daily.select(
        "suppkey",
        "d",
        F.sum("net").over(w_run).alias("open_ct"),
    ).withColumn("peak_open", F.max("open_ct").over(w_all))
    return (
        conc.where(F.col("open_ct") == F.col("peak_open"))
        .groupBy("suppkey", "peak_open")
        .agg(F.min(fmt_date("d")).alias("peak_date"))
        .select("suppkey", "peak_open", "peak_date")
    )


# --------------------------------------------------------------------------
# CUPED (Controlled-experiment Using Pre-Existing Data, Deng et al. 2013):
# variance-reduced A/B readout. The experiment metric y (post-period spend)
# is adjusted by the pre-period covariate x: y' = y − θ(x − x̄), with
# θ = cov(x,y)/var(x) pooled across variants — the industry-standard
# sensitivity boost every experimentation platform ships beside the z-test.
# --------------------------------------------------------------------------

CUPED_SPLIT = "2024-01-11"  # pre-period before, experiment period after

CUPED_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         CAST(user_id % 2 AS BIGINT) AS variant,
         CAST(sum(CASE WHEN ts <  TIMESTAMP '{CUPED_SPLIT} 00:00:00'
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT} 00:00:00'
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
  FROM events
  GROUP BY 1
), pool AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy
  FROM u
), th AS (
  SELECT CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
  FROM pool
), v AS (
  SELECT variant,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(x) AS DOUBLE) / count(*) AS mx,
         CAST(sum(y) AS DOUBLE) / count(*) AS my
  FROM u GROUP BY 1
)
SELECT v.variant, v.n_users,
       floor(v.my / 100.0 * 10000 + 0.5) / 10000.0 AS mean_spend,
       floor((v.my - th.theta * (v.mx - th.xbar)) / 100.0 * 10000 + 0.5)
         / 10000.0 AS mean_spend_cuped,
       floor(th.theta * 1000000 + 0.5) / 1000000.0 AS theta
FROM v CROSS JOIN th
"""


@query("olap_abtest_cuped", oracle=CUPED_ORACLE)
def olap_abtest_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout (variant = user_id parity,
    covariate = pre-period spend): per-variant raw and variance-reduced
    mean spend plus the pooled θ. All sums are exact integer cents;
    θ's numerator/denominator are exact 128-bit integer cross-products
    (decimal(38,0) on Spark, HUGEINT on DuckDB) cast to double only for
    the final division — so the float expressions see bit-identical
    inputs and stay IEEE-deterministic (+,-,*,/ only, no transcendentals).

    Scale shape: one user-keyed aggregation (map-side combinable
    conditional sums), then a 5-number pooled reduce and a 2-row
    per-variant reduce — the θ arithmetic runs on scalars; the per-user
    table is aggregated once and never joined back to events."""
    ev = table(spark, sf_dir, "events")
    split = F.lit(f"{CUPED_SPLIT} 00:00:00").cast("timestamp")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    u = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("bigint").alias("variant"),
        F.sum(F.when(F.col("ts") < split, cents).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pool = u.agg(
        d(F.count("*")).alias("n"),
        d(F.sum("x")).alias("sx"),
        d(F.sum("y")).alias("sy"),
        F.sum(d(F.col("x")) * d(F.col("x"))).cast("decimal(38,0)").alias("sxx"),
        F.sum(d(F.col("x")) * d(F.col("y"))).cast("decimal(38,0)").alias("sxy"),
    )
    th = pool.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("theta"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias("xbar"),
    )
    v = u.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        (F.sum("x").cast("double") / F.count("*")).alias("mx"),
        (F.sum("y").cast("double") / F.count("*")).alias("my"),
    )
    out = v.crossJoin(F.broadcast(th))
    r4 = lambda c: F.floor(c * 10_000 + F.lit(0.5)) / 10_000.0  # noqa: E731
    return out.select(
        "variant",
        "n_users",
        r4(F.col("my") / 100.0).alias("mean_spend"),
        r4(
            (F.col("my") - F.col("theta") * (F.col("mx") - F.col("xbar")))
            / 100.0
        ).alias("mean_spend_cuped"),
        (F.floor(F.col("theta") * 1_000_000 + F.lit(0.5)) / 1_000_000.0).alias(
            "theta"
        ),
    )


# --------------------------------------------------------------------------
# Top user paths: the first 3 event types of each session, counted and
# ranked — the "path sankey" readout beside funnels/retention (ClickHouse
# sequenceMatch family territory). Steps are pivoted to columns (no
# arrays/string-agg: deterministic, hash-friendly, and the driver's
# canonicalizer requires scalar columns).
# --------------------------------------------------------------------------

TOP_PATHS_N = 20

TOP_PATHS_ORACLE = f"""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   >= {SESSION_GAP_S * 1_000_000} THEN 1
              WHEN lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS session_seq
  FROM seq
), stepped AS (
  SELECT user_id, session_seq, event_type,
         row_number() OVER (
           PARTITION BY user_id, session_seq ORDER BY ts, event_id
         ) AS step
  FROM tagged
), paths AS (
  SELECT user_id, session_seq,
         max(CASE WHEN step = 1 THEN event_type END) AS s1,
         max(CASE WHEN step = 2 THEN event_type END) AS s2,
         max(CASE WHEN step = 3 THEN event_type END) AS s3
  FROM stepped WHERE step <= 3
  GROUP BY 1, 2
)
SELECT coalesce(s1, '-') AS s1, coalesce(s2, '-') AS s2,
       coalesce(s3, '-') AS s3,
       CAST(count(*) AS BIGINT) AS path_ct
FROM paths
GROUP BY 1, 2, 3
ORDER BY path_ct DESC, s1, s2, s3
LIMIT {TOP_PATHS_N}
"""


@query("olap_top_paths", oracle=TOP_PATHS_ORACLE)
def olap_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} session-opening paths (first 3 event types per session,
    sessions = the same >= gap rule as olap_sessionize): pivoted step
    columns, one count per distinct path, global top-k.

    Scale shape: sessionize's single user-keyed exchange also serves the
    step ranking (same user-prefixed sort); the path pivot is a
    map-combinable conditional-max aggregation on (user, session); the
    final top-k is TakeOrderedAndProject over |distinct paths| rows —
    never a global sort of sessions.""".format(n=TOP_PATHS_N)
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us >= SESSION_GAP_S * 1_000_000), 1
    ).otherwise(0)
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )
    ws = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    stepped = tagged.withColumn("step", F.row_number().over(ws)).where(
        F.col("step") <= 3
    )
    paths = stepped.groupBy("user_id", "session_seq").agg(
        F.max(F.when(F.col("step") == 1, F.col("event_type"))).alias("s1"),
        F.max(F.when(F.col("step") == 2, F.col("event_type"))).alias("s2"),
        F.max(F.when(F.col("step") == 3, F.col("event_type"))).alias("s3"),
    )
    counted = paths.groupBy(
        F.coalesce("s1", F.lit("-")).alias("s1"),
        F.coalesce("s2", F.lit("-")).alias("s2"),
        F.coalesce("s3", F.lit("-")).alias("s3"),
    ).agg(F.count("*").cast("bigint").alias("path_ct"))
    return counted.orderBy(
        F.desc("path_ct"), "s1", "s2", "s3"
    ).limit(TOP_PATHS_N)


# --------------------------------------------------------------------------
# FIFO allocation: match sales to purchase lots in first-in-first-out
# order — inventory costing / lot-tracking's core operator. The classic
# set-based formulation: both sides get CUMULATIVE quantity ranges
# [lo, hi) per part (a running sum in arrival order), and a sale consumes
# exactly the lots whose cumulative range overlaps its own — allocation
# quantity = overlap length. No loops, no per-row state: two windows and
# one overlap join reproduce the sequential FIFO walk exactly.
# --------------------------------------------------------------------------

FIFO_PART_PRED = "l_partkey % 10 = 0"  # detail subset keeps output bounded

FIFO_ORACLE = f"""
WITH base AS (
  SELECT l_partkey AS partkey,
         l_orderkey * 16 + l_linenumber AS line_id,
         CAST(l_quantity AS BIGINT) AS qty,
         l_returnflag AS rf, l_shipdate AS d,
         l_orderkey, l_linenumber
  FROM lineitem WHERE {FIFO_PART_PRED}
), lots AS (
  SELECT partkey, line_id AS lot_id, qty,
         sum(qty) OVER w AS hi, sum(qty) OVER w - qty AS lo
  FROM base WHERE rf = 'A'
  WINDOW w AS (PARTITION BY partkey ORDER BY d, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING)
), sales AS (
  SELECT partkey, line_id AS sale_id, qty,
         sum(qty) OVER w AS hi, sum(qty) OVER w - qty AS lo
  FROM base WHERE rf = 'R'
  WINDOW w AS (PARTITION BY partkey ORDER BY d, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING)
)
SELECT s.partkey, s.sale_id, l.lot_id,
       CAST(least(s.hi, l.hi) - greatest(s.lo, l.lo) AS BIGINT) AS alloc_qty
FROM sales s JOIN lots l
  ON l.partkey = s.partkey
 AND s.lo < l.hi AND l.lo < s.hi
"""


@query("olap_fifo_allocation", oracle=FIFO_ORACLE)
def olap_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO sale→lot allocation via cumulative-range overlap ('A' lines
    are lots, 'R' lines are sales, arrival = shipdate order): each sale
    splits across exactly the lots its cumulative quantity range overlaps,
    which IS the sequential first-in-first-out walk, computed set-based.

    Scale shape: ONE partkey-keyed exchange serves both running sums and
    the overlap join (all partkey-prefixed); candidate pairs per part are
    bounded by lots+sales per part (ranges are disjoint within a side, so
    the overlap graph is a staircase — at most n_lots + n_sales − 1 true
    matches per part, and the equi-join on partkey confines the filter to
    within-part pairs). For parts with very deep histories the cumulative
    axis bins exactly like ext_interval_overlap_pairs' grid."""
    base = (
        table(spark, sf_dir, "lineitem")
        .where(F.expr(FIFO_PART_PRED))
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("l_orderkey") * 16 + F.col("l_linenumber")).alias(
                "line_id"
            ),
            F.col("l_quantity").cast("bigint").alias("qty"),
            F.col("l_returnflag").alias("rf"),
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
        )
    )
    w = (
        Window.partitionBy("partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def ranged(rf: str, id_name: str) -> DataFrame:
        return (
            base.where(F.col("rf") == rf)
            .withColumn("hi", F.sum("qty").over(w))
            .select(
                "partkey",
                F.col("line_id").alias(id_name),
                (F.col("hi") - F.col("qty")).alias("lo"),
                "hi",
            )
        )

    lots = ranged("A", "lot_id")
    sales = ranged("R", "sale_id")
    j = sales.alias("s").join(
        lots.alias("l"),
        (F.col("s.partkey") == F.col("l.partkey"))
        & (F.col("s.lo") < F.col("l.hi"))
        & (F.col("l.lo") < F.col("s.hi")),
    )
    return j.select(
        F.col("s.partkey").alias("partkey"),
        "sale_id",
        "lot_id",
        (
            F.least(F.col("s.hi"), F.col("l.hi"))
            - F.greatest(F.col("s.lo"), F.col("l.lo"))
        ).cast("bigint").alias("alloc_qty"),
    )


# --------------------------------------------------------------------------
# Rolling exact median over a trailing calendar window — the range-frame
# percentile the OVER clause can't express (percentile isn't a Spark
# window function): day-level pre-aggregation first, then a 30-day grid
# self-join OVER THE DAILY AGGREGATE (dimension-sized — |days| × 30 rows,
# never the fact table), then exact rank selection (lower median by
# row_number — pure integers, no interpolation to disagree on).
# --------------------------------------------------------------------------

ROLLMED_DAYS = 30

ROLLING_MEDIAN_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS gmv_cents
  FROM orders GROUP BY 1
), grid AS (
  SELECT a.d AS d, b.gmv_cents,
         row_number() OVER (PARTITION BY a.d ORDER BY b.gmv_cents, b.d)
           AS rn,
         count(*) OVER (PARTITION BY a.d) AS n
  FROM daily a JOIN daily b
    ON b.d BETWEEN a.d - {ROLLMED_DAYS - 1} AND a.d
)
SELECT strftime(d, '%Y-%m-%d') AS d,
       CAST(n AS BIGINT) AS window_days,
       gmv_cents AS p50_gmv_cents
FROM grid
WHERE rn = (n + 1) // 2
"""


@query("olap_rolling_median_gmv", oracle=ROLLING_MEDIAN_ORACLE)
def olap_rolling_median_gmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-{n}-day median of daily GMV per day (lower median
    at rank ⌈n/2⌉ — integer rank selection, no float interpolation).

    Scale shape: the fact table is touched ONCE (map-combinable daily
    cents sum); the trailing window materializes as a |days| × {n} grid
    join over the DAILY aggregate — thousands of rows at any corpus
    size — and the rank window runs on that grid. The naive alternative
    (percentile over a fact-level range frame) would re-sort facts per
    day; this shape is why rolling quantiles pre-aggregate first.""".format(
        n=ROLLMED_DAYS
    )
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("gmv_cents")
    )
    a, b = daily.alias("a"), daily.alias("b")
    grid = a.join(
        b,
        (F.col("b.d") >= F.date_sub(F.col("a.d"), ROLLMED_DAYS - 1))
        & (F.col("b.d") <= F.col("a.d")),
    ).select(
        F.col("a.d").alias("d"),
        F.col("b.gmv_cents").alias("gmv_cents"),
        F.col("b.d").alias("bd"),
    )
    wrank = Window.partitionBy("d").orderBy("gmv_cents", "bd")
    wall = Window.partitionBy("d")
    ranked = grid.select(
        "d",
        "gmv_cents",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(wall).alias("n"),
    )
    return ranked.where(
        F.col("rn") == F.floor((F.col("n") + 1) / 2)
    ).select(
        fmt_date("d").alias("d"),
        F.col("n").cast("bigint").alias("window_days"),
        F.col("gmv_cents").alias("p50_gmv_cents"),
    )


# --------------------------------------------------------------------------
# Clamped running balance: balance_t = max(0, balance_{t-1} + delta_t) —
# the stock-on-hand recursion (issues can't take inventory negative).
# The clamp makes the fold NON-associative, so no direct window aggregate
# computes it; the classic identity rescues it:
#     balance_t = prefix_t − min(0, min_{s≤t} prefix_s)
# (each time the raw prefix dips to a new low, the clamp has absorbed
# exactly that dip). Two running window aggregates over one partkey sort.
# --------------------------------------------------------------------------

BALANCE_ORACLE = f"""
WITH base AS (
  SELECT l_partkey AS partkey,
         l_shipdate AS d, l_orderkey, l_linenumber,
         CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT)
              WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS BIGINT)
              ELSE 0 END AS delta
  FROM lineitem WHERE {FIFO_PART_PRED} AND l_returnflag IN ('A', 'R')
), pfx AS (
  SELECT partkey, d, l_orderkey, l_linenumber, delta,
         sum(delta) OVER (PARTITION BY partkey
             ORDER BY d, l_orderkey, l_linenumber
             ROWS UNBOUNDED PRECEDING) AS p
  FROM base
), pre AS (
  SELECT partkey, d, l_orderkey, l_linenumber, delta, p,
         min(p) OVER (PARTITION BY partkey
             ORDER BY d, l_orderkey, l_linenumber
             ROWS UNBOUNDED PRECEDING) AS minp
  FROM pfx
)
SELECT partkey,
       CAST(l_orderkey * 16 + l_linenumber AS BIGINT) AS line_id,
       delta,
       CAST(p - least(CAST(0 AS BIGINT), minp) AS BIGINT) AS balance
FROM pre
"""


@query("olap_clamped_running_balance", oracle=BALANCE_ORACLE)
def olap_clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock-on-hand after every movement ('A' receipts, 'R' issues,
    issues clamped at zero stock) via the prefix − min(0, running-min)
    identity — the non-associative clamp recursion computed with two
    stacked running aggregates on ONE partkey-keyed sort (no per-row
    state, no recursion). The identity itself is pinned by an
    independent sequential-walk test."""
    base = (
        table(spark, sf_dir, "lineitem")
        .where(
            F.expr(FIFO_PART_PRED) & F.col("l_returnflag").isin("A", "R")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            F.when(
                F.col("l_returnflag") == "A",
                F.col("l_quantity").cast("bigint"),
            )
            .otherwise(-F.col("l_quantity").cast("bigint"))
            .alias("delta"),
        )
    )
    w = (
        Window.partitionBy("partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = base.withColumn("p", F.sum("delta").over(w)).withColumn(
        "minp", F.min("p").over(w)
    )
    return pre.select(
        "partkey",
        (F.col("l_orderkey") * 16 + F.col("l_linenumber"))
        .cast("bigint")
        .alias("line_id"),
        "delta",
        (F.col("p") - F.least(F.lit(0).cast("bigint"), F.col("minp")))
        .cast("bigint")
        .alias("balance"),
    )


# --------------------------------------------------------------------------
# Interval UNION per key: total covered time after merging overlapping
# intervals (active-time accounting — each event opens a 30-minute
# activity window; overlaps must not double-count). Sweep-line again, but
# the aggregate is the MEASURE of the union: sum segment lengths where
# the open count is positive, plus the island count (0→1 transitions).
# --------------------------------------------------------------------------

ACTIVE_WINDOW_S = 30 * 60

ACTIVE_TIME_ORACLE = f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + {ACTIVE_WINDOW_S} * 1000000 AS e
  FROM events
), ev AS (
  SELECT user_id, s AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT user_id, e AS t, -1 AS delta FROM iv
), agg AS (
  SELECT user_id, t, sum(delta) AS net FROM ev GROUP BY 1, 2
), sweep AS (
  SELECT user_id, t,
         sum(net) OVER w AS open_ct,
         sum(net) OVER w - net AS prev_open,
         lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nxt
  FROM agg
  WINDOW w AS (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING)
)
SELECT user_id,
       CAST(sum(CASE WHEN open_ct > 0 THEN nxt - t ELSE 0 END) // 1000000
            AS BIGINT) AS active_s,
       CAST(sum(CASE WHEN open_ct > 0 AND prev_open = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_islands
FROM sweep
GROUP BY 1
"""


@query("olap_active_time_union", oracle=ACTIVE_TIME_ORACLE)
def olap_active_time_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total active time per user = measure of the UNION of per-event
    30-minute activity intervals (overlaps counted once), plus the number
    of merged activity islands. Sweep line over ±1 boundary events: a
    timestamp's segment [t, next_t) is covered iff the running open count
    is positive; an island starts where the count rises from zero.

    Scale shape: one user-keyed exchange serves the boundary pre-agg,
    the running sum, the lead, and the final aggregation (all
    user-prefixed); state per user is its distinct boundary timestamps.
    Never materializes merged intervals — the union's measure is computed
    directly from the sweep."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    iv = ev.select(
        "user_id",
        us.alias("s"),
        (us + F.lit(ACTIVE_WINDOW_S * 1_000_000)).alias("e"),
    )
    bnd = iv.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("b"),
    ).select("user_id", "b.t", "b.delta")
    agg = bnd.groupBy("user_id", "t").agg(F.sum("delta").alias("net"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy("t")
    sweep = agg.select(
        "user_id",
        "t",
        F.sum("net").over(w).alias("open_ct"),
        (F.sum("net").over(w) - F.col("net")).alias("prev_open"),
        F.lead("t").over(wl).alias("nxt"),
    )
    return sweep.groupBy("user_id").agg(
        F.floor(
            F.sum(
                F.when(
                    F.col("open_ct") > 0, F.col("nxt") - F.col("t")
                ).otherwise(0)
            )
            / 1_000_000
        )
        .cast("bigint")
        .alias("active_s"),
        F.sum(
            F.when(
                (F.col("open_ct") > 0) & (F.col("prev_open") == 0), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_islands"),
    )


# --------------------------------------------------------------------------
# Population Stability Index — the distribution-drift metric model
# monitoring runs between a baseline and a current window:
# PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i). Baseline = first half of the
# order-date range, current = second half; fixed equal-width price bins.
# --------------------------------------------------------------------------

PSI_BINS = 10

PSI_ORACLE = f"""
WITH b AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderdate AS d
  FROM orders
), rng AS (
  SELECT min(cents) AS lo, max(cents) AS hi,
         min(d) AS d0, max(d) AS d1 FROM b
), tagged AS (
  SELECT least(CAST((cents - rng.lo) * {PSI_BINS} // (rng.hi - rng.lo + 1)
               AS BIGINT), {PSI_BINS - 1}) AS bin,
         CASE WHEN epoch_us(d) - epoch_us(rng.d0)
                   < (epoch_us(rng.d1) - epoch_us(rng.d0)) // 2
              THEN 0 ELSE 1 END AS half
  FROM b CROSS JOIN rng
), cts AS (
  SELECT bin,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) + 1 AS base_ct,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) + 1 AS cur_ct
  FROM tagged GROUP BY 1
), tot AS (
  SELECT sum(base_ct) AS nb, sum(cur_ct) AS nc FROM cts
), terms AS (
  SELECT bin, base_ct, cur_ct,
         CAST(floor((base_ct * 1.0 / tot.nb - cur_ct * 1.0 / tot.nc)
                    * ln((base_ct * 1.0 / tot.nb)
                         / (cur_ct * 1.0 / tot.nc))
                    * 1000000 + 0.5) AS BIGINT) AS psi6
  FROM cts CROSS JOIN tot
)
SELECT bin, CAST(base_ct AS BIGINT) AS base_ct,
       CAST(cur_ct AS BIGINT) AS cur_ct, psi6,
       CAST(sum(psi6) OVER () AS BIGINT) AS psi6_total
FROM terms
"""


@query("olap_snapshot_drift_psi", oracle=PSI_ORACLE)
def olap_snapshot_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the order history over fixed equal-width price bins (add-one
    smoothing keeps empty bins finite) — per-bin contributions plus the
    total, 1e-6-quantized after the ln (same libm-agreement caveat and
    discipline as unigram_logprob).

    Scale shape: one scan feeds the (bin, half) conditional counts
    (map-combinable); the PSI arithmetic runs on {bins} rows."""
    o = table(spark, sf_dir, "orders")
    b = o.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        F.col("o_orderdate").alias("d"),
    )
    rng = b.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.min("d").alias("d0"),
        F.max("d").alias("d1"),
    )
    tagged = b.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.expr(f"(cents - lo) * {PSI_BINS} div (hi - lo + 1)"),
            F.lit(PSI_BINS - 1).cast("bigint"),
        ).alias("bin"),
        F.when(
            F.unix_micros(F.col("d")) - F.unix_micros(F.col("d0"))
            < F.expr("(unix_micros(d1) - unix_micros(d0)) div 2"),
            0,
        )
        .otherwise(1)
        .alias("half"),
    )
    cts = tagged.groupBy("bin").agg(
        (F.sum(F.when(F.col("half") == 0, 1).otherwise(0)) + 1).alias(
            "base_ct"
        ),
        (F.sum(F.when(F.col("half") == 1, 1).otherwise(0)) + 1).alias(
            "cur_ct"
        ),
    )
    tot = cts.agg(
        F.sum("base_ct").alias("nb"), F.sum("cur_ct").alias("nc")
    )
    p = F.col("base_ct").cast("double") / F.col("nb")
    q = F.col("cur_ct").cast("double") / F.col("nc")
    terms = cts.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("base_ct").cast("bigint").alias("base_ct"),
        F.col("cur_ct").cast("bigint").alias("cur_ct"),
        F.floor((p - q) * F.log(p / q) * 1_000_000 + F.lit(0.5))
        .cast("bigint")
        .alias("psi6"),
    )
    return terms.withColumn(
        "psi6_total",
        F.sum("psi6").over(Window.partitionBy()).cast("bigint"),
    )


# --------------------------------------------------------------------------
# Classical seasonal decomposition (moving-average flavor): daily GMV =
# trend (centered 7-day mean) + day-of-week seasonal (mean detrended per
# weekday) + residual. The additive STL-lite every ops dashboard shows;
# all arithmetic integer cents + explicit floors, so both engines agree
# bit-for-bit.
# --------------------------------------------------------------------------

SEASONAL_DECOMP_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS gmv
  FROM orders GROUP BY 1
), tr AS (
  SELECT d, gmv,
         CAST(floor(sum(gmv) OVER w * 1.0 / 7) AS BIGINT) AS trend,
         count(*) OVER w AS wn
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), det AS (
  SELECT d, gmv, trend, gmv - trend AS detr,
         CAST(dayofweek(d) AS BIGINT) AS dow
  FROM tr WHERE wn = 7
), seas AS (
  SELECT dow,
         CAST(floor(sum(detr) * 1.0 / count(*)) AS BIGINT) AS seasonal
  FROM det GROUP BY 1
)
SELECT strftime(det.d, '%Y-%m-%d') AS d, det.gmv AS gmv_cents,
       det.trend AS trend_cents, seas.seasonal AS seasonal_cents,
       CAST(det.detr - seas.seasonal AS BIGINT) AS residual_cents
FROM det JOIN seas ON seas.dow = det.dow
"""


@query("olap_seasonal_decompose", oracle=SEASONAL_DECOMP_ORACLE)
def olap_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/residual decomposition of daily GMV:
    centered 7-day moving mean as trend (full windows only), day-of-week
    mean of the detrended series as the seasonal component, remainder as
    residual. Integer cents with explicit floor division throughout —
    no float accumulation to disagree on.

    Scale shape: facts collapse to the daily aggregate first; every
    window and join after that runs on |days| rows (the single-partition
    centered window is over ~2.4k rows — the pre-aggregation IS the
    scale strategy, same as olap_rolling_median_gmv)."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("gmv")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "gmv",
        F.floor(F.sum("gmv").over(w) * F.lit(1.0) / 7)
        .cast("bigint")
        .alias("trend"),
        F.count("*").over(w).alias("wn"),
    )
    det = tr.where(F.col("wn") == 7).select(
        "d",
        "gmv",
        "trend",
        (F.col("gmv") - F.col("trend")).alias("detr"),
        F.dayofweek("d").cast("bigint").alias("dow"),
    )
    seas = det.groupBy("dow").agg(
        F.floor(F.sum("detr") * F.lit(1.0) / F.count("*"))
        .cast("bigint")
        .alias("seasonal")
    )
    return det.join(F.broadcast(seas), "dow").select(
        fmt_date("d").alias("d"),
        F.col("gmv").alias("gmv_cents"),
        F.col("trend").alias("trend_cents"),
        F.col("seasonal").alias("seasonal_cents"),
        (F.col("detr") - F.col("seasonal"))
        .cast("bigint")
        .alias("residual_cents"),
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival curve over customer reorder gaps: S(t) = Π_{u≤t}
# (1 − d_u / n_u) with right-censoring at the observation horizon — the
# churn-analysis estimator ("probability a customer has NOT reordered by
# day t"). The product becomes exp(Σ ln(·)) with per-term 1e-6
# quantization (order-free int64 cumsum), the same discipline as the LM
# scorers.
# --------------------------------------------------------------------------

KM_ORACLE = """
WITH o AS (
  SELECT o_custkey AS c, CAST(o_orderdate AS DATE) AS d FROM orders
), horizon AS (
  SELECT max(d) AS h FROM o
), iv AS (
  SELECT c, d,
         lead(d) OVER (PARTITION BY c ORDER BY d) AS nd
  FROM o
), spans AS (
  SELECT CASE WHEN nd IS NULL
              THEN date_diff('day', d, horizon.h)
              ELSE date_diff('day', d, nd) END AS dur,
         CASE WHEN nd IS NULL THEN 0 ELSE 1 END AS ev
  FROM iv CROSS JOIN horizon
), tot AS (
  SELECT count(*) AS n FROM spans
), dist AS (
  SELECT dur, sum(ev) AS d_ct, count(*) AS all_ct
  FROM spans GROUP BY 1
), risk AS (
  SELECT dur, d_ct,
         tot.n - coalesce(sum(all_ct) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM dist CROSS JOIN tot
), ev_t AS (
  SELECT dur AS t, CAST(d_ct AS BIGINT) AS d_events,
         CAST(n_risk AS BIGINT) AS n_risk,
         CAST(floor(ln(1.0 - d_ct * 1.0 / n_risk) * 1000000
                    - 0.5) AS BIGINT) * -1 AS negln6
  FROM risk WHERE d_ct > 0 AND d_ct < n_risk
)
SELECT t, n_risk, d_events,
       floor(exp(-CAST(sum(negln6) OVER (ORDER BY t
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1000000.0)
             * 1000000 + 0.5) / 1000000.0 AS survival
FROM ev_t
"""


@query("olap_survival_km", oracle=KM_ORACLE)
def olap_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier reorder-survival curve: per distinct gap length, the
    at-risk count, event count, and S(t) — last orders right-censored at
    the horizon. Facts collapse to one row per order interval, then the
    whole estimator runs on the |distinct durations| table; the running
    product is exp of a quantized-ln cumulative sum (libm caveat as
    documented for the LM scorers)."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"), F.to_date("o_orderdate").alias("d")
    )
    horizon = o.agg(F.max("d").alias("h"))
    wc = Window.partitionBy("c").orderBy("d")
    iv = o.withColumn("nd", F.lead("d").over(wc))
    spans = iv.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("nd").isNull(), F.datediff(F.col("h"), F.col("d"))
        )
        .otherwise(F.datediff(F.col("nd"), F.col("d")))
        .alias("dur"),
        F.when(F.col("nd").isNull(), 0).otherwise(1).alias("ev"),
    )
    tot = spans.agg(F.count("*").alias("n"))
    dist = spans.groupBy("dur").agg(
        F.sum("ev").alias("d_ct"), F.count("*").alias("all_ct")
    )
    wd = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = dist.crossJoin(F.broadcast(tot)).select(
        "dur",
        "d_ct",
        (
            F.col("n")
            - F.coalesce(F.sum("all_ct").over(wd), F.lit(0))
        ).alias("n_risk"),
    )
    # negln6 = round-half-up of -ln(1 - d/n) (positive); floor(x*1e6 - 0.5)
    # * -1 on the negative ln reproduces the same rounding in both engines
    ev_t = risk.where(
        (F.col("d_ct") > 0) & (F.col("d_ct") < F.col("n_risk"))
    ).select(
        F.col("dur").alias("t"),
        F.col("d_ct").cast("bigint").alias("d_events"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        (
            F.floor(
                F.log(
                    F.lit(1.0)
                    - F.col("d_ct").cast("double") / F.col("n_risk")
                )
                * 1_000_000
                - F.lit(0.5)
            ).cast("bigint")
            * -1
        ).alias("negln6"),
    )
    wt = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev_t.select(
        "t",
        "n_risk",
        "d_events",
        (
            F.floor(
                F.exp(
                    -F.sum("negln6").over(wt).cast("double") / 1_000_000.0
                )
                * 1_000_000
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("survival"),
    )


# --------------------------------------------------------------------------
# ABC classification: rank parts by revenue, classify by cumulative share
# (A ≤ 80%, B ≤ 95%, C rest) — the inventory-policy Pareto cut, computed
# on integer cents with an exclusive-prefix rule so class boundaries are
# exact.
# --------------------------------------------------------------------------

ABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey AS partkey,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT sum(cents) AS t FROM rev
), ranked AS (
  SELECT partkey, cents,
         sum(cents) OVER (ORDER BY cents DESC, partkey
                          ROWS UNBOUNDED PRECEDING) - cents AS prefix_excl
  FROM rev
), classed AS (
  SELECT partkey, cents,
         CASE WHEN prefix_excl * 100 < tot.t * 80 THEN 'A'
              WHEN prefix_excl * 100 < tot.t * 95 THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked CROSS JOIN tot
)
SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       floor(sum(cents) * 1000000.0 / tot.t + 0.5) / 10000.0
         AS revenue_share_pct
FROM classed CROSS JOIN tot
GROUP BY abc, tot.t
"""


@query("olap_abc_classification", oracle=ABC_ORACLE)
def olap_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classes by revenue: a part is 'A' while the
    EXCLUSIVE cumulative share before it is under 80% (so the part
    crossing the boundary still counts into the class), 'B' under 95%,
    else 'C'. The boundary test is pure integer cross-multiplication
    (prefix·100 < total·80) — no float thresholds to disagree on.

    Scale shape: facts collapse to per-part cents first; the ranking
    window and classification run on the |parts| aggregate (the
    dimension-sized-window discipline of the Pareto/Gini family)."""
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("cents")
    )
    tot = rev.agg(F.sum("cents").alias("t"))
    w = Window.orderBy(F.desc("cents"), F.asc("partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = rev.select(
        "partkey",
        "cents",
        (F.sum("cents").over(w) - F.col("cents")).alias("prefix_excl"),
    )
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "cents",
        "t",
        F.when(F.col("prefix_excl") * 100 < F.col("t") * 80, "A")
        .when(F.col("prefix_excl") * 100 < F.col("t") * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("abc", "t").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
        (
            F.floor(
                F.sum("cents") * F.lit(1_000_000.0) / F.first("t")
                + F.lit(0.5)
            )
            / 10_000.0
        ).alias("revenue_share_pct"),
    ).drop("t")


# --------------------------------------------------------------------------
# Wald–Wolfowitz runs test: is the daily GMV sequence random around its
# median, or does it trend/cluster? Signs vs the median, count runs R,
# z = (R − E[R]) / sqrt(Var[R]) with E and Var exact rational functions of
# the +/− counts — the randomness screen run on KPI series before anyone
# trusts a trend story.
# --------------------------------------------------------------------------

RUNS_TEST_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS gmv
  FROM orders GROUP BY 1
), med AS (
  SELECT gmv AS m FROM (
    SELECT gmv, row_number() OVER (ORDER BY gmv, d) AS rn,
           count(*) OVER () AS n
    FROM daily
  ) WHERE rn = (n + 1) // 2
), signs AS (
  SELECT d, CASE WHEN gmv > med.m THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN med
  WHERE gmv <> med.m
), runs AS (
  SELECT s,
         CASE WHEN lag(s) OVER (ORDER BY d) IS NULL
                   OR lag(s) OVER (ORDER BY d) <> s THEN 1 ELSE 0 END AS brk
  FROM signs
), agg AS (
  SELECT CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(brk) AS BIGINT) AS r
  FROM runs
)
SELECT n1, n2, r,
       floor((r - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)))
             * 10000 + 0.5) / 10000.0 AS z
FROM agg
"""


@query("olap_runs_test", oracle=RUNS_TEST_ORACLE)
def olap_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs test for randomness of the daily GMV series around its exact
    median (lower-median rank selection; ties to the median excluded, the
    standard treatment): run count via one lag window, the z-statistic
    from exact integer counts with one sqrt — identically parenthesized
    in both engines.

    Scale shape: facts collapse to the daily aggregate; everything after
    runs on |days| rows."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("gmv")
    )
    wrn = Window.orderBy("gmv", "d")
    med = (
        daily.select(
            "gmv",
            F.row_number().over(wrn).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("n"),
        )
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("gmv").alias("m"))
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("gmv") != F.col("m"))
        .select(
            "d", F.when(F.col("gmv") > F.col("m"), 1).otherwise(0).alias("s")
        )
    )
    wd = Window.orderBy("d")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(wd).isNull() | (F.lag("s").over(wd) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    agg = runs.agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum("brk").cast("bigint").alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    e = F.lit(2.0) * n1 * n2 / (n1 + n2) + F.lit(1.0)
    var = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - F.lit(1.0)))
    )
    return agg.select(
        "n1",
        "n2",
        "r",
        (
            F.floor((r - e) / F.sqrt(var) * 10_000 + F.lit(0.5)) / 10_000.0
        ).alias("z"),
    )


# --------------------------------------------------------------------------
# Mann–Kendall trend test — the nonparametric companion of the runs test:
# S = Σ_{i<j} sign(gmv_j − gmv_i) over the day-ordered series, variance
# with the exact tie correction, z with the ±1 continuity correction.
# Pairwise by definition, but over the DAILY AGGREGATE (|days|² pairs ≈
# millions at any corpus size — dimension-side work).
# --------------------------------------------------------------------------

MANN_KENDALL_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS gmv
  FROM orders GROUP BY 1
), s AS (
  SELECT CAST(sum(CASE WHEN b.gmv > a.gmv THEN 1
                       WHEN b.gmv < a.gmv THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM daily a JOIN daily b ON b.d > a.d
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM daily
), ties AS (
  SELECT coalesce(CAST(sum(ct * (ct - 1) * (2 * ct + 5)) AS BIGINT), 0)
           AS tie_term
  FROM (SELECT count(*) AS ct FROM daily GROUP BY gmv HAVING count(*) > 1)
)
SELECT s.s_stat, nn.n,
       floor((CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                   WHEN s.s_stat < 0 THEN s.s_stat + 1
                   ELSE 0 END)
             / sqrt((nn.n * (nn.n - 1.0) * (2.0 * nn.n + 5.0)
                     - ties.tie_term) / 18.0)
             * 10000 + 0.5) / 10000.0 AS z
FROM s CROSS JOIN nn CROSS JOIN ties
"""


@query("olap_mann_kendall_trend", oracle=MANN_KENDALL_ORACLE)
def olap_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test on daily GMV: exact integer S
    over all day pairs, tie-corrected variance, continuity-corrected z.
    All inputs to the one float expression are exact integers; sqrt is
    IEEE-exact.

    Scale shape: facts collapse to the daily aggregate; the pairwise
    join is |days|×|days|/2 on dimension-sized data (a few million pairs
    regardless of corpus size) — the one join here that is INHERENTLY
    quadratic, priced on the aggregate precisely so it never touches
    fact cardinality."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("gmv")
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(b, F.col("b.d") > F.col("a.d"))
        .agg(
            F.sum(
                F.when(F.col("b.gmv") > F.col("a.gmv"), 1)
                .when(F.col("b.gmv") < F.col("a.gmv"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    nn = daily.agg(F.count("*").cast("bigint").alias("n"))
    ties = (
        daily.groupBy("gmv")
        .agg(F.count("*").alias("ct"))
        .where(F.col("ct") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("ct")
                    * (F.col("ct") - 1)
                    * (2 * F.col("ct") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    sc = F.col("s_stat")
    corrected = (
        F.when(sc > 0, sc - 1).when(sc < 0, sc + 1).otherwise(0)
    )
    var = (
        F.col("n") * (F.col("n") - F.lit(1.0)) * (F.lit(2.0) * F.col("n") + 5.0)
        - F.col("tie_term")
    ) / F.lit(18.0)
    return (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            "s_stat",
            "n",
            (
                F.floor(corrected / F.sqrt(var) * 10_000 + F.lit(0.5))
                / 10_000.0
            ).alias("z"),
        )
    )


# --------------------------------------------------------------------------
# Theil–Sen estimator — the robust trend SLOPE to Mann–Kendall's
# significance: median of all pairwise slopes (gmv_j − gmv_i)/(d_j − d_i)
# in cents/day. Slopes are 1e-6-quantized before the exact lower-median
# rank selection, so both engines pick the identical element.
# --------------------------------------------------------------------------

THEIL_SEN_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS dd,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS gmv
  FROM orders GROUP BY 1, 2
), slopes AS (
  SELECT CAST(floor((b.gmv - a.gmv) * 1000000.0 / (b.dd - a.dd) + 0.5)
              AS BIGINT) AS s6
  FROM daily a JOIN daily b ON b.dd > a.dd
), ranked AS (
  SELECT s6, row_number() OVER (ORDER BY s6) AS rn, count(*) OVER () AS n
  FROM slopes
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       floor(s6 / 100.0 + 0.5) / 10000.0 AS slope_cents_per_day
FROM ranked WHERE rn = (n + 1) // 2
"""


@query("olap_theil_sen_slope", oracle=THEIL_SEN_ORACLE)
def olap_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope of daily GMV (median of all pairwise
    slopes — immune to outlier days that wreck OLS): quantized slopes,
    exact lower-median rank selection.

    Scale shape: the pairwise join and the rank window run on the DAILY
    aggregate (same dimension-side quadratic as Mann–Kendall — millions
    of pairs regardless of corpus size); facts are scanned once."""
    o = table(spark, sf_dir, "orders")
    epoch = F.lit("1970-01-01").cast("date")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("d"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("gmv")
    ).select(
        F.datediff("d", epoch).cast("bigint").alias("dd"), "gmv"
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("b.dd") > F.col("a.dd")).select(
        F.floor(
            (F.col("b.gmv") - F.col("a.gmv"))
            * F.lit(1_000_000.0)
            / (F.col("b.dd") - F.col("a.dd"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("s6")
    )
    wrn = Window.orderBy("s6")
    ranked = slopes.select(
        "s6",
        F.row_number().over(wrn).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return ranked.where(
        F.col("rn") == F.floor((F.col("n") + 1) / 2)
    ).select(
        F.col("n").cast("bigint").alias("n_pairs"),
        (F.floor(F.col("s6") / 100.0 + F.lit(0.5)) / 10_000.0).alias(
            "slope_cents_per_day"
        ),
    )


# --------------------------------------------------------------------------
# Price-volume-mix bridge: ΔGMV between two periods decomposed into price
# effect ((p₂−p₁)·q₁), volume effect ((q₂−q₁)·p₁), a mix residual
# (defined as Δ_common − price − volume, so the identity holds EXACTLY
# under quantization), and new/dropped part contributions. The standard
# finance bridge beside the month-over-month waterfall.
# --------------------------------------------------------------------------

PVM_ORACLE = """
WITH b AS (
  SELECT l_partkey AS pk,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         l_shipdate AS d
  FROM lineitem
), rng AS (
  SELECT min(d) AS d0, max(d) AS d1 FROM b
), per AS (
  SELECT pk,
         CASE WHEN epoch_us(d) - epoch_us(rng.d0)
                   < (epoch_us(rng.d1) - epoch_us(rng.d0)) // 2
              THEN 1 ELSE 2 END AS period,
         q, cents
  FROM b CROSS JOIN rng
), agg AS (
  SELECT pk, period, CAST(sum(q) AS BIGINT) AS qq,
         CAST(sum(cents) AS BIGINT) AS rr
  FROM per GROUP BY 1, 2
), wide AS (
  SELECT pk,
         max(CASE WHEN period = 1 THEN qq END) AS q1,
         max(CASE WHEN period = 1 THEN rr END) AS r1,
         max(CASE WHEN period = 2 THEN qq END) AS q2,
         max(CASE WHEN period = 2 THEN rr END) AS r2
  FROM agg GROUP BY 1
), common AS (
  SELECT pk, q1, r1, q2, r2,
         CAST(floor(r1 * 1000000.0 / q1) AS BIGINT) AS p1_6,
         CAST(floor(r2 * 1000000.0 / q2) AS BIGINT) AS p2_6
  FROM wide WHERE q1 IS NOT NULL AND q2 IS NOT NULL
), eff AS (
  SELECT
    CAST(sum(CAST(floor((p2_6 - p1_6) * q1 / 1000000.0) AS BIGINT))
         AS BIGINT) AS price_c,
    CAST(sum(CAST(floor((q2 - q1) * p1_6 / 1000000.0) AS BIGINT))
         AS BIGINT) AS volume_c,
    CAST(sum(r2 - r1) AS BIGINT) AS delta_common
  FROM common
), extremes AS (
  SELECT CAST(coalesce(sum(CASE WHEN q1 IS NULL THEN r2 END), 0) AS BIGINT)
           AS new_c,
         CAST(coalesce(sum(CASE WHEN q2 IS NULL THEN -r1 END), 0) AS BIGINT)
           AS dropped_c
  FROM wide
)
SELECT * FROM (
  SELECT 'price' AS effect, price_c AS cents FROM eff
  UNION ALL
  SELECT 'volume', volume_c FROM eff
  UNION ALL
  SELECT 'mix_residual', delta_common - price_c - volume_c FROM eff
  UNION ALL
  SELECT 'new_parts', new_c FROM extremes
  UNION ALL
  SELECT 'dropped_parts', dropped_c FROM extremes
  UNION ALL
  SELECT 'total_delta', eff.delta_common + extremes.new_c
                        + extremes.dropped_c
  FROM eff CROSS JOIN extremes
)
"""


@query("olap_price_volume_mix", oracle=PVM_ORACLE)
def olap_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ΔGMV bridge between the two halves of the shipment history:
    price / volume / mix-residual effects over parts sold in both
    periods (unit prices as 1e-6-quantized rationals; the residual is
    defined as the remainder so the bridge ties out EXACTLY), plus
    new-part and dropped-part contributions and the total.

    Scale shape: one fact scan → per-(part, period) integer sums →
    per-part pivot → five scalar aggregates; every effect is computed on
    the |parts| aggregate."""
    li = table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_partkey").alias("pk"),
        F.col("l_quantity").cast("bigint").alias("q"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        F.col("l_shipdate").alias("d"),
    )
    rng = b.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    per = b.crossJoin(F.broadcast(rng)).select(
        "pk",
        "q",
        "cents",
        F.when(
            F.unix_micros(F.col("d")) - F.unix_micros(F.col("d0"))
            < F.expr("(unix_micros(d1) - unix_micros(d0)) div 2"),
            1,
        )
        .otherwise(2)
        .alias("period"),
    )
    agg = per.groupBy("pk", "period").agg(
        F.sum("q").cast("bigint").alias("qq"),
        F.sum("cents").cast("bigint").alias("rr"),
    )
    wide = agg.groupBy("pk").agg(
        F.max(F.when(F.col("period") == 1, F.col("qq"))).alias("q1"),
        F.max(F.when(F.col("period") == 1, F.col("rr"))).alias("r1"),
        F.max(F.when(F.col("period") == 2, F.col("qq"))).alias("q2"),
        F.max(F.when(F.col("period") == 2, F.col("rr"))).alias("r2"),
    )
    common = wide.where(
        F.col("q1").isNotNull() & F.col("q2").isNotNull()
    ).select(
        "q1",
        "r1",
        "q2",
        "r2",
        F.floor(F.col("r1") * F.lit(1_000_000.0) / F.col("q1"))
        .cast("bigint")
        .alias("p1_6"),
        F.floor(F.col("r2") * F.lit(1_000_000.0) / F.col("q2"))
        .cast("bigint")
        .alias("p2_6"),
    )
    eff = common.agg(
        F.sum(
            F.floor(
                (F.col("p2_6") - F.col("p1_6"))
                * F.col("q1")
                / F.lit(1_000_000.0)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("price_c"),
        F.sum(
            F.floor(
                (F.col("q2") - F.col("q1"))
                * F.col("p1_6")
                / F.lit(1_000_000.0)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("volume_c"),
        F.sum(F.col("r2") - F.col("r1")).cast("bigint").alias("delta_common"),
    )
    extremes = wide.agg(
        F.coalesce(
            F.sum(F.when(F.col("q1").isNull(), F.col("r2"))), F.lit(0)
        )
        .cast("bigint")
        .alias("new_c"),
        F.coalesce(
            F.sum(F.when(F.col("q2").isNull(), -F.col("r1"))), F.lit(0)
        )
        .cast("bigint")
        .alias("dropped_c"),
    )
    x = F.broadcast(extremes)

    def row(name, col, df):
        return df.select(
            F.lit(name).alias("effect"), col.cast("bigint").alias("cents")
        )

    return (
        row("price", F.col("price_c"), eff)
        .unionByName(row("volume", F.col("volume_c"), eff))
        .unionByName(
            row(
                "mix_residual",
                F.col("delta_common") - F.col("price_c") - F.col("volume_c"),
                eff,
            )
        )
        .unionByName(row("new_parts", F.col("new_c"), extremes))
        .unionByName(row("dropped_parts", F.col("dropped_c"), extremes))
        .unionByName(
            row(
                "total_delta",
                F.col("delta_common") + F.col("new_c") + F.col("dropped_c"),
                eff.crossJoin(x),
            )
        )
    )


# --------------------------------------------------------------------------
# XmR (individuals / moving-range) control chart: limits = x̄ ± 2.66·mR̄
# over the daily GMV series — the SPC chart for per-unit observations,
# beside CUSUM (drift), Bollinger (rolling bands), and MAD (robust fence).
# --------------------------------------------------------------------------

XMR_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS gmv
  FROM orders GROUP BY 1
), mr AS (
  SELECT d, gmv,
         abs(gmv - lag(gmv) OVER (ORDER BY d)) AS mrange
  FROM daily
), lim AS (
  SELECT CAST(sum(gmv) AS BIGINT) AS sx, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(mrange) AS BIGINT) AS smr,
         CAST(count(mrange) AS BIGINT) AS nmr
  FROM mr
), flagged AS (
  SELECT d, gmv,
         sx * 1.0 / n + 2.66 * (smr * 1.0 / nmr) AS ucl,
         sx * 1.0 / n - 2.66 * (smr * 1.0 / nmr) AS lcl
  FROM mr CROSS JOIN lim
)
SELECT strftime(d, '%Y-%m-%d') AS d, gmv,
       CAST(floor(ucl + 0.5) AS BIGINT) AS ucl_cents,
       CAST(floor(lcl + 0.5) AS BIGINT) AS lcl_cents,
       CASE WHEN gmv > ucl OR gmv < lcl THEN 1 ELSE 0 END AS out_of_control
FROM flagged
WHERE gmv > ucl OR gmv < lcl
"""


@query("olap_xmr_control_chart", oracle=XMR_ORACLE)
def olap_xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-control days under the XmR individuals chart (x̄ ± 2.66·mR̄
    from the moving range) — the SPC flagging query beside CUSUM and the
    MAD fence. Exact integer sums feed one deterministic float
    expression; only flagged days are emitted.

    Scale shape: facts collapse to the daily series; the moving range is
    one lag window and the limits one scalar aggregate on |days| rows."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("gmv")
    )
    wd = Window.orderBy("d")
    mr = daily.withColumn(
        "mrange", F.abs(F.col("gmv") - F.lag("gmv").over(wd))
    )
    lim = mr.agg(
        F.sum("gmv").cast("bigint").alias("sx"),
        F.count("*").cast("bigint").alias("n"),
        F.sum("mrange").cast("bigint").alias("smr"),
        F.count("mrange").cast("bigint").alias("nmr"),
    )
    xbar = F.col("sx") * F.lit(1.0) / F.col("n")
    mrbar = F.col("smr") * F.lit(1.0) / F.col("nmr")
    flagged = mr.crossJoin(F.broadcast(lim)).select(
        "d",
        "gmv",
        (xbar + F.lit(2.66) * mrbar).alias("ucl"),
        (xbar - F.lit(2.66) * mrbar).alias("lcl"),
    )
    return flagged.where(
        (F.col("gmv") > F.col("ucl")) | (F.col("gmv") < F.col("lcl"))
    ).select(
        fmt_date("d").alias("d"),
        "gmv",
        F.floor(F.col("ucl") + F.lit(0.5)).cast("bigint").alias("ucl_cents"),
        F.floor(F.col("lcl") + F.lit(0.5)).cast("bigint").alias("lcl_cents"),
        F.when(
            (F.col("gmv") > F.col("ucl")) | (F.col("gmv") < F.col("lcl")), 1
        )
        .otherwise(0)
        .alias("out_of_control"),
    )
