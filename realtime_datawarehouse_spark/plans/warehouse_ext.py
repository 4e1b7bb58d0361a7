"""Warehouse-pattern extensions: SCD Type-2 dimension building, point-in-
time (as-of) dimension lookup, revenue-concentration (Gini), new-vs-
returning decomposition, seasonal-naive forecast error, and funnel
time-to-convert percentiles.

The reference's DIM layer keeps only the LATEST row per key (Phoenix
upsert, rt/app/func/DimSinkFunction.java) — history is overwritten. SCD2
validity intervals are the standard warehouse answer to "what was the
dimension worth WHEN the fact happened", and the point-in-time join here
shows the two equivalent formulations: the oracle joins facts into
explicit [valid_from, valid_to) intervals, while the Spark plan uses the
union + last-non-null-window as-of form that needs NO range join — one
hash exchange on the entity key, no interval blow-up, the shape that
survives 100 TB (range joins degenerate to broadcast-nested-loop;
the window form is a single sort within user partitions).

Cross-engine exactness: every money/ratio figure is integer-quantized
before summation (functions/compare.py discipline); Gini and MAPE are
computed in pure int64 up to a single final division; percentiles use the
identical interpolated formula on exact int64 microsecond values.
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
from realtime_datawarehouse_spark.functions.timeutil import fmt_date, fmt_ts
from realtime_datawarehouse_spark.plans.registry import query
from realtime_datawarehouse_spark.tables import table

# ---------------------------------------------------------------------------
# Gini revenue concentration per nation
# ---------------------------------------------------------------------------

GINI_ORACLE = """
WITH cust AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT n.n_name AS nation,
         c.cents,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY c.cents, c.custkey) AS rk
  FROM cust c
  JOIN customer ON c_custkey = c.custkey
  JOIN nation n ON n.n_nationkey = c_nationkey
)
SELECT nation,
       CAST(count(*) AS BIGINT) AS n_customers,
       floor((CAST(2 * sum(rk * cents) - (count(*) + 1) * sum(cents) AS DOUBLE)
              / (CAST(count(*) AS DOUBLE) * CAST(sum(cents) AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS gini
FROM ranked
GROUP BY 1
"""


@query("olap_gini_concentration", oracle=GINI_ORACLE)
def olap_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue within each nation — the
    inequality readout behind olap_pareto_segments' banded shares (ADS
    concentration metric; the reference's ADS layer stops at plain sums,
    pub/service/impl/TradeStatsServiceImpl.java).

    G = (2·Σ i·x_i − (n+1)·Σx_i) / (n·Σx_i) over customers ranked by
    spend ascending (ties broken by custkey → a total order, identical in
    both engines). All sums run in exact int64 cents; one double division
    at the end, portably rounded to 6 dp.

    Scale shape: the rank window sorts PER-CUSTOMER AGGREGATES (|customers|
    rows, not |orders|), partitioned by nation; customer/nation dims
    broadcast. One shuffle for the per-customer agg, one for the window,
    map-combinable final agg."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(cents).alias("cents")
    )
    ranked = (
        cust.join(F.broadcast(c), cust.custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "cents", "custkey")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("nation").orderBy("cents", "custkey")
            ),
        )
    )
    num = 2 * F.sum(F.col("rk") * F.col("cents")) - (
        F.count("*") + 1
    ) * F.sum("cents")
    den = F.count("*").cast("double") * F.sum("cents").cast("double")
    return ranked.groupBy("nation").agg(
        F.count("*").alias("n_customers"),
        pround(num.cast("double") / den, 6).alias("gini"),
    )


# ---------------------------------------------------------------------------
# New vs returning GMV decomposition
# ---------------------------------------------------------------------------

NEW_RET_ORACLE = f"""
WITH flagged AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CASE WHEN row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) = 1
              THEN 'new' ELSE 'returning' END AS cohort,
         o_totalprice
  FROM orders
)
SELECT month, cohort,
       CAST(count(*) AS BIGINT)        AS order_ct,
       {dsum_sql('o_totalprice')}      AS gmv
FROM flagged
GROUP BY 1, 2
"""


@query("olap_new_vs_returning_gmv", oracle=NEW_RET_ORACLE)
def olap_new_vs_returning_gmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly GMV split into first-ever orders ('new') vs repeat orders
    ('returning') — the acquisition-vs-retention decomposition every
    commerce ADS serves (generalizes ST6's first-order-of-day flag,
    rt/app/dws/DwsTradeOrderWindow.java:91-108, from day scope to
    lifetime scope).

    The first-order flag is a row_number window over (custkey; orderdate,
    orderkey) — one shuffle on custkey, then a month×cohort aggregation
    that is map-side combinable. No self-join against a min-date subquery
    (the naive form scans orders twice and shuffles both)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.when(F.row_number().over(w) == 1, F.lit("new"))
        .otherwise(F.lit("returning"))
        .alias("cohort"),
        "o_totalprice",
    )
    return flagged.groupBy("month", "cohort").agg(
        F.count("*").alias("order_ct"),
        dsum(F.col("o_totalprice")).alias("gmv"),
    )


# ---------------------------------------------------------------------------
# SCD Type-2 interval build (gaps-and-islands over the event stream)
# ---------------------------------------------------------------------------

_SCD2_RUNS_CTE = """
WITH marked AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, ts, event_type,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM marked
),
intervals AS (
  SELECT user_id, event_type,
         min(ts)  AS vf,
         CAST(count(*) AS BIGINT) AS n_events,
         lead(min(ts)) OVER (PARTITION BY user_id ORDER BY min(ts)) AS vt
  FROM runs
  GROUP BY user_id, event_type, grp
)
"""

SCD2_ORACLE = (
    _SCD2_RUNS_CTE
    + """
SELECT user_id, event_type,
       strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(vt, '%Y-%m-%d %H:%M:%S'), 'CURRENT') AS valid_to,
       n_events
FROM intervals
"""
)


def _scd2_runs(ev: DataFrame) -> DataFrame:
    """Collapse consecutive same-type events per user into runs (islands),
    returning one row per run with raw-timestamp validity bounds
    (vf inclusive, vt exclusive; vt NULL for the open current run)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = marked.withColumn("grp", F.sum("chg").over(wrun))
    agg = runs.groupBy("user_id", "event_type", "grp").agg(
        F.min("ts").alias("vf"), F.count("*").alias("n_events")
    )
    wlead = Window.partitionBy("user_id").orderBy("vf")
    return agg.withColumn("vt", F.lead("vf").over(wlead)).drop("grp")


@query("olap_scd2_intervals", oracle=SCD2_ORACLE)
def olap_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: collapse each user's event-type stream
    into validity intervals [valid_from, valid_to) — the history-keeping
    upgrade of the reference's overwrite-only DIM layer
    (rt/app/func/DimSinkFunction.java keeps only the latest row).

    Classic gaps-and-islands: change flag (lag), running-sum island id,
    per-island min/count, lead() for the exclusive upper bound. All three
    windows and the aggregation share ONE user_id exchange (Catalyst
    reuses the sort); nothing here is quadratic in history length."""
    ev = table(spark, sf_dir, "events")
    return _scd2_runs(ev).select(
        "user_id",
        "event_type",
        fmt_ts("vf").alias("valid_from"),
        F.coalesce(fmt_ts("vt"), F.lit("CURRENT")).alias("valid_to"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Point-in-time (as-of) lookup against the SCD2 dimension
# ---------------------------------------------------------------------------

SCD2_PIT_ORACLE = (
    _SCD2_RUNS_CTE.replace("FROM events", "FROM events\n  WHERE event_type <> 'purchase'", 1)
    + """
SELECT p.event_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       coalesce(i.event_type, 'NONE')      AS state_at_purchase,
       floor(p.value * 100 + 0.5) / 100.0  AS amount
FROM events p
LEFT JOIN intervals i
  ON i.user_id = p.user_id
 AND p.ts >= i.vf
 AND (i.vt IS NULL OR p.ts < i.vt)
WHERE p.event_type = 'purchase'
"""
)


@query("ext_scd2_point_in_time_join", oracle=SCD2_PIT_ORACLE)
def ext_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each purchase is joined to the SCD2
    state interval (built from the user's NON-purchase events) that
    contains its timestamp — "what state was the user in when they
    bought". Purchases before any state event get 'NONE'.

    The oracle states the textbook interval-containment join; the Spark
    plan uses the equivalent as-of form that avoids the range join
    entirely: union state-change rows with purchase rows, sort per user by
    (ts, kind) — state rows first on timestamp ties, matching the
    inclusive valid_from — and carry the last non-null state forward with
    an IGNORE NULLS last_value window. One hash exchange on user_id, one
    sort; no interval table is ever materialized or broadcast, so the
    shape is identical at 100 TB (a range join would degenerate to a
    broadcast-nested-loop or per-row interval probe). Equivalence holds
    because run-collapse never changes the latest-state-at-ts answer."""
    ev = table(spark, sf_dir, "events")
    states = ev.where(F.col("event_type") != "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        "event_id",
        F.col("event_type").alias("state"),
        F.lit(None).cast("double").alias("value"),
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("string").alias("state"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = states.unionByName(facts).withColumn(
        "cur_state", F.last("state", ignorenulls=True).over(w)
    )
    return merged.where(F.col("kind") == 1).select(
        "event_id",
        "user_id",
        fmt_ts("ts").alias("purchase_ts"),
        F.coalesce("cur_state", F.lit("NONE")).alias("state_at_purchase"),
        pround(F.col("value"), 2).alias("amount"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast error (MAPE vs the value 7 days earlier)
# ---------------------------------------------------------------------------

SEASONAL_MAPE_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT a.event_type,
         CAST(floor(CAST(abs(a.cents - p.cents) AS DOUBLE) * 1000000.0
                    / CAST(a.cents AS DOUBLE)) AS BIGINT) AS ape6
  FROM daily a
  JOIN daily p ON p.event_type = a.event_type AND p.d = a.d - 7
  WHERE a.cents > 0
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       floor(CAST(sum(ape6) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0
             * 1000000.0 + 0.5) / 1000000.0 AS mape
FROM scored
GROUP BY 1
"""


@query("olap_seasonal_naive_mape", oracle=SEASONAL_MAPE_ORACLE)
def olap_seasonal_naive_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality readout for the seasonal-naive baseline (predict
    today's per-type revenue with the value from 7 days earlier) — the
    error yardstick olap_forecast_linear's trend model must beat. MAPE is
    computed from integer cent sums with the per-day absolute-percentage
    error quantized to 1e-6 BEFORE averaging, so both engines sum exact
    int64 and divide once.

    Scale shape: one map-combinable daily aggregation, then a self-join on
    (type, day−7) over the TINY daily table (|types|×|days| rows) — the
    join input is already aggregated, never the raw events."""
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.sum(cents).alias("cents"))
    pred = daily.select(
        F.col("event_type").alias("p_type"),
        F.col("d").alias("p_d"),
        F.col("cents").alias("p_cents"),
    )
    scored = (
        daily.join(
            pred,
            (F.col("p_type") == F.col("event_type"))
            & (F.col("p_d") == F.date_sub(F.col("d"), 7)),
        )
        .where(F.col("cents") > 0)
        .select(
            "event_type",
            F.floor(
                F.abs(F.col("cents") - F.col("p_cents")).cast("double")
                * F.lit(1000000.0)
                / F.col("cents").cast("double")
            )
            .cast("bigint")
            .alias("ape6"),
        )
    )
    mape = (
        F.floor(
            F.sum("ape6").cast("double")
            / F.count("*").cast("double")
            / F.lit(1000000.0)
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        / F.lit(1000000.0)
    )
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_days"), mape.alias("mape")
    )


# ---------------------------------------------------------------------------
# Funnel time-to-convert percentiles
# ---------------------------------------------------------------------------

FUNNEL_TTC_ORACLE = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON t1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= t1.t1 GROUP BY 1
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON t2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= t2.t2 GROUP BY 1
),
ttc AS (
  SELECT CAST(epoch_us(t3.t3) - epoch_us(t1.t1) AS BIGINT) AS us
  FROM t3 JOIN t1 ON t1.user_id = t3.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY us)
             / 1000000.0 * 100 + 0.5) / 100.0 AS p50_sec,
       floor(percentile_cont(0.9) WITHIN GROUP (ORDER BY us)
             / 1000000.0 * 100 + 0.5) / 100.0 AS p90_sec
FROM ttc
"""


@query("olap_funnel_ttc", oracle=FUNNEL_TTC_ORACLE)
def olap_funnel_ttc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert for the view→click→purchase funnel: exact p50/p90
    of (purchase time − first view time) across fully-converted users —
    the latency companion to olap_funnel_conversion's counts.

    Same chain-of-mins as the funnel (three user-keyed aggregations
    sharing one partitioning); percentiles interpolate over exact int64
    microsecond gaps (doubles hold integers < 2^53 exactly, and both
    engines run the identical percentile_cont formula), then round to
    centiseconds portably."""
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
    us = (
        F.unix_micros(F.col("t3")) - F.unix_micros(F.col("t1"))
    ).alias("us")
    ttc = t3.join(t1, "user_id").select(us)
    return ttc.agg(
        F.count("*").alias("n_converted"),
        pround(F.percentile(F.col("us"), F.lit(0.5)) / F.lit(1000000.0), 2).alias(
            "p50_sec"
        ),
        pround(F.percentile(F.col("us"), F.lit(0.9)) / F.lit(1000000.0), 2).alias(
            "p90_sec"
        ),
    )


# ---------------------------------------------------------------------------
# Bollinger bands: rolling mean ± 2σ over the daily per-type revenue series
# ---------------------------------------------------------------------------

BOLL_WINDOW = 7  # trailing days (ROWS frame)

BOLLINGER_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
),
roll AS (
  SELECT event_type, d,
         CAST(sum(cents)         OVER w7 AS BIGINT) AS s,
         CAST(sum(cents * cents) OVER w7 AS BIGINT) AS ss,
         CAST(count(*)           OVER w7 AS BIGINT) AS n
  FROM daily
  WINDOW w7 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN {BOLL_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       strftime(d, '%Y-%m-%d') AS dt,
       n AS n_days,
       floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 * 100 + 0.5)
         / 100.0 AS mid,
       floor((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
              + 2.0 * sqrt(CAST(n * ss - s * s AS DOUBLE)
                           / CAST(n * n AS DOUBLE))) / 100.0 * 100 + 0.5)
         / 100.0 AS upper,
       floor((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
              - 2.0 * sqrt(CAST(n * ss - s * s AS DOUBLE)
                           / CAST(n * n AS DOUBLE))) / 100.0 * 100 + 0.5)
         / 100.0 AS lower
FROM roll
"""


@query("olap_bollinger_bands", oracle=BOLLINGER_ORACLE)
def olap_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over daily per-type revenue: trailing-{BOLL_WINDOW}-day
    rolling mean ± 2σ (population), the volatility envelope read against
    olap_ohlc_bars / olap_cusum_drift for regime shifts.

    Cross-engine exactness: the rolling sum and sum-of-squares accumulate
    exact int64 cents inside the ROWS frame; variance is the integer
    identity (n·Σx² − (Σx)²)/n² — one double division — and sqrt is
    IEEE-exactly-rounded, so identical inputs give identical bands in
    both engines (the functions/compare.py 'prefer sqrt over ln' rule).

    Scale shape: one map-combinable daily aggregation, then a windowed
    pass over the TINY per-type daily series (|types|×|days| rows); the
    ROWS frame is O(1) running state per row, never a per-row rescan."""
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.sum(cents).alias("cents"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(BOLL_WINDOW - 1), Window.currentRow)
    )
    roll = daily.select(
        "event_type",
        "d",
        F.sum("cents").over(w7).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(w7).alias("ss"),
        F.count("*").over(w7).alias("n"),
    )
    mean_c = F.col("s").cast("double") / F.col("n").cast("double")
    sd_c = F.sqrt(
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
        / (F.col("n") * F.col("n")).cast("double")
    )
    return roll.select(
        "event_type",
        fmt_date("d").alias("dt"),
        F.col("n").alias("n_days"),
        pround(mean_c / F.lit(100.0), 2).alias("mid"),
        pround((mean_c + F.lit(2.0) * sd_c) / F.lit(100.0), 2).alias("upper"),
        pround((mean_c - F.lit(2.0) * sd_c) / F.lit(100.0), 2).alias("lower"),
    )


# ---------------------------------------------------------------------------
# Proportional budget allocation (largest-remainder / Hamilton method)
# ---------------------------------------------------------------------------

ALLOC_BUDGET = 1_000_000  # ppm units allocated per month

ALLOC_ORACLE = f"""
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         strftime(o_orderdate, '%Y-%m-%d') AS dt,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
quoted AS (
  SELECT month, dt, cents,
         CAST(sum(cents) OVER m AS BIGINT)                        AS total,
         CAST(({ALLOC_BUDGET} * cents) // sum(cents) OVER m AS BIGINT)
                                                                  AS quota,
         CAST(({ALLOC_BUDGET} * cents) % sum(cents) OVER m AS BIGINT)
                                                                  AS frac
  FROM daily
  WINDOW m AS (PARTITION BY month)
),
ranked AS (
  SELECT month, dt, quota,
         CAST({ALLOC_BUDGET} - sum(quota) OVER (PARTITION BY month) AS BIGINT)
           AS leftover,
         row_number() OVER (PARTITION BY month
                            ORDER BY frac DESC, dt ASC) AS rk
  FROM quoted
)
SELECT month, dt,
       CAST(quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_ppm
FROM ranked
"""


@query("olap_budget_allocation", oracle=ALLOC_ORACLE)
def olap_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) proportional allocation: each month's
    fixed budget of {ALLOC_BUDGET} ppm units is split across its days in
    proportion to daily GMV, integer quotas topped up by the days with
    the largest fractional remainders until the budget is EXACTLY
    exhausted (Σ alloc per month ≡ budget — the invariant naive
    per-row rounding violates; the finance/targeting allocation op).

    Pure int64 end-to-end: quota = ⌊B·cents/total⌋ and the remainder
    ranking uses (B·cents) mod total — no doubles anywhere, so both
    engines agree bit-for-bit. One exchange on month; the quota windows
    and the remainder rank share its partitioning (the rank sorts
    |days-per-month| ≈ 31 rows per group)."""
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("dt"),
    ).agg(F.sum(cents).alias("cents"))
    m = Window.partitionBy("month")
    # integer division on BOTH sides: DuckDB's / on bigints is a double
    # divide whose BIGINT cast ROUNDS, while Spark's cast truncates —
    # `//` vs `div` keeps the whole chain in exact int64
    quoted = daily.withColumn("total", F.sum("cents").over(m)).select(
        "month",
        "dt",
        F.expr(f"CAST(({ALLOC_BUDGET} * cents) div total AS BIGINT)").alias(
            "quota"
        ),
        F.expr(f"CAST(({ALLOC_BUDGET} * cents) % total AS BIGINT)").alias(
            "frac"
        ),
    )
    ranked = quoted.select(
        "month",
        "dt",
        "quota",
        (F.lit(ALLOC_BUDGET) - F.sum("quota").over(m)).alias("leftover"),
        F.row_number()
        .over(Window.partitionBy("month").orderBy(F.desc("frac"), F.asc("dt")))
        .alias("rk"),
    )
    return ranked.select(
        "month",
        "dt",
        (
            F.col("quota")
            + F.when(F.col("rk") <= F.col("leftover"), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("alloc_ppm"),
    )


# ---------------------------------------------------------------------------
# Pearson correlation matrix over daily per-type revenue series
# ---------------------------------------------------------------------------

CORR_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) // 100
              AS BIGINT) AS dollars
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT)              AS n,
         CAST(sum(a.dollars) AS BIGINT)        AS sx,
         CAST(sum(b.dollars) AS BIGINT)        AS sy,
         CAST(sum(a.dollars * a.dollars) AS BIGINT) AS sxx,
         CAST(sum(b.dollars * b.dollars) AS BIGINT) AS syy,
         CAST(sum(a.dollars * b.dollars) AS BIGINT) AS sxy
  FROM daily a JOIN daily b
    ON b.d = a.d AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n,
       floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS corr
FROM pairs
"""


@query("olap_corr_matrix", oracle=CORR_ORACLE)
def olap_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between every pair of event types' daily
    revenue series — the co-movement screen behind basket/affinity
    analysis (upper triangle; |types|·(|types|−1)/2 rows).

    Exactness: daily sums quantize to integer DOLLARS (scale-invariant
    for correlation, and the coarser grid keeps n·Σxy inside int64 at
    any SF — the cents grid would overflow near sf1); all five moments
    are exact int64; the final expression is one double chain with
    IEEE-exact sqrt, identical in both engines.

    Scale shape: one map-combinable daily aggregation; the pair join and
    moment aggregation run on the |types|×|days| table — thousands of
    rows regardless of corpus size."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.expr(
            "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) div 100"
            " AS BIGINT)"
        ).alias("dollars")
    )
    a = daily.select(
        F.col("event_type").alias("type_a"),
        "d",
        F.col("dollars").alias("x"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("d").alias("d2"),
        F.col("dollars").alias("y"),
    )
    pairs = (
        a.join(
            b,
            (F.col("d2") == F.col("d"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    corr = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (
            F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
            )
            * F.sqrt(
                (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            )
        )
    )
    return pairs.select("type_a", "type_b", "n", pround(corr, 6).alias("corr"))


# ---------------------------------------------------------------------------
# Decile lift / gains table (model-evaluation readout)
# ---------------------------------------------------------------------------

LIFT_TRAIN_END = "1999-01-01"  # score window: orders before; outcome: after

LIFT_ORACLE = f"""
WITH scored AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '{LIFT_TRAIN_END}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS score,
         CAST(max(CASE WHEN o_orderdate >= TIMESTAMP '{LIFT_TRAIN_END}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS responded
  FROM orders GROUP BY 1
),
decs AS (
  SELECT ntile(10) OVER (ORDER BY score DESC, custkey ASC) AS decile,
         score, responded
  FROM scored
),
per AS (
  SELECT decile,
         CAST(count(*) AS BIGINT)      AS n_customers,
         CAST(sum(responded) AS BIGINT) AS responders
  FROM decs GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_customers) AS BIGINT) AS n_all,
         CAST(sum(responders) AS BIGINT)  AS r_all
  FROM per
)
SELECT decile, n_customers, responders,
       CAST(floor(CAST(responders AS DOUBLE) * 1000000.0
                  / CAST(n_customers AS DOUBLE)) AS BIGINT) AS rate6,
       CAST(floor((CAST(responders AS DOUBLE) / CAST(n_customers AS DOUBLE))
                  / (CAST(r_all AS DOUBLE) / CAST(n_all AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS lift6
FROM per CROSS JOIN tot
"""


@query("olap_model_lift_table", oracle=LIFT_ORACLE)
def olap_model_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table — the standard propensity-model evaluation
    readout: customers scored by pre-{LIFT_TRAIN_END} order frequency,
    outcome = ordered at-or-after that date; per score-decile response
    rate and lift vs the base rate. A high-score decile with lift ≫ 1e6
    (1.0) validates the score; the table is what campaign-targeting ADS
    layers serve.

    ntile runs over (score DESC, custkey) — a total order, so decile
    boundaries are identical in both engines; rates/lifts are single
    double chains over exact int64 counts. The ntile sort ranks
    per-customer AGGREGATES, and the final table is 10 rows. The global
    ntile is a single-partition sort of |customers| aggregate rows — at
    billions of customers swap to broadcast percentile thresholds
    (exactly olap_pareto_segments' banding), which changes only how the
    decile id is assigned."""
    o = table(spark, sf_dir, "orders")
    scored = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(
            F.when(F.col("o_orderdate") < F.lit(LIFT_TRAIN_END), 1).otherwise(0)
        ).alias("score"),
        F.max(
            F.when(F.col("o_orderdate") >= F.lit(LIFT_TRAIN_END), 1).otherwise(
                0
            )
        ).alias("responded"),
    )
    decs = scored.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.desc("score"), F.asc("custkey"))),
    )
    per = decs.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("responded").alias("responders"),
    )
    tot = per.agg(
        F.sum("n_customers").alias("n_all"), F.sum("responders").alias("r_all")
    )
    rate = F.floor(
        F.col("responders").cast("double")
        * F.lit(1000000.0)
        / F.col("n_customers").cast("double")
    )
    lift = F.floor(
        (F.col("responders").cast("double") / F.col("n_customers").cast("double"))
        / (F.col("r_all").cast("double") / F.col("n_all").cast("double"))
        * F.lit(1000000.0)
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_customers",
        "responders",
        rate.cast("bigint").alias("rate6"),
        lift.cast("bigint").alias("lift6"),
    )


# ---------------------------------------------------------------------------
# Growth accounting: new / retained / resurrected / churned per day
# ---------------------------------------------------------------------------

GROWTH_ORACLE = """
WITH active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
tagged AS (
  SELECT user_id, d,
         lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d,
         lead(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d
  FROM active
),
states AS (
  SELECT d,
         CAST(sum(CASE WHEN prev_d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users,
         CAST(sum(CASE WHEN prev_d = d - 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS retained,
         CAST(sum(CASE WHEN prev_d IS NOT NULL AND prev_d < d - 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
  FROM tagged GROUP BY 1
),
churn AS (
  SELECT d + 1 AS d, CAST(count(*) AS BIGINT) AS churned
  FROM tagged
  WHERE next_d IS DISTINCT FROM d + 1
  GROUP BY 1
)
SELECT strftime(s.d, '%Y-%m-%d') AS dt,
       s.new_users, s.retained, s.resurrected,
       CAST(coalesce(c.churned, 0) AS BIGINT) AS churned_from_prev
FROM states s LEFT JOIN churn c ON c.d = s.d
"""


@query("olap_growth_accounting", oracle=GROWTH_ORACLE)
def olap_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting — the canonical DAU decomposition: each
    active user-day classified as NEW (first day ever), RETAINED (also
    active yesterday), or RESURRECTED (returning after a gap), plus the
    count of users who were active the previous day and did not return
    (churned-from-prev; includes last-day-of-data users by the standard
    convention, identical in both engines). new+retained+resurrected =
    DAU, the identity the invariant test pins.

    One exchange on user_id for the distinct + lag/lead windows; the
    day-level states aggregate is map-combinable; churn joins the tiny
    |days| table."""
    ev = table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    tagged = active.select(
        "user_id",
        "d",
        F.lag("d").over(w).alias("prev_d"),
        F.lead("d").over(w).alias("next_d"),
    )
    states = tagged.groupBy("d").agg(
        F.sum(F.when(F.col("prev_d").isNull(), 1).otherwise(0)).alias(
            "new_users"
        ),
        F.sum(
            F.when(F.col("prev_d") == F.date_sub("d", 1), 1).otherwise(0)
        ).alias("retained"),
        F.sum(
            F.when(
                F.col("prev_d").isNotNull()
                & (F.col("prev_d") < F.date_sub("d", 1)),
                1,
            ).otherwise(0)
        ).alias("resurrected"),
    )
    churn = (
        tagged.where(
            ~F.col("next_d").eqNullSafe(F.date_add("d", 1))
        )
        .groupBy(F.date_add("d", 1).alias("d"))
        .agg(F.count("*").alias("churned"))
    )
    return (
        states.join(F.broadcast(churn), "d", "left")
        .select(
            fmt_date("d").alias("dt"),
            "new_users",
            "retained",
            "resurrected",
            F.coalesce("churned", F.lit(0)).alias("churned_from_prev"),
        )
    )


# ---------------------------------------------------------------------------
# A/B sample-ratio-mismatch (SRM) chi-square check
# ---------------------------------------------------------------------------

SRM_ORACLE = """
WITH assign AS (
  SELECT DISTINCT user_id, CAST(user_id % 2 AS BIGINT) AS variant
  FROM events
),
counts AS (
  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM assign
)
SELECT n0, n1,
       floor(CAST((2 * n0 - (n0 + n1)) * (2 * n0 - (n0 + n1))
                  + (2 * n1 - (n0 + n1)) * (2 * n1 - (n0 + n1)) AS DOUBLE)
             / CAST(2 * (n0 + n1) AS DOUBLE) * 1000000.0 + 0.5)
         / 1000000.0 AS chi2,
       CAST(CASE WHEN CAST((2 * n0 - (n0 + n1)) * (2 * n0 - (n0 + n1))
                           + (2 * n1 - (n0 + n1)) * (2 * n1 - (n0 + n1))
                      AS DOUBLE)
                      / CAST(2 * (n0 + n1) AS DOUBLE) > 3.841
                 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM counts
"""


@query("olap_abtest_srm_check", oracle=SRM_ORACLE)
def olap_abtest_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard for the A/B pipeline (the validity
    check that must pass BEFORE olap_abtest_ztest's effect readout is
    trusted): chi-square goodness-of-fit of the observed 50/50 split
    (same user_id%2 assignment as the z-test), flagged at the p<0.05
    critical value 3.841. χ² for two equal-expected cells reduces to
    ((2n0−N)² + (2n1−N)²)/(2N) — integer numerators (4·Δ² ≤ 4N² keeps
    int64 to ~1.5e9 users), one division, portable rounding.

    One distinct on user_id, then a two-cell reduce — nothing else."""
    ev = table(spark, sf_dir, "events")
    assign = ev.select(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).distinct()
    counts = assign.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
    )
    n = F.col("n0") + F.col("n1")
    num = (2 * F.col("n0") - n) * (2 * F.col("n0") - n) + (
        2 * F.col("n1") - n
    ) * (2 * F.col("n1") - n)
    chi2 = num.cast("double") / (2 * n).cast("double")
    return counts.select(
        "n0",
        "n1",
        pround(chi2, 6).alias("chi2"),
        F.when(chi2 > F.lit(3.841), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# Year-over-year growth (the lag-12 companion to olap_monthly_growth's MoM)
# ---------------------------------------------------------------------------

YOY_ORACLE = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(strftime(o_orderdate, '%Y') AS BIGINT)  AS yr,
         CAST(strftime(o_orderdate, '%m') AS BIGINT)  AS mo,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2, 3
)
SELECT a.month,
       floor(CAST(a.cents AS DOUBLE) / 100.0 * 100 + 0.5) / 100.0 AS gmv,
       CAST(a.cents - p.cents AS BIGINT) AS delta_cents,
       CAST(floor(CAST(a.cents - p.cents AS DOUBLE) * 1000000.0
                  / CAST(p.cents AS DOUBLE)) AS BIGINT) AS yoy_growth6
FROM monthly a
JOIN monthly p ON p.yr = a.yr - 1 AND p.mo = a.mo
"""


@query("olap_yoy_growth", oracle=YOY_ORACLE)
def olap_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly GMV growth — the seasonal-safe companion to
    olap_monthly_growth's MoM readout (lag-12 as a self-join on
    (year−1, month) over the tiny monthly aggregate, robust to missing
    months where a window lag(12) silently misaligns). Integer cents
    end-to-end; the growth ratio is one floor(double) chain."""
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
    ).agg(F.sum(cents).alias("cents"))
    prev = monthly.select(
        F.col("yr").alias("p_yr"),
        F.col("mo").alias("p_mo"),
        F.col("cents").alias("p_cents"),
    )
    j = monthly.join(
        prev,
        (F.col("p_yr") == F.col("yr") - 1) & (F.col("p_mo") == F.col("mo")),
    )
    return j.select(
        "month",
        pround(F.col("cents").cast("double") / F.lit(100.0), 2).alias("gmv"),
        (F.col("cents") - F.col("p_cents")).alias("delta_cents"),
        F.floor(
            (F.col("cents") - F.col("p_cents")).cast("double")
            * F.lit(1000000.0)
            / F.col("p_cents").cast("double")
        )
        .cast("bigint")
        .alias("yoy_growth6"),
    )


# ---------------------------------------------------------------------------
# Join-key skew report (the pre-flight for salting / AQE skew decisions)
# ---------------------------------------------------------------------------

SKEW_KEYS = (
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)


def _skew_report_oracle() -> str:
    parts = []
    for rel, key in SKEW_KEYS:
        parts.append(
            f"""(
  WITH counts AS (
    SELECT {key} AS k, CAST(count(*) AS BIGINT) AS ct FROM {rel} GROUP BY 1
  ),
  top AS (
    SELECT k, ct FROM counts ORDER BY ct DESC, k ASC LIMIT 1
  ),
  tot AS (
    SELECT CAST(count(*) AS BIGINT) AS dk, CAST(sum(ct) AS BIGINT) AS n
    FROM counts
  )
  SELECT '{rel}' AS rel, '{key}' AS key,
         tot.dk AS distinct_keys,
         CAST(top.k AS BIGINT) AS top_key,
         top.ct AS top_ct,
         tot.n AS total_rows,
         CAST(floor(CAST(top.ct AS DOUBLE) * 1000000.0
                    / CAST(tot.n AS DOUBLE)) AS BIGINT) AS top_share6
  FROM top CROSS JOIN tot
)"""
        )
    return "\nUNION ALL\n".join(parts)


@query("olap_join_skew_report", oracle=_skew_report_oracle())
def olap_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew pre-flight: for each hot join key, the distinct-key
    count, the heaviest key and its row share — the numbers that decide
    between a plain shuffle join, salting (operators/skew.py), or AQE
    skew splitting BEFORE a 100 TB join is launched. Per key: one
    map-combinable count, a TakeOrdered(1) for the top key (never a
    global sort), and a two-scalar reduce; ties break to the smallest
    key in both engines."""
    out = None
    for rel, key in SKEW_KEYS:
        t = table(spark, sf_dir, rel)
        counts = t.groupBy(F.col(key).alias("k")).agg(
            F.count("*").alias("ct")
        )
        top = counts.orderBy(F.desc("ct"), F.asc("k")).limit(1)
        tot = counts.agg(
            F.count("*").alias("distinct_keys"),
            F.sum("ct").alias("total_rows"),
        )
        row = top.crossJoin(F.broadcast(tot)).select(
            F.lit(rel).alias("rel"),
            F.lit(key).alias("key"),
            "distinct_keys",
            F.col("k").cast("bigint").alias("top_key"),
            F.col("ct").alias("top_ct"),
            "total_rows",
            F.floor(
                F.col("ct").cast("double")
                * F.lit(1000000.0)
                / F.col("total_rows").cast("double")
            )
            .cast("bigint")
            .alias("top_share6"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Shared-dialect SQL entry: ONE ANSI-SQL text runs verbatim on both engines
# ---------------------------------------------------------------------------

SHARED_SQL = """
WITH cust_orders AS (
  SELECT o_custkey,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
per AS (
  SELECT o_custkey, yr,
         CAST(sum(cents) AS BIGINT)  AS cents,
         CAST(count(*) AS BIGINT)    AS order_ct
  FROM cust_orders
  GROUP BY o_custkey, yr
),
ranked AS (
  SELECT o_custkey, yr, cents, order_ct,
         row_number() OVER (PARTITION BY yr
                            ORDER BY cents DESC, o_custkey ASC) AS rn
  FROM per
)
SELECT yr, o_custkey AS custkey, cents, order_ct, rn AS yr_rank
FROM ranked WHERE rn <= 5
"""


@query("sql_top_customers_by_year", oracle=SHARED_SQL)
def sql_top_customers_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-first interface demonstration (the reference's 7 DWD jobs are
    Flink SQL — rt/app/dwd/db/*.java — so the engine must accept raw SQL,
    not just the DataFrame DSL): top-5 customers by spend per year,
    written ONCE in dialect-neutral ANSI SQL (EXTRACT / floor / CAST /
    windowed row_number / CTEs) and executed VERBATIM by both Spark and
    the DuckDB oracle — the query text IS the oracle text, so any
    divergence is an engine-semantics bug by definition.

    Catalyst plans it identically to the DSL equivalent: map-combinable
    per-(cust, yr) aggregation, one exchange for the per-year rank
    window over aggregates."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(SHARED_SQL)


# ---------------------------------------------------------------------------
# Binned interval-overlap join (range join): which order lines were "in
# fulfillment" at overlapping times, per supplier. The naive formulation is
# a non-equi self-join (a.s < b.e AND b.s < a.e) — a nested-loop O(n²) scan
# Spark cannot hash. The grid-bin identity turns it into an EQUI-join:
# every interval is exploded to the coarse time bins it spans, candidates
# meet only inside a shared (supplier, bin) bucket, and each true pair is
# counted exactly once in the bin containing max(start_a, start_b) — a day
# both intervals provably contain. Bin width is chosen at the interval
# length cap, so each interval lands in ≤2 bins (bounded fan-out); at
# 100 TB hot (supplier, bin) cells are salted like any skewed equi-key.
# ---------------------------------------------------------------------------

OVERLAP_BIN_DAYS = 32  # ≥ the 30-day interval cap → ≤2 bins per interval
OVERLAP_CAP_DAYS = 30  # fulfillment intervals capped at 30 days (fixture
# shipdates are synthetic/uncorrelated; the cap keeps pair density real)

INTERVAL_OVERLAP_ORACLE = f"""
WITH iv AS (
  SELECT l.l_suppkey AS suppkey,
         l.l_orderkey * 16 + l.l_linenumber AS iid,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(o.o_orderdate AS DATE)) AS BIGINT) AS s,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS e
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > o.o_orderdate
    AND date_diff('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) <= {OVERLAP_CAP_DAYS}
)
SELECT a.suppkey AS suppkey, CAST(count(*) AS BIGINT) AS overlap_pairs
FROM iv a JOIN iv b
  ON a.suppkey = b.suppkey AND a.iid < b.iid
 AND a.s < b.e AND b.s < a.e
GROUP BY 1
"""


def binned_overlap_pairs(
    iv: DataFrame, bin_days: int = OVERLAP_BIN_DAYS
) -> DataFrame:
    """(suppkey, iid, s, e) half-open intervals → per-suppkey count of
    overlapping pairs via the grid-bin equi-join. ``bin_days`` must be
    ≥ the longest interval for the ≤2-bins-per-interval bound (correctness
    holds for any width; width only controls fan-out vs bucket density)."""
    B = bin_days
    binned = iv.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / F.lit(B)),
                F.floor((F.col("e") - 1) / F.lit(B)),
            )
        ),
    )
    a, b = binned.alias("a"), binned.alias("b")
    # shuffle-HASH, not sort-merge: both sides are the same exploded
    # high-cardinality set — the sort phase buys nothing (same exchange)
    pairs = a.join(
        b.hint("shuffle_hash"),
        (F.col("a.suppkey") == F.col("b.suppkey"))
        & (F.col("a.bin") == F.col("b.bin"))
        & (F.col("a.iid") < F.col("b.iid")),
    ).where(
        (F.col("a.s") < F.col("b.e"))
        & (F.col("b.s") < F.col("a.e"))
        # count each pair once: only in the bin holding max(s_a, s_b) — a
        # day both intervals contain whenever they overlap
        & (
            F.col("a.bin")
            == F.floor(F.greatest(F.col("a.s"), F.col("b.s")) / F.lit(B))
        )
    )
    return pairs.groupBy(F.col("a.suppkey").alias("suppkey")).agg(
        F.count("*").cast("bigint").alias("overlap_pairs")
    )


@query("ext_interval_overlap_pairs", oracle=INTERVAL_OVERLAP_ORACLE)
def ext_interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count overlapping fulfillment-interval pairs per supplier with the
    grid-bin equi-join (oracle: the textbook quadratic non-equi self-join —
    same counts, infeasible shape at scale). See the module comment for
    the dedup identity; [s, e) is [orderdate, shipdate) in epoch days,
    intervals capped at {cap} days, bin width {bin} days.""".format(
        cap=OVERLAP_CAP_DAYS, bin=OVERLAP_BIN_DAYS
    )
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    epoch = F.lit("1970-01-01").cast("date")
    iv = (
        li.select("l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("l_shipdate") > F.col("o_orderdate"))
            & (
                F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
                <= OVERLAP_CAP_DAYS
            )
        )
        .select(
            F.col("l_suppkey").alias("suppkey"),
            (F.col("l_orderkey") * 16 + F.col("l_linenumber")).alias("iid"),
            F.datediff(F.to_date("o_orderdate"), epoch)
            .cast("bigint")
            .alias("s"),
            F.datediff(F.to_date("l_shipdate"), epoch)
            .cast("bigint")
            .alias("e"),
        )
    )
    return binned_overlap_pairs(iv)


# ---------------------------------------------------------------------------
# Table reconciliation: the audit every migration/backfill runs — full-outer
# join two snapshots on the PK and classify every key as left-only /
# right-only / value-mismatch / equal, with per-column mismatch counts.
# The "restated" side derives deterministically from the fixture (price
# restatement on one key slice, dropped keys on another, late-arriving keys
# on a third) so the diff exercises all four classes.
# ---------------------------------------------------------------------------

RECON_ORACLE = """
WITH restated AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 0.01
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 89 = 0 THEN '5-LOW'
              ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % 101 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 103 = 0
), j AS (
  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
         a.o_orderkey IS NULL AS lmiss, b.o_orderkey IS NULL AS rmiss,
         CASE WHEN a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                   AND CAST(floor(a.o_totalprice * 100 + 0.5) AS BIGINT)
                    <> CAST(floor(b.o_totalprice * 100 + 0.5) AS BIGINT)
              THEN 1 ELSE 0 END AS price_ne,
         CASE WHEN a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                   AND a.o_orderpriority <> b.o_orderpriority
              THEN 1 ELSE 0 END AS prio_ne
  FROM orders a FULL OUTER JOIN restated b ON a.o_orderkey = b.o_orderkey
)
SELECT CASE WHEN rmiss THEN 'left_only'
            WHEN lmiss THEN 'right_only'
            WHEN price_ne = 1 OR prio_ne = 1 THEN 'mismatch'
            ELSE 'equal' END AS status,
       CAST(count(*) AS BIGINT) AS key_ct,
       CAST(sum(price_ne) AS BIGINT) AS totalprice_ne_ct,
       CAST(sum(prio_ne) AS BIGINT) AS orderpriority_ne_ct
FROM j
GROUP BY 1
"""


@query("olap_reconciliation_report", oracle=RECON_ORACLE)
def olap_reconciliation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot reconciliation (migration/backfill audit): full-outer
    join on the PK, every key classified left_only / right_only /
    mismatch / equal, with per-column not-equal counts (money compared in
    integer cents — float-format drift must not read as a diff).

    Scale shape: ONE full-outer shuffle join on the PK (both sides fact-
    sized — this is the one join class where sort-merge IS the right
    physical choice) and a 4-key aggregation; per-column comparisons are
    codegen'd conditionals, not per-column joins."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    restated = (
        o.where(F.col("o_orderkey") % 101 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 0.01
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            F.when(F.col("o_orderkey") % 89 == 0, F.lit("5-LOW"))
            .otherwise(F.col("o_orderpriority"))
            .alias("o_orderpriority"),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 103 == 0).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderpriority",
            )
        )
    )
    a, b = o.alias("a"), restated.alias("b")
    cents = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("bigint")  # noqa: E731
    j = a.join(
        b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    ).select(
        F.col("a.o_orderkey").isNull().alias("lmiss"),
        F.col("b.o_orderkey").isNull().alias("rmiss"),
        F.when(
            F.col("a.o_orderkey").isNotNull()
            & F.col("b.o_orderkey").isNotNull()
            & (cents(F.col("a.o_totalprice")) != cents(F.col("b.o_totalprice"))),
            1,
        )
        .otherwise(0)
        .alias("price_ne"),
        F.when(
            F.col("a.o_orderkey").isNotNull()
            & F.col("b.o_orderkey").isNotNull()
            & (F.col("a.o_orderpriority") != F.col("b.o_orderpriority")),
            1,
        )
        .otherwise(0)
        .alias("prio_ne"),
    )
    status = (
        F.when(F.col("rmiss"), "left_only")
        .when(F.col("lmiss"), "right_only")
        .when((F.col("price_ne") == 1) | (F.col("prio_ne") == 1), "mismatch")
        .otherwise("equal")
    )
    return j.groupBy(status.alias("status")).agg(
        F.count("*").cast("bigint").alias("key_ct"),
        F.sum("price_ne").cast("bigint").alias("totalprice_ne_ct"),
        F.sum("prio_ne").cast("bigint").alias("orderpriority_ne_ct"),
    )
