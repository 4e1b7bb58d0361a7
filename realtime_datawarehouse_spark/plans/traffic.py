"""Traffic/log-side operator queries over the ``events`` stream table:
projection/routing (P3/P4, R1/R3), event-time tumble windows (A1–A3),
the stateful families ST1–ST8 in their exact batch (window-function)
formulation, and the interval join J8 (SURVEY.md §2.3/§2.4/§2.6/§2.7).

Fixture binding (FIXTURES.md §4): ``events(user_id, event_type, ts, value,
props)`` plays topic_log — user_id ≈ mid, event_type ≈ page_id, props is the
nested-JSON payload. Sessions/entries are gap-defined (no previous event for
the same user within ENTRY_GAP), replacing the reference's
``last_page_id is null`` entry marker with an equivalent, deterministic
predicate over the fixture's flat schema.

Batch-vs-streaming: each STn here is the *oracle-exact* batch form (window
functions over partitions, per SURVEY §2.7's table); the streaming forms
live in ``streaming/`` and are verified against these in tests.

Scale notes: all window functions partition by ``user_id`` (or
(user_id, day)) — one hash shuffle, then per-partition sorted scans; no
driver-side state. Tumble aggregations are map-side-combined window+key
groupBys. Nothing here collects to the driver.
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

ENTRY_GAP_MS = 10 * 60 * 1000  # session entry = no prior event within 10 min
WINDOW = "10 minutes"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# P3 — ETL filter (DimApp.java:127-144: drop bootstrap markers, require data).
# Analog: drop 'error' envelopes, require props payload.
# --------------------------------------------------------------------------

P3_ORACLE = """
SELECT
  event_id,
  user_id,
  event_type,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time
FROM events
WHERE event_type NOT IN ('error') AND props IS NOT NULL
"""


@query("p3_etl_filter", oracle=P3_ORACLE)
def p3_etl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.where(
        (~F.col("event_type").isin("error")) & F.col("props").isNotNull()
    ).select(
        "event_id",
        "user_id",
        "event_type",
        fmt_ts("ts").alias("event_time"),
    )


# --------------------------------------------------------------------------
# P4 — map/JSON element projection (DwdTradeCartAdd.java:31-44: data['id'] …).
# props is the JSON payload; pull a typed field out of it.
# --------------------------------------------------------------------------

P4_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
WHERE props IS NOT NULL
"""


@query("p4_json_map_projection", oracle=P4_ORACLE)
def p4_json_map_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.where(F.col("props").isNotNull()).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


# --------------------------------------------------------------------------
# R1 — multi-way demultiplex via side outputs
# (DwdTrafficBaseLogSplit.java:148-237: one event can fan out to err / start /
# page / display / action). Spark-first: build the branch list per row, then
# explode — a single narrow pass; no N scans of the source.
# --------------------------------------------------------------------------

R1_ORACLE = """
SELECT event_id,
       unnest(CASE event_type
              WHEN 'error'    THEN ['err']
              WHEN 'signup'   THEN ['start']
              WHEN 'view'     THEN ['page']
              WHEN 'click'    THEN ['page', 'display']
              WHEN 'purchase' THEN ['page', 'action']
              ELSE ['page'] END) AS branch
FROM events
"""


@query("r1_demux_side_outputs", oracle=R1_ORACLE)
def r1_demux_side_outputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    branches = (
        F.when(F.col("event_type") == "error", F.array(F.lit("err")))
        .when(F.col("event_type") == "signup", F.array(F.lit("start")))
        .when(F.col("event_type") == "view", F.array(F.lit("page")))
        .when(
            F.col("event_type") == "click", F.array(F.lit("page"), F.lit("display"))
        )
        .when(
            F.col("event_type") == "purchase",
            F.array(F.lit("page"), F.lit("action")),
        )
        .otherwise(F.array(F.lit("page")))
    )
    return ev.select("event_id", F.explode(branches).alias("branch"))


# --------------------------------------------------------------------------
# R3 — same-type stream union (DwdTrafficUserJumpDetail.java:129;
# DwsTrafficVcChArIsNewPageViewWindow.java:157). unionByName of two
# projections of independent filters.
# --------------------------------------------------------------------------

R3_ORACLE = """
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time, 'signup' AS src
FROM events WHERE event_type = 'signup'
UNION ALL
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time, 'purchase' AS src
FROM events WHERE event_type = 'purchase'
"""


@query("r3_union_same_type", oracle=R3_ORACLE)
def r3_union_same_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)

    def branch(t: str) -> DataFrame:
        return ev.where(F.col("event_type") == t).select(
            "user_id",
            fmt_ts("ts").alias("event_time"),
            F.lit(t).alias("src"),
        )

    return branch("signup").unionByName(branch("purchase"))


# --------------------------------------------------------------------------
# A1 — tumble-window count by key
# (DwsTrafficSourceKeywordPageViewWindow.java:61-69) with formatted stt/edt.
# --------------------------------------------------------------------------

A1_ORACLE = """
SELECT
  strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS stt,
  strftime(time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes',
           '%Y-%m-%d %H:%M:%S')                                         AS edt,
  event_type,
  count(*) AS keyword_count
FROM events
GROUP BY 1, 2, 3
"""


@query("a1_tumble_count_by_key", oracle=A1_ORACLE)
def a1_tumble_count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", WINDOW), "event_type")
        .agg(F.count("*").alias("keyword_count"))
        .select(
            fmt_ts(F.col("window.start")).alias("stt"),
            fmt_ts(F.col("window.end")).alias("edt"),
            "event_type",
            "keyword_count",
        )
    )


# --------------------------------------------------------------------------
# A2 — keyed tumble window, multi-metric reduce
# (DwsTrafficVcChArIsNewPageViewWindow.java:173-216: 5 counters per
# (vc,ch,ar,is_new) key). Analog: count / exact-uv / money per
# (window, event_type).
# --------------------------------------------------------------------------

A2_ORACLE = f"""
SELECT
  strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS stt,
  event_type,
  count(*)                      AS pv_ct,
  count(DISTINCT user_id)       AS uv_ct,
  {dsum_sql('value')} AS dur_sum
FROM events
GROUP BY 1, 2
"""


@query("a2_tumble_multi_metric", oracle=A2_ORACLE)
def a2_tumble_multi_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", WINDOW), "event_type")
        .agg(
            F.count("*").alias("pv_ct"),
            F.countDistinct("user_id").alias("uv_ct"),
            dsum(F.col("value")).alias("dur_sum"),
        )
        .select(
            fmt_ts(F.col("window.start")).alias("stt"),
            "event_type",
            "pv_ct",
            "uv_ct",
            "dur_sum",
        )
    )


# --------------------------------------------------------------------------
# A3 — global (non-keyed) tumble window — the reference's parallelism-1
# windowAll (DwsTrafficHomeDetailPageViewWindow.java:143-169). In Spark an
# ungrouped window aggregation still computes partial aggregates in parallel;
# only the tiny per-window combine is single-keyed (SURVEY §7.4 #7).
# --------------------------------------------------------------------------

A3_ORACLE = f"""
SELECT
  strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS stt,
  count(*)                 AS pv_ct,
  count(DISTINCT user_id)  AS uv_ct,
  {dsum_sql('value')} AS value_sum
FROM events
GROUP BY 1
"""


@query("a3_global_tumble_window", oracle=A3_ORACLE)
def a3_global_tumble_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", WINDOW))
        .agg(
            F.count("*").alias("pv_ct"),
            F.countDistinct("user_id").alias("uv_ct"),
            dsum(F.col("value")).alias("value_sum"),
        )
        .select(
            fmt_ts(F.col("window.start")).alias("stt"),
            "pv_ct",
            "uv_ct",
            "value_sum",
        )
    )


# --------------------------------------------------------------------------
# ST1 — new-visitor flag repair (DwdTrafficBaseLogSplit.java:102-145): a
# claimed is_new=1 is rewritten to 0 when the device was seen on an earlier
# day. Batch form: compare against min(visit date) over the user.
# --------------------------------------------------------------------------

ST1_ORACLE = """
SELECT
  event_id,
  user_id,
  strftime(ts, '%Y-%m-%d') AS dt,
  CASE WHEN CAST(ts AS DATE) = min(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
       THEN 1 ELSE 0 END   AS is_new
FROM events
"""


@query("st1_new_visitor_repair", oracle=ST1_ORACLE)
def st1_new_visitor_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    d = F.to_date("ts")
    return ev.select(
        "event_id",
        "user_id",
        fmt_date("ts").alias("dt"),
        F.when(d == F.min(d).over(w), 1).otherwise(0).alias("is_new"),
    )


# --------------------------------------------------------------------------
# ST2 — daily unique-visitor detail (DwdTrafficUniqueVisitorDetail.java:51-88):
# keep only each device's first page view per day. Batch form:
# row_number over (user, day) ordered by time = 1.
# --------------------------------------------------------------------------

ST2_ORACLE = """
SELECT
  user_id,
  strftime(ts, '%Y-%m-%d')          AS dt,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts
FROM events
GROUP BY user_id, strftime(ts, '%Y-%m-%d')
"""


@query("st2_daily_unique_visitor", oracle=ST2_ORACLE)
def st2_daily_unique_visitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            fmt_date("ts").alias("dt"),
            fmt_ts("ts").alias("first_ts"),
        )
    )


# --------------------------------------------------------------------------
# ST3 — per-page-type daily UV, two states in one pass
# (DwsTrafficHomeDetailPageViewWindow.java:88-141: home vs good_detail).
# Analog pages: 'view' (home) and 'purchase' (good_detail).
# --------------------------------------------------------------------------

ST3_ORACLE = """
SELECT
  strftime(ts, '%Y-%m-%d') AS dt,
  count(DISTINCT CASE WHEN event_type = 'view'     THEN user_id END) AS home_uv_ct,
  count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS good_detail_uv_ct
FROM events
GROUP BY 1
"""


@query("st3_page_uv_two_states", oracle=ST3_ORACLE)
def st3_page_uv_two_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy(fmt_date("ts").alias("dt")).agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("home_uv_ct"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("good_detail_uv_ct"),
    )


# --------------------------------------------------------------------------
# ST4 — daily unique user + 7-day-returning flag
# (DwsUserUserLoginWindow.java:84-129: uuCt on first login of day, backCt when
# the gap since the previous login is ≥ 8 days). Batch form: lag over the
# distinct (user, day) grid.
# --------------------------------------------------------------------------

ST4_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), lagged AS (
  SELECT user_id, d, lag(d) OVER (PARTITION BY user_id ORDER BY d) AS pd
  FROM days
)
SELECT
  strftime(d, '%Y-%m-%d') AS dt,
  count(*)                AS uu_ct,
  count(CASE WHEN pd IS NOT NULL AND date_diff('day', pd, d) >= 8 THEN 1 END)
                          AS back_ct
FROM lagged
GROUP BY 1
"""


@query("st4_login_uu_and_back", oracle=ST4_ORACLE)
def st4_login_uu_and_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    lagged = days.withColumn("pd", F.lag("d").over(w))
    return lagged.groupBy(F.date_format("d", "yyyy-MM-dd").alias("dt")).agg(
        F.count("*").alias("uu_ct"),
        F.count(
            F.when(
                F.col("pd").isNotNull() & (F.datediff("d", "pd") >= 8), 1
            )
        ).alias("back_ct"),
    )


# --------------------------------------------------------------------------
# ST5 — daily unique cart-add user (DwsTradeCartAddUuWindow.java:76-98).
# Analog cart event: 'click'. The Spark plan keeps the reference's
# "emit first event per user per day, then count" shape.
# --------------------------------------------------------------------------

ST5_ORACLE = """
SELECT
  strftime(ts, '%Y-%m-%d')  AS dt,
  count(DISTINCT user_id)   AS cart_add_uu_ct
FROM events
WHERE event_type = 'click'
GROUP BY 1
"""


@query("st5_cart_add_uu", oracle=ST5_ORACLE)
def st5_cart_add_uu(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).where(F.col("event_type") == "click")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    firsts = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return firsts.groupBy(fmt_date("ts").alias("dt")).agg(
        F.count("*").alias("cart_add_uu_ct")
    )


# --------------------------------------------------------------------------
# ST7 — keep-latest dedup by version timestamp
# (DwsTradeSkuOrderWindow.java:113-155 + TimestampLtz3CompareUtil: buffer one
# row per key, keep the newest row_op_ts, flush on timer). Batch form:
# row_number() over key ordered by ts desc = 1.
# --------------------------------------------------------------------------

ST7_ORACLE = f"""
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time,
       event_type,
       {pround_sql('value')} AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@query("st7_keep_latest_dedup", oracle=ST7_ORACLE)
def st7_keep_latest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            fmt_ts("ts").alias("event_time"),
            "event_type",
            pround(F.col("value")).alias("value"),
        )
    )


# --------------------------------------------------------------------------
# ST8 — bounce ("user jump") detection, CEP pattern + timeout branch
# (DwdTrafficUserJumpDetail.java:86-129): a session entry is a bounce when the
# next event is another entry OR never arrives within the window. Batch form
# (SURVEY §2.7): lag for entry detection, lead for the follow-up test. With
# gap-defined entries the two conditions collapse: bounce ⇔ entry whose next
# event is > gap away or absent — exactly the reference's match ∪ timeout.
# --------------------------------------------------------------------------

ST8_ORACLE = f"""
WITH seq AS (
  SELECT event_id, user_id, ts,
         epoch_ms(ts) - epoch_ms(lag(ts)  OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS prev_gap,
         epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_ms(ts) AS next_gap
  FROM events
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS entry_time
FROM seq
WHERE (prev_gap IS NULL OR prev_gap > {ENTRY_GAP_MS})
  AND (next_gap IS NULL OR next_gap > {ENTRY_GAP_MS})
"""


@query("st8_bounce_detection", oracle=ST8_ORACLE)
def st8_bounce_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    seq = ev.select(
        "event_id",
        "user_id",
        "ts",
        (ms - F.lag(ms).over(w)).alias("prev_gap"),
        (F.lead(ms).over(w) - ms).alias("next_gap"),
    )
    return seq.where(
        (F.col("prev_gap").isNull() | (F.col("prev_gap") > ENTRY_GAP_MS))
        & (F.col("next_gap").isNull() | (F.col("next_gap") > ENTRY_GAP_MS))
    ).select("event_id", "user_id", fmt_ts("ts").alias("entry_time"))


# --------------------------------------------------------------------------
# J8 — interval join (TestIntervalJoin.java:67-78: keyed join within
# [-5ms, +5ms]; scaled to ±5 min for fixture density). Spark: equi-join on
# the key plus a time-band predicate — planner executes the equi part hashed,
# band as residual filter.
# --------------------------------------------------------------------------

J8_BAND_MS = 5 * 60 * 1000

J8_ORACLE = f"""
SELECT
  p.event_id AS purchase_id,
  c.event_id AS click_id,
  p.user_id  AS user_id,
  epoch_ms(c.ts) - epoch_ms(p.ts) AS offset_ms
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND epoch_ms(c.ts) BETWEEN epoch_ms(p.ts) - {J8_BAND_MS} AND epoch_ms(p.ts) + {J8_BAND_MS}
"""


@query("j8_interval_join", oracle=J8_ORACLE)
def j8_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.unix_millis("ts").alias("p_ms"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.unix_millis("ts").alias("c_ms"),
    )
    return (
        p.join(
            c,
            (p.user_id == c.c_user_id)
            & (c.c_ms >= p.p_ms - J8_BAND_MS)
            & (c.c_ms <= p.p_ms + J8_BAND_MS),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            (F.col("c_ms") - F.col("p_ms")).alias("offset_ms"),
        )
    )


# --------------------------------------------------------------------------
# P8 — per-record field add/remove (TableProcessFunction.java:57-61 put
# sink_table; DwdTrafficBaseLogSplit.java:168,213-214 remove err). Spark:
# withColumn + drop — declarative column ops the optimizer folds into the
# scan projection (the dropped column is never read: check ReadSchema).
# --------------------------------------------------------------------------

P8_ORACLE = """
SELECT event_id, user_id, event_type, 'dwd_traffic_page_log' AS sink_table
FROM events
"""


@query("p8_field_add_remove", oracle=P8_ORACLE)
def p8_field_add_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("sink_table", F.lit("dwd_traffic_page_log"))
        .drop("props", "value", "ts")
    )


# --------------------------------------------------------------------------
# P9 — bean mapping with literal/conditional metric flags
# (DwsTrafficVcChArIsNewPageViewWindow.java:77-155: page log →
# TrafficPageViewBean(uv=0, sv = last_page null ? 1 : 0, pv=1, dur, uj=0)).
# sv uses the gap-defined session-entry predicate (see module docstring).
# --------------------------------------------------------------------------

P9_ORACLE = f"""
WITH seq AS (
  SELECT event_id, user_id, event_type, ts, value,
         epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS prev_gap
  FROM events
)
SELECT event_id, user_id, event_type,
       0 AS uv_ct,
       CASE WHEN prev_gap IS NULL OR prev_gap > {ENTRY_GAP_MS} THEN 1 ELSE 0 END AS sv_ct,
       1 AS pv_ct,
       {pround_sql('value')} AS dur_sum,
       0 AS uj_ct
FROM seq
"""


@query("p9_bean_mapping", oracle=P9_ORACLE)
def p9_bean_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    prev_gap = ms - F.lag(ms).over(w)
    entry = prev_gap.isNull() | (prev_gap > ENTRY_GAP_MS)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.lit(0).alias("uv_ct"),
        F.when(entry, 1).otherwise(0).alias("sv_ct"),
        F.lit(1).alias("pv_ct"),
        pround(F.col("value")).alias("dur_sum"),
        F.lit(0).alias("uj_ct"),
    )


# --------------------------------------------------------------------------
# A4 — incremental accumulator count over a non-keyed window
# (DwsTradeCartAddUuWindow.java:100-139: windowAll + AggregateFunction
# counting daily-first cart events per 10 s tumble). Composition ST5 → A4:
# the UU filter then an ungrouped window count — partial counts are
# map-side-combined; only the tiny per-window merge is single-keyed.
# --------------------------------------------------------------------------

A4_ORACLE = """
WITH firsts AS (
  SELECT ts, row_number() OVER (
      PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'click'
)
SELECT
  strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS stt,
  count(*) AS cart_add_uu_ct
FROM firsts WHERE rn = 1
GROUP BY 1
"""


@query("a4_window_count_agg", oracle=A4_ORACLE)
def a4_window_count_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).where(F.col("event_type") == "click")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    firsts = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        firsts.groupBy(F.window("ts", WINDOW))
        .agg(F.count("*").alias("cart_add_uu_ct"))
        .select(fmt_ts(F.col("window.start")).alias("stt"), "cart_add_uu_ct")
    )


# --------------------------------------------------------------------------
# J9 — regular-join family incl. FULL OUTER (TestSqlJoin.java:58-82; inner /
# left shapes are exercised by J1/J2). Sides are filtered to disjoint-ish
# subsets so both null-extended directions appear in the result.
# --------------------------------------------------------------------------

J9_ORACLE = """
SELECT
  coalesce(c.c_custkey, o.o_custkey) AS custkey,
  c.c_name                           AS c_name,
  o.order_ct                         AS order_ct
FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0) c
FULL OUTER JOIN (
  SELECT o_custkey, count(*) AS order_ct FROM orders
  WHERE o_custkey % 2 = 0 GROUP BY 1
) o ON c.c_custkey = o.o_custkey
"""


@query("j9_full_outer_join", oracle=J9_ORACLE)
def j9_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name")
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 2 == 0)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("order_ct"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_name"),
        F.col("order_ct"),
    )


# --------------------------------------------------------------------------
# R2 — array unnest carrying parent fields
# (DwdTrafficBaseLogSplit.java:182-210: each displays[i] element joined with
# parent common/page/ts). posexplode keeps the element index (the
# reference's display 'order'); parent columns ride along the Generate.
# --------------------------------------------------------------------------

R2_ORACLE = """
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_time,
       p.pos                                AS display_order,
       CAST(e.event_id AS VARCHAR) || '_' || CAST(p.pos AS VARCHAR) AS item
FROM events e, (SELECT unnest([0, 1]) AS pos) p
WHERE e.event_type = 'purchase'
"""


@query("r2_array_unnest", oracle=R2_ORACLE)
def r2_array_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).where(F.col("event_type") == "purchase")
    displays = F.transform(
        F.sequence(F.lit(0), F.lit(1)),
        lambda i: F.concat_ws(
            "_", F.col("event_id").cast("string"), i.cast("string")
        ),
    )
    return ev.select(
        "event_id",
        "user_id",
        fmt_ts("ts").alias("event_time"),
        F.posexplode(displays).alias("display_order", "item"),
    )


# --------------------------------------------------------------------------
# EXT — session windows (beyond the reference: §2.8 notes it uses none, but
# gap-based sessionization is a staple of traffic/training-data pipelines).
# Spark-first: F.session_window (native, state-store-backed in streaming);
# oracle = classic gap-and-islands (lag → boundary flag → running sum).
# Session end follows Spark's semantics: last event + gap.
# --------------------------------------------------------------------------

EXT_SESSION_ORACLE = f"""
WITH seq AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {ENTRY_GAP_MS}
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM seq
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS event_ct,
       {dsum_sql('value')} AS value_sum
FROM sess
GROUP BY user_id, sess_id
"""


@query("ext_session_window", oracle=EXT_SESSION_ORACLE)
def ext_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.session_window("ts", "10 minutes").alias("sw"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("event_ct"),
            dsum(F.col("value")).alias("value_sum"),
        )
        .select(
            "user_id",
            fmt_ts(F.col("sw.start")).alias("session_start"),
            fmt_ts(F.col("sw.end")).alias("session_end"),
            "event_ct",
            "value_sum",
        )
    )


# --------------------------------------------------------------------------
# ext: as-of join — each event enriched with the user's latest order at or
# before the event time (operators/temporal.py). Orders are pre-collapsed
# to one row per (custkey, orderdate) with a deterministic winner so the
# as-of tie contract holds in both engines (DuckDB ASOF is the oracle).
# --------------------------------------------------------------------------

EXT_ASOF_ORACLE = """
WITH oc AS (
  SELECT o_custkey, o_orderdate,
         max(o_orderkey)                 AS order_id,
         max_by(o_totalprice, o_orderkey) AS order_amount
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id AS event_id,
       e.user_id  AS user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       oc.order_id AS order_id,
       strftime(oc.o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_dt,
       oc.order_amount AS order_amount
FROM events e
ASOF LEFT JOIN oc ON e.user_id = oc.o_custkey AND e.ts >= oc.o_orderdate
"""


@query("ext_asof_join", oracle=EXT_ASOF_ORACLE)
def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of enrichment via the union-merge window (one keyed exchange +
    sort; see operators/temporal.py for the scale argument)."""
    from realtime_datawarehouse_spark.operators.temporal import asof_join

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    oc = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("order_id"),
            F.max_by("o_totalprice", "o_orderkey").alias("order_amount"),
        )
        .select(
            "o_custkey",
            "o_orderdate",
            "order_id",
            fmt_ts("o_orderdate").alias("order_dt"),
            "order_amount",
        )
    )
    joined = asof_join(
        ev,
        oc,
        key_left="user_id",
        key_right="o_custkey",
        ts_left="ts",
        ts_right="o_orderdate",
        payload=["order_id", "order_dt", "order_amount"],
    )
    return joined.select(
        "event_id",
        "user_id",
        fmt_ts("ts").alias("event_ts"),
        "order_id",
        "order_dt",
        "order_amount",
    )


# --------------------------------------------------------------------------
# ext: hopping (sliding) event-time window — beyond the reference's tumble
# set (SURVEY.md §2.8 notes the reference uses NO sliding windows; this is
# the natural extension a DWS layer grows next). Window 10 min, slide 5 min
# ⇒ every event lands in exactly 2 windows.
# --------------------------------------------------------------------------

HOP_WIN_S = 600
HOP_SLIDE_S = 300

EXT_HOP_ORACLE = f"""
WITH x AS (
  SELECT event_type, value,
         ts - (epoch_us(ts) % {HOP_SLIDE_S * 1_000_000})
                * INTERVAL 1 MICROSECOND
            - k * INTERVAL {HOP_SLIDE_S} SECOND AS wstart
  FROM events, (SELECT unnest([0, 1]) AS k)
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS event_ct,
       {dsum_sql('value')} AS value_sum
FROM x
GROUP BY 1, 2
"""


@query("ext_hop_window", oracle=EXT_HOP_ORACLE)
def ext_hop_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window multi-metric agg: ``F.window(ts, 10min, 5min)``
    expands each row into win/slide assignments and the aggregation is an
    ordinary map-side-combinable groupBy — the same shape the streaming
    leg gets for free via ``readStream`` + identical expressions."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", f"{HOP_WIN_S} seconds", f"{HOP_SLIDE_S} seconds").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("event_ct"), dsum(F.col("value")).alias("value_sum"))
        .select(
            fmt_ts(F.col("w.start")).alias("window_start"),
            "event_type",
            "event_ct",
            "value_sum",
        )
    )


ASOF_FWD_TOL_DAYS = 7

EXT_ASOF_FWD_ORACLE = f"""
WITH pur AS (
  SELECT user_id, ts, max(event_id) AS purchase_id,
         arg_max(value, event_id) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), v AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), j AS (
  SELECT v.event_id, v.user_id, v.ts,
         pur.ts AS pts, pur.purchase_id, pur.purchase_value
  FROM v
  ASOF LEFT JOIN pur
    ON v.user_id = pur.user_id AND pur.ts >= v.ts
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
       CASE WHEN epoch_us(pts) - epoch_us(ts)
                 <= {ASOF_FWD_TOL_DAYS} * CAST(86400000000 AS BIGINT)
            THEN purchase_id END AS purchase_id,
       CASE WHEN epoch_us(pts) - epoch_us(ts)
                 <= {ASOF_FWD_TOL_DAYS} * CAST(86400000000 AS BIGINT)
            THEN strftime(pts, '%Y-%m-%d %H:%M:%S') END AS purchase_ts,
       CASE WHEN epoch_us(pts) - epoch_us(ts)
                 <= {ASOF_FWD_TOL_DAYS} * CAST(86400000000 AS BIGINT)
            THEN purchase_value END AS purchase_value
FROM j
"""


@query("ext_asof_forward_tol", oracle=EXT_ASOF_FWD_ORACLE)
def ext_asof_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each view event picks up the SAME
    user's next purchase, but only if it lands within 7 days — the
    conversion-attribution join (pandas merge_asof direction=\'forward\',
    tolerance=...). Single-exchange union-merge ordered descending; the
    tolerance check is one comparison on the carried payload's own
    timestamp, and an out-of-window match nulls the whole payload. The
    oracle is DuckDB's native ASOF LEFT JOIN with the same post-filter."""
    from realtime_datawarehouse_spark.operators.temporal import (
        asof_join_forward,
    )

    ev = _events(spark, sf_dir)
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    pur = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("purchase_id"),
            F.max_by("value", "event_id").alias("purchase_value"),
        )
        .select(
            "user_id",
            "ts",
            "purchase_id",
            fmt_ts("ts").alias("purchase_ts"),
            "purchase_value",
        )
    )
    joined = asof_join_forward(
        views,
        pur,
        key_left="user_id",
        key_right="user_id",
        ts_left="ts",
        ts_right="ts",
        payload=["purchase_id", "purchase_ts", "purchase_value"],
        tolerance_us=ASOF_FWD_TOL_DAYS * 86_400_000_000,
    )
    return joined.select(
        "event_id",
        "user_id",
        fmt_ts("ts").alias("view_ts"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


# --------------------------------------------------------------------------
# ext: nearest as-of join — each error event matched to the CLOSEST click
# of the same user in either direction, within tolerance (pandas
# merge_asof(direction='nearest', tolerance=...)).
# --------------------------------------------------------------------------

ASOF_NEAREST_TOL_US = 86_400_000_000  # 1 day

EXT_ASOF_NEAREST_ORACLE = f"""
WITH ck AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
b AS (
  SELECT err.event_id, ck.click_id, ck.ts AS cts
  FROM err ASOF LEFT JOIN ck
    ON err.user_id = ck.user_id AND err.ts >= ck.ts
),
f AS (
  SELECT err.event_id, ck.click_id, ck.ts AS cts
  FROM err ASOF LEFT JOIN ck
    ON err.user_id = ck.user_id AND ck.ts >= err.ts
),
j AS (
  SELECT err.event_id, err.user_id, err.ts,
         b.click_id AS b_id, epoch_us(err.ts) - epoch_us(b.cts) AS db,
         b.cts AS b_ts,
         f.click_id AS f_id, epoch_us(f.cts) - epoch_us(err.ts) AS df,
         f.cts AS f_ts
  FROM err
  LEFT JOIN b ON b.event_id = err.event_id
  LEFT JOIN f ON f.event_id = err.event_id
),
pick AS (
  SELECT event_id, user_id, ts,
         (db IS NOT NULL AND db <= {ASOF_NEAREST_TOL_US}) AS vb,
         (df IS NOT NULL AND df <= {ASOF_NEAREST_TOL_US}) AS vf,
         b_id, db, b_ts, f_id, df, f_ts
  FROM j
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
       CASE WHEN vb AND (NOT vf OR db <= df) THEN b_id
            WHEN vf THEN f_id END AS click_id,
       CASE WHEN vb AND (NOT vf OR db <= df)
              THEN strftime(b_ts, '%Y-%m-%d %H:%M:%S')
            WHEN vf THEN strftime(f_ts, '%Y-%m-%d %H:%M:%S') END AS click_ts,
       CASE WHEN vb AND (NOT vf OR db <= df) THEN db
            WHEN vf THEN df END AS delta_us
FROM pick
"""


@query("ext_asof_nearest", oracle=EXT_ASOF_NEAREST_ORACLE)
def ext_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (merge_asof direction='nearest', 1-day
    tolerance): each error event is matched to the same user's closest
    click in time, backward winning exact-distance ties — "what was the
    user doing when the error hit", the diagnostic enrichment pattern.

    Composed from the two audited as-of kernels (operators/temporal.py):
    one backward and one forward union-merge pass (each a single keyed
    exchange + sort — a fused one-sort variant exists but would need the
    inclusive-tie contract moved to a post-check; two passes keeps both
    kernels' contracts intact), then a per-row distance arbitration with
    NO additional shuffle (the two results join on the error's own key).
    The oracle states the same arbitration over DuckDB's native ASOF
    joins in both directions."""
    from realtime_datawarehouse_spark.operators.temporal import (
        asof_join,
        asof_join_forward,
    )

    ev = _events(spark, sf_dir)
    err = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    ck = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", F.col("ts").alias("cts"), "click_id")
    )
    b = asof_join(
        err,
        ck,
        key_left="user_id",
        key_right="user_id",
        ts_left="ts",
        ts_right="cts",
        payload=["click_id", "cts"],
    ).select(
        F.col("event_id"),
        F.col("click_id").alias("b_id"),
        F.col("cts").alias("b_ts"),
    )
    f = asof_join_forward(
        err,
        ck,
        key_left="user_id",
        key_right="user_id",
        ts_left="ts",
        ts_right="cts",
        payload=["click_id", "cts"],
    ).select(
        F.col("event_id"),
        F.col("click_id").alias("f_id"),
        F.col("cts").alias("f_ts"),
    )
    j = err.join(b, "event_id", "left").join(f, "event_id", "left")
    db = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    df_ = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    vb = F.col("b_ts").isNotNull() & (db <= F.lit(ASOF_NEAREST_TOL_US))
    vf = F.col("f_ts").isNotNull() & (df_ <= F.lit(ASOF_NEAREST_TOL_US))
    use_b = vb & (~vf | (db <= df_))
    return j.select(
        "event_id",
        "user_id",
        fmt_ts("ts").alias("error_ts"),
        F.when(use_b, F.col("b_id"))
        .when(vf, F.col("f_id"))
        .alias("click_id"),
        F.when(use_b, fmt_ts("b_ts"))
        .when(vf, fmt_ts("f_ts"))
        .alias("click_ts"),
        F.when(use_b, db).when(vf, df_).alias("delta_us"),
    )
