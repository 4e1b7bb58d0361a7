"""CDC/log pipeline queries: the real envelope surfaces driven end-to-end.

The driver's fixture tables are flat (TESTDATA.md), but the reference's
actual inputs are nested JSON (topic_log) and Maxwell envelopes (topic_db).
Per FIXTURES.md §4, these queries SYNTHESIZE the wire formats from fixture
rows deterministically, then run the genuine parsers/operators
(sources/log_events.py, sources/maxwell.py, operators/config_router.py) —
so the full parse → filter → route pipeline is oracle-checked, with the
oracle computing the expected result directly from the flat fixture columns.

Covered operator rows: P1/P2 (parse + dirty routing), P3 (ETL filter),
P4/P5/P6 (map access + conditional delta + old-map change detection),
R1/R2 (5-way split + explode), R4/P7/K4/K5 (config-driven routing, pruning,
upsert collapse), ST6 (first-order-of-day flag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.operators import config_router
from realtime_datawarehouse_spark.plans.registry import query
from realtime_datawarehouse_spark.sources import log_events, maxwell
from realtime_datawarehouse_spark.tables import table

# --------------------------------------------------------------------------
# S3 + P3..P6 — Maxwell cart_add pipeline (DwdTradeCartAdd.java:31-44).
# Envelope synthesis: lineitem rows become cart_info changes —
#   l_linenumber = 7            → bootstrap-start marker (dropped by P3)
#   l_returnflag = 'R'          → update, old sku_num = qty - (lnum%3 - 1)
#   l_returnflag = 'A'          → insert
#   otherwise                   → delete (dropped by the cart filter)
# Updates qualify only when quantity increased, i.e. lnum%3 == 2.
# --------------------------------------------------------------------------

S3_ORACLE = """
SELECT
  CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) AS id,
  CAST(l_suppkey AS VARCHAR)                      AS user_id,
  CAST(l_partkey AS VARCHAR)                      AS sku_id,
  CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS INT)
       ELSE (l_linenumber % 3) - 1 END            AS sku_num_delta,
  CASE WHEN l_returnflag = 'A' THEN 'insert' ELSE 'update' END AS change_type
FROM lineitem
WHERE l_linenumber <> 7
  AND (l_returnflag = 'A'
       OR (l_returnflag = 'R' AND l_linenumber % 3 = 2))
"""


def _cart_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("int")
    lnum = F.col("l_linenumber")
    typ = (
        F.when(lnum == 7, "bootstrap-start")
        .when(F.col("l_returnflag") == "R", "update")
        .when(F.col("l_returnflag") == "A", "insert")
        .otherwise("delete")
    )
    old_qty = qty - (lnum % 3 - 1)
    s = lambda c: c.cast("string")  # noqa: E731 — Maxwell carries strings
    return l.select(
        F.lit("gmall").alias("database"),
        F.lit("cart_info").alias("table"),
        typ.alias("type"),
        s(F.col("l_orderkey")).alias("ts"),
        F.when(
            typ == "update", F.create_map(F.lit("sku_num"), s(old_qty))
        ).alias("old"),
        F.create_map(
            F.lit("id"), s(F.col("l_orderkey") * 10 + lnum),
            F.lit("user_id"), s(F.col("l_suppkey")),
            F.lit("sku_id"), s(F.col("l_partkey")),
            F.lit("sku_num"), s(qty),
        ).alias("data"),
    )


@query("s3_maxwell_cart_add", oracle=S3_ORACLE)
def s3_maxwell_cart_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = _cart_envelopes(spark, sf_dir)
    return maxwell.cart_add_delta(maxwell.etl_filter(env))


# --------------------------------------------------------------------------
# P1/P2 + R1/R2 — tracking-log JSON round trip with dirty routing
# (DwdTrafficBaseLogSplit.java:76-237). Events become topic_log JSON lines:
# 'error' events carry err{}, 'signup' carries start{} (no page), others
# carry page{}; purchases embed 2 displays, clicks 1 action; every
# (event_id % 97 == 0) line is corrupted to exercise the dirty route.
# --------------------------------------------------------------------------

R1_NESTED_ORACLE = """
SELECT 'dirty' AS branch, count(CASE WHEN event_id % 97 = 0 THEN 1 END) AS ct FROM events
UNION ALL
SELECT 'err', count(CASE WHEN event_id % 97 <> 0 AND event_type = 'error' THEN 1 END) FROM events
UNION ALL
SELECT 'start', count(CASE WHEN event_id % 97 <> 0 AND event_type = 'signup' THEN 1 END) FROM events
UNION ALL
SELECT 'page', count(CASE WHEN event_id % 97 <> 0 AND event_type <> 'signup' THEN 1 END) FROM events
UNION ALL
SELECT 'display', 2 * count(CASE WHEN event_id % 97 <> 0 AND event_type = 'purchase' THEN 1 END) FROM events
UNION ALL
SELECT 'action', count(CASE WHEN event_id % 97 <> 0 AND event_type = 'click' THEN 1 END) FROM events
"""


def _log_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = lambda c: c.cast("string")  # noqa: E731
    common = F.struct(
        s(F.col("user_id")).alias("mid"),
        s(F.col("user_id")).alias("uid"),
        F.lit("v1").alias("vc"),
        F.lit("app").alias("ch"),
        F.lit("110000").alias("ar"),
        F.lit("0").alias("is_new"),
    )
    page = F.struct(
        F.col("event_type").alias("page_id"),
        F.lit(None).cast("string").alias("last_page_id"),
        s(F.col("event_id")).alias("item"),
        F.lit("sku_id").alias("item_type"),
        F.col("value").cast("long").alias("during_time"),
    )
    err = F.struct(F.lit("42").alias("error_code"))
    start = F.struct(F.lit("icon").alias("entry"))
    display = lambda pos: F.struct(  # noqa: E731
        F.lit("promo").alias("display_type"),
        s(F.col("event_id")).alias("item"),
        F.lit("sku").alias("item_type"),
        s(F.col("user_id")).alias("pos_id"),
        F.lit(pos).alias("order"),
    )
    action = F.struct(
        F.lit("cart_add").alias("action_id"),
        s(F.col("event_id")).alias("item"),
        F.lit("sku").alias("item_type"),
        F.unix_millis("ts").alias("ts"),
    )
    body = F.struct(
        common.alias("common"),
        F.when(F.col("event_type") != "signup", page).alias("page"),
        F.when(F.col("event_type") == "error", err).alias("err"),
        F.when(F.col("event_type") == "signup", start).alias("start"),
        F.when(
            F.col("event_type") == "purchase",
            F.array(display("1"), display("2")),
        ).alias("displays"),
        F.when(F.col("event_type") == "click", F.array(action)).alias(
            "actions"
        ),
        F.unix_millis("ts").alias("ts"),
    )
    json_line = F.to_json(body)
    corrupted = F.when(
        F.col("event_id") % 97 == 0, F.concat(F.lit("CORRUPT{"), json_line)
    ).otherwise(json_line)
    return ev.select(corrupted.alias("value"))


@query("r1_log_split_pipeline", oracle=R1_NESTED_ORACLE)
def r1_log_split_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _log_json_lines(spark, sf_dir)
    clean, dirty = log_events.parse_with_dirty_routing(raw)
    branches = log_events.split_log(clean)
    counts = dirty.agg(F.count("*").alias("ct")).select(
        F.lit("dirty").alias("branch"), "ct"
    )
    for name, df in branches.items():
        counts = counts.unionByName(
            df.agg(F.count("*").alias("ct")).select(
                F.lit(name).alias("branch"), "ct"
            )
        )
    return counts


# --------------------------------------------------------------------------
# R4/P7/K4/K5 — config-driven dim routing with upsert collapse
# (DimApp + TableProcessFunction + DimSinkFunction). part and supplier play
# CDC'd dim tables; part gets update churn (pk%3==0 at ts=2) and deletes
# (pk%7==0 at ts=3) so last-write-wins and delete semantics are exercised.
# --------------------------------------------------------------------------

K4_ORACLE = """
SELECT 'dim_part' AS sink_table, CAST(p_partkey AS VARCHAR) AS pk,
       CASE WHEN p_partkey % 3 = 0 THEN 'UPD' ELSE p_brand END AS val
FROM part WHERE p_partkey % 7 <> 0
UNION ALL
SELECT 'dim_supplier', CAST(s_suppkey AS VARCHAR), s_name FROM supplier
"""

ROUTER_CONFIG_ROWS = [
    {
        "source_table": "part",
        "sink_table": "dim_part",
        "sink_columns": "p_partkey,p_brand",
        "sink_pk": "p_partkey",
        "sink_extend": None,
    },
    {
        "source_table": "supplier",
        "sink_table": "dim_supplier",
        "sink_columns": "s_suppkey,s_name",
        "sink_pk": "s_suppkey",
        "sink_extend": None,
    },
]


def _dim_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    sup = table(spark, sf_dir, "supplier")
    s = lambda c: c.cast("string")  # noqa: E731

    def env(tbl, typ, ts, data):
        return F.struct(
            F.lit("gmall").alias("database"),
            F.lit(tbl).alias("table"),
            typ.alias("type") if hasattr(typ, "alias") else F.lit(typ).alias("type"),
            ts.alias("ts") if hasattr(ts, "alias") else F.lit(str(ts)).alias("ts"),
            F.lit(None).cast("map<string,string>").alias("old"),
            data.alias("data"),
        )

    part_data = lambda brand: F.create_map(  # noqa: E731
        F.lit("p_partkey"), s(F.col("p_partkey")),
        F.lit("p_brand"), brand,
        F.lit("p_type"), F.col("p_type"),
    )
    base = p.select(env("part", "insert", "1", part_data(F.col("p_brand"))).alias("e"))
    upd = (
        p.where(F.col("p_partkey") % 3 == 0)
        .select(env("part", "update", "2", part_data(F.lit("UPD"))).alias("e"))
    )
    dele = (
        p.where(F.col("p_partkey") % 7 == 0)
        .select(env("part", "delete", "3", part_data(F.col("p_brand"))).alias("e"))
    )
    sup_data = F.create_map(
        F.lit("s_suppkey"), s(F.col("s_suppkey")),
        F.lit("s_name"), F.col("s_name"),
    )
    sups = sup.select(env("supplier", "insert", "1", sup_data).alias("e"))
    return base.unionByName(upd).unionByName(dele).unionByName(sups).select("e.*")


@query("k4_config_routed_dims", oracle=K4_ORACLE)
def k4_config_routed_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime_datawarehouse_spark.sources.debezium import config_from_rows

    env = _dim_envelopes(spark, sf_dir)
    config = config_from_rows(spark, ROUTER_CONFIG_ROWS)
    routed = config_router.route(env, config)
    state = config_router.upsert_state(routed)
    return state.select(
        "sink_table",
        "pk",
        F.coalesce(
            F.col("data").getItem("p_brand"), F.col("data").getItem("s_name")
        ).alias("val"),
    )


# --------------------------------------------------------------------------
# P6 — order-lifecycle status-transition filter
# (DwdTradeOrderCancelDetail.java:80-82; same shape in
# DwdTradeRefundPaySuc.java:40-44,56-60,73-77). Envelope synthesis from
# orders: every order inserts at status '1001'; %2==0 orders update to paid
# '1002' (old carries prior status); %5==0 orders update to cancelled '1003';
# %11==0 orders emit a NOISE update whose data still says '1003' but whose
# old-map records only a total_amount change — the old-map presence check
# must reject these (Maxwell's old = changed columns only).
# --------------------------------------------------------------------------

P6_ORACLE = """
SELECT
  CAST(o_orderkey AS VARCHAR) AS order_id,
  CAST(o_custkey  AS VARCHAR) AS user_id,
  CASE WHEN o_orderkey % 2 = 0 THEN '1002' ELSE '1001' END AS old_status,
  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS cancel_time
FROM orders
WHERE o_orderkey % 5 = 0
"""


def _order_status_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    s = lambda c: c.cast("string")  # noqa: E731
    ctime = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    data = lambda status: F.create_map(  # noqa: E731
        F.lit("id"), s(F.col("o_orderkey")),
        F.lit("user_id"), s(F.col("o_custkey")),
        F.lit("order_status"), F.lit(status),
        F.lit("operate_time"), ctime,
    )
    env = lambda typ, old, d: F.struct(  # noqa: E731
        F.lit("gmall").alias("database"),
        F.lit("order_info").alias("table"),
        F.lit(typ).alias("type"),
        s(F.col("o_orderkey")).alias("ts"),
        old.alias("old"),
        d.alias("data"),
    )
    no_old = F.lit(None).cast("map<string,string>")
    prior = F.when(F.col("o_orderkey") % 2 == 0, "1002").otherwise("1001")
    ins = o.select(env("insert", no_old, data("1001")).alias("e"))
    paid = o.where(F.col("o_orderkey") % 2 == 0).select(
        env(
            "update",
            F.create_map(F.lit("order_status"), F.lit("1001")),
            data("1002"),
        ).alias("e")
    )
    cancel = o.where(F.col("o_orderkey") % 5 == 0).select(
        env(
            "update",
            F.create_map(F.lit("order_status"), prior),
            data("1003"),
        ).alias("e")
    )
    noise = o.where(F.col("o_orderkey") % 11 == 0).select(
        env(
            "update",
            F.create_map(F.lit("total_amount"), s(F.col("o_totalprice"))),
            data("1003"),
        ).alias("e")
    )
    return (
        ins.unionByName(paid).unionByName(cancel).unionByName(noise).select("e.*")
    )


@query("p6_status_change_filter", oracle=P6_ORACLE)
def p6_status_change_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = maxwell.etl_filter(_order_status_envelopes(spark, sf_dir))
    cancelled = maxwell.status_change_filter(env, "order_status", "1003")
    return cancelled.select(
        maxwell.data_col("id").alias("order_id"),
        maxwell.data_col("user_id").alias("user_id"),
        maxwell.old_col("order_status").alias("old_status"),
        maxwell.data_col("operate_time").alias("cancel_time"),
    )


# --------------------------------------------------------------------------
# ST6 — first-order-of-day flag, row passes through regardless
# (DwsTradeSkuOrderWindow.java:191-214).
# --------------------------------------------------------------------------

ST6_ORACLE = """
SELECT
  o_orderkey AS order_id,
  o_custkey  AS user_id,
  strftime(o_orderdate, '%Y-%m-%d') AS dt,
  CASE WHEN row_number() OVER (
         PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
         ORDER BY o_orderdate, o_orderkey) = 1
       THEN 1 ELSE 0 END AS order_uu
FROM orders
"""


@query("st6_order_uu_flag", oracle=ST6_ORACLE)
def st6_order_uu_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", F.to_date("o_orderdate")).orderBy(
        "o_orderdate", "o_orderkey"
    )
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("user_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("dt"),
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias("order_uu"),
    )
