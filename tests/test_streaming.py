"""Batch-parity tests for the streaming operator forms.

Contract (streaming/__init__.py): each streaming form, run with availableNow
over file inputs split into several micro-batches, must agree with the batch
operator — exactly for watermark-closed windows and keep-latest state;
structurally (one row per key, key correctness) for arrival-order-dependent
first-per-key ops.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from realtime_datawarehouse_spark.streaming import jobs
from realtime_datawarehouse_spark.tables import table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """events split into 3 day-range files → 3 ordered micro-batches."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = table(spark, SF_DIR, "events")
    for i, (lo, hi) in enumerate(
        [("2024-01-01", "2024-01-11"), ("2024-01-11", "2024-01-21"), ("2024-01-21", "2024-02-01")]
    ):
        (
            ev.where((F.col("ts") >= lo) & (F.col("ts") < hi))
            .orderBy("ts")
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )
    return d


def _drain(spark, stream, name, mode="append"):
    q = jobs.run_to_memory(stream, name, mode)
    q.awaitTermination()
    return spark.table(name)


def test_tumble_count_parity(spark, events_stream_dir):
    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = _drain(
        spark, jobs.tumble_count_by_key(stream), "t_tumble"
    ).toPandas()

    batch = (
        ev.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("keyword_count"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
            F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
            "event_type",
            "keyword_count",
        )
    ).toPandas()
    # windows not yet closed by the final watermark (max_ts - 3s) may be
    # withheld in append mode — compare on the emitted set, which must be a
    # prefix-complete subset of the batch result
    key = ["stt", "edt", "event_type"]
    merged = got.merge(batch, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(got), "streaming emitted a window batch lacks"
    assert (merged.keyword_count_s == merged.keyword_count_b).all()
    # everything except possibly the last open window must have emitted
    assert len(got) >= len(batch) - 2


def test_first_per_user_day_structure(spark, events_stream_dir):
    ev = table(spark, SF_DIR, "events")
    stream = jobs.with_visit_date(
        jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    )
    got = _drain(
        spark, jobs.first_per_user_day(stream), "t_uv"
    ).toPandas()
    batch_keys = (
        jobs.with_visit_date(ev)
        .select("user_id", "visit_date")
        .distinct()
        .toPandas()
    )
    assert len(got) == len(batch_keys)
    assert not got.duplicated(["user_id", "visit_date"]).any()
    # each emitted row's event really belongs to its claimed (user, day)
    assert (got["ts"].dt.date == got["visit_date"]).all()


def test_keep_latest_state_parity(spark, events_stream_dir):
    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(
        spark, events_stream_dir, ev.schema
    ).withColumn("user_key", F.col("user_id").cast("string"))
    out = jobs.keep_latest_stream(
        stream, "user_key", "ts", ["event_type", "event_id"]
    )
    got = _drain(spark, out, "t_latest", mode="update").toPandas()
    # per key, the newest emission must equal the batch keep-latest row
    final = got.sort_values("ts").groupby("key").last().reset_index()
    batch = (
        ev.withColumn("user_key", F.col("user_id").cast("string"))
        .groupBy("user_key")
        .agg(F.max_by("event_id", F.struct("ts", "event_id")).alias("event_id"))
        .toPandas()
    )
    merged = final.merge(batch, left_on="key", right_on="user_key")
    assert len(merged) == len(batch)
    assert (merged.event_id_x.astype(int) == merged.event_id_y.astype(int)).all()


def test_bounce_detection_streaming_parity(spark, events_stream_dir, tmp_path):
    """ST8 streaming (state machine + event-time timeout) must equal the
    batch lead/lag formulation once a heartbeat advances the watermark past
    every pending entry's timeout."""
    import shutil

    from realtime_datawarehouse_spark.plans.traffic import (
        ENTRY_GAP_MS,
        st8_bounce_detection,
    )

    d = str(tmp_path / "bounce_in")
    shutil.copytree(events_stream_dir, d)
    ev = table(spark, SF_DIR, "events")
    # heartbeat: one far-future event for a sentinel user advances the
    # watermark so every real pending entry's timeout fires before the drain
    # ends (the sentinel's own entry stays pending — excluded below)
    hb = ev.groupBy().agg(F.max("ts").alias("mx")).select(
        F.lit(9_999_999).alias("event_id"),
        (F.col("mx") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    ).select(*ev.columns)
    hb.coalesce(1).write.mode("append").parquet(d)

    stream = jobs.parquet_stream(spark, d, ev.schema)
    out = jobs.bounce_detect_stream(stream, ENTRY_GAP_MS)
    got = _drain(spark, out, "t_bounce", mode="append").toPandas()
    got = got[got.user_id >= 0]

    exp = st8_bounce_detection(spark, SF_DIR).toPandas()
    assert sorted(got.event_id.astype(int)) == sorted(exp.event_id.astype(int))


def test_stream_stream_join_parity(spark, tmp_path):
    """J1 streaming: watermarked stream-stream inner join must emit exactly
    the rows of the batch join restricted by the same time band."""
    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li_dir, o_dir = str(tmp_path / "li"), str(tmp_path / "o")
    li.orderBy("l_shipdate").coalesce(2).write.parquet(li_dir)
    o.orderBy("o_orderdate").coalesce(2).write.parquet(o_dir)

    ls = jobs.parquet_stream(spark, li_dir, li.schema)
    os_ = jobs.parquet_stream(spark, o_dir, o.schema)
    out = jobs.stream_stream_join(
        ls,
        os_,
        left_ts="l_shipdate",
        right_ts="o_orderdate",
        on=(F.col("l_orderkey") == F.col("o_orderkey")),
        band="200 days",
    )
    got = _drain(spark, out, "t_ssj").count()

    band = F.expr("INTERVAL 200 days")
    exp = li.join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("o_orderdate") >= F.col("l_shipdate") - band)
        & (F.col("o_orderdate") <= F.col("l_shipdate") + band),
    ).count()
    assert got == exp


def test_visit_state_streaming_parity(spark, events_stream_dir):
    """ST1+ST4 streaming kernel vs their batch window-function forms."""
    from realtime_datawarehouse_spark.plans.traffic import (
        st1_new_visitor_repair,
        st4_login_uu_and_back,
    )

    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = _drain(spark, jobs.visit_state_stream(stream), "t_visit").toPandas()

    # ST1: per-event is_new must match the batch min-date repair
    exp1 = st1_new_visitor_repair(spark, SF_DIR).toPandas()
    m = got.merge(exp1, on="event_id", suffixes=("_s", "_b"))
    assert len(m) == len(exp1)
    assert (m.is_new_s == m.is_new_b).all()

    # ST4: day-aggregated uu/back must match the batch lag formulation
    agg = got.groupby("dt", as_index=False).agg(
        uu_ct=("uu", "sum"), back_ct=("back", "sum")
    )
    exp4 = st4_login_uu_and_back(spark, SF_DIR).toPandas()
    m4 = agg.merge(exp4, on="dt", suffixes=("_s", "_b"))
    assert len(m4) == len(exp4)
    assert (m4.uu_ct_s == m4.uu_ct_b).all() and (m4.back_ct_s == m4.back_ct_b).all()


def test_checkpoint_restart_recovers_exactly(spark, events_stream_dir, tmp_path):
    """Kill a windowed-aggregation stream after its first micro-batch, then
    restart from the same checkpoint: the union of emissions must equal an
    uninterrupted run (no loss, no duplicates) — the Structured Streaming
    rendering of the reference's (commented-out) exactly-once checkpointing
    (rt/app/dim/DimApp.java:82-99)."""
    import os

    ev = table(spark, SF_DIR, "events")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    in_dir = str(tmp_path / "in")
    src_dir = str(tmp_path / "src")
    # four ordered files; a restarted query only re-derives its watermark
    # from a DATA batch, so each phase gets two files (the second flushes
    # windows the first closed)
    ranges = [
        ("2024-01-01", "2024-01-11"),
        ("2024-01-11", "2024-01-21"),
        ("2024-01-21", "2024-01-27"),
        ("2024-01-27", "2024-02-01"),
    ]
    # one directory per range, then indexed file names — the part-file names
    # Spark generates are random UUIDs, so a name-sort would pick an
    # arbitrary subset for phase 1
    import glob
    import shutil

    os.makedirs(src_dir)
    for i, (lo, hi) in enumerate(ranges):
        part_dir = str(tmp_path / f"part{i}")
        (
            ev.where((F.col("ts") >= lo) & (F.col("ts") < hi))
            .orderBy("ts")
            .coalesce(1)
            .write.parquet(part_dir)
        )
        shutil.copy(
            glob.glob(os.path.join(part_dir, "*.parquet"))[0],
            os.path.join(src_dir, f"{i:02d}.parquet"),
        )
    os.makedirs(in_dir)
    src_files = sorted(f for f in os.listdir(src_dir) if f.endswith(".parquet"))
    assert len(src_files) == 4

    def start():
        stream = jobs.parquet_stream(spark, in_dir, ev.schema)
        return (
            jobs.tumble_count_by_key(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # phase 1: first two files; drain and shut down cleanly
    for f in src_files[:2]:
        shutil.copy(os.path.join(src_dir, f), in_dir)
    q = start()
    q.awaitTermination()
    phase1 = spark.read.parquet(out_dir).count()

    # phase 2: the remaining files arrive; restart from the SAME checkpoint
    for f in src_files[2:]:
        shutil.copy(os.path.join(src_dir, f), in_dir)
    q2 = start()
    q2.awaitTermination()
    got = spark.read.parquet(out_dir).toPandas()

    # batch reference for correctness + the completeness bound: phase 2's
    # last DATA batch (file 4) runs with watermark = max ts of files 1-3
    # minus the 3 s delay, so every window ending at or before that bound
    # MUST have been emitted. (Whether optional no-data micro-batches also
    # flushed later windows is timing-dependent — not asserted.)
    exp = (
        ev.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("keyword_count"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
            F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
            "event_type",
            "keyword_count",
        )
        .toPandas()
    )
    bound = (
        ev.where(F.col("ts") < ranges[2][1])
        .agg(F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss"))
        .collect()[0][0]
    )

    key = ["stt", "edt", "event_type"]
    assert phase1 < len(got), "phase 2 must have added windows"
    assert not got.duplicated(key).any(), "restart produced duplicate windows"
    merged = got.merge(exp, on=key, suffixes=("_g", "_e"))
    assert len(merged) == len(got), "restart emitted a window batch lacks"
    assert (merged.keyword_count_g == merged.keyword_count_e).all()
    closed = exp[exp.edt <= bound]
    have = set(map(tuple, got[key].values))
    missing = [t for t in map(tuple, closed[key].values) if t not in have]
    assert not missing, f"windows lost across restart: {missing[:5]}"


def test_st3_two_state_uv_streaming_parity(spark, events_stream_dir):
    """ST3 streaming: the per-page-type daily UV is two page-filtered
    instances of the first-per-user-day kernel; their day-counts must match
    the batch two-state formulation."""
    from realtime_datawarehouse_spark.plans.traffic import st3_page_uv_two_states

    ev = table(spark, SF_DIR, "events")
    got = {}
    for page, alias in [("view", "home_uv_ct"), ("purchase", "good_detail_uv_ct")]:
        stream = jobs.with_visit_date(
            jobs.parquet_stream(spark, events_stream_dir, ev.schema)
        ).where(F.col("event_type") == page)
        out = _drain(
            spark, jobs.first_per_user_day(stream), f"t_st3_{page}"
        ).toPandas()
        got[alias] = (
            out.assign(dt=out["visit_date"].astype(str))
            .groupby("dt")["user_id"]
            .nunique()
        )
    exp = st3_page_uv_two_states(spark, SF_DIR).toPandas().set_index("dt")
    for alias in ("home_uv_ct", "good_detail_uv_ct"):
        merged = exp[alias].to_frame().join(got[alias].rename("got"), how="left")
        merged["got"] = merged["got"].fillna(0).astype(int)
        assert (merged[alias] == merged["got"]).all(), alias


def test_stream_stream_left_outer_holds_until_watermark(spark, tmp_path):
    """J2 streaming: left-outer join emits matches immediately and
    null-extends unmatched left rows only once the watermark proves no match
    can arrive (Spark's hold-until-watermark vs Flink's emit+retract —
    SURVEY §7.4 #1). With a far-future heartbeat on both sides, the final
    output must equal the batch left join within the band."""
    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    # drop half the orders so many lineitems have NO match
    o = (
        table(spark, SF_DIR, "orders")
        .where(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", "o_orderdate")
    )
    mx_li = li.agg(F.max("l_shipdate")).collect()[0][0]
    mx_o = o.agg(F.max("o_orderdate")).collect()[0][0]
    li_dir, o_dir = str(tmp_path / "li"), str(tmp_path / "o")
    li.orderBy("l_shipdate").coalesce(1).write.parquet(li_dir)
    o.orderBy("o_orderdate").coalesce(1).write.parquet(o_dir)
    # heartbeats (sentinel keys) advance both watermarks BEYOND the join
    # band so every unmatched left row can null-extend before the drain ends
    import datetime

    # two heartbeat batches per side: the first advances the watermark, the
    # second triggers the state-flush micro-batch for everything it closed
    for extra_days in (90, 91):
        hb_ts = max(mx_li, mx_o) + datetime.timedelta(days=extra_days)
        spark.createDataFrame(
            [(-1, -1, hb_ts)], li.schema
        ).coalesce(1).write.mode("append").parquet(li_dir)
        spark.createDataFrame(
            [(-2, hb_ts)], o.schema
        ).coalesce(1).write.mode("append").parquet(o_dir)

    out = jobs.stream_stream_join(
        jobs.parquet_stream(spark, li_dir, li.schema),
        jobs.parquet_stream(spark, o_dir, o.schema),
        left_ts="l_shipdate",
        right_ts="o_orderdate",
        on=(F.col("l_orderkey") == F.col("o_orderkey")),
        band="30 days",
        how="left_outer",
    )
    got = (
        _drain(spark, out, "t_ssj_left")
        .where(F.col("l_orderkey") >= 0)  # sentinels are negative
        .toPandas()
    )

    band = F.expr("INTERVAL 30 days")
    exp = (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("o_orderdate") >= F.col("l_shipdate") - band)
            & (F.col("o_orderdate") <= F.col("l_shipdate") + band),
            "left",
        )
        .toPandas()
    )
    assert len(got) == len(exp)
    got_nulls = int(got.o_orderkey.isna().sum())
    exp_nulls = int(exp.o_orderkey.isna().sum())
    assert got_nulls == exp_nulls and got_nulls > 0


def test_session_window_streaming_parity(spark, events_stream_dir):
    """Session windows in streaming (watermarked, append mode) must agree
    with the batch session_window aggregation on watermark-closed sessions."""
    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    out = (
        stream.withWatermark("ts", "3 seconds")
        .groupBy(F.session_window("ts", "10 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("event_ct"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "event_ct",
        )
    )
    got = _drain(spark, out, "t_sess").toPandas()
    batch = (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("event_ct"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "event_ct",
        )
        .toPandas()
    )
    key = ["user_id", "session_start"]
    merged = got.merge(batch, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(got)  # nothing emitted that batch lacks
    assert (merged.event_ct_s == merged.event_ct_b).all()
    # all but the watermark-open tail must have emitted
    assert len(got) >= len(batch) - 50


def test_chained_stream_stream_joins_three_way(spark, tmp_path):
    """DwdTradeRefundPaySuc shape (J6 + multi-stateful chaining): two
    chained watermarked stream-stream joins — lineitem ⋈ orders ⋈ part-dim
    stream — must match the equivalent batch 3-way join within the bands."""
    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderdate")
    # third stream: per-(order, part) "refund" events derived from returns
    r = (
        table(spark, SF_DIR, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("r_orderkey"),
            F.col("l_partkey").alias("r_partkey"),
            F.col("l_shipdate").alias("r_ts"),
        )
    )
    dirs = {}
    for name, df, ts in [("li", li, "l_shipdate"), ("o", o, "o_orderdate"), ("r", r, "r_ts")]:
        d = str(tmp_path / name)
        df.orderBy(ts).coalesce(2).write.parquet(d)
        dirs[name] = (d, df.schema)

    s_li = jobs.parquet_stream(spark, *dirs["li"])
    s_o = jobs.parquet_stream(spark, *dirs["o"])
    s_r = jobs.parquet_stream(spark, *dirs["r"])
    j1 = jobs.stream_stream_join(
        s_li, s_o,
        left_ts="l_shipdate", right_ts="o_orderdate",
        on=(F.col("l_orderkey") == F.col("o_orderkey")), band="200 days",
    )
    # project away the consumed event-time column: a chained stateful op
    # needs exactly ONE event-time column in its input
    j1 = j1.drop("o_orderdate")
    j2 = jobs.stream_stream_join(
        j1, s_r,
        left_ts="l_shipdate", right_ts="r_ts",
        on=(
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_partkey") == F.col("r_partkey"))
        ),
        band="30 days",
        watermark_left=False,  # j1 already carries its watermark
    )
    got = _drain(spark, j2, "t_3way").count()

    b200, b30 = F.expr("INTERVAL 200 days"), F.expr("INTERVAL 30 days")
    exp = (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("o_orderdate").between(
                F.col("l_shipdate") - b200, F.col("l_shipdate") + b200)),
        )
        .join(
            r,
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_partkey") == F.col("r_partkey"))
            & (F.col("r_ts").between(
                F.col("l_shipdate") - b30, F.col("l_shipdate") + b30)),
        )
        .count()
    )
    assert got == exp


def test_drop_duplicates_within_watermark_dedups_redelivery(spark, tmp_path):
    """K1/S1 at-least-once story: a redelivered batch (same event_ids) must
    collapse to one row per key via dropDuplicatesWithinWatermark — the
    source-side dedup that makes the at-least-once Kafka sink effectively
    exactly-once for keyed facts."""
    import os

    ev = table(spark, SF_DIR, "events")
    first = ev.where(F.col("ts") < "2024-01-05").orderBy("ts").coalesce(1)
    d = str(tmp_path / "in")
    os.makedirs(d)
    first.write.mode("append").parquet(d)   # original delivery
    first.write.mode("append").parquet(d)   # redelivery (duplicate batch)

    stream = jobs.parquet_stream(spark, d, ev.schema)
    deduped = stream.withWatermark("ts", "1 day").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    got = _drain(spark, deduped, "t_dedup_wm").toPandas()
    assert len(got) == first.count()
    assert not got.duplicated(["event_id"]).any()


def test_union_takes_min_watermark(spark, tmp_path):
    """W5 (watermark after union of streams): Spark tracks each input's
    watermark and the union advances at the MINIMUM — windows beyond the
    slower stream's watermark must be withheld even if the faster stream
    has moved far past them."""
    ev = table(spark, SF_DIR, "events")
    fast = ev.where(F.col("ts") < "2024-01-20")          # up to Jan 20
    slow = ev.where(
        (F.col("ts") >= "2024-01-20") & (F.col("ts") < "2024-01-25")
    ).withColumn("ts", F.col("ts") - F.expr("INTERVAL 15 DAYS"))  # lags at ~Jan 10
    d_fast, d_slow = str(tmp_path / "fast"), str(tmp_path / "slow")
    fast.coalesce(1).write.parquet(d_fast)
    slow.coalesce(1).write.parquet(d_slow)

    sf = jobs.parquet_stream(spark, d_fast, ev.schema).withWatermark("ts", "3 seconds")
    ss = jobs.parquet_stream(spark, d_slow, ev.schema).withWatermark("ts", "3 seconds")
    out = (
        sf.unionByName(ss)
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count("*").alias("ct"))
        .select(F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("edt"), "ct")
    )
    got = _drain(spark, out, "t_union_wm").toPandas()
    slow_max = slow.agg(
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss")
    ).collect()[0][0]
    # nothing past the SLOW stream's watermark may have been emitted
    assert (got.edt <= slow_max).all(), got.edt.max()
    # and plenty of earlier windows did emit
    assert len(got) > 100


def test_first_per_user_day_disorder_contract(spark, tmp_path):
    """VERDICT r01 #7: pins the documented arrival-order contract — within a
    micro-batch the FIRST-ARRIVED row per (user, day) is kept, which equals
    the min-ts row only for time-ordered sources. A disordered batch must
    still emit exactly one row per (user, day), and it is the first arrival."""
    import datetime as dt

    d = str(tmp_path / "disorder")
    rows = [  # u1 day1 arrives 10:00 BEFORE 09:00 — intra-batch disorder
        (1, 100, dt.datetime(2024, 1, 1, 10, 0, 0)),
        (1, 101, dt.datetime(2024, 1, 1, 9, 0, 0)),
        (2, 102, dt.datetime(2024, 1, 1, 11, 0, 0)),
    ]
    spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    ).coalesce(1).write.parquet(d)
    stream = jobs.with_visit_date(
        jobs.parquet_stream(
            spark, d, spark.read.parquet(d).schema
        )
    )
    got = _drain(spark, jobs.first_per_user_day(stream), "t_disorder").toPandas()
    assert len(got) == 2 and not got.duplicated(["user_id", "visit_date"]).any()
    # arrival order wins: u1's emitted row is event 100 (10:00), not min-ts 101
    assert int(got.loc[got.user_id == 1, "event_id"].iloc[0]) == 100


def test_first_per_user_day_state_is_evicted(spark, tmp_path):
    """ADVICE r01 #3: dropDuplicates on a derived date column never evicts
    state; the dropDuplicatesWithinWatermark form must — day-1 entries leave
    the state store once the watermark (day-5 - 26h) passes them."""
    import datetime as dt

    d = str(tmp_path / "evict")

    def write_batch(rows):
        spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(d)

    day1, day5 = dt.datetime(2024, 1, 1, 12, 0), dt.datetime(2024, 1, 5, 12, 0)
    write_batch([(u, u, day1) for u in (1, 2, 3)])
    write_batch([(10, 10, day5)])  # advances max event time
    write_batch([(11, 11, day5)])  # watermark now day5-26h → day1 evictable
    stream = jobs.with_visit_date(
        jobs.parquet_stream(spark, d, spark.read.parquet(d).schema)
    )
    q = jobs.run_to_memory(jobs.first_per_user_day(stream), "t_evict")
    q.awaitTermination()
    assert spark.table("t_evict").count() == 5  # all 5 (user, day) pairs emit
    state_rows = None
    for p in reversed(q.recentProgress):
        if p["stateOperators"]:
            state_rows = p["stateOperators"][0]["numRowsTotal"]
            break
    # 3 day-1 entries evicted; only the 2 day-5 entries may remain
    assert state_rows is not None and state_rows <= 2, state_rows


def test_hop_window_streaming_parity(spark, events_stream_dir):
    """ext_hop_window's streaming twin: closed hopping windows agree
    exactly with the batch plan (same expressions, same quantized sum)."""
    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = _drain(spark, jobs.hop_multi_metric(stream), "t_hop").toPandas()

    from realtime_datawarehouse_spark.functions.compare import dsum

    batch = (
        ev.groupBy(F.window("ts", "600 seconds", "300 seconds"), "event_type")
        .agg(F.count("*").alias("event_ct"), dsum(F.col("value")).alias("value_sum"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "event_ct",
            "value_sum",
        )
    ).toPandas()
    key = ["window_start", "event_type"]
    merged = got.merge(batch, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged.event_ct_s == merged.event_ct_b).all()
    assert (abs(merged.value_sum_s - merged.value_sum_b) < 1e-9).all()
    # at most the final slide's 2 open windows may be withheld
    assert len(got) >= len(batch) - 4


def test_approx_uv_streaming_equals_batch_sketch(spark, events_stream_dir):
    """HLL streaming state merges to the SAME estimate as the batch sketch
    (register-max merge is order-independent) — per closed day."""
    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = {
        r.dt: r.approx_distinct
        for r in _drain(spark, jobs.approx_uv_daily(stream), "t_hll").collect()
    }
    batch = {
        r.dt: r.approx_distinct
        for r in ev.groupBy(F.window("ts", "1 day"))
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_distinct"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd").alias("dt"),
            "approx_distinct",
        )
        .collect()
    }
    assert got, "no closed days emitted"
    for dt, v in got.items():
        assert batch[dt] == v, (dt, v, batch[dt])


def test_stream_static_enrich_parity(spark, events_stream_dir):
    """J3 streaming form: stream-static broadcast lookup join — every
    micro-batch row enriched from the bounded dim, result equals the batch
    join exactly (no state, no watermark involved)."""
    ev = table(spark, SF_DIR, "events")
    dim = (
        table(spark, SF_DIR, "customer")
        .select(F.col("c_custkey").alias("dim_key"), "c_mktsegment")
    )
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = _drain(
        spark,
        jobs.stream_static_enrich(
            stream.select("event_id", "user_id"), dim, "user_id", "dim_key"
        ),
        "t_enrich",
    ).toPandas()
    batch = (
        ev.select("event_id", "user_id")
        .join(dim, F.col("user_id") == F.col("dim_key"), "left")
        .toPandas()
    )
    key = ["event_id"]
    assert len(got) == len(batch)
    m = got.sort_values(key).reset_index(drop=True).fillna("~")
    b = batch.sort_values(key).reset_index(drop=True).fillna("~")
    assert (m.c_mktsegment == b.c_mktsegment).all()


def test_dedup_stream_parity(spark, tmp_path):
    """Streaming exact dedup ≡ batch keeper mapping: the first-arriving
    (== min doc_id under ordered file batches) document survives per
    content hash, every later duplicate is dropped."""
    docs = table(spark, SF_DIR, "documents")
    d = str(tmp_path / "docs_stream")
    # two ordered micro-batch files, doc_id ascending across them
    n = docs.count()
    lo = docs.orderBy("doc_id").limit(n // 2)
    # the desc+limit selects the top half; re-sort ascending before writing
    # so rows inside this file also arrive doc_id-ascending (the parity
    # check pins the keeper to the global min doc_id per content hash)
    hi = docs.orderBy(F.desc("doc_id")).limit(n - n // 2).sort("doc_id")
    lo.coalesce(1).write.mode("append").parquet(d)
    hi.coalesce(1).write.mode("append").parquet(d)

    stream = jobs.parquet_stream(spark, d, docs.schema)
    got = _drain(spark, jobs.dedup_stream(stream), "t_dedup").toPandas()

    keepers = (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .toPandas()
    )
    assert len(got) == len(keepers)
    assert set(got.doc_id) == set(keepers.doc_id)


def test_funnel_stream_parity(spark, events_stream_dir):
    """Streaming funnel ≡ batch chain-of-mins: the last emitted stage per
    user (drained ordered stream) must reproduce the batch funnel's
    per-user conversion depth, including across micro-batch boundaries
    (state carries t1/t2/t3 between files)."""
    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = _drain(spark, jobs.funnel_stream(stream), "t_funnel").toPandas()
    # final stage per user = stage of the user's last event (max event order)
    last = (
        got.sort_values(["user_id", "event_id"])
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")["stage"]
    )

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
    batch = (
        t1.join(t2, "user_id", "left").join(t3, "user_id", "left").toPandas()
    )
    expected = {
        r.user_id: (3 if r.t3 == r.t3 and r.t3 is not None
                    else 2 if r.t2 == r.t2 and r.t2 is not None else 1)
        for r in batch.itertuples()
    }
    for uid, stage in expected.items():
        assert last.get(uid, 0) == stage, (uid, stage, last.get(uid))


def test_split_assignment_stream_batch_parity(spark, tmp_path):
    """train_val_test_split is a pure row expression — stream-safe with
    NO state: streaming assignment must equal the batch assignment doc
    for doc (the property that lets split tagging run at ingest)."""
    docs = table(spark, SF_DIR, "documents")
    d = str(tmp_path / "docs_split_stream")
    docs.orderBy("doc_id").coalesce(2).write.mode("overwrite").parquet(d)

    from realtime_datawarehouse_spark.operators import textops

    stream = jobs.parquet_stream(spark, d, docs.schema)
    got = _drain(
        spark, textops.train_val_test_split(stream), "t_split"
    ).toPandas()
    batch = textops.train_val_test_split(docs).toPandas()
    g = got.set_index("doc_id")["split"].to_dict()
    b = batch.set_index("doc_id")["split"].to_dict()
    assert g == b
    assert set(b.values()) <= {"train", "val", "test"}


def test_semantic_dedup_stream_parity(spark, tmp_path):
    """Streaming SemDeDup ≡ batch dedup_semantic_lsh: with the stream's
    fixed plane count set to the batch operator's derived count, draining
    the vec_id-ordered stream must reproduce the batch (cluster_id,
    is_dup) row for row — including pairs split across micro-batches
    (bucket state carries members between files)."""
    from realtime_datawarehouse_spark.operators import similarity

    emb = table(spark, SF_DIR, "embeddings")
    n = emb.count()
    # the batch operator's adaptive plane count, derived the same way
    planes = max(
        similarity.SEM_LSH_MIN_PLANES,
        sum(
            1
            for p in range(similarity.SEM_LSH_MAX_PLANES)
            if n > similarity.SEM_LSH_TARGET_POP * (1 << p)
        ),
    )
    d = str(tmp_path / "emb_stream")
    half = emb.orderBy("vec_id").limit(n // 2)
    rest = emb.orderBy(F.desc("vec_id")).limit(n - n // 2).sort("vec_id")
    half.coalesce(1).write.mode("append").parquet(d)
    rest.coalesce(1).write.mode("append").parquet(d)

    stream = jobs.parquet_stream(spark, d, emb.schema)
    got = (
        _drain(spark, jobs.semantic_dedup_stream(stream, planes), "t_semdd")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    batch = (
        similarity.semdedup_lsh(emb)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(batch) == n
    assert (got.vec_id == batch.vec_id).all()
    assert (got.cluster_id == batch.cluster_id).all()
    assert (got.is_dup == batch.is_dup).all()


def test_streaming_bitmap_uv_state_parity(spark, events_stream_dir):
    """The streaming-maintained bitmap state (complete mode, merged across
    3 micro-batches) must read out to EXACTLY the batch distinct-user
    counts — bitmaps are exact, so parity is equality, not approximation."""
    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    q = jobs.run_to_memory(
        jobs.bitmap_uv_state_stream(stream), "t_bitmap_state", "complete"
    )
    q.awaitTermination()
    got = {
        r.event_type: r.uv
        for r in spark.table("t_bitmap_state")
        .groupBy("event_type")
        .agg(F.expr("sum(bitmap_count(bm))").alias("uv"))
        .collect()
    }
    exact = {
        r.event_type: r.uv
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("uv"))
        .collect()
    }
    assert got == exact


def test_ohlc_bars_streaming_parity(spark, events_stream_dir):
    """olap_ohlc_bars' streaming twin: closed hourly bars carry exactly
    the batch OHLC values — min_by/max_by state is arrival-order-free
    because the order key (epoch_us‖event_id) is total."""
    from realtime_datawarehouse_spark.plans.registry import get_queries

    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = _drain(spark, jobs.ohlc_bars_stream(stream), "t_ohlc").toPandas()
    batch = get_queries()["olap_ohlc_bars"](spark, SF_DIR).toPandas()
    key = ["bar_start", "event_type"]
    merged = got.merge(batch, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    for c in ("open", "high", "low", "close", "trade_ct"):
        assert (merged[f"{c}_s"] == merged[f"{c}_b"]).all(), c
    assert (abs(merged.volume_s - merged.volume_b) < 1e-9).all()
    # only the final open hour may be withheld per key
    assert len(got) >= len(batch) - merged.event_type.nunique() - 1


def test_ewma_stream_parity(spark, events_stream_dir):
    """Streaming integer EWMA must equal the batch recursive fold
    EXACTLY (both run s = (3x + 7s) // 10 over the same event-time
    order; the streaming state is one int64 per user)."""
    from realtime_datawarehouse_spark.plans.registry import get_queries

    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = _drain(spark, jobs.ewma_stream(stream), "t_ewma").toPandas()
    batch = get_queries()["olap_ewma_user_value"](spark, SF_DIR).toPandas()
    key = ["user_id", "event_id"]
    merged = got.merge(batch, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(batch) == len(got)
    assert (merged.ewma_q6_s == merged.ewma_q6_b).all()


def test_scd2_stream_parity(spark, events_stream_dir):
    """Streaming SCD2 ≡ batch gaps-and-islands on the CLOSED intervals:
    every interval the batch build closes (valid_to set) must be emitted
    by the incremental kernel — including runs spanning micro-batch
    boundaries (the open run carries in state and closes in a later
    batch). Open (CURRENT) runs stay in state by design."""
    from realtime_datawarehouse_spark.plans.warehouse_ext import _scd2_runs

    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = _drain(spark, jobs.scd2_stream(stream), "t_scd2").toPandas()

    batch = (
        _scd2_runs(ev)
        .where(F.col("vt").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.col("vf").alias("valid_from"),
            F.col("vt").alias("valid_to"),
            "n_events",
        )
        .toPandas()
    )
    key = ["user_id", "valid_from"]
    assert len(got) == len(batch)
    g = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    for c in ["user_id", "event_type", "valid_to", "n_events"]:
        assert (g[c] == b[c]).all(), c


def test_kmv_stream_parity(spark, events_stream_dir):
    """Streaming KMV ≡ batch sk_kmv_distinct once the stream drains: the
    bottom-k state is order-insensitive (set minimum), so the final
    emission per day must equal the batch sketch exactly — including days
    whose bottom-k assembles across micro-batches."""
    from realtime_datawarehouse_spark.plans import registry

    registry.load()
    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = _drain(spark, jobs.kmv_stream(stream), "t_kmv", "update").toPandas()
    final = (
        got.sort_values("upd_seq").groupby("dt", as_index=False).last()
    )
    batch = registry.QUERIES["sk_kmv_distinct"](spark, SF_DIR).toPandas()
    m = final.merge(batch, on="dt", suffixes=("_s", "_b"))
    assert len(m) == len(batch)
    assert (m.est_uv_s == m.est_uv_b).all()


def test_growth_accounting_stream_parity(spark, events_stream_dir):
    """Streaming lifecycle classification ≡ batch growth accounting for
    new/retained/resurrected per day — including users whose state
    transition spans a micro-batch boundary (last-active-day carries in
    state)."""
    from realtime_datawarehouse_spark.plans import registry

    registry.load()
    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = _drain(
        spark, jobs.growth_accounting_stream(stream), "t_growth"
    ).toPandas()
    got["dt"] = (
        pd.to_datetime(got.d, unit="D").dt.strftime("%Y-%m-%d")
    )
    counts = (
        got.groupby(["dt", "cls"]).size().unstack(fill_value=0).reset_index()
    )
    batch = (
        registry.QUERIES["olap_growth_accounting"](spark, SF_DIR)
        .toPandas()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    counts = counts.rename(
        columns={"new": "s_new", "retained": "s_ret", "resurrected": "s_res"}
    )
    for c in ("s_new", "s_ret", "s_res"):
        if c not in counts:
            counts[c] = 0
    m = batch.merge(counts, on="dt", how="left").fillna(0)
    assert (m.new_users == m.s_new).all()
    assert (m.retained == m.s_ret).all()
    assert (m.resurrected == m.s_res).all()


def test_session_window_streaming_parity(spark, events_stream_dir):
    """olap_sessionize's streaming twin: closed builtin session_window
    sessions agree exactly with the batch lag+cumsum construction (same
    >= gap half-open rule, same quantized value sum). Only the final
    micro-batch's still-open sessions may be withheld."""
    from realtime_datawarehouse_spark.plans import registry

    ev = table(spark, SF_DIR, "events")
    stream = jobs.parquet_stream(spark, events_stream_dir, ev.schema)
    got = _drain(
        spark, jobs.session_window_stream(stream), "t_sesswin"
    ).toPandas()

    batch = (
        registry.get_queries()["olap_sessionize"](spark, SF_DIR)
        .select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "duration_s",
            "n_events",
            "session_value",
        )
        .toPandas()
    )
    key = ["user_id", "session_start"]
    merged = got.merge(batch, on=key, suffixes=("_s", "_b"))
    # every emitted session matches its batch twin exactly
    assert len(merged) == len(got), (len(merged), len(got))
    assert (merged.duration_s_s == merged.duration_s_b).all()
    assert (merged.n_events_s == merged.n_events_b).all()
    assert (abs(merged.session_value_s - merged.session_value_b) < 1e-9).all()
    # ...and nearly all batch sessions were emitted (open tail withheld)
    assert len(got) >= len(batch) * 0.9, (len(got), len(batch))


def test_clamped_balance_streaming_parity(spark, tmp_path):
    """The streaming kernel runs the LITERAL max(0, prev+delta) recursion
    with one int64 of state per part; the batch plan uses the reflection
    identity — parity across micro-batch boundaries proves the identity
    under state carry-over."""
    from realtime_datawarehouse_spark.plans import registry

    li = table(spark, SF_DIR, "lineitem").where(
        F.expr("l_partkey % 10 = 0") & F.col("l_returnflag").isin("A", "R")
    )
    d = str(tmp_path / "li_stream")
    # two ordered micro-batches split by shipdate (state carries across)
    lo = li.where(F.col("l_shipdate") < "2000-01-01").sort(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    hi = li.where(F.col("l_shipdate") >= "2000-01-01").sort(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    lo.coalesce(1).write.mode("append").parquet(d)
    hi.coalesce(1).write.mode("append").parquet(d)

    stream = jobs.parquet_stream(spark, d, li.schema)
    got = {
        (r.partkey, r.line_id): r.balance
        for r in _drain(
            spark, jobs.clamped_balance_stream(stream), "t_clamp"
        ).collect()
    }
    want = {
        (r.partkey, r.line_id): r.balance
        for r in registry.get_queries()["olap_clamped_running_balance"](
            spark, SF_DIR
        ).collect()
    }
    assert got == want and len(want) > 100


def test_content_sniff_streaming_parity(spark, tmp_path):
    """The magic-byte router's streaming aggregation must converge to the
    batch mm_content_sniff result once all micro-batches are processed
    (complete output mode; state = one row per content type)."""
    from realtime_datawarehouse_spark.plans import registry

    docs = table(spark, SF_DIR, "documents")
    d = str(tmp_path / "docs_sniff_stream")
    n = docs.count()
    docs.orderBy("doc_id").limit(n // 2).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    docs.orderBy(F.desc("doc_id")).limit(n - n // 2).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    stream = jobs.parquet_stream(spark, d, docs.schema)
    got = {
        r.content_type: (r.n_files, r.total_bytes)
        for r in _drain(
            spark, jobs.content_sniff_stream(stream), "t_sniff", "complete"
        ).collect()
    }
    want = {
        r.content_type: (r.n_files, r.total_bytes)
        for r in registry.get_queries()["mm_content_sniff"](
            spark, SF_DIR
        ).collect()
    }
    assert got == want and len(want) == 4
