"""End-to-end streaming pipeline tests over literal wire-format inputs
(golden Maxwell/log lines → file stream → pipeline → memory sink)."""

from __future__ import annotations

import pytest

from realtime_datawarehouse_spark.streaming import jobs, pipelines


def _stream_of_lines(spark, tmp_path, lines_batches):
    """Write each batch of (value: string) lines as one parquet file."""
    d = str(tmp_path)
    for batch in lines_batches:
        spark.createDataFrame([(s,) for s in batch], "value string").coalesce(
            1
        ).write.mode("append").parquet(d)
    return spark.readStream.schema("value string").option(
        "maxFilesPerTrigger", 1
    ).parquet(d)


CART_LINES_B1 = [
    '{"database":"g","table":"cart_info","type":"insert","ts":"1704067200",'
    '"data":{"id":"1","user_id":"u1","sku_id":"s1","sku_num":"2"}}',
    '{"database":"g","table":"cart_info","type":"insert","ts":"1704067201",'
    '"data":{"id":"2","user_id":"u2","sku_id":"s1","sku_num":"1"}}',
    '{"database":"g","table":"cart_info","type":"bootstrap-start","ts":"1704067202","data":{}}',
]
CART_LINES_B2 = [
    # same user u1 same day → not a new UU; u3 new
    '{"database":"g","table":"cart_info","type":"update","ts":"1704067210",'
    '"old":{"sku_num":"2"},"data":{"id":"1","user_id":"u1","sku_id":"s1","sku_num":"5"}}',
    '{"database":"g","table":"cart_info","type":"insert","ts":"1704067211",'
    '"data":{"id":"3","user_id":"u3","sku_id":"s2","sku_num":"1"}}',
]
# append-mode windows emit in the batch AFTER the watermark passes their end:
# two next-day heartbeat batches advance the watermark, then flush
CART_HEARTBEATS = [
    ['{"database":"g","table":"cart_info","type":"insert","ts":"1704153600",'
     '"data":{"id":"90","user_id":"u9","sku_id":"s9","sku_num":"1"}}'],
    ['{"database":"g","table":"cart_info","type":"insert","ts":"1704153601",'
     '"data":{"id":"91","user_id":"u9","sku_id":"s9","sku_num":"1"}}'],
]


def test_cart_add_uu_pipeline(spark, tmp_path):
    raw = _stream_of_lines(
        spark, tmp_path, [CART_LINES_B1, CART_LINES_B2] + CART_HEARTBEATS
    )
    q = jobs.run_to_memory(
        pipelines.dws_cart_add_uu_window(raw), "t_cart_uu", "append"
    )
    q.awaitTermination()
    rows = spark.table("t_cart_uu").collect()
    # u1@:00 u2@:01 in window [:00,:10); u3@:11 in [:10,:20) — the second
    # window may be withheld by the watermark, the first must have closed
    by_stt = {r.stt: r.cart_add_uu_ct for r in rows}
    assert by_stt["2024-01-01 00:00:00"] == 2


LOG_HEARTBEAT = (
    '{"common":{"mid":"hb"},"page":{"page_id":"good_list","last_page_id":"search",'
    '"item":"late heartbeat","item_type":"keyword"},"ts":1704153600000}'
)

LOG_LINES = [
    '{"common":{"mid":"m1"},"page":{"page_id":"good_list","last_page_id":"search",'
    '"item":"apple iphone case","item_type":"keyword"},"ts":1704067200000}',
    '{"common":{"mid":"m2"},"page":{"page_id":"good_list","last_page_id":"search",'
    '"item":"apple watch","item_type":"keyword"},"ts":1704067201000}',
    '{"common":{"mid":"m3"},"page":{"page_id":"home"},"ts":1704067215000}',
    "NOT JSON",
]


def test_keyword_window_pipeline(spark, tmp_path):
    raw = _stream_of_lines(
        spark, tmp_path, [LOG_LINES, [LOG_HEARTBEAT], [LOG_HEARTBEAT]]
    )
    q = jobs.run_to_memory(
        pipelines.dws_keyword_window(raw), "t_kw", "append"
    )
    q.awaitTermination()
    got = {(r.keyword, r.keyword_count) for r in spark.table("t_kw").collect()}
    # tokenized + exploded counts in the closed [:00, :10) window
    assert ("apple", 2) in got
    assert ("iphone", 1) in got
    assert ("watch", 1) in got


def test_log_split_streaming_branches(spark, tmp_path):
    raw = _stream_of_lines(spark, tmp_path, [LOG_LINES])
    branches = pipelines.dwd_log_split(raw)
    qs = {
        name: jobs.run_to_memory(df, f"t_split_{name}", "append")
        for name, df in branches.items()
    }
    for q in qs.values():
        q.awaitTermination()
    assert spark.table("t_split_page").count() == 3
    assert spark.table("t_split_dirty").count() == 1
    assert spark.table("t_split_err").count() == 0
