"""Sink-side operators (K2/K3/K4 contracts) and the ADS serving layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_datawarehouse_spark import serving
from realtime_datawarehouse_spark.operators import sinks
from tests.conftest import SF_DIR


def test_exclude_transient_drops_accumulator_cols(spark):
    df = spark.createDataFrame(
        [(1, "a", [1, 2])], "id int, keep string, order_id_set array<int>"
    )
    out = sinks.exclude_transient(df, ["order_id_set"])
    assert out.columns == ["id", "keep"]


def test_upsert_sink_last_write_wins(spark, tmp_path):
    path = str(tmp_path / "dim_state")
    b1 = spark.createDataFrame(
        [("1", "old", 1), ("2", "keep", 1)], "pk string, val string, ver int"
    )
    b2 = spark.createDataFrame(
        [("1", "new", 2), ("3", "ins", 2)], "pk string, val string, ver int"
    )
    sinks.upsert_sink(spark, b1, path, pk="pk", version_col="ver")
    sinks.upsert_sink(spark, b2, path, pk="pk", version_col="ver")
    state = {
        r.pk: r.val for r in spark.read.parquet(path).collect()
    }
    assert state == {"1": "new", "2": "keep", "3": "ins"}


def test_append_sink_excludes_transient(spark, tmp_path):
    path = str(tmp_path / "appended")
    df = spark.createDataFrame([(1, "x")], "id int, tmp string")
    sinks.append_sink(df, path, transient_cols=["tmp"])
    sinks.append_sink(df, path, transient_cols=["tmp"])
    back = spark.read.parquet(path)
    assert back.columns == ["id"] and back.count() == 2


def _some_date(spark) -> str:
    from realtime_datawarehouse_spark.tables import table

    return (
        table(spark, SF_DIR, "orders")
        .select(F.date_format("o_orderdate", "yyyyMMdd").alias("d"))
        .groupBy("d")
        .count()
        .orderBy(F.desc("count"))
        .first()
        .d
    )


def test_gmv_endpoint_matches_oracle(spark, duck):
    date = _some_date(spark)
    got = serving.gmv(spark, SF_DIR, date)
    exp = duck.execute(
        "SELECT round(sum(o_totalprice), 2) FROM orders "
        f"WHERE strftime(o_orderdate, '%Y%m%d') = '{date}'"
    ).fetchone()[0]
    assert got["status"] == 0
    assert abs(got["data"] - float(exp)) < 1e-6


def test_province_endpoint_matches_oracle(spark, duck):
    date = _some_date(spark)
    got = serving.province_stats(spark, SF_DIR, date)
    exp = {
        name: val
        for name, val in duck.execute(
            "SELECT n.n_name, round(sum(o.o_totalprice), 2) "
            "FROM orders o "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            f"WHERE strftime(o.o_orderdate, '%Y%m%d') = '{date}' "
            "GROUP BY n.n_name"
        ).fetchall()
    }
    assert got["status"] == 0
    assert got["data"]["valueName"] == serving.VALUE_NAME
    got_map = {e["name"]: e["value"] for e in got["data"]["mapData"]}
    assert set(got_map) == set(exp)
    for k, v in exp.items():
        assert abs(got_map[k] - float(v)) < 1e-6


def test_segmenter_udf_slot(spark):
    """U1 pluggable segmenter: Arrow-batched UDF whose fallback agrees with
    the builtin tokenizer, so swapping in a real segmenter changes only the
    token boundaries, never the pipeline shape."""
    from realtime_datawarehouse_spark.functions.text import (
        make_segmenter_udf,
        tokenize,
    )
    from realtime_datawarehouse_spark.tables import table

    docs = table(spark, SF_DIR, "documents").limit(50)
    seg = make_segmenter_udf()
    a = docs.select("doc_id", F.explode(seg("text")).alias("tok"))
    b = docs.select("doc_id", F.explode(tokenize("text")).alias("tok"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    plan = a._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_sql_view_surface(spark):
    """Every operator output is addressable from plain spark.sql, and
    cross-view composition optimizes as one fused query."""
    from realtime_datawarehouse_spark.serving import register_query_views

    names = register_query_views(spark, SF_DIR)
    assert len(names) >= 60
    row = spark.sql(
        """
        SELECT q.l_returnflag, q.sum_qty, d.dup_ct
        FROM tpch_q1_pricing_summary q
        CROSS JOIN (SELECT count(*) AS dup_ct FROM dedup_exact) d
        ORDER BY q.l_returnflag, q.l_linestatus
        LIMIT 1
        """
    ).collect()[0]
    assert row.sum_qty > 0 and row.dup_ct > 0
