"""End-to-end layered warehouse test: ODS→DIM→DWD→DWS→ADS over parquet
layers, with the final ADS numbers checked against DuckDB straight off the
source fixtures (the whole pipeline must be lossless)."""

from __future__ import annotations

from realtime_datawarehouse_spark.plans import warehouse
from tests.conftest import SF_DIR


def test_layered_pipeline_end_to_end(spark, duck, tmp_path):
    out = str(tmp_path / "wh")
    paths = warehouse.run_warehouse(spark, SF_DIR, out)

    # every layer landed
    for key in (
        "ods/topic_db_cart", "ods/topic_log", "dim/dim_part",
        "dim/dim_supplier", "dwd/cart_add", "dwd/order_detail",
        "dwd/page_log", "dws/sku_order", "dws/trade_daily", "dws/cart_uu",
    ):
        assert key in paths, f"missing layer table {key}"

    # DIM: config-routed upsert state matches the oracle (insert+update-delete)
    dim_part_ct = spark.read.parquet(paths["dim/dim_part"]).count()
    exp_part = duck.execute(
        "SELECT count(*) FROM part WHERE p_partkey % 7 <> 0"
    ).fetchone()[0]
    assert dim_part_ct == exp_part

    # DWD: cart facts equal the S3 envelope-pipeline oracle
    cart_ct = spark.read.parquet(paths["dwd/cart_add"]).count()
    exp_cart = duck.execute(
        """SELECT count(*) FROM lineitem
           WHERE l_linenumber <> 7
             AND (l_returnflag = 'A'
                  OR (l_returnflag = 'R' AND l_linenumber % 3 = 2))"""
    ).fetchone()[0]
    assert cart_ct == exp_cart

    # DWD order_detail is partitioned by dt (partition pruning surface)
    import os

    parts = [p for p in os.listdir(paths["dwd/order_detail"]) if p.startswith("dt=")]
    assert len(parts) > 1

    # ADS: gmv for the busiest day, computed through ALL layers, equals
    # DuckDB computed directly from the raw fixtures
    dt, exp_gmv = duck.execute(
        """SELECT strftime(o.o_orderdate, '%Y-%m-%d') AS dt,
                  sum(l.l_quantity * l.l_extendedprice) AS gmv
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           GROUP BY 1 ORDER BY count(*) DESC LIMIT 1"""
    ).fetchone()
    got = warehouse.ads_gmv(spark, out, dt)
    assert abs(got - float(exp_gmv)) < 1e-6 * max(1.0, abs(exp_gmv))
