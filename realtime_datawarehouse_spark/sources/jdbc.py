"""JDBC lookup-dim source (S5) — the base_dic lookup table.

Reference: Flink lookup table with 200-row / 1 h JDBC cache
(rt/util/MySqlUtil.java:10-30) queried per record with
``FOR SYSTEM_TIME AS OF proc_time`` (J3). Spark-first: read the dim as a
snapshot DataFrame once per (micro-)batch and broadcast-join it — the
broadcast ships to every executor once, strictly better than a per-record
RPC cache at any scale.

No database runs in the test container; ``lookup_table`` is exercised in
tests through its in-memory twin (``dic_from_rows``), which produces an
identical schema/contract downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def lookup_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "com.mysql.cj.jdbc.Driver",
) -> DataFrame:
    """S5: snapshot read of a JDBC dim table (broadcast by the caller)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .load()
    )


def dic_from_rows(
    spark: SparkSession, rows: list[tuple[str, str]]
) -> DataFrame:
    """In-memory twin of base_dic(dic_code, dic_name) for tests/demos."""
    return spark.createDataFrame(rows, "dic_code string, dic_name string")
