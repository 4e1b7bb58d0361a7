"""Literal / socket sources (S6, S7).

S7 in-memory literal source (env.fromElements demos,
rt/app/dwd/log/DwdTrafficUserJumpDetail.java:51-60) → ``createDataFrame``;
S6 socket source (rt-test/TestIntervalJoin.java:23,46) → readStream socket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def from_json_lines(spark: SparkSession, lines: list[str]) -> DataFrame:
    """S7: literal JSON lines as a (value: string) DataFrame — the shape a
    Kafka value column has, so parsers plug in unchanged."""
    return spark.createDataFrame([(s,) for s in lines], "value string")


def socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S6: line stream from a TCP socket (demo parity; streaming mode)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
