"""Standalone MERGE writer — one OS process, one JVM, one SparkSession.

Spawned by tests/test_sinks_serving.py::test_multiprocess_concurrent_writers
to exercise the table store's Delta-style serialization contract ACROSS
PROCESSES (the reference's sinks are multi-process by deployment — one
Flink job per JVM writing Phoenix/ClickHouse, rt/util/MyClickhouseUtil.java
— and real lakehouse multi-writer concurrency is cross-process too, which
thread-level tests cannot prove: O_EXCL lock files, mkdir claim tokens and
the atomic pointer rename must serialize at the KERNEL level).

Usage: mp_writer.py <table_path> <writer_id> <n_batches> [buckets]

Each batch merges one disjoint PK (``w<id>-b<batch>``) plus one PK
contended by every writer (``shared``) whose version encodes
(writer, batch) so the parent can assert deterministic last-write-wins.
``buckets`` exercises the hive-bucketed layout (zero-copy carry-forward
racing GC across processes). Exits non-zero on any unabsorbed conflict.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    path, writer_id, n_batches = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    buckets = int(sys.argv[4]) if len(sys.argv) > 4 else None
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pyspark.sql import SparkSession

    from realtime_datawarehouse_spark.operators import table_store as ts

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"mp-writer-{writer_id}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    try:
        for b in range(n_batches):
            ver = writer_id * 1000 + b
            df = spark.createDataFrame(
                [
                    (f"w{writer_id}-b{b}", f"w{writer_id}", ver),
                    ("shared", f"w{writer_id}b{b}", ver),
                ],
                "pk string, val string, ver long",
            )
            ts.merge_upsert(
                spark,
                df,
                path,
                pk="pk",
                version_col="ver",
                retain=8,
                attempts=64,
                buckets=buckets,
            )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
