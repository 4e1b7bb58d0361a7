"""Decade probe for the bucketed table-store MERGE (SCALE.md §20).

Question: does merge cost stay O(batch) as the TABLE grows 10×? The flat
path rewrites full state per merge (the copy-on-write wall the reference's
Phoenix/ClickHouse sinks never hit because they mutate in place,
rt/app/func/DimSinkFunction.java); ``buckets=N`` must hold the merge cost
near-flat while the table decades.

Method: for each table size, seed a flat table and a 256-bucket table
with identical rows, then time ONE 10-row merge into each (min of 2 reps;
a fresh batch per rep so the merge is never a no-op). Emits one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from realtime_datawarehouse_spark.operators import table_store as ts  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [100_000, 1_000_000, 10_000_000]
    out: dict[str, dict[str, float]] = {}
    work = tempfile.mkdtemp(prefix="probe_bucketed_")
    try:
        for n in sizes:
            seed = spark.range(n).select(
                F.col("id").cast("string").alias("pk"),
                F.sha2(F.col("id").cast("string"), 256).alias("val"),
                F.lit(1).alias("ver"),
            )
            flat = os.path.join(work, f"flat_{n}")
            buck = os.path.join(work, f"buck_{n}")
            ts.merge_upsert(spark, seed, flat, pk="pk", version_col="ver")
            ts.merge_upsert(
                spark, seed, buck, pk="pk", version_col="ver", buckets=256
            )
            row = {}
            for label, path in (("flat", flat), ("bucketed", buck)):
                best = float("inf")
                for rep in range(2):
                    batch = spark.createDataFrame(
                        [
                            (str(i * 997 % n), f"upd{rep}", 2 + rep)
                            for i in range(10)
                        ],
                        "pk string, val string, ver int",
                    )
                    t0 = time.perf_counter()
                    ts.merge_upsert(
                        spark, batch, path, pk="pk", version_col="ver",
                        retain=2,
                    )
                    best = min(best, time.perf_counter() - t0)
                row[label] = round(best, 3)
            out[str(n)] = row
        print(json.dumps({"merge_10row_batch_s": out, "buckets": 256}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
