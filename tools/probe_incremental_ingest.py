#!/usr/bin/env python
"""Per-ingest cost of incremental dedup vs corpus size (round 6).

`dedup_incremental_batch`'s docstring claims that at deployment scale the
corpus signatures are NOT recomputed per ingest — they live in a
signature table maintained by the versioned store, and only the batch
side runs. This probe measures that claim across a corpus decade
(sf0.1 documents = 5 000 docs → sf1 = 50 000 docs, same batch of ~500):

  recompute  — the registered single-table form (both sides from text)
  sig-table  — incremental_flags_vs_signatures against a materialized
               signature table (the production loop's read side)
  sig-merge  — merging the batch's 500 signatures INTO the table
               (the production loop's write side; bucketed store)

Expected shape: `recompute` grows with the corpus (it re-shingles and
re-minhashes everything); `sig-table` keeps only the residual linear
term — a narrow 17-column signature scan + 4-rows/doc band explode, no
shingling — so its decade ratio sits well under the recompute form's;
`sig-merge` is flat by the bucketed-store law (SCALE.md §20). The fully
indexed port for 100 TB stores the BANDED view hive-bucketed by
band-key hash so the broadcast-batch join prunes to touched buckets and
even the residual scan drops to O(collisions) — same manifest-pruning
story as the store's own bucketed MERGE.

Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from realtime_datawarehouse_spark.operators import dedup, table_store  # noqa: E402
from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.tables import table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scale_data",
    "sf1",
)
WORK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scale_data",
    "_incr_probe",
)


def _time_warm(df: DataFrame) -> float:
    df.write.format("noop").mode("overwrite").save()  # cold
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _calib() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    return time.perf_counter() - t0


def main() -> None:
    spark = build_session(app_name="probe-incremental-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)
    batch = (
        table(spark, SF01, "documents")
        .where("doc_id % 10 = 7")
        .select("doc_id", "text")
    )
    out: dict = {"batch_docs": batch.count()}
    for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        docs = table(spark, sf_dir, "documents").select("doc_id", "text")
        corpus = docs.where("doc_id % 10 <> 7")
        row: dict = {"corpus_docs": corpus.count()}
        # (a) registered single-table recompute form
        row["recompute_s"] = round(
            _time_warm(dedup.incremental_lsh_flags(docs)), 3
        )
        # (b) production read side: flags vs a materialized sig table
        sig_path = os.path.join(WORK, f"sigs_{label}")
        table_store.merge_upsert(
            spark,
            dedup.minhash_signatures(corpus).withColumn("ver", F.lit(0)),
            sig_path,
            pk="doc_id",
            version_col="ver",
            buckets=64,
        )
        corpus_sig = table_store.read_state(spark, sig_path).drop("ver")
        row["sig_table_s"] = round(
            _time_warm(
                dedup.incremental_flags_vs_signatures(batch, corpus_sig)
            ),
            3,
        )
        # (c) production write side: merge the batch's signatures in
        bsig = dedup.minhash_signatures(batch).withColumn("ver", F.lit(1))
        t0 = time.perf_counter()
        table_store.merge_upsert(
            spark, bsig, sig_path, pk="doc_id", version_col="ver"
        )
        row["sig_merge_s"] = round(time.perf_counter() - t0, 3)
        out[label] = row
    out["recompute_ratio"] = round(
        out["sf1"]["recompute_s"] / out["sf0.1"]["recompute_s"], 2
    )
    out["sig_table_ratio"] = round(
        out["sf1"]["sig_table_s"] / out["sf0.1"]["sig_table_s"], 2
    )
    out["calib_py_loop_s"] = round(_calib(), 3)
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
