#!/usr/bin/env python
"""Throughput of the streaming ingest-dedup loop at sf0.1 (round 7).

SCALE.md §23 measured the loop's READ side flat across a corpus decade
and its WRITE side flat by the bucketed-merge law; this probe adds the
operational headline: documents/second through the DEPLOYED topology —
`streaming/pipelines.py::streaming_incremental_dedup` consuming a file
stream one micro-batch per trigger (flag vs the standing signature
table, commit flags, merge the batch's signatures so batch N+1 sees
batch N as corpus).

sf0.1 documents (5 000 docs) split into 10 micro-batches of ~500 — the
same batch size as §23. Reports total wall (excluding the one-time
~35 s streaming-machinery init — a warm-up stream absorbs it first)
and docs/s; per-batch flatness is pinned in-suite at sf0.01. Prints
one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.streaming import pipelines  # noqa: E402
from realtime_datawarehouse_spark.tables import table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
N_BATCHES = 10


def main() -> None:
    spark = build_session(app_name="probe-stream-ingest-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ingest_probe_")
    try:
        docs = table(spark, SF01, "documents").select("doc_id", "text")
        n_docs = docs.count()
        in_dir = os.path.join(work, "in")
        for i in range(N_BATCHES):
            docs.where(f"doc_id % {N_BATCHES} = {i}").coalesce(1).write.mode(
                "append"
            ).parquet(in_dir)
            time.sleep(1.05)  # file source orders micro-batches by mtime

        # warm the one-time streaming machinery on a throwaway stream so
        # the measured loop isn't billed for JVM/stream init
        warm = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(in_dir)
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(work, "warm_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        warm.awaitTermination()

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        sig_path = os.path.join(work, "sigs")
        flags_path = os.path.join(work, "flags")
        builder = pipelines.streaming_incremental_dedup(
            stream, sig_path, flags_path
        )
        t0 = time.perf_counter()
        q = (
            builder.option(
                "checkpointLocation", os.path.join(work, "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        from realtime_datawarehouse_spark.operators import table_store

        n_sig = table_store.read_state(spark, sig_path).count()
        n_flags = table_store.read_state(spark, flags_path).count()
        out = {
            "docs": n_docs,
            "batches": N_BATCHES,
            "wall_s": round(wall, 2),
            "docs_per_s": round(n_docs / wall, 1),
            "sig_rows": n_sig,
            "flag_rows": n_flags,
        }
        assert n_sig == n_docs
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
