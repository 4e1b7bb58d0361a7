"""Decade probe for the round-8 streaming split maintenance
(SCALE.md §29): per-batch component→split maintenance cost must track
the BATCH, not the standing corpus.

Method (mirrors the §23 ingest probe): seed the signature + component
tables with a standing corpus of N docs (one bulk ingest step), then
time ONE fixed-size 500-doc ingest step (`pipelines.ingest_split_step`:
incremental pair generation against the standing signatures, contracted
union-find, assignment/relabel merge) at N = 500 (sf0.01 corpus) and
N = 5 000 (sf0.1 corpus) — a 10× standing-corpus decade with the
measured batch held constant. Fresh ids for the probe batch so both
scales do identical work shapes.

A first unreported warmup step absorbs one-time plan/exchange init
(the §13/§23 discipline). Run on a QUIET host. Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.streaming import pipelines  # noqa: E402
from realtime_datawarehouse_spark.tables import table  # noqa: E402

BATCH = 500


def probe(spark, sf_dir: str, tmp: str) -> dict:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_corpus = docs.count()
    sig = f"{tmp}/sigs"
    comp = f"{tmp}/comps"
    # bulk-seed the standing corpus (step 0 — not the measured shape)
    pipelines.ingest_split_step(spark, docs, sig, comp, batch_id=0)
    # fixed probe batch: 500 fresh-id docs recycled from the corpus text
    probe_docs = (
        docs.limit(BATCH)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    # unreported warmup step (one-time plan/exchange init), then measure
    warm = probe_docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)
    pipelines.ingest_split_step(spark, warm, sig, comp, batch_id=1)
    t0 = time.monotonic()
    pipelines.ingest_split_step(spark, probe_docs, sig, comp, batch_id=2)
    sec = time.monotonic() - t0
    return {"corpus": n_corpus, "batch": BATCH, "step_sec": round(sec, 3)}


def main() -> None:
    import tempfile

    spark = build_session(app_name="probe-split-decade")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "split-maintenance per-batch cost vs corpus decade"}
    for label, sf_dir in (
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
    ):
        tmp = tempfile.mkdtemp(prefix=f"rdw-split-decade-{label}-")
        r = probe(spark, sf_dir, tmp)
        out[f"{label}_corpus"] = r["corpus"]
        out[f"{label}_step_sec"] = r["step_sec"]
    out["decade_ratio"] = round(
        out["sf0.1_step_sec"] / out["sf0.01_step_sec"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
