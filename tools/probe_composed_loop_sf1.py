"""sf1 probe of the FULL composed production-ingest loop with every
maintenance policy live at once (VERDICT r10 item 6; results in SCALE.md
§37): bucketed standing tables (buckets=16), compaction cadence
(compact_every=5 — whose persisted-spec gate correctly SKIPS the bucketed
tables, so the cadence's cost at this layout is the gate probe alone),
IVF refresh policy (ivf_refresh_every=5, default threshold), and the
quality-model refresh policy (quality_refresh_every=5, default PSI
threshold, day-0 model installed over the seed corpus).

Shape: a 45 000-doc SEED batch establishes the standing corpus, then 20
small batches of 250 docs each ingest on top — the standing tables
outweigh every measured batch by 180–198×. The O(touched buckets +
batch) claim is that the 20 per-batch wall times stay FLAT while the
corpus grows; a per-batch cost that tracked table size would rise ~10%
across the window and would have risen ~180× vs a batch-sized baseline.

Prints one JSON line:
  {"seed_s": ..., "batch_s": [20 floats], "first5_mean": ...,
   "last5_mean": ..., "policies": {"ivf_refreshes": n, "quality_
   refreshes": n, "compactions_skipped_bucketed": true},
   "corpus_batch_ratio": [min, max]}

Run on a QUIET host (no concurrent pytest).
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from realtime_datawarehouse_spark.operators import (  # noqa: E402
    similarity,
    table_store,
)
from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.streaming import pipelines  # noqa: E402

SF1 = "/root/repo/scale_data/sf1"
N_SMALL = 20
SMALL_SIZE = 250


def main() -> None:
    spark = build_session(app_name="rdw-probe-composed-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF1}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    joined = (
        docs.join(emb, docs.doc_id == emb.vec_id, "left")
        .select("doc_id", "text", "embedding")
        .persist()
    )
    joined.count()
    centroids = similarity._ivf_centroids(emb)

    seed = joined.where(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    smalls = [
        joined.where(
            (F.pmod(F.col("doc_id"), F.lit(10)) == 0)
            & (F.pmod(F.expr("doc_id div 10"), F.lit(N_SMALL)) == i)
        )
        for i in range(N_SMALL)
    ]

    tmp = tempfile.mkdtemp(prefix="rdw-composed-sf1-")
    ivf_refreshes = quality_refreshes = 0
    try:
        paths = tuple(
            f"{tmp}/{t}" for t in ("sigs", "flags", "comps", "ivf")
        )
        qpath = f"{tmp}/quality"
        kw = dict(
            quality_path=qpath,
            buckets=16,
            compact_every=5,
            ivf_refresh_every=5,
            quality_refresh_every=5,
            quality_corpus_provider=lambda s: docs,
        )
        t0 = time.perf_counter()
        pipelines.production_ingest_step(
            spark, seed, centroids, *paths, 0, **kw
        )
        # day-0 quality model: stand-in weights + snapshot over the seed
        pipelines.refresh_quality_model(
            spark,
            qpath,
            seed.select("doc_id", "text"),
            refresh_id=0,
            new_weights=spark.range(512).select(
                F.col("id").alias("bucket"),
                (
                    (F.col("id") * F.lit(2654435761)) % F.lit(2001)
                    - F.lit(1000)
                ).alias("w_milli"),
            ),
        )
        seed_s = round(time.perf_counter() - t0, 2)

        def versions(p):
            return len(table_store.list_versions(p))

        batch_s = []
        for i, b in enumerate(smalls, start=1):
            iv_before = versions(paths[3])
            q_before = versions(qpath)
            t0 = time.perf_counter()
            pipelines.production_ingest_step(
                spark, b, centroids, *paths, i, **kw
            )
            batch_s.append(round(time.perf_counter() - t0, 2))
            # a policy REFRESH (vs the cheap audit) writes a new version
            # outside the batch's own merge; detect via version deltas
            if versions(paths[3]) > iv_before + 1:
                ivf_refreshes += 1
            if versions(qpath) > q_before + 1:
                quality_refreshes += 1
        bucketed = all(
            table_store.bucket_spec_of(p) is not None
            for p in paths[:3] + (qpath,)
        )
        corpus_sizes = [45_000 + SMALL_SIZE * i for i in range(N_SMALL)]
        out = {
            "seed_s": seed_s,
            "batch_s": batch_s,
            "first5_mean": round(sum(batch_s[:5]) / 5, 2),
            "last5_mean": round(sum(batch_s[-5:]) / 5, 2),
            "policies": {
                "ivf_refreshes": ivf_refreshes,
                "quality_refreshes": quality_refreshes,
                "compactions_skipped_bucketed": bucketed,
            },
            "corpus_batch_ratio": [
                round(corpus_sizes[0] / SMALL_SIZE),
                round(corpus_sizes[-1] / SMALL_SIZE),
            ],
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
