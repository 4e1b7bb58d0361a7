"""sf1 probe of the SEVEN-table composed loop (round 12 — §37's setup
with the BPE encodings + vocabulary tables folded in; results in
SCALE.md §39): same 45 000-doc seed + small-batch regime (corpus ≫
batch), bucketed standing tables, compaction cadence, and ALL THREE
measure→act policies enabled with audits firing at the cadence points
and (homogeneous staging) correctly skipping the act. The claim: the
two extra standing tables add the §38 per-batch encode+merge cost
(~1 s at 250 docs) on top of §37's five-table overhead, and per-batch
cost stays FLAT while the corpus grows.

Prints one JSON line:
  {"seed_s": ..., "batch_s": [8 floats], "first4_mean": ...,
   "last4_mean": ..., "fires": {"bpe": 0, "quality": 0, "ivf": 0}}

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
    textops,
)
from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.streaming import pipelines  # noqa: E402

SF1 = "/root/repo/scale_data/sf1"
N_SMALL = 8
SMALL_SIZE = 250
SEED_N = 45_000


def main() -> None:
    spark = build_session(app_name="rdw-probe-composed7-sf1")
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
    seed = joined.where(F.col("doc_id") < SEED_N)
    centroids = similarity._ivf_centroids(
        emb.where(F.col("vec_id") < SEED_N)
    )
    out: dict = {}
    tmp = tempfile.mkdtemp(prefix="rdw-composed7-sf1-")
    try:
        p = {
            n: f"{tmp}/{n}"
            for n in ("sigs", "flags", "comps", "ivf", "quality",
                      "vocab", "enc")
        }
        m0 = [
            (r.left, r.right)
            for r in textops.bpe_train(
                seed.select("doc_id", "text"), 32
            ).orderBy("step").collect()
        ]
        r0 = pipelines._bpe_ratio_milli(
            textops.bpe_encode_vocab(
                seed.select("doc_id", "text"), merges=m0
            )
        )
        pipelines.install_bpe_vocab(spark, p["vocab"], m0, 0, r0)

        fires = {"bpe": 0, "quality": 0, "ivf": 0}

        def step(i: int, batch) -> None:
            rep: dict = {}
            pipelines.production_ingest_step(
                spark, batch, centroids,
                p["sigs"], p["flags"], p["comps"], p["ivf"],
                batch_id=i, quality_path=p["quality"],
                compact_every=5,
                ivf_refresh_every=4,
                quality_refresh_every=4,
                quality_corpus_provider=lambda s: docs,
                bpe_vocab_path=p["vocab"], bpe_enc_path=p["enc"],
                bpe_corpus_provider=lambda s: docs,
                buckets=16,
                report=rep,
            )
            for k in fires:
                if rep.get(k, {}).get("fired"):
                    fires[k] += 1

        t0 = time.perf_counter()
        step(0, seed)
        # day-0 quality model: stand-in rule weights + snapshot over the
        # seed (the §37 convention — the GD trainer's sf1 wall time is
        # §39's probe_quality_refresh_sf1.py)
        pipelines.refresh_quality_model(
            spark, p["quality"], seed.select("doc_id", "text"),
            refresh_id=0,
            new_weights=spark.range(512).select(
                F.col("id").alias("bucket"),
                (
                    (F.col("id") * F.lit(2654435761)) % F.lit(2001)
                    - F.lit(1000)
                ).alias("w_milli"),
            ),
        )
        out["seed_s"] = round(time.perf_counter() - t0, 3)

        batch_s = []
        for j in range(N_SMALL):
            lo = SEED_N + j * SMALL_SIZE
            batch = joined.where(
                (F.col("doc_id") >= lo)
                & (F.col("doc_id") < lo + SMALL_SIZE)
            )
            t0 = time.perf_counter()
            step(j + 1, batch)
            batch_s.append(round(time.perf_counter() - t0, 3))
        out["batch_s"] = batch_s
        out["first4_mean"] = round(sum(batch_s[:4]) / 4, 3)
        out["last4_mean"] = round(sum(batch_s[-4:]) / 4, 3)
        out["fires"] = fires
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
