"""sf1 probe of the tokenize-on-ingest loop (round 11; results in
SCALE.md §38): per-batch cost of ``ingest_bpe_step`` must be flat in the
STANDING corpus size — a batch encodes map-only under the broadcast
vocab and merges O(touched buckets + batch); only a REFRESH touches the
accumulated corpus (and §30 already scales the trainer itself).

Shape mirrors §37: 45 000-doc seed, then 20 batches of 250 docs at
180–199× corpus/batch, margin high enough that no refresh fires inside
the measured window (steady-state cost), plus ONE forced refresh at the
end timed separately (the amortized compaction-class job).

Prints one JSON line. Run on a QUIET host.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from realtime_datawarehouse_spark.operators import textops  # noqa: E402
from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.streaming import pipelines  # noqa: E402

SF1 = "/root/repo/scale_data/sf1"
N_SMALL = 20
MERGES = 32


def main() -> None:
    spark = build_session(app_name="rdw-probe-bpe-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF1}/documents.parquet").select(
        "doc_id", "text"
    ).persist()
    docs.count()
    seed = docs.where(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    smalls = [
        docs.where(
            (F.pmod(F.col("doc_id"), F.lit(10)) == 0)
            & (F.pmod(F.expr("doc_id div 10"), F.lit(N_SMALL)) == i)
        )
        for i in range(N_SMALL)
    ]
    tmp = tempfile.mkdtemp(prefix="rdw-bpe-sf1-")
    try:
        vpath, epath = f"{tmp}/vocab", f"{tmp}/enc"
        t0 = time.perf_counter()
        m1 = [
            (r.left, r.right)
            for r in textops.bpe_train(seed, MERGES).orderBy("step").collect()
        ]
        train_s = round(time.perf_counter() - t0, 2)
        r1 = pipelines._bpe_ratio_milli(
            textops.bpe_encode_vocab(seed, merges=m1)
        )
        pipelines.install_bpe_vocab(spark, vpath, m1, 0, r1)
        t0 = time.perf_counter()
        pipelines.ingest_bpe_step(spark, seed, vpath, epath, 0)
        seed_s = round(time.perf_counter() - t0, 2)
        batch_s = []
        for i, b in enumerate(smalls, start=1):
            t0 = time.perf_counter()
            fired = pipelines.ingest_bpe_step(
                spark, b, vpath, epath, i,
                corpus_provider=lambda s: docs,
            )
            batch_s.append(round(time.perf_counter() - t0, 2))
            assert fired is False  # steady state: the window stays cheap
        # ONE forced refresh: margin 0 fires on any batch above snapshot
        t0 = time.perf_counter()
        refired = pipelines.ingest_bpe_step(
            spark, smalls[0], vpath, epath, N_SMALL + 1,
            corpus_provider=lambda s: docs, margin_milli=-1,
        )
        refresh_s = round(time.perf_counter() - t0, 2)
        out = {
            "train_seed_s": train_s,
            "seed_encode_merge_s": seed_s,
            "batch_s": batch_s,
            "first5_mean": round(sum(batch_s[:5]) / 5, 2),
            "last5_mean": round(sum(batch_s[-5:]) / 5, 2),
            "forced_refresh_fired": bool(refired),
            "forced_refresh_s": refresh_s,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
