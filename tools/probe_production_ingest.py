"""Per-batch cost probe for the round-9 COMPOSED production ingest loop
(VERDICT r8 item 5; results recorded in SCALE.md §32).

Measures, over the same deterministic 4-ingest replay of the sf0.1
corpus (docs left-joined to embeddings):

  (a) the composed ``production_ingest_step`` — dup flags + split
      maintenance + IVF upkeep over ONE shared signature pass and ONE
      corpus-signature read per batch;
  (b) the three loops run SEPARATELY per batch (the pre-composition
      deployment: ``streaming_incremental_dedup``'s flag+sig sequence,
      ``ingest_split_step`` with its own signature pass and sig table,
      ``ingest_ivf_step``) — each maintaining its own stores.

The separate form shingles/minhashes every batch twice (flags loop and
split loop each recompute signatures) and reads a corpus signature
table twice, so the composed step should win on exactly that margin;
end states are asserted identical before timing is reported. Prints one
JSON line. Run on a QUIET host (no concurrent pytest).
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
    dedup,
    similarity,
    table_store,
)
from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.streaming import pipelines  # noqa: E402
from realtime_datawarehouse_spark.tables import table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N_BATCHES = 4


def main() -> None:
    spark = build_session("probe_production_ingest")
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = table(spark, SF_DIR, "embeddings")
    joined = docs.join(emb, docs.doc_id == emb.vec_id, "left").select(
        "doc_id", "text", "embedding"
    )
    centroids = similarity._ivf_centroids(emb)
    joined.count()  # warm the scans

    out: dict[str, float] = {}

    def batches():
        for i in range(N_BATCHES):
            yield i, joined.where(
                F.pmod(F.col("doc_id"), F.lit(N_BATCHES)) == i
            )

    # (a) composed
    tmp_c = tempfile.mkdtemp(prefix="rdw-probe-comp-")
    t0 = time.time()
    per_batch_c = []
    for i, b in batches():
        tb = time.time()
        pipelines.production_ingest_step(
            spark, b, centroids,
            f"{tmp_c}/sigs", f"{tmp_c}/flags", f"{tmp_c}/comps",
            f"{tmp_c}/ivf", batch_id=i,
        )
        per_batch_c.append(round(time.time() - tb, 3))
    out["composed_total_s"] = round(time.time() - t0, 3)
    out["composed_per_batch_s"] = per_batch_c  # type: ignore[assignment]

    # (b) separate loops, each with its own stores (split keeps its own
    # signature table — that is the point being measured)
    tmp_s = tempfile.mkdtemp(prefix="rdw-probe-sep-")
    t0 = time.time()
    per_batch_s = []
    for i, b in batches():
        tb = time.time()
        d = b.select("doc_id", "text")
        # flags loop (streaming_incremental_dedup's write sequence)
        corpus_sig = table_store.read_state(spark, f"{tmp_s}/sigs_a")
        corpus_sig = (
            corpus_sig.drop("ver") if corpus_sig is not None else None
        )
        if corpus_sig is not None:
            flags = dedup.incremental_flags_vs_signatures(d, corpus_sig)
            table_store.merge_upsert(
                spark,
                flags.withColumn("batch_id", F.lit(i)).withColumn(
                    "ver", F.lit(i)
                ),
                f"{tmp_s}/flags", pk="doc_id", version_col="ver",
            )
        table_store.merge_upsert(
            spark,
            dedup.minhash_signatures(d).withColumn("ver", F.lit(i)),
            f"{tmp_s}/sigs_a", pk="doc_id", version_col="ver",
        )
        # split loop (own signature table + pass)
        pipelines.ingest_split_step(
            spark, d, f"{tmp_s}/sigs_b", f"{tmp_s}/comps", batch_id=i
        )
        # IVF loop
        e = b.where(F.col("embedding").isNotNull()).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        pipelines.ingest_ivf_step(spark, e, centroids, f"{tmp_s}/ivf", i)
        per_batch_s.append(round(time.time() - tb, 3))
    out["separate_total_s"] = round(time.time() - t0, 3)
    out["separate_per_batch_s"] = per_batch_s  # type: ignore[assignment]

    # end states must be identical before the timing means anything
    def snap(root, t, cols):
        df = table_store.read_state(spark, f"{root}/{t}")
        return sorted(tuple(r) for r in df.select(*cols).collect())

    assert snap(tmp_c, "flags", ["doc_id", "dup_of", "match_bits"]) == snap(
        tmp_s, "flags", ["doc_id", "dup_of", "match_bits"]
    )
    assert snap(tmp_c, "comps", ["doc_id", "component_id"]) == snap(
        tmp_s, "comps", ["doc_id", "component_id"]
    )
    assert snap(tmp_c, "ivf", ["vec_id", "centroid_id"]) == snap(
        tmp_s, "ivf", ["vec_id", "centroid_id"]
    )
    out["end_states_identical"] = 1

    shutil.rmtree(tmp_c, ignore_errors=True)
    shutil.rmtree(tmp_s, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
