#!/usr/bin/env python
"""sf0.1 → sf1 scaling probe for the pair-stage (superlinear-risk) operators.

VERDICT r03 #3: extend measured scaling evidence one more decade for the
operators whose pair stages could go quadratic — `dedup_semantic`,
`dedup_ngram_jaccard` (exact and df-capped forms), `dedup_minhash_lsh`,
`dedup_minhash_cdc`, and the composed `pipeline_corpus_curation_v2`.

Methodology mirrors bench.py: noop sink, cold then best-of-2 warm, warm
reported. sf1 inputs come from tools/gen_scale_sf1.py (10× sf0.1 rows,
matched text statistics and embedding cluster geometry). Prints one JSON
line: {query: {"sf0.1": s, "sf1": s, "ratio": r}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402

from realtime_datawarehouse_spark.operators import dedup  # noqa: E402
from realtime_datawarehouse_spark.plans import registry  # noqa: E402
from realtime_datawarehouse_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_data", "sf1"
)

PROBE_QUERIES = (
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_cdc",
    "dedup_semantic",
    "dedup_semantic_lsh",
    "dedup_ngram_containment",
    "pipeline_corpus_curation_v2",
    "pipeline_corpus_curation_v3",
    "ann_pq_topk",
    "ann_pq_rerank_topk",
    # round-4 third-session additions (documents/embeddings-based)
    "dedup_jaccard_prefix",
    "text_substring_dedup",
    "text_dsir_weights",
    "text_ngram_novelty",
)


def _time_warm(df: DataFrame) -> float:
    df.write.format("noop").mode("overwrite").save()  # cold
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = build_session(app_name="rdw-probe-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.get_queries()

    out: dict[str, dict[str, float]] = {}
    for name in PROBE_QUERIES:
        lo = _time_warm(queries[name](spark, SF01))
        hi = _time_warm(queries[name](spark, SF1))
        out[name] = {"sf0.1": round(lo, 3), "sf1": round(hi, 3), "ratio": round(hi / lo, 2)}
        print(f"# {name}: {out[name]}", file=sys.stderr)

    # df-capped Jaccard — the registered query is the exact oracle form;
    # the cap is the 100 TB configuration (hot-shingle quadratic guard).
    for cap in (50,):
        name = f"dedup_ngram_jaccard_cap{cap}"
        lo = _time_warm(
            dedup.ngram_jaccard_pairs(
                spark.read.parquet(f"{SF01}/documents.parquet"), 0.8, max_doc_freq=cap
            )
        )
        hi = _time_warm(
            dedup.ngram_jaccard_pairs(
                spark.read.parquet(f"{SF1}/documents.parquet"), 0.8, max_doc_freq=cap
            )
        )
        out[name] = {"sf0.1": round(lo, 3), "sf1": round(hi, 3), "ratio": round(hi / lo, 2)}
        print(f"# {name}: {out[name]}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
