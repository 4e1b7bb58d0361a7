"""Training-throughput probe for the round-9 fast BPE trainer
(VERDICT r8 item 1; results recorded in SCALE.md §30).

The round-per-merge distributed trainer (``bpe_train_rounds``) launches
one Spark aggregation per learned merge — right data movement (the loop
runs over the word-frequency table, never the corpus) but a round count
that makes a realistic 32k-merge vocabulary 32 000 sequential job
launches. ``bpe_train`` collects the (tiny, frequency-capped)
word-frequency table ONCE and runs the merge loop in-process with
incremental pair-count deltas + a lazy-deletion heap.

Measures:
  (a) head-to-head at n=8 and n=64 on the sf0.1 fixture (31-word vocab —
      the largest table it sustains is 89);
  (b) the fast trainer at n ∈ {1 024, 4 096, 16 384} on the synthetic
      100k-word corpus (same LCG construction as
      probe_bpe_vocab_throughput, 5 000 docs × 150 words, 5.6 M chars);
  (c) the trained 4 096-merge table fed through ``bpe_encode_vocab`` —
      the full production train→encode pipeline wall time.

Prints one JSON line. Run on a QUIET host (no concurrent pytest).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from realtime_datawarehouse_spark.operators import textops  # noqa: E402
from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.tables import table  # noqa: E402
from tools.probe_bpe_vocab_throughput import synthetic_corpus  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = build_session("probe_bpe_train_scale")
    out: dict[str, float | int] = {}

    docs = table(spark, SF_DIR, "documents")
    docs.count()  # warm the scan

    for n in (8, 64):
        t0 = time.time()
        fast = textops.bpe_train(docs, n).collect()
        out[f"fixture_fast_n{n}_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        rounds = textops.bpe_train_rounds(docs, n).collect()
        out[f"fixture_rounds_n{n}_s"] = round(time.time() - t0, 3)
        assert sorted(map(tuple, fast)) == sorted(map(tuple, rounds))

    syn = synthetic_corpus(spark).cache()
    syn.count()
    for n in (1_024, 4_096, 16_384):
        t0 = time.time()
        got = textops.bpe_train(syn, n).collect()
        out[f"synthetic_fast_n{n}_s"] = round(time.time() - t0, 3)
        out[f"synthetic_fast_n{n}_learned"] = len(got)

    # full production pipeline: train 4 096 then encode the corpus under it
    t0 = time.time()
    merges = [
        (r.left, r.right)
        for r in textops.bpe_train(syn, 4_096).orderBy("step").collect()
    ]
    t_train = time.time() - t0
    t0 = time.time()
    enc = textops.bpe_encode_vocab(syn, merges=merges)
    n_docs = enc.count()
    t_encode = time.time() - t0
    out["pipeline_train4096_s"] = round(t_train, 3)
    out["pipeline_encode4096_s"] = round(t_encode, 3)
    out["pipeline_docs"] = n_docs

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
