"""Encode-throughput probe for the round-8 vocabulary BPE encoder
(VERDICT r7 item 1; results recorded in SCALE.md §26).

Measures ``bpe_encode_vocab`` wall time under merge tables of size
8 / 1 000 / 8 000 / 32 000 (rank-consistent synthetic extensions of a
trained head — the padding entries mostly never fire, exactly like the
long tail of a real 32k vocabulary on any single document), on two
corpora:

  (a) the sf0.1 ``documents`` fixture — 5 000 docs / 1.49 M chars but a
      31-word vocabulary, so the per-partition word memo absorbs almost
      all encode work (the broadcast/plan-size cost dominates);
  (b) a synthetic high-vocab corpus (100 000 distinct words, 5 000 docs
      × 150 words) — memo-miss bound, the honest per-char kernel cost.

The chained-regexp form (``bpe_encode``) is timed at its demonstrative
n_merges=8 for the crossover reference; it cannot BUILD a 1 000-deep
Column tree, which is the point of the rewrite. Prints one JSON line.

Run on a QUIET host (no concurrent pytest), like bench.py.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from realtime_datawarehouse_spark.operators import textops  # noqa: E402
from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.tables import table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def synthetic_table(n: int) -> list[tuple[str, str]]:
    """Deterministic rank-consistent merge table over a-z (same LCG
    construction as tests/test_plans.py::
    test_bpe_encode_vocab_survives_large_vocabulary)."""
    syms = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    merges: list[tuple[str, str]] = []
    seed = 0x2545F491
    while len(merges) < n:
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        i = seed % len(syms)
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        j = seed % len(syms)
        left, right = syms[i], syms[j]
        if len(left) + len(right) > 12:
            continue
        merges.append((left, right))
        syms.append(left + right)
    return merges


def synthetic_corpus(spark, n_docs=5000, words_per_doc=150, vocab=100_000):
    """High-vocab corpus: words are LCG letter strings of length 3-10."""
    seed = 0xC0FFEE
    wordlist = []
    for _ in range(vocab):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        ln = 3 + seed % 8
        chars = []
        s = seed
        for _ in range(ln):
            s = (s * 1103515245 + 12345) % (1 << 31)
            chars.append(chr(ord("a") + s % 26))
        wordlist.append("".join(chars))
    rows = []
    s = 1
    for d in range(n_docs):
        idx = []
        for _ in range(words_per_doc):
            s = (s * 1103515245 + 12345) % (1 << 31)
            idx.append(s % vocab)
        rows.append((d, " ".join(wordlist[i] for i in idx)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def time_encode(docs, merges) -> tuple[float, int]:
    t0 = time.monotonic()
    row = (
        textops.bpe_encode_vocab(docs, merges=merges)
        .agg(
            F.sum("tokens_before").alias("b"), F.sum("tokens_after").alias("a")
        )
        .collect()[0]
    )
    return time.monotonic() - t0, int(row.b)


def main() -> None:
    spark = build_session(app_name="probe-bpe-vocab")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "bpe_encode_vocab throughput", "unit": "sec"}

    fixture = table(spark, SF_DIR, "documents").select("doc_id", "text")
    fixture.count()  # warm the scan
    synth = synthetic_corpus(spark).cache()
    n_chars_synth = synth.agg(F.sum(F.length("text"))).collect()[0][0]

    for label, docs, chars in (
        ("fixture_sf01", fixture, 1_485_576),
        ("synthetic_100k_vocab", synth, n_chars_synth),
    ):
        for n in (8, 1_000, 8_000, 32_000):
            tbl = synthetic_table(n)
            sec, _b = time_encode(docs, tbl)
            out[f"{label}_n{n}_sec"] = round(sec, 3)
            out[f"{label}_n{n}_mchars_per_s"] = round(
                chars / sec / 1e6, 2
            )

    # chained-regexp reference at its demonstrative 8 merges (training
    # subtracted: the probe times ENCODE, both forms train identically)
    t0 = time.monotonic()
    merges8 = textops._bpe_collect_merges(fixture, 8, "text")
    train_sec = time.monotonic() - t0
    t0 = time.monotonic()
    textops.bpe_encode(fixture).agg(F.sum("tokens_after")).collect()
    out["regexp_form_n8_sec_incl_train"] = round(time.monotonic() - t0, 3)
    out["train_n8_sec"] = round(train_sec, 3)
    sec, _ = time_encode(fixture, merges8)
    out["vocab_form_trained_n8_sec"] = round(sec, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
