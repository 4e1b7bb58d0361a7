#!/usr/bin/env python
"""Generate an sf1-scale documents/embeddings pair for scaling probes.

The driver testdata stops at sf0.1 (TESTDATA.md); the superlinear-risk
operators (pair-stage dedup, composed curation) need one more decade of
evidence (VERDICT r03 #3). This writes ``scale_data/sf1/{documents,
embeddings}.parquet`` inside the repo (testdata is read-only), 10× the
sf0.1 row counts, matching its observed statistics:

- documents: 50 000 rows, the same 31-word vocabulary, uniform 10–100
  tokens, the same lang/source distributions, and a comparable exact-dup
  rate (~0.16%: sf0.1 has 8 dup texts in 5 000). Texts are FRESH random
  sequences — replicating sf0.1 texts 10× would manufacture ~45 near-dup
  pairs per document and distort the pair-stage ops the probe exists to
  measure.
- embeddings: 20 000 rows, bootstrap-resampled from sf0.1 (unit-norm base
  + σ=0.05 noise, re-normalized, label preserved) so the 10-cluster
  geometry that drives IVF/SemDeDup cluster populations carries over.

Deterministic (seed 42). Idempotent: skips if outputs exist.
"""
from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_data", "sf1")
N_DOCS = 50_000
N_VECS = 20_000
DUP_EVERY = 625  # ≈ sf0.1's 8/5000 exact-dup rate


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    docs_out = os.path.join(OUT, "documents.parquet")
    emb_out = os.path.join(OUT, "embeddings.parquet")
    if os.path.exists(docs_out) and os.path.exists(emb_out):
        print("exists, skipping")
        return
    rng = np.random.default_rng(42)
    con = duckdb.connect()

    vocab = [
        r[0]
        for r in con.execute(
            f"""SELECT DISTINCT unnest(string_split(text, ' ')) AS t
                FROM '{SF01}/documents.parquet' ORDER BY t"""
        ).fetchall()
    ]
    langs, lang_w = zip(
        *con.execute(
            f"""SELECT lang, count(*) FROM '{SF01}/documents.parquet'
                GROUP BY 1 ORDER BY 1"""
        ).fetchall()
    )
    lang_p = np.array(lang_w, dtype=float)
    lang_p /= lang_p.sum()

    n_tok = rng.integers(10, 101, size=N_DOCS)
    words = np.array(vocab)
    texts: list[str] = []
    for i in range(N_DOCS):
        if i % DUP_EVERY == DUP_EVERY - 1 and i > 0:
            texts.append(texts[rng.integers(0, i)])
        else:
            texts.append(" ".join(words[rng.integers(0, len(words), n_tok[i])]))
    doc_lang = rng.choice(langs, size=N_DOCS, p=lang_p)
    doc_src = np.array([f"src{i}" for i in rng.integers(0, 20, N_DOCS)])
    tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(doc_lang, pa.string()),
            "source": pa.array(doc_src, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, docs_out)

    base = con.execute(
        f"SELECT embedding, label FROM '{SF01}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    base_vecs = np.array([r[0] for r in base], dtype=np.float32)
    base_labels = np.array([r[1] for r in base])
    pick = rng.integers(0, len(base_vecs), N_VECS)
    noise = rng.normal(0.0, 0.05, size=(N_VECS, base_vecs.shape[1])).astype(
        np.float32
    )
    vecs = base_vecs[pick] + noise
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(base_labels[pick].tolist(), pa.int32()),
        }
    )
    pq.write_table(tbl, emb_out)
    print(f"wrote {docs_out} ({N_DOCS}) and {emb_out} ({N_VECS})")


if __name__ == "__main__":
    main()
