"""Property tests for the portable hash layer — every sketch oracle
(MinHash, SimHash, LSH, fingerprints) rests on Spark and DuckDB computing
bit-identical hashes; hypothesis hunts the string space for divergence."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from realtime_datawarehouse_spark.functions.hashing import (
    MERSENNE_P,
    hash64,
    hash64_sql,
    minhash_perm,
    minhash_perm_sql,
    permutation_params,
)

# arbitrary unicode incl. quotes/backslashes/controls — values are PARAMETER
# BOUND on the DuckDB side (as real column values flow), never spliced into
# SQL text: literal splicing mangles e.g. NBSP and would test the quoting,
# not the hash
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=0,
    max_size=80,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20, unique=True))
def test_hash64_matches_duckdb(spark, strings):
    got = {
        r.s: r.h
        for r in spark.createDataFrame([(s,) for s in strings], "s string")
        .select("s", hash64(F.col("s")).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for s in strings:
        (exp,) = con.execute(
            f"SELECT {hash64_sql('?')}", [s]
        ).fetchone()
        assert got[s] == exp, f"hash64 diverges for {s!r}"
    con.close()


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 60) - 1))
def test_minhash_permutation_matches_duckdb(spark, h):
    a, b = permutation_params(4)[2]
    got = (
        spark.range(1)
        .select(minhash_perm(F.lit(h), a, b).alias("p"))
        .collect()[0]
        .p
    )
    (exp,) = duckdb.sql(f"SELECT {minhash_perm_sql(str(h), a, b)}").fetchone()
    assert got == exp
    assert 0 <= got < MERSENNE_P


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=10, unique=True))
def test_hash64_pair_matches_duckdb(spark, strings):
    """Both halves of the one-md5 double hash (Bloom k=2) must agree with
    their DuckDB renderings, and the halves must be independent (differ
    for at least one input when any input is non-degenerate)."""
    from realtime_datawarehouse_spark.functions.hashing import (
        hash64_pair,
        hash64_pair_sql,
    )

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    h1, h2 = hash64_pair(F.col("s"))
    got = {
        r.s: (r.h1, r.h2)
        for r in df.select("s", h1.alias("h1"), h2.alias("h2")).collect()
    }
    s1, s2 = hash64_pair_sql("?")
    con = duckdb.connect()
    for s in strings:
        (e1,) = con.execute(f"SELECT {s1}", [s]).fetchone()
        (e2,) = con.execute(f"SELECT {s2}", [s]).fetchone()
        assert got[s] == (e1, e2), f"hash64_pair diverges for {s!r}"
        assert 0 <= got[s][0] < (1 << 60) and 0 <= got[s][1] < (1 << 60)
    con.close()


@settings(max_examples=10, deadline=None)
@given(
    st.lists(  # left rows: (key, ts)
        st.tuples(st.sampled_from(["k1", "k2", "k3"]), st.integers(0, 50)),
        min_size=1, max_size=12,
    ),
    st.lists(  # right rows: (key, ts, payload-or-None)
        st.tuples(
            st.sampled_from(["k1", "k2", "k4"]),
            st.integers(0, 50),
            st.one_of(st.none(), st.integers(0, 9)),
        ),
        min_size=0, max_size=12,
    ),
)
def test_asof_join_matches_duckdb_asof(spark, left_rows, right_rows):
    """asof_join ≡ DuckDB native ASOF LEFT JOIN (>= semantics) on random
    inputs, including NULL payload fields — pins the struct-carry fix
    (a NULL in the matched right row must surface, never back-fill)."""
    import pandas as pd

    from realtime_datawarehouse_spark.operators.temporal import asof_join

    # dedupe right on (key, ts) — the operator's documented precondition
    seen = {}
    for k, t, p in right_rows:
        seen[(k, t)] = p
    right_rows = [(k, t, p) for (k, t), p in sorted(seen.items())]
    left_rows = sorted(set(left_rows))

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        "k string, t long, lid long",
    )
    if right_rows:
        right = spark.createDataFrame(right_rows, "k string, t long, p long")
    else:
        right = spark.createDataFrame([], "k string, t long, p long")
    got = {
        r.lid: r.p
        for r in asof_join(
            left, right, "k", "k", "t", "t", payload=["p"]
        ).collect()
    }

    con = duckdb.connect()
    con.register("l", pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["k", "t", "lid"],
    ))
    con.register("r", pd.DataFrame(right_rows, columns=["k", "t", "p"]))
    exp_rows = con.execute(
        "SELECT l.lid, r.p FROM l ASOF LEFT JOIN r"
        " ON l.k = r.k AND l.t >= r.t"
    ).fetchall()
    exp = {lid: (None if p is None else int(p)) for lid, p in exp_rows}
    con.close()
    assert got == exp, (left_rows, right_rows)


def test_cdc_chunks_reconstruct_property(spark):
    """Property (hypothesis): for ANY text — including sentinel chars,
    doubled spaces, and empty tokens — cdc_chunks is a partition of the
    sanitized token stream: chunk token-counts and md5 hashes match an
    independent pure-Python re-derivation, and no token is dropped or
    duplicated."""
    import hashlib

    from hypothesis import given, settings, strategies as st

    from realtime_datawarehouse_spark.operators import textops

    token = st.text(alphabet="ab\x01 Z9", min_size=0, max_size=6)
    texts = st.lists(token, min_size=0, max_size=40).map(" ".join)

    def local_chunks(toks, divisor=textops.CDC_DIVISOR):
        out, cur = [], []
        for t in toks:
            cur.append(t)
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            if h % divisor == 0:
                out.append(cur)
                cur = []
        if cur:
            out.append(cur)
        return out

    @settings(max_examples=10, deadline=None)
    @given(texts)
    def check(text):
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = textops.cdc_chunks(docs).orderBy("chunk_id").collect()
        sanitized = [
            t for t in text.replace("\x01", "").lower().split(" ") if t != ""
        ]
        expected = local_chunks(sanitized)
        assert [r.n_tokens for r in out] == [len(c) for c in expected]
        assert sum(r.n_tokens for r in out) == len(sanitized)
        assert [r.chunk_hash for r in out] == [
            hashlib.md5(" ".join(c).encode()).hexdigest() for c in expected
        ]

    check()
