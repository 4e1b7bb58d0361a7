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
