"""Skew mitigation utilities (the 100 TB escape hatches).

Default stance: AQE handles skew where it can —
``spark.sql.adaptive.skewJoin`` splits oversized join partitions at runtime
(on by default in session.py). These utilities cover the cases AQE cannot
re-plan:

- ``salted_count_distinct`` — exact COUNT(DISTINCT v) per key when one key
  owns a huge share of rows. Salting by HASH OF THE VALUE keeps each
  distinct value in exactly one (key, salt) bucket, so bucket counts are
  disjoint and their sum is exact — two shuffles of bounded-size partials
  instead of one shuffle with a giant hot partition.
- ``replicated_salt_join`` — fact⋈fact equi-join with a pathological hot
  key on the probe side and a non-broadcastable build side: probe rows get
  a deterministic per-row salt, build rows are replicated across all salts,
  and the join key becomes (key, salt) — the hot key's rows spread over
  ``n_salt`` partitions. Costs ``n_salt×`` replication of the build side;
  use only on the skewed key subset (split-union with the normal join) when
  the build side is large.

Both are pure DataFrame rewrites — deterministic, oracle-checkable, no RDDs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(col: Column, n_salt: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(n_salt))


def salted_count_distinct(
    df: DataFrame, key: str, value: str, n_salt: int = 16
) -> DataFrame:
    """Exact per-key count-distinct via value-hash salting.

    Returns (key, distinct_ct). Equivalent to
    ``df.groupBy(key).agg(countDistinct(value))`` for any data; differs only
    in shuffle shape: partial distinct-counts per (key, salt) combine
    map-side, then n_salt small rows per key merge — the hot key never
    concentrates in one task.
    """
    partial = (
        df.groupBy(F.col(key), _salt_of(F.col(value), n_salt).alias("_salt"))
        .agg(F.countDistinct(value).alias("_part_ct"))
    )
    return partial.groupBy(key).agg(
        F.sum("_part_ct").alias("distinct_ct")
    )


def replicated_salt_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side's hot keys spread across n_salt tasks.

    ``probe`` rows get salt = hash(entire row) % n_salt; ``build`` rows are
    exploded once per salt value. Output columns = probe ∪ build columns
    (join key kept once, from the probe side).
    """
    pcols, bcols = probe.columns, build.columns
    salted_probe = probe.withColumn(
        "_salt", _salt_of(F.struct(*[F.col(c) for c in pcols]), n_salt)
    )
    replicated_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumnRenamed(key, "_bkey")
    joined = salted_probe.join(
        replicated_build,
        (F.col(key) == F.col("_bkey"))
        & (salted_probe["_salt"] == replicated_build["_salt"]),
        how,
    )
    keep = [F.col(c) for c in pcols] + [
        F.col(c) for c in bcols if c != key
    ]
    return joined.select(*keep)
