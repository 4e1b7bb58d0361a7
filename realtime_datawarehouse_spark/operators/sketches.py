"""Sketch / approximate aggregation layer — the 100 TB counterparts of the
exact distinct/quantile/top-k aggregations.

The reference computes exact distincts by materializing per-window HashSets
(rt/app/dws/DwsTradeSkuOrderWindow.java:113-155 — A5) — fine when a window's
key set fits one task's heap, but the state is O(distinct values). These
operators are the scale escape hatches a 100 TB deployment swaps in:

- ``approx_distinct_by_key``: HyperLogLog++ (`approx_count_distinct`) —
  fixed ~1.5 KB of state per key regardless of cardinality, map-side
  combinable, mergeable across partitions. Error is ~1.04/sqrt(2^p).
- ``approx_quantiles_by_key``: Greenwald-Khanna (`percentile_approx`) —
  bounded-size mergeable quantile summaries, vs an exact sort of the group.
- ``heavy_hitters``: exact top-k per group via two-level count + rank — the
  count pre-aggregates map-side so the shuffle carries one row per distinct
  (group, item), then a window rank over the (much smaller) count table.

Spark's HLL/GK sketches are deterministic for a given input but NOT
bit-compatible with DuckDB's approx functions, so the approx operators
register without a SQL oracle (the driver records the weaker rows-only
check); their accuracy contracts are pinned by bounds tests against the
exact aggregations (tests/test_plans.py::test_sketch_accuracy_bounds).
``heavy_hitters`` is exact and fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.functions.hashing import (
    hash64,
    hash64_sql,
    minhash_perm,
    minhash_perm_sql,
    permutation_params,
)


def approx_distinct_by_key(
    df: DataFrame, key: Column | str, col: str, rsd: float = 0.02
) -> DataFrame:
    """groupBy(key).approx_count_distinct(col) — HLL++ with target relative
    standard deviation ``rsd``. State per key is constant-size, so the
    aggregation survives any cardinality the exact set-based form cannot."""
    return df.groupBy(key).agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct"),
    )


def approx_quantiles_by_key(
    df: DataFrame,
    key: Column | str,
    col: str,
    quantiles: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """groupBy(key).percentile_approx(col, quantiles) — mergeable GK
    summaries; max rank error is 1/accuracy of the group size."""
    return df.groupBy(key).agg(
        F.percentile_approx(col, quantiles, accuracy).alias("quantiles"),
    )


def heavy_hitters(
    df: DataFrame,
    group: str,
    item: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-``k`` most frequent ``item`` values per ``group``.

    Two-level shape: count per (group, item) — map-side combined, shuffle
    carries one row per distinct pair — then rank within group. Ties break
    deterministically by item value so the result (and the DuckDB oracle)
    is unique. At 100 TB the count table is |distinct pairs|, orders of
    magnitude under the fact table; a skewed group only ever ranks its own
    distinct items, never re-scans rows.
    """
    counts = df.groupBy(group, item).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(group).orderBy(F.desc("cnt"), F.asc(item))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group, item, "cnt", "rank")
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 1024  # slots per row


def cms_heavy_hitters(
    fact: DataFrame,
    dim_keys: DataFrame,
    key_col: str,
    k: int = 10,
) -> DataFrame:
    """Top-k keys by count-min-sketch estimate, with the exact count and
    the CMS overestimate beside it.

    The mergeable-state alternative to :func:`heavy_hitters` when the key
    domain is unbounded: sketch state is d×w counters (here 4×1024)
    REGARDLESS of data volume — after Spark's map-side partial aggregation
    the (row, slot) shuffle carries at most d·w·partitions rows, and the
    candidate probe joins against a broadcast of the ≤ d·w cells. Estimates
    only ever overestimate (collisions add); the exact column quantifies it.

    Hash family: the engine's portable universal hashes over the 60-bit md5
    base (functions/hashing.py), slot = perm_j(h) mod w — identical in the
    SQL oracle, so cell placement (and therefore every collision) is
    engine-exact.

    ``dim_keys``: one row per candidate key (the dimension table / prior
    candidate list — at 100 TB the CMS answers point queries; it cannot
    enumerate keys, so candidates come from a dimension or a sampled pass).
    """
    params = permutation_params(CMS_D)
    # CMS increments are additive, so cells can aggregate per-KEY counts
    # instead of per-ROW increments — bit-identical by additivity, and the
    # hash/explode pipeline runs over |keys| rows instead of |fact| rows
    # (this query materializes the per-key counts anyway for the exact
    # column; a pure streaming build would explode per row and rely on
    # map-side combine for the same d×w shuffle bound).
    keyed = fact.groupBy(F.col(key_col).alias("cand")).agg(
        F.count("*").alias("exact_ct")
    )
    h = hash64(F.col("cand").cast("string"))
    slots = F.array(
        *[
            F.struct(
                F.lit(j).alias("r"),
                (minhash_perm(h, a, b) % CMS_W).alias("slot"),
            )
            for j, (a, b) in enumerate(params)
        ]
    )
    cells = (
        keyed.select(F.col("exact_ct").alias("w"), F.explode(slots).alias("c"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.slot").alias("slot"))
        .agg(F.sum("w").alias("cnt"))
    )
    hq = hash64(F.col("cand").cast("string"))
    probes = dim_keys.select(F.col(key_col).alias("cand")).select(
        "cand",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("r"),
                        (minhash_perm(hq, a, b) % CMS_W).alias("slot"),
                    )
                    for j, (a, b) in enumerate(params)
                ]
            )
        ).alias("p"),
    )
    est = (
        probes.join(
            F.broadcast(cells),
            (F.col("p.r") == F.col("r")) & (F.col("p.slot") == F.col("slot")),
            "left",
        )
        .groupBy("cand")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_ct"))
    )
    return (
        est.join(keyed, "cand", "left")
        .select(
            F.col("cand").alias(key_col),
            "est_ct",
            F.coalesce(F.col("exact_ct"), F.lit(0)).alias("exact_ct"),
            (F.col("est_ct") - F.coalesce(F.col("exact_ct"), F.lit(0))).alias(
                "over_ct"
            ),
        )
        .orderBy(F.col("est_ct").desc(), F.col(key_col))
        .limit(k)
    )


def cms_heavy_hitters_oracle(k: int = 10) -> str:
    params = permutation_params(CMS_D)
    h_fact = hash64_sql("CAST(l_partkey AS VARCHAR)")
    h_cand = hash64_sql("CAST(p_partkey AS VARCHAR)")
    inst = "\nUNION ALL\n".join(
        f"SELECT {j} AS r, ({minhash_perm_sql('h', a, b)}) % {CMS_W} AS slot"
        f" FROM hf"
        for j, (a, b) in enumerate(params)
    )
    probe = "\nUNION ALL\n".join(
        f"SELECT cand, {j} AS r, ({minhash_perm_sql('h', a, b)}) % {CMS_W}"
        f" AS slot FROM hc"
        for j, (a, b) in enumerate(params)
    )
    return f"""
WITH hf AS (
  SELECT {h_fact} AS h FROM lineitem
), inst AS (
{inst}
), cells AS (
  SELECT r, slot, count(*) AS cnt FROM inst GROUP BY 1, 2
), hc AS (
  SELECT p_partkey AS cand, {h_cand} AS h FROM part
), probes AS (
{probe}
), est AS (
  SELECT p.cand, min(COALESCE(c.cnt, 0)) AS est_ct
  FROM probes p LEFT JOIN cells c ON c.r = p.r AND c.slot = p.slot
  GROUP BY p.cand
), exact AS (
  SELECT l_partkey AS cand, count(*) AS exact_ct FROM lineitem GROUP BY 1
)
SELECT e.cand AS l_partkey, e.est_ct,
       COALESCE(x.exact_ct, 0) AS exact_ct,
       e.est_ct - COALESCE(x.exact_ct, 0) AS over_ct
FROM est e LEFT JOIN exact x ON x.cand = e.cand
ORDER BY e.est_ct DESC, e.cand
LIMIT {k}
"""
