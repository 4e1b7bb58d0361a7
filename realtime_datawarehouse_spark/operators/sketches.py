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
