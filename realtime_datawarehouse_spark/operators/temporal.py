"""Temporal join operators — as-of enrichment (the batch/time-series twin of
the reference's lookup/temporal dim join, SURVEY.md §2.5 J3: "join the dim
version valid AT the fact row's time").

Spark has no native ASOF JOIN. The scalable formulation used here is the
union-merge: tag both inputs, union them, and run one windowed
last-non-null carry-forward per key ordered by time — a single hash
exchange on the key plus a per-partition sort, i.e. exactly the cost of a
sort-merge join. This beats the naive range-join (every left row × every
earlier right row, then argmax) which is quadratic per key, and it never
collects anything driver-side.

At 100 TB: the window is per-key and streams in sort order (no full-key
buffering — ``last(ignorenulls)`` over an UNBOUNDED PRECEDING..CURRENT frame
is an O(1) running value); skewed keys are exactly as problematic as in any
keyed shuffle and AQE skew handling applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    payload: list[str],
) -> DataFrame:
    """For each ``left`` row, attach ``payload`` columns of the latest
    ``right`` row with the same key and ``right.ts <= left.ts`` (inclusive
    — a right row AT the left timestamp matches). Left rows with no prior
    right row keep NULL payloads (left-outer as-of).

    ``right`` must be unique per (key, ts) — pre-collapse ties first, or
    which row wins is undefined (same contract as DuckDB's ASOF JOIN).

    All payload columns travel as ONE struct carried by a single
    ``last(ignorenulls)``: the struct is non-NULL for every right row even
    when individual payload fields are NULL, so a left row always receives
    the payload of exactly one right row — never a per-column mix where a
    NULL field back-fills from an older right row.
    """
    lcols = left.columns
    payload_t = F.struct(*[F.col(c) for c in payload])
    tagged_left = left.select(
        F.col(key_left).alias("_k"),
        F.col(ts_left).alias("_t"),
        F.lit(0).alias("_is_r"),
        F.lit(None)
        .cast(right.select(payload_t.alias("_p")).schema["_p"].dataType)
        .alias("_p"),
        *[F.col(c) for c in lcols],
    )
    tagged_right = right.select(
        F.col(key_right).alias("_k"),
        F.col(ts_right).alias("_t"),
        F.lit(1).alias("_is_r"),
        payload_t.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    # at equal _t the right row must sort FIRST so an equal-time left row
    # sees it (inclusive as-of)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        F.last("_p", ignorenulls=True).over(w).alias("_asof_p"),
    )
    return carried.where(F.col("_is_r") == 0).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_asof_p.{c}").alias(c) for c in payload],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    payload: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """Forward as-of: attach the EARLIEST ``right`` row with the same key
    and ``right.ts >= left.ts`` (inclusive), optionally only if it lands
    within ``tolerance_us`` microseconds — "the next order after this
    event, if within a week" (pandas ``merge_asof(direction='forward',
    tolerance=...)``, kdb ``aj`` forward form).

    Same union-merge shape as :func:`asof_join` (ONE keyed exchange + a
    per-partition sort), just ordered DESCENDING so the carried value is
    the nearest FOLLOWING right row. The payload struct carries the right
    row's own timestamp, so the tolerance check is one comparison after
    the window — no second pass, and an out-of-tolerance match nulls the
    WHOLE payload (never a per-column mix)."""
    lcols = left.columns
    payload_t = F.struct(
        F.col(ts_right).alias("_pt"), *[F.col(c) for c in payload]
    )
    tagged_left = left.select(
        F.col(key_left).alias("_k"),
        F.col(ts_left).alias("_t"),
        F.lit(0).alias("_is_r"),
        F.lit(None)
        .cast(right.select(payload_t.alias("_p")).schema["_p"].dataType)
        .alias("_p"),
        *[F.col(c) for c in lcols],
    )
    tagged_right = right.select(
        F.col(key_right).alias("_k"),
        F.col(ts_right).alias("_t"),
        F.lit(1).alias("_is_r"),
        payload_t.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    # descending time: the running last-non-null is the nearest FOLLOWING
    # right row; at equal _t the right row sorts first (inclusive forward)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").desc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        F.last("_p", ignorenulls=True).over(w).alias("_asof_p"),
    )
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col("_asof_p._pt")) - F.unix_micros(F.col("_t"))
        ) <= F.lit(tolerance_us)
        carried = carried.withColumn(
            "_asof_p", F.when(in_tol, F.col("_asof_p"))
        )
    return carried.where(F.col("_is_r") == 0).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_asof_p.{c}").alias(c) for c in payload],
    )
