"""Registry mapping operator-query names to (Spark callable, DuckDB oracle).

Conventions (driver contract, see repo README / __spark_entry__.py):

- Spark callable signature: ``fn(spark: SparkSession, sf_dir: str) -> DataFrame``.
- Every computed/aggregate column is aliased identically in the Spark plan
  and the oracle SQL (the driver sorts columns by name before hashing).
- Doubles are ``round()``-ed (2 dp money, 4 dp ratios) on BOTH sides so
  accumulation order can't flip a hash bit (SURVEY.md §7.4 #4/#7).
- Time columns cross the boundary as 'yyyy-MM-dd HH:mm:ss' strings
  (functions/timeutil.py) so physical timestamp precision never matters.
- Queries with no SQL-expressible oracle (streaming-stateful, LSH internals)
  register ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# --------------------------------------------------------------------------
# Driver-rotation policy (VERDICT r5 items 2 + 4). The external driver
# records correctness rows for only the first ~50 entries of queries() per
# round, in emission order, so emission order must rotate for every query to
# accumulate a driver-recorded row. Through round 5 the order was a
# hand-maintained list; a stale head would silently re-record the same 50
# queries and starve the backlog (it nearly did — VERDICT r5 "wrong" #2).
# The order is now COMPUTED from the committed CORRECTNESS_r*.json ledgers:
#
#   tier 0 — never driver-recorded, alphabetical (close the ledger gap
#            first; a newly registered query lands here automatically);
#   tier 1 — latest record NOT fully green (re-record a fixed query ASAP);
#   tier 2 — fully green, STALEST latest-record round first, then name.
#
# A rows-only record (err == "no_oracle") is that query's best achievable
# record and counts as green. Each new round's committed ledger re-derives
# the head, so the stale-head failure mode is structurally impossible and
# tier 2 cycles every query on a ~(total/50)-round cadence.
# --------------------------------------------------------------------------

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def record_ledger(repo_root: str = _REPO_ROOT) -> dict[str, tuple[int, bool]]:
    """name -> (latest driver-recorded round, that record was fully green),
    from the committed ``CORRECTNESS_r*.json`` files (absent files → empty
    ledger → pure-alphabetical rotation, e.g. in a deployed package)."""
    by_round: list[tuple[int, dict]] = []
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        with open(path, encoding="utf-8") as f:
            by_round.append((int(m.group(1)), json.load(f)))
    ledger: dict[str, tuple[int, bool]] = {}
    for rnd, rows in sorted(by_round):  # numeric order — r10 after r09
        for name, row in rows.items():
            green = row.get("err") in (None, "no_oracle") and not any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            ledger[name] = (rnd, green)
    return ledger


def driver_priority(
    names: Iterable[str] | None = None, repo_root: str = _REPO_ROOT
) -> list[str]:
    """Emission order per the rotation policy above."""
    if names is None:
        load()
        names = QUERIES
    ledger = record_ledger(repo_root)

    def key(n: str) -> tuple[int, int, str]:
        if n not in ledger:
            return (0, 0, n)
        rnd, green = ledger[n]
        return (2, rnd, n) if green else (1, 0, n)

    return sorted(names, key=key)


_LOADED = False


def _rotated(d: dict) -> dict:
    return {n: d[n] for n in driver_priority(d)}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query plan and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load() -> None:
    """Import all plan modules (idempotent) so their decorators register."""
    global _LOADED
    if _LOADED:
        return
    from realtime_datawarehouse_spark.plans import (  # noqa: F401
        analytic,
        cdc_pipelines,
        graph_ops,
        llm_ops,
        sketch_agg,
        tpch_like,
        traffic,
        trade,
        warehouse_ext,
    )

    _LOADED = True


def get_queries() -> dict[str, QueryFn]:
    load()
    return _rotated(QUERIES)


def get_oracles() -> dict[str, str]:
    load()
    return _rotated(ORACLES)
