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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


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
        cdc_pipelines,
        llm_ops,
        tpch_like,
        traffic,
        trade,
    )

    _LOADED = True


def get_queries() -> dict[str, QueryFn]:
    load()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    load()
    return dict(ORACLES)
