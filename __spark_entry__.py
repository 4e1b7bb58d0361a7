"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``realtime_datawarehouse_spark`` package; the
query/oracle pairs are registered in
``realtime_datawarehouse_spark/plans/*.py`` (one entry per operator from
SURVEY.md §2 plus the training-data-pipeline extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_datawarehouse_spark.plans import registry  # noqa: E402
from realtime_datawarehouse_spark.session import tune_existing  # noqa: E402

FLAGSHIP = "tpch_q1_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_existing(spark)
    return registry.get_queries()[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""

    def wrap(fn: registry.QueryFn) -> registry.QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in registry.get_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys missing here are the
    non-SQL-expressible ops (driver records a weaker rows-only check)."""
    return registry.get_oracles()
