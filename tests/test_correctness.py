"""Replicates the driver's t2 gate locally: every registered query with an
oracle must match DuckDB at sf0.001 (fast); queries without an oracle must at
least run and return a stable schema."""

from __future__ import annotations

import pytest

from realtime_datawarehouse_spark.plans import registry
from tests.conftest import SF_DIR, assert_matches_oracle

registry.load()
ALL = sorted(registry.QUERIES)
WITH_ORACLE = [n for n in ALL if n in registry.ORACLES]
WITHOUT_ORACLE = [n for n in ALL if n not in registry.ORACLES]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, registry.ORACLES[name])


@pytest.mark.parametrize("name", WITHOUT_ORACLE)
def test_query_runs(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert df.columns  # stable schema
    assert df.count() >= 0


def test_every_query_has_docstring_or_operator_citation():
    for name, fn in registry.QUERIES.items():
        mod_doc = __import__(fn.__module__, fromlist=["__doc__"]).__doc__ or ""
        assert (fn.__doc__ or mod_doc), f"{name} lacks documentation"
