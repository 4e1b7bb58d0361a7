#!/usr/bin/env python
"""Driver-contract simulation: run ``queries()`` vs ``oracle_sql()``
side-by-side at sf0.01 and compare the canonicalized results — the same
check the external driver records in CORRECTNESS_r*.json, runnable
locally for ALL queries (the driver caps at ~50 rows/round).

Usage: python tools/driver_sim.py [query_name ...]    (no args = all)
       SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/driver_sim.py

Exit code 0 iff every named query matches (rows-only queries count as
pass when they execute and canonicalize cleanly). Previously recreated
each session as /tmp/t2sim.py (verify-skill recipe); persisted here so
the recipe survives the session.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonical form: columns sorted by name, rows sorted
    by all columns."""
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or list(qs)
    fails: list[str] = []
    for n in names:
        try:
            got = canon(qs[n](spark, SF_DIR).toPandas())
            if n not in oracles:
                print(f"{n}: rows-only ({len(got)} rows)")
                continue
            want = canon(duck.execute(oracles[n]).fetchdf())
            assert list(got.columns) == list(want.columns), (
                f"cols {list(got.columns)} != {list(want.columns)}"
            )
            assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
            for c in got.columns:
                g, w = got[c], want[c]
                if g.dtype.kind == "f" or w.dtype.kind == "f":
                    ok = np.allclose(
                        g.astype(float),
                        w.astype(float),
                        atol=1e-9,
                        rtol=0,
                        equal_nan=True,
                    )
                else:
                    ok = (
                        g.astype(str).fillna("~")
                        == w.astype(str).fillna("~")
                    ).all()
                assert ok, f"col {c} mismatch"
            print(f"{n}: OK ({len(got)} rows)")
        except Exception as ex:  # noqa: BLE001
            print(f"{n}: FAIL — {ex}")
            fails.append(n)
    print(f"\n{len(names) - len(fails)}/{len(names)} match; fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
