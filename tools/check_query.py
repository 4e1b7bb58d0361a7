"""Spot-check registered queries against their DuckDB oracles.

Usage: python tools/check_query.py name1 name2 ... [--sf 0.001]

Replicates the driver's t2 compare (tests/conftest.assert_matches_oracle)
for a subset of queries without paying the full suite's session cost.
"""

from __future__ import annotations

import sys

import duckdb

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from realtime_datawarehouse_spark.plans import registry  # noqa: E402
from realtime_datawarehouse_spark.tables import TABLE_NAMES  # noqa: E402
from tests.conftest import assert_matches_oracle  # noqa: E402


def main() -> None:
    # both `--sf 0.01` and `--sf=0.01` work; the space form's value must
    # not leak into the query-name list (it did pre-r6 — VERDICT r5 nit)
    argv, args, sf, i = sys.argv[1:], [], "0.001", 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--sf"):
            if "=" in a:
                sf = a.split("=", 1)[1]
            elif i + 1 < len(argv):
                sf = argv[i + 1]
                i += 1
            else:
                sys.exit("usage: check_query.py name... [--sf 0.01 | --sf=0.01]")
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    sf_dir = f"/root/testdata/sf{sf}"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("check_query")
        .getOrCreate()
    )
    duck = duckdb.connect()
    for t in TABLE_NAMES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    registry.load()
    failed = []
    for name in args:
        fn = registry.QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            if name in registry.ORACLES:
                assert_matches_oracle(df, duck, registry.ORACLES[name])
                print(f"{name}: OK (oracle match, {df.count()} rows)")
            else:
                print(f"{name}: ran, {df.count()} rows (no oracle)")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"{name}: FAIL — {e}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
