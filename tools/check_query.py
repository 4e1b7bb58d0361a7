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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "0.001"
    for a in sys.argv[1:]:
        if a.startswith("--sf"):
            sf = a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1]
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
