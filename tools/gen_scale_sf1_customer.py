#!/usr/bin/env python
"""Generate a sf1-scale customer table for the iterative-graph probes
(companion to gen_scale_sf1.py / gen_scale_sf1_tpch.py).

10 copies of sf0.1's customer with c_custkey offset per copy and the
nation key kept — so every nation's ring in the graph fixtures grows 10×
in circumference (10× nodes, 10× edges, same degree distribution), which
is the scaling regime the per-round lineage-cut mechanism must survive.
Deterministic; idempotent (skips if the output exists)."""
from __future__ import annotations

import os

import duckdb

SF01 = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scale_data",
    "sf1",
)
COPIES = 10


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    dst = os.path.join(OUT, "customer.parquet")
    if os.path.exists(dst):
        print(f"exists, skipping: {dst}")
        return
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW c AS SELECT * FROM '{SF01}/customer.parquet'"
    )
    (off,) = duck.execute("SELECT max(c_custkey) FROM c").fetchone()
    duck.execute(
        f"""
        COPY (
          SELECT c.* REPLACE (c_custkey + i.range * {off} AS c_custkey)
          FROM c CROSS JOIN range({COPIES}) i
          ORDER BY c_custkey
        ) TO '{dst}' (FORMAT PARQUET)
        """
    )
    (n,) = duckdb.execute(f"SELECT count(*) FROM '{dst}'").fetchone()
    print(f"wrote {dst}: {n} rows ({COPIES} copies, offset {off})")


if __name__ == "__main__":
    main()
