#!/usr/bin/env python
"""Generate sf1-scale lineitem/orders for scaling probes (companion to
gen_scale_sf1.py, which covers documents/embeddings, and
gen_scale_sf1_events.py for events).

10 copies of the sf0.1 fact tables with: orderkeys offset per copy (facts
scale), part/supp keys remapped by a per-copy affine shift modulo the
EXISTING key universe (dimensions do NOT scale — the realistic regime:
10× more orders against the same catalog, so the co-purchase graph
densifies and interval buckets crowd, exactly the stress the pair-stage
probes exist to measure), and order/ship dates shifted by ±copy days to
decorrelate replicas. Deterministic; idempotent (skips if outputs exist).
"""
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
    li_out = os.path.join(OUT, "lineitem.parquet")
    o_out = os.path.join(OUT, "orders.parquet")
    if os.path.exists(li_out) and os.path.exists(o_out):
        print("exists, skipping")
        return
    con = duckdb.connect()
    maxok = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM '{SF01}/orders.parquet'"
    ).fetchone()[0]
    maxp = con.execute(
        f"SELECT max(l_partkey) FROM '{SF01}/lineitem.parquet'"
    ).fetchone()[0]
    maxs = con.execute(
        f"SELECT max(l_suppkey) FROM '{SF01}/lineitem.parquet'"
    ).fetchone()[0]
    copies = ", ".join(str(c) for c in range(COPIES))
    con.execute(
        f"""
        COPY (
          SELECT l_orderkey + c * {maxok} AS l_orderkey,
                 ((l_partkey - 1 + c * 7919) % {maxp}) + 1 AS l_partkey,
                 ((l_suppkey - 1 + c * 131) % {maxs}) + 1 AS l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount,
                 l_tax, l_returnflag, l_linestatus,
                 l_shipdate + to_days(CAST(c - 5 AS INTEGER)) AS l_shipdate
          FROM '{SF01}/lineitem.parquet', unnest([{copies}]) AS t(c)
        ) TO '{li_out}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT o_orderkey + c * {maxok} AS o_orderkey,
                 o_custkey, o_orderstatus, o_totalprice,
                 o_orderdate + to_days(CAST(c - 5 AS INTEGER)) AS o_orderdate,
                 o_orderpriority
          FROM '{SF01}/orders.parquet', unnest([{copies}]) AS t(c)
        ) TO '{o_out}' (FORMAT PARQUET)
        """
    )
    n1 = con.execute(f"SELECT count(*) FROM '{li_out}'").fetchone()[0]
    n2 = con.execute(f"SELECT count(*) FROM '{o_out}'").fetchone()[0]
    print(f"lineitem: {n1} rows, orders: {n2} rows")


if __name__ == "__main__":
    main()
